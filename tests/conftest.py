import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths
# compile and execute in CI without TPU hardware (SURVEY.md §4). The axon
# TPU plugin in this image ignores JAX_PLATFORMS, so we force the platform
# through jax.config before any backend is initialized.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeated suite runs skip XLA recompilation.
# NOTE: on the CPU backend the cache only engages with
# persistent_cache_enable_xla_caches="all" (measured 11x speedup on
# re-compiles; without it the cache dir stays cold).
# STYLETTS2_NO_CACHE=1 opts out entirely (debugging compile behavior).
if os.environ.get("STYLETTS2_NO_CACHE") != "1":
    # keyed by host fingerprint: XLA:CPU AOT entries compiled on another
    # machine must never load here (cpu_aot_loader SIGILL risk)
    from styletts2_tpu.utils import host_cache_dir

    jax.config.update("jax_compilation_cache_dir", host_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
