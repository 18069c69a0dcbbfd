"""Multi-chip validation on the 8-virtual-CPU-device mesh (conftest forces
--xla_force_host_platform_device_count=8): the REAL trainer steps run
sharded (batch P('data'), wide kernels P over 'model') and produce the same
losses as the single-device path.

This is the CI counterpart of `__graft_entry__.dryrun_multichip` /
parallel/dryrun.py and the replacement for the reference's DDP/DataParallel
layer (train_first.py:49-50, train_second.py:35-40 — the latter documented
broken for stage 2; pjit over a Mesh fixes it by construction)."""

import jax
import numpy as np
import pytest

from styletts2_tpu.parallel.dryrun import (
    synthetic_batch,
    tiny_config,
    tiny_training_setup,
)


@pytest.fixture(autouse=True, scope="module")
def _no_compile_cache():
    """Disable the persistent compile cache for multi-device tests:
    AOT-reloaded multi-device CPU executables deadlock XLA's in-process
    collective rendezvous (see parallel/dryrun.py). Cold compiles are safe."""
    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    yield
    jax.config.update("jax_compilation_cache_dir", prev)
from styletts2_tpu.parallel.mesh import make_mesh, param_pspec, shard_params
from styletts2_tpu.train.stage1 import Stage1Trainer
from styletts2_tpu.train.stage2 import Stage2Trainer


def test_mesh_has_8_devices():
    assert jax.device_count() >= 8


def test_param_pspec_rules():
    from jax.sharding import PartitionSpec as P

    class A:
        ndim, shape = 2, (128, 2048)

    class B:
        ndim, shape = 2, (2048, 128)

    class C:
        ndim, shape = 2, (128, 128)

    assert param_pspec("x", A()) == P(None, "model")
    assert param_pspec("x", B()) == P("model", None)
    assert param_pspec("x", C()) == P()


@pytest.mark.slow
def test_stage1_pre_tma_mesh_matches_single_device():
    """One pre-TMA stage-1 step: dp×tp mesh losses == single-device losses.
    Same init seed, same batch, same host rng draws on both paths.
    slow: compiles the trainer step twice (~10 min each on a 1-core host)."""
    mesh = make_mesh(8, model_parallel=2)
    B = int(mesh.shape["data"])  # 4

    def one_step(use_mesh):
        cfg = tiny_config()  # TMA_epoch default → pre-TMA at epoch 0
        models, state = tiny_training_setup(cfg)
        trainer = Stage1Trainer(
            cfg, models, state, mesh=mesh if use_mesh else None
        )
        rng = np.random.default_rng(7)
        batch = synthetic_batch(rng, B)
        return trainer.train_step(batch, epoch=0, rng=rng), trainer

    m_single, _ = one_step(False)
    m_mesh, tr = one_step(True)
    assert m_single is not None and m_mesh is not None
    for k in m_single:
        np.testing.assert_allclose(
            m_mesh[k], m_single[k], rtol=2e-3, atol=2e-4,
            err_msg=f"metric {k} diverges between mesh and single device",
        )
    # some wide PL-BERT kernels really are sharded over 'model'
    shardings = {
        str(s)
        for s in jax.tree.leaves(
            jax.tree.map(lambda x: x.sharding.spec, tr.state.params["bert"])
        )
    }
    assert any("model" in s for s in shardings), shardings


@pytest.mark.slow
def test_stage2_joint_mesh_step():
    """One joint stage-2 step (diffusion + SLM-adv + discriminators) under
    the dp×tp mesh: finite losses, params stay sharded."""
    mesh = make_mesh(8, model_parallel=2)
    B = int(mesh.shape["data"])
    cfg = tiny_config()
    cfg.loss_params.diff_epoch = 0
    cfg.loss_params.joint_epoch = 0
    models, state = tiny_training_setup(cfg, stage2=True)
    trainer = Stage2Trainer(cfg, models, state, mesh=mesh)
    rng = np.random.default_rng(2)
    batch = synthetic_batch(rng, B, wav_len=40000)
    m = trainer.train_step(batch, epoch=1, iters=9, rng=rng)
    assert m is not None
    for k in ("g_loss", "mel", "diff", "sty", "slm_gen", "slm_d", "d_loss"):
        assert np.isfinite(m[k]), (k, m)


def test_shard_params_uneven_dims_replicate():
    mesh = make_mesh(8, model_parallel=2)
    tree = {"a": np.zeros((3, 2050), np.float32), "b": np.zeros((4, 4), np.float32)}
    placed = shard_params(tree, mesh)
    # 2050 % 2 == 0 → sharded; small → replicated
    assert "model" in str(placed["a"].sharding.spec)
    assert placed["b"].sharding.spec == jax.sharding.PartitionSpec()


def test_process_shard_partitions_disjoint_and_complete(monkeypatch):
    """Per-host data sharding (SURVEY.md §7.1): the process slices cover the
    list exactly once, balanced to ±1, for any process count."""
    import jax as _jax

    from styletts2_tpu.parallel.mesh import process_shard

    for pc in (1, 2, 3, 4, 8):
        monkeypatch.setattr(_jax, "process_count", lambda: pc)
        seen = []
        sizes = []
        for pi in range(pc):
            monkeypatch.setattr(_jax, "process_index", lambda pi=pi: pi)
            sl = process_shard(103)
            seen.extend(range(103)[sl])
            sizes.append(len(range(103)[sl]))
        assert sorted(seen) == list(range(103)), pc
        assert max(sizes) - min(sizes) <= 1, pc


def test_place_batch_single_process_matches_device_put():
    from styletts2_tpu.parallel.mesh import place_batch

    mesh = make_mesh(8, model_parallel=2)
    tree = {"x": np.arange(32, dtype=np.float32).reshape(8, 4)}
    placed = place_batch(tree, mesh)
    assert placed["x"].sharding.spec == jax.sharding.PartitionSpec("data")
    np.testing.assert_array_equal(np.asarray(placed["x"]), tree["x"])
