"""Pallas kernel correctness (interpreter mode on CPU) vs the jnp reference."""

import numpy as np

import jax.numpy as jnp

from styletts2_tpu.ops.pallas_kernels import _adain_snake_ref, fused_adain_snake


import pytest


# T=128 exercises the actual Pallas kernel (TT=128 ≥ 64 with C divisible by
# the 128 channel tile); T=24 trips the TT<64 fallback — both paths must
# agree with the jnp reference. B=3 covers the batch>1 full-batch stat
# blocks (the round-1 block-spec fix).
@pytest.mark.parametrize("B,T,C,kernel_path", [(2, 24, 256, False), (3, 128, 256, True)])
def test_fused_adain_snake_matches_reference(rng, B, T, C, kernel_path):
    from styletts2_tpu.ops import pallas_kernels as pk

    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal((B, C)) * 0.1, jnp.float32)
    beta = jnp.asarray(rng.standard_normal((B, C)) * 0.1, jnp.float32)
    alpha = jnp.asarray(np.abs(rng.standard_normal(C)) + 0.5, jnp.float32)
    want = _adain_snake_ref(x, gamma, beta, jnp.broadcast_to(alpha.reshape(1, 1, C), (1, 1, C)))
    calls = []
    orig = pk.pl.pallas_call

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    pk.pl.pallas_call = spy
    try:
        got = fused_adain_snake(x, gamma, beta, alpha, interpret=True)
    finally:
        pk.pl.pallas_call = orig
    assert bool(calls) == kernel_path, (
        f"expected kernel_path={kernel_path}, pallas_call invoked={bool(calls)}"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_adain_snake_bf16_kernel_path(rng):
    """bf16 activations take the REAL kernel path (16-aligned time tiles,
    f32 per-channel operands — the round-3 VERDICT's bf16 fallback gap) and
    match the jnp reference computed through the same f32-math pipeline."""
    from styletts2_tpu.ops import pallas_kernels as pk

    B, T, C = 2, 160, 256  # T % 16 == 0: bf16 (16,128) sublane tiling
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.bfloat16)
    gamma = jnp.asarray(rng.standard_normal((B, C)) * 0.1, jnp.bfloat16)
    beta = jnp.asarray(rng.standard_normal((B, C)) * 0.1, jnp.bfloat16)
    alpha = jnp.asarray(np.abs(rng.standard_normal(C)) + 0.5, jnp.bfloat16)
    want = _adain_snake_ref(
        x, gamma, beta, jnp.broadcast_to(alpha.reshape(1, 1, C), (1, 1, C))
    )
    calls = []
    orig = pk.pl.pallas_call

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    pk.pl.pallas_call = spy
    try:
        got = fused_adain_snake(x, gamma, beta, alpha, interpret=True)
    finally:
        pk.pl.pallas_call = orig
    assert calls, "bf16 input must dispatch the kernel, not fall back"
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_adain_snake_custom_vjp_matches_autodiff(rng):
    import jax

    from styletts2_tpu.ops.pallas_kernels import _adain_snake_pallas

    B, T, C = 2, 12, 128
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal((B, C)) * 0.1, jnp.float32)
    beta = jnp.asarray(rng.standard_normal((B, C)) * 0.1, jnp.float32)
    alpha = jnp.asarray(np.abs(rng.standard_normal(C)) + 0.5, jnp.float32)

    # test the _bwd function directly against autodiff of the reference
    from styletts2_tpu.ops.pallas_kernels import _adain_snake_ref as refc, _bwd

    def fwd_only(x, g, b, a):
        return refc(x, g, b, jnp.broadcast_to(a.reshape(1, 1, C), (1, 1, C)))

    y, pullback = jax.vjp(fwd_only, x, gamma, beta, alpha)
    dy = jnp.asarray(rng.standard_normal(y.shape), jnp.float32)
    want = pullback(dy)
    got = _bwd((x, gamma, beta, alpha), dy)
    for w, g_ in zip(want, got):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(w), atol=2e-4, rtol=1e-3)
