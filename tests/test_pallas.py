"""Pallas kernel correctness (interpreter mode on CPU) vs the jnp reference."""

import numpy as np

import jax.numpy as jnp

from styletts2_tpu.ops.pallas_kernels import _adain_snake_ref, fused_adain_snake


def test_fused_adain_snake_matches_reference(rng):
    B, T, C = 2, 24, 256
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal((B, C)) * 0.1, jnp.float32)
    beta = jnp.asarray(rng.standard_normal((B, C)) * 0.1, jnp.float32)
    alpha = jnp.asarray(np.abs(rng.standard_normal(C)) + 0.5, jnp.float32)
    want = _adain_snake_ref(x, gamma, beta, jnp.broadcast_to(alpha.reshape(1, 1, C), (1, 1, C)))
    got = fused_adain_snake(x, gamma, beta, alpha, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


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
