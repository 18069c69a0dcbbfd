"""Pallas TPU kernels for the hot elementwise/reduction paths.

The iSTFTNet/HiFi-GAN decoder applies AdaIN (instance norm over time +
style-conditioned affine) followed by the snake activation 6× per residual
block, 21 blocks deep (Modules/istftnet.py:66-75) — memory-bound chains
between MXU convs. `fused_adain_snake` performs
    y = snake((1+γ)·IN_T(x) + β, α)
in a single VMEM pass per (batch, channel-tile): one HBM read + one write
instead of several, with the time-axis mean/variance computed in-kernel.

Falls back to the pure-jnp composition off-TPU (tests run the kernel in
interpreter mode for correctness).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from styletts2_tpu.models.layers import instance_norm, snake


def _adain_snake_ref(x, gamma, beta, alpha, eps=1e-5):
    """Reference composition (AdaIN1d + snake, models/layers.py); math in
    f32 (matching the kernel) even for bf16 activations."""
    dt = x.dtype
    y = instance_norm(x.astype(jnp.float32), axis=1, eps=eps)
    y = (1.0 + gamma.astype(jnp.float32)[:, None, :]) * y + beta.astype(
        jnp.float32
    )[:, None, :]
    return snake(y, alpha.astype(jnp.float32)).astype(dt)


def _kernel(x_ref, mean_ref, rstd_ref, gamma_ref, beta_ref, alpha_ref, out_ref):
    # block: (1, Tt, Ct) — time-tiled so arbitrarily long sequences fit VMEM.
    # The per-(b, c) stats arrive as full-batch (B, Ct) blocks (TPU requires
    # sublane dims divisible by 8 or whole); select this program's row.
    bi = pl.program_id(0)
    x = x_ref[0].astype(jnp.float32)  # (Tt, Ct); math in f32 even for bf16 io
    # per-channel operands are all pre-cast f32 host-side: only x/out carry
    # the serving dtype, so the bf16 path has a single (16,128)-tileable
    # bf16 operand and the stats blocks keep f32 (8,128) tiling
    mean = mean_ref[bi][None, :]
    rstd = rstd_ref[bi][None, :]
    g = gamma_ref[bi][None, :]
    b = beta_ref[bi][None, :]
    a = alpha_ref[0][None, :]
    y = (1.0 + g) * ((x - mean) * rstd) + b
    s = jnp.sin(a * y)
    out_ref[0] = (y + (s * s) / a).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_adain_snake(x, gamma, beta, alpha, interpret: bool = False):
    """x: (B, T, C); gamma/beta: (B, C) style affine; alpha: (C,) snake.

    Equivalent to `snake(AdaIN(x, s), alpha)` with the AdaIN fc already
    applied. The time-axis mean/rstd are one cheap XLA reduction; the fused
    normalize→affine→snake chain then runs in a single tiled VMEM pass."""
    B, T, C = x.shape
    CT = min(C, 128)
    # time tile: the Mosaic lowering needs the sublane (2nd-minor) block dim
    # divisible by the dtype's native sublane count — 8 for f32, 16 for bf16
    # ((16,128) packed tiles) — OR equal to the full axis. Prefer the largest
    # aligned divisor of T ≤ 2048; whole-T blocks are fine when T itself
    # fits; odd/prime long lengths fall back to the jnp chain.
    gr = 16 if x.dtype == jnp.bfloat16 else 8
    TT = 0
    for d in range(min(T - T % gr, 2048), 0, -gr):
        if T % d == 0:
            TT = d
            break
    if TT == 0 and T <= 2048:
        TT = T  # single whole-axis block
    if C % CT != 0 or TT < 64:
        return _adain_snake_ref(x, gamma, beta, jnp.broadcast_to(alpha, (1, 1, C)))
    xs = x.astype(jnp.float32)  # f32 statistics for bf16 activations
    mean = jnp.mean(xs, axis=1)  # (B, C)
    var = jnp.mean(jnp.square(xs), axis=1) - mean * mean
    rstd = jax.lax.rsqrt(var + 1e-5)
    gamma = gamma.astype(jnp.float32)
    beta = beta.astype(jnp.float32)
    alpha = alpha.astype(jnp.float32)
    grid = (B, T // TT, C // CT)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TT, CT), lambda b, t, c: (b, t, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, CT), lambda b, t, c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, CT), lambda b, t, c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, CT), lambda b, t, c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, CT), lambda b, t, c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CT), lambda b, t, c: (0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TT, CT), lambda b, t, c: (b, t, c), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        interpret=interpret,
    )(x, mean, rstd, gamma, beta, jnp.broadcast_to(alpha.reshape(1, -1), (1, C)))


@jax.custom_vjp
def _adain_snake_pallas(x, gamma, beta, alpha):
    return fused_adain_snake(x, gamma, beta, alpha)


def _fwd(x, gamma, beta, alpha):
    return fused_adain_snake(x, gamma, beta, alpha), (x, gamma, beta, alpha)


def _bwd(res, dy):
    """Analytic VJP of snake((1+γ)·IN_T(x)+β, α); recomputes the cheap
    normalization statistics instead of saving activations.

    All math runs in f32 regardless of the primal dtype: under bf16
    mixed-precision training the time-axis mean/var reductions span
    thousands of frames and must not accumulate in an 8-bit mantissa
    (the forward keeps f32 statistics too). Cotangents are cast back to
    the primal dtypes on return."""
    x, gamma, beta, alpha = res
    dts = (x.dtype, gamma.dtype, beta.dtype, alpha.dtype)
    x = x.astype(jnp.float32)
    gamma = gamma.astype(jnp.float32)
    beta = beta.astype(jnp.float32)
    alpha = alpha.astype(jnp.float32)
    dy = dy.astype(jnp.float32)
    eps = 1e-5
    mean = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    g1 = 1.0 + gamma[:, None, :]
    z = g1 * xhat + beta[:, None, :]
    a = alpha.reshape(1, 1, -1)
    s2az = jnp.sin(2.0 * a * z)
    dz = dy * (1.0 + s2az)
    saz = jnp.sin(a * z)
    dalpha = jnp.sum(
        dy * (z * s2az / a - (saz * saz) / (a * a)), axis=(0, 1)
    )
    dgamma = jnp.sum(dz * xhat, axis=1)
    dbeta = jnp.sum(dz, axis=1)
    dz_g = dz * g1
    dx = inv * (
        dz_g
        - jnp.mean(dz_g, axis=1, keepdims=True)
        - xhat * jnp.mean(dz_g * xhat, axis=1, keepdims=True)
    )
    return (
        dx.astype(dts[0]),
        dgamma.astype(dts[1]),
        dbeta.astype(dts[2]),
        dalpha.astype(dts[3]),
    )


_adain_snake_pallas.defvjp(_fwd, _bwd)


def adain_snake(x, gamma, beta, alpha, use_pallas: bool | None = None):
    """Dispatch: Pallas (custom-VJP) on TPU, jnp composition elsewhere.
    STYLETTS2_NO_PALLAS=1 forces the jnp path (A/B + debugging)."""
    import os

    if use_pallas is None and os.environ.get("STYLETTS2_NO_PALLAS"):
        use_pallas = False
    if use_pallas is None:
        dd = jax.config.jax_default_device
        forced_cpu = dd is not None and getattr(dd, "platform", None) == "cpu"
        use_pallas = jax.default_backend() == "tpu" and not forced_cpu
        # f32 and bf16 both dispatch to the kernel (bf16 uses 16-aligned
        # time tiles and f32 per-channel operands); other dtypes fall back
        if x.dtype not in (jnp.float32, jnp.bfloat16):
            use_pallas = False
    if use_pallas:
        return _adain_snake_pallas(x, gamma, beta, alpha)
    return _adain_snake_ref(x, gamma, beta, jnp.broadcast_to(alpha.reshape(1, 1, -1), (1, 1, x.shape[-1])))
