"""EDM (Karras) diffusion: preconditioning, schedules, samplers, training loss.

Reference semantics: Modules/diffusion/sampler.py —
  KDiffusion (165-234): c_skip/c_out/c_in scale weights, c_noise=log(σ)/4,
  LogNormal σ distribution, weighted MSE loss;
  KarrasSchedule (319-337): eq. 5 of arXiv 2206.00364 with trailing 0;
  ADPM2Sampler (481-519): 2-evaluation midpoint step + stochastic churn;
  DiffusionSampler (550-586): schedule + sampler + optional clamp.

TPU-first: the sampling loop is a lax.scan over static num_steps with both
denoiser evaluations inside one traced body; σ values are traced scalars so
one compiled program serves a fixed (num_steps, embedding_scale) pair.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def karras_schedule(
    num_steps: int, sigma_min: float = 1e-4, sigma_max: float = 3.0, rho: float = 9.0
) -> np.ndarray:
    """σ_i for i<num_steps plus trailing 0 (sampler.py:319-337)."""
    ramp = np.arange(num_steps, dtype=np.float64) / (num_steps - 1)
    s = (
        sigma_max ** (1.0 / rho)
        + ramp * (sigma_min ** (1.0 / rho) - sigma_max ** (1.0 / rho))
    ) ** rho
    return np.concatenate([s, [0.0]]).astype(np.float32)


def linear_schedule(num_steps: int) -> np.ndarray:
    return np.linspace(1.0, 0.0, num_steps + 1)[:-1].astype(np.float32)


def edm_scale_weights(sigmas: jnp.ndarray, sigma_data) -> Tuple[jnp.ndarray, ...]:
    """c_skip, c_out, c_in, c_noise for σ (B,) (sampler.py:184-191)."""
    c_noise = jnp.log(sigmas) * 0.25
    s2 = sigmas[:, None, None] ** 2
    d2 = sigma_data ** 2
    c_skip = d2 / (s2 + d2)
    c_out = sigmas[:, None, None] * sigma_data * jax.lax.rsqrt(d2 + s2)
    c_in = jax.lax.rsqrt(s2 + d2)
    return c_skip, c_out, c_in, c_noise


def make_denoise_fn(net_apply: Callable, sigma_data) -> Callable:
    """Wrap a raw denoiser net into the EDM-preconditioned denoise function
    x̂0(x_noisy, σ) (sampler.py:193-208). net_apply(x, c_noise, **kw)."""

    def denoise(x_noisy, sigmas, **kwargs):
        c_skip, c_out, c_in, c_noise = edm_scale_weights(sigmas, sigma_data)
        x_pred = net_apply(c_in * x_noisy, c_noise, **kwargs)
        return c_skip * x_noisy + c_out * x_pred

    return denoise


def kdiffusion_loss(
    net_apply: Callable,
    x0: jnp.ndarray,
    key: jax.Array,
    sigma_data,
    dist_mean: float = -3.0,
    dist_std: float = 1.0,
    **net_kwargs,
) -> jnp.ndarray:
    """EDM training loss (sampler.py:210-234): σ ~ LogNormal, weighted MSE."""
    B = x0.shape[0]
    k_sigma, k_noise = jax.random.split(key)
    sigmas = jnp.exp(dist_mean + dist_std * jax.random.normal(k_sigma, (B,)))
    noise = jax.random.normal(k_noise, x0.shape, dtype=x0.dtype)
    x_noisy = x0 + sigmas[:, None, None] * noise
    denoise = make_denoise_fn(net_apply, sigma_data)
    x_denoised = denoise(x_noisy, sigmas, **net_kwargs)
    losses = jnp.mean((x_denoised - x0) ** 2, axis=tuple(range(1, x0.ndim)))
    weight = (sigmas ** 2 + sigma_data ** 2) * (sigmas * sigma_data) ** -2
    return jnp.mean(losses * weight)


def sample_adpm2(
    denoise_fn: Callable,
    noise: jnp.ndarray,
    key: jax.Array,
    num_steps: int,
    sigma_min: float = 1e-4,
    sigma_max: float = 3.0,
    rho_schedule: float = 9.0,
    rho: float = 1.0,
    clamp: bool = False,
    **net_kwargs,
) -> jnp.ndarray:
    """ADPM2 ancestral sampling as a lax.scan (sampler.py:481-519).

    denoise_fn(x, sigmas_batch, **net_kwargs) -> x̂0.
    """
    sigmas = jnp.asarray(karras_schedule(num_steps, sigma_min, sigma_max, rho_schedule))
    x = sigmas[0] * noise
    B = noise.shape[0]
    keys = jax.random.split(key, num_steps - 1)

    def body(x, inp):
        sigma, sigma_next, k = inp
        sig2 = sigma * sigma
        sn2 = sigma_next * sigma_next
        sigma_up = jnp.sqrt(jnp.maximum(sn2 * (sig2 - sn2) / sig2, 0.0))
        sigma_down = jnp.sqrt(jnp.maximum(sn2 - sigma_up * sigma_up, 0.0))
        sigma_mid = ((sigma ** (1.0 / rho) + sigma_down ** (1.0 / rho)) / 2.0) ** rho
        sb = jnp.full((B,), sigma)
        d = (x - denoise_fn(x, sb, **net_kwargs)) / sigma
        x_mid = x + d * (sigma_mid - sigma)
        mb = jnp.full((B,), sigma_mid)
        d_mid = (x_mid - denoise_fn(x_mid, mb, **net_kwargs)) / sigma_mid
        x = x + d_mid * (sigma_down - sigma)
        x = x + jax.random.normal(k, x.shape, dtype=x.dtype) * sigma_up
        return x, None

    # reference samplers iterate range(num_steps-1) over a schedule of
    # num_steps+1 values, so the trailing 0 sigma is never stepped to
    # (sampler.py:512-519)
    x, _ = jax.lax.scan(body, x, (sigmas[:-2], sigmas[1:-1], keys))
    if clamp:
        x = jnp.clip(x, -1.0, 1.0)
    return x


def sample_aeuler(
    denoise_fn: Callable,
    noise: jnp.ndarray,
    key: jax.Array,
    num_steps: int,
    sigma_min: float = 1e-4,
    sigma_max: float = 3.0,
    rho_schedule: float = 9.0,
    clamp: bool = False,
    **net_kwargs,
) -> jnp.ndarray:
    """Ancestral Euler sampler (sampler.py:451-478), single eval per step."""
    sigmas = jnp.asarray(karras_schedule(num_steps, sigma_min, sigma_max, rho_schedule))
    x = sigmas[0] * noise
    B = noise.shape[0]
    keys = jax.random.split(key, num_steps - 1)

    def body(x, inp):
        sigma, sigma_next, k = inp
        sig2, sn2 = sigma * sigma, sigma_next * sigma_next
        sigma_up = jnp.sqrt(jnp.maximum(sn2 * (sig2 - sn2) / sig2, 0.0))
        sigma_down = jnp.sqrt(jnp.maximum(sn2 - sigma_up * sigma_up, 0.0))
        d = (x - denoise_fn(x, jnp.full((B,), sigma), **net_kwargs)) / sigma
        x = x + d * (sigma_down - sigma)
        x = x + jax.random.normal(k, x.shape, dtype=x.dtype) * sigma_up
        return x, None

    # reference samplers iterate range(num_steps-1) over a schedule of
    # num_steps+1 values, so the trailing 0 sigma is never stepped to
    # (sampler.py:512-519)
    x, _ = jax.lax.scan(body, x, (sigmas[:-2], sigmas[1:-1], keys))
    if clamp:
        x = jnp.clip(x, -1.0, 1.0)
    return x


def sample_karras(
    denoise_fn: Callable,
    noise: jnp.ndarray,
    key: jax.Array,
    num_steps: int,
    sigma_min: float = 1e-4,
    sigma_max: float = 3.0,
    rho_schedule: float = 9.0,
    s_churn: float = 0.0,
    s_noise: float = 1.0,
    clamp: bool = False,
    **net_kwargs,
) -> jnp.ndarray:
    """Karras algorithm-2 sampler with 2nd-order correction (sampler.py:394-448)."""
    sigmas = jnp.asarray(karras_schedule(num_steps, sigma_min, sigma_max, rho_schedule))
    gamma_val = min(s_churn / num_steps, math.sqrt(2.0) - 1.0)
    x = sigmas[0] * noise
    B = noise.shape[0]
    keys = jax.random.split(key, num_steps - 1)

    def body(x, inp):
        sigma, sigma_next, k = inp
        sigma_hat = sigma * (1.0 + gamma_val)
        eps = s_noise * jax.random.normal(k, x.shape, dtype=x.dtype)
        x_hat = x + jnp.sqrt(jnp.maximum(sigma_hat ** 2 - sigma ** 2, 0.0)) * eps
        d = (x_hat - denoise_fn(x_hat, jnp.full((B,), sigma_hat), **net_kwargs)) / sigma_hat
        x_euler = x_hat + (sigma_next - sigma_hat) * d

        def second_order(_):
            d2 = (
                x_euler - denoise_fn(x_euler, jnp.full((B,), sigma_next), **net_kwargs)
            ) / jnp.where(sigma_next == 0.0, 1.0, sigma_next)
            return x_hat + 0.5 * (sigma - sigma_hat) * (d + d2)

        x = jax.lax.cond(sigma_next != 0.0, second_order, lambda _: x_euler, None)
        return x, None

    # reference samplers iterate range(num_steps-1) over a schedule of
    # num_steps+1 values, so the trailing 0 sigma is never stepped to
    # (sampler.py:512-519)
    x, _ = jax.lax.scan(body, x, (sigmas[:-2], sigmas[1:-1], keys))
    if clamp:
        x = jnp.clip(x, -1.0, 1.0)
    return x


SAMPLERS = {
    "adpm2": sample_adpm2,
    "aeuler": sample_aeuler,
    "karras": sample_karras,
}


# ---------------------------------------------------------------------------
# V-diffusion family + inpainting (reference sampler.py:119-163, 364-391,
# 521-544, 589-655 — unused by the shipped configs but part of the API)
# ---------------------------------------------------------------------------


def v_get_alpha_beta(sigmas):
    angle = sigmas * np.pi / 2.0
    return jnp.cos(angle), jnp.sin(angle)


def vdiffusion_loss(net_apply: Callable, x0, key, **net_kwargs):
    """VDiffusion training loss (sampler.py:145-162)."""
    B = x0.shape[0]
    k_s, k_n = jax.random.split(key)
    sigmas = jax.random.uniform(k_s, (B,))
    noise = jax.random.normal(k_n, x0.shape, dtype=x0.dtype)
    alpha, beta = v_get_alpha_beta(sigmas[:, None, None])
    x_noisy = x0 * alpha + noise * beta
    x_target = noise * alpha - x0 * beta
    return jnp.mean((net_apply(x_noisy, sigmas, **net_kwargs) - x_target) ** 2)


def sample_v(denoise_fn: Callable, noise, key, num_steps: int, clamp: bool = False,
             **net_kwargs):
    """VSampler over a linear schedule (sampler.py:364-391)."""
    del key
    sigmas = jnp.asarray(linear_schedule(num_steps))
    x = sigmas[0] * noise
    B = noise.shape[0]

    def body(carry, inp):
        x, alpha, beta = carry
        sigma, sigma_next = inp
        x_denoised = denoise_fn(x, jnp.full((B,), sigma), **net_kwargs)
        x_pred = x * alpha - x_denoised * beta
        x_eps = x * beta + x_denoised * alpha
        alpha_n, beta_n = v_get_alpha_beta(sigma_next)
        x_new = x_pred * alpha_n + x_eps * beta_n
        return (x_new, alpha_n, beta_n), x_pred

    a0, b0 = v_get_alpha_beta(sigmas[0])
    pairs = (sigmas[:-1], jnp.concatenate([sigmas[1:], sigmas[-1:]]))
    (_, _, _), preds = jax.lax.scan(body, (x, a0, b0), pairs)
    out = preds[-1]
    return jnp.clip(out, -1.0, 1.0) if clamp else out


def inpaint_adpm2(
    denoise_fn: Callable,
    source: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    num_steps: int,
    num_resamples: int = 1,
    sigma_min: float = 1e-4,
    sigma_max: float = 3.0,
    rho_schedule: float = 9.0,
    rho: float = 1.0,
    **net_kwargs,
) -> jnp.ndarray:
    """ADPM2 inpainting (sampler.py:521-544): keep masked region from the
    noised source each step; resample between denoise passes."""
    sigmas = jnp.asarray(karras_schedule(num_steps, sigma_min, sigma_max, rho_schedule))
    B = source.shape[0]
    k0, key = jax.random.split(key)
    x = sigmas[0] * jax.random.normal(k0, source.shape, dtype=source.dtype)
    maskf = mask.astype(source.dtype)

    def adpm2_step(x, sigma, sigma_next, k):
        sig2, sn2 = sigma * sigma, sigma_next * sigma_next
        sigma_up = jnp.sqrt(jnp.maximum(sn2 * (sig2 - sn2) / sig2, 0.0))
        sigma_down = jnp.sqrt(jnp.maximum(sn2 - sigma_up ** 2, 0.0))
        sigma_mid = ((sigma ** (1 / rho) + sigma_down ** (1 / rho)) / 2.0) ** rho
        d = (x - denoise_fn(x, jnp.full((B,), sigma), **net_kwargs)) / sigma
        x_mid = x + d * (sigma_mid - sigma)
        d_mid = (x_mid - denoise_fn(x_mid, jnp.full((B,), sigma_mid), **net_kwargs)) / sigma_mid
        x = x + d_mid * (sigma_down - sigma)
        return x + jax.random.normal(k, x.shape, dtype=x.dtype) * sigma_up

    def outer(x, inp):
        sigma, sigma_next, k = inp
        ks = jax.random.split(k, 2 * num_resamples + 1)
        source_noisy = source + sigma * jax.random.normal(ks[0], source.shape, source.dtype)

        def resample(r, x):
            x = source_noisy * maskf + x * (1.0 - maskf)
            x = adpm2_step(x, sigma, sigma_next, ks[1 + r])
            renoise = jnp.sqrt(jnp.maximum(sigma ** 2 - sigma_next ** 2, 0.0))
            x = jnp.where(
                r < num_resamples - 1,
                x + renoise * jax.random.normal(ks[1 + num_resamples + r], x.shape, x.dtype),
                x,
            )
            return x

        x = jax.lax.fori_loop(0, num_resamples, resample, x)
        return x, None

    keys = jax.random.split(key, num_steps - 1)
    x, _ = jax.lax.scan(outer, x, (sigmas[:-2], sigmas[1:-1], keys))
    return source * maskf + x * (1.0 - maskf)


def span_by_span_compose(
    denoise_fn: Callable,
    start: jnp.ndarray,
    key: jax.Array,
    num_spans: int,
    num_steps: int,
    num_resamples: int = 1,
    keep_start: bool = False,
    **kwargs,
) -> jnp.ndarray:
    """SpanBySpanComposer (sampler.py:626-655): autoregressive half-window
    continuation via inpainting."""
    B, C, L = start.shape
    half = L // 2
    maskf = jnp.zeros((B, C, L)).at[:, :, :half].set(1.0)
    spans = [start[:, :, :half], start[:, :, half:]] if keep_start else []
    inpaint = jnp.zeros_like(start).at[:, :, :half].set(start[:, :, half:])
    for i in range(num_spans):
        key, k = jax.random.split(key)
        span = inpaint_adpm2(
            denoise_fn, inpaint, maskf, k, num_steps, num_resamples, **kwargs
        )
        second = span[:, :, half:]
        inpaint = inpaint.at[:, :, :half].set(second)
        spans.append(second)
    return jnp.concatenate(spans, axis=2)
