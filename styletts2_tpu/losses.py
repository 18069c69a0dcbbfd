"""Training losses: multi-res mel STFT, LSGAN + feature matching + TPRLS,
WavLM SLM losses.

Reference semantics: losses.py —
  STFTLoss/MultiResolutionSTFTLoss (24-94): per-resolution *mel* spectral
  convergence ‖y−x‖₁/‖y‖₁ on log-normed mels, resolutions
  (1024/120/600, 2048/240/1200, 512/50/240), averaged. NOTE these mels use
  an explicit sample_rate=24000 filterbank (losses.py:33), unlike the data
  frontend which uses torchaudio's 16 kHz default — both quirks replicated.
  feature_loss ×2 (97-103); LSGAN discriminator/generator losses (106-128);
  TPRLS median-relativistic truncated loss τ=0.04 (131-147);
  GeneratorLoss/DiscriminatorLoss aggregation over mpd+msd (149-190);
  WavLMLoss (193-252): 13-layer feature matching + LSGAN through the wd head.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from styletts2_tpu.ops.stft import MEL_MEAN, MEL_STD, melspectrogram

MRSTFT_RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def _f32(t):
    """Upcast to f32 at loss entry: under bf16 mixed precision (train/mp.py)
    network outputs arrive bf16 and every loss reduction must accumulate in
    f32. A no-op for f32 inputs (lax.convert_element_type short-circuits), so
    the full-precision path's HLO is unchanged."""
    return jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.bfloat16
        else x,
        t,
    )


def _log_norm_mel(wav, n_fft, hop, win):
    mel = melspectrogram(
        wav, n_fft=n_fft, win_length=win, hop_length=hop, n_mels=80,
        fb_sample_rate=24000,
    )
    return (jnp.log(1e-5 + mel) - MEL_MEAN) / MEL_STD


def multires_stft_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Mean over resolutions of mel spectral convergence (losses.py:58-94).
    x: predicted wav (B, T); y: target wav (B, T)."""
    x, y = _f32(x), _f32(y)
    total = 0.0
    for n_fft, hop, win in MRSTFT_RESOLUTIONS:
        xm = _log_norm_mel(x, n_fft, hop, win)
        ym = _log_norm_mel(y, n_fft, hop, win)
        total = total + jnp.sum(jnp.abs(ym - xm)) / jnp.sum(jnp.abs(ym))
    return total / len(MRSTFT_RESOLUTIONS)


def feature_loss(fmap_r, fmap_g) -> jnp.ndarray:
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


def lsgan_d_loss(real_outputs, gen_outputs) -> jnp.ndarray:
    loss = 0.0
    for dr, dg in zip(real_outputs, gen_outputs):
        loss = loss + jnp.mean((1.0 - dr) ** 2) + jnp.mean(dg ** 2)
    return loss


def lsgan_g_loss(gen_outputs) -> jnp.ndarray:
    loss = 0.0
    for dg in gen_outputs:
        loss = loss + jnp.mean((1.0 - dg) ** 2)
    return loss


def _lower_median(x: jnp.ndarray) -> jnp.ndarray:
    """torch.median semantics: the LOWER of the two middle elements for
    even-sized inputs (jnp.median averages them — a real numerical
    difference since the TPRLS mask compares against the median)."""
    flat = jnp.sort(x.ravel())
    return flat[(flat.shape[0] - 1) // 2]


def tprls_loss(first_outputs, second_outputs, tau: float = 0.04) -> jnp.ndarray:
    """Truncated pointwise relativistic LS loss (losses.py:131-147).

    diff = first − second; m = median(diff); L_rel = mean over the
    diff < m tail of (diff − m)². NOT sign-symmetric: the discriminator
    calls this with (real, gen) (reference discriminator_TPRLS_loss binds
    dr=real, dg=gen → diff = real−gen), while the GENERATOR binds the zip
    the other way round (generator_TPRLS_loss: `for dg, dr in zip(real,
    gen)` → diff = gen−real), so generator_adv_loss below passes
    (gen, real)."""
    loss = 0.0
    for da, db in zip(first_outputs, second_outputs):
        diff = da - db
        m = _lower_median(diff)
        mask = (diff < m).astype(diff.dtype)
        cnt = jnp.maximum(jnp.sum(mask), 1.0)
        l_rel = jnp.sum(((diff - m) ** 2) * mask) / cnt
        loss = loss + tau - jax.nn.relu(tau - l_rel)
    return loss


def generator_adv_loss(mpd_out, msd_out) -> jnp.ndarray:
    """GeneratorLoss aggregation (losses.py:149-168). Each *_out is the
    (real, gen, fmap_r, fmap_g) tuple from a discriminator module."""
    y_df_r, y_df_g, fmap_f_r, fmap_f_g = _f32(mpd_out)
    y_ds_r, y_ds_g, fmap_s_r, fmap_s_g = _f32(msd_out)
    loss = (
        lsgan_g_loss(y_df_g)
        + lsgan_g_loss(y_ds_g)
        + feature_loss(fmap_f_r, fmap_f_g)
        + feature_loss(fmap_s_r, fmap_s_g)
        + tprls_loss(y_df_g, y_df_r)
        + tprls_loss(y_ds_g, y_ds_r)
    )
    return loss


def discriminator_adv_loss(mpd_out, msd_out) -> jnp.ndarray:
    """DiscriminatorLoss aggregation (losses.py:170-190)."""
    y_df_r, y_df_g, _, _ = _f32(mpd_out)
    y_ds_r, y_ds_g, _, _ = _f32(msd_out)
    loss = (
        lsgan_d_loss(y_df_r, y_df_g)
        + lsgan_d_loss(y_ds_r, y_ds_g)
        + tprls_loss(y_df_r, y_df_g)
        + tprls_loss(y_ds_r, y_ds_g)
    )
    return loss


# ---------------------------------------------------------------------------
# WavLM (SLM) losses — parametrized by callables so the frozen WavLM apply
# and the trainable wd head stay outside this module (losses.py:193-252)
# ---------------------------------------------------------------------------


def wavlm_feature_loss(wav_states: Sequence, rec_states: Sequence) -> jnp.ndarray:
    """L1 feature matching over all hidden states (losses.py:201-212)."""
    loss = 0.0
    for er, eg in zip(_f32(list(wav_states)), _f32(list(rec_states))):
        loss = loss + jnp.mean(jnp.abs(jax.lax.stop_gradient(er) - eg))
    return loss


def stack_wavlm_states(states: Sequence) -> jnp.ndarray:
    """Stack 13 hidden states (B, T, 768) → (B, T, 13*768) for the wd head
    (losses.py:217: stack → transpose → flatten channels)."""
    return jnp.concatenate(list(states), axis=-1)


def wavlm_generator_loss(wd_apply: Callable, rec_states: Sequence) -> jnp.ndarray:
    d_g = _f32(wd_apply(stack_wavlm_states(rec_states)))
    return jnp.mean((1.0 - d_g) ** 2)


def wavlm_discriminator_loss(
    wd_apply: Callable, wav_states: Sequence, rec_states: Sequence
) -> jnp.ndarray:
    d_r = _f32(wd_apply(jax.lax.stop_gradient(stack_wavlm_states(wav_states))))
    d_g = _f32(wd_apply(jax.lax.stop_gradient(stack_wavlm_states(rec_states))))
    return jnp.mean((1.0 - d_r) ** 2) + jnp.mean(d_g ** 2)


# ---------------------------------------------------------------------------
# Stage-2 scalar losses
# ---------------------------------------------------------------------------


def duration_ce_loss(dur_logits, durations, lengths) -> jnp.ndarray:
    """Binary CE on the duration step targets (train_second.py:422-437):
    target[t, :d_t] = 1 over the max_dur bins; per-sample mean over the
    valid (len × max_dur) region, then sum over batch (the trainer divides
    by batch size)."""
    B, T, D = dur_logits.shape
    steps = jnp.arange(D)[None, None, :]
    target = (steps < durations[..., None]).astype(dur_logits.dtype)
    ce = jnp.maximum(dur_logits, 0) - dur_logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(dur_logits))
    )
    valid = (jnp.arange(T)[None, :] < lengths[:, None]).astype(dur_logits.dtype)
    per_sample = jnp.sum(ce.mean(-1) * valid, axis=1) / jnp.maximum(lengths, 1)
    return jnp.mean(per_sample)


def duration_l1_loss(dur_pred_sum, durations, lengths) -> jnp.ndarray:
    """L1 on sigmoid-summed durations over *interior* tokens 1..len-2
    (train_second.py:433: _dur_pred[1:_text_length-1]); per-sample mean,
    then batch mean."""
    T = dur_pred_sum.shape[1]
    idx = jnp.arange(T)[None, :]
    interior = ((idx >= 1) & (idx < lengths[:, None] - 1)).astype(dur_pred_sum.dtype)
    per_sample = jnp.sum(jnp.abs(dur_pred_sum - durations) * interior, axis=1) / jnp.maximum(
        jnp.sum(interior, axis=1), 1.0
    )
    return jnp.mean(per_sample)


def smooth_l1(x, y, beta: float = 1.0) -> jnp.ndarray:
    d = jnp.abs(_f32(x) - _f32(y))
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))
