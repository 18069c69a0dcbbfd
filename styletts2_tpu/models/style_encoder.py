"""Mel-reference style encoder (and the 2D discriminator backbone it shares).

Reference semantics: models.py:96-164 — spectral-norm Conv2d stem, four
spectral-norm ResBlks with 'half' downsampling (learned depthwise strided
conv on the residual path, avg-pool on the shortcut), LeakyReLU(0.2),
5x5 valid conv, global average pool, Linear to style_dim. NHWC layout:
input mel (B, n_mels, T) is treated as a 1-channel image (B, n_mels, T, 1).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn

from styletts2_tpu.models.layers import SNConv2d, avg_pool_2d_2x, leaky_relu


class ResBlk2d(nn.Module):
    """models.py:96-137 with downsample='half'."""

    dim_out: int
    downsample: str = "half"

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        dim_in = x.shape[-1]
        # residual branch
        h = leaky_relu(x)
        h = SNConv2d(dim_in, (3, 3), padding=(1, 1), name="conv1")(h, update_stats)
        if self.downsample == "half":
            # learned depthwise stride-2 downsample (models.py:36-37)
            h = SNConv2d(
                dim_in, (3, 3), stride=(2, 2), padding=(1, 1), groups=dim_in,
                name="downsample_res",
            )(h, update_stats)
        h = leaky_relu(h)
        h = SNConv2d(self.dim_out, (3, 3), padding=(1, 1), name="conv2")(h, update_stats)
        # shortcut
        s = x
        if dim_in != self.dim_out:
            s = SNConv2d(self.dim_out, (1, 1), use_bias=False, name="conv1x1")(s, update_stats)
        if self.downsample == "half":
            s = avg_pool_2d_2x(s)
        return (s + h) / math.sqrt(2.0)


class StyleEncoder(nn.Module):
    """mel (B, n_mels, T) -> style vector (B, style_dim)."""

    dim_in: int = 64
    style_dim: int = 128
    max_conv_dim: int = 512
    repeat_num: int = 4

    @nn.compact
    def __call__(self, mel, lengths=None, update_stats: bool = False):
        """mel: (B, n_mels, T); optional lengths (B,) of valid frames.

        With lengths, the global average pool is masked to the valid region —
        the batched TPU replacement of the reference's per-item
        full-utterance style loop (train_second.py:295-307, which runs the
        encoder once per sample because of AdaptiveAvgPool2d)."""
        min_frames = 5 * 2 ** self.repeat_num  # stride-2 stages + 5-wide conv
        if mel.shape[-1] < min_frames:
            # the reference enforces this by skipping short clips
            # (train_first.py:246-247)
            raise ValueError(
                f"StyleEncoder(repeat_num={self.repeat_num}) needs "
                f">={min_frames} mel frames, got {mel.shape[-1]}"
            )
        if lengths is not None:
            T = mel.shape[-1]
            mel = jnp.where(jnp.arange(T)[None, None, :] < lengths[:, None, None], mel, 0.0)
        x = mel[..., None]  # (B, n_mels, T, 1) as NHWC image
        x = SNConv2d(self.dim_in, (3, 3), padding=(1, 1), name="stem")(x, update_stats)
        d = self.dim_in
        for i in range(self.repeat_num):
            d_out = min(d * 2, self.max_conv_dim)
            x = ResBlk2d(d_out, name=f"block_{i}")(x, update_stats)
            d = d_out
        x = leaky_relu(x)
        x = SNConv2d(d, (5, 5), padding=(0, 0), name="conv5x5")(x, update_stats)
        if lengths is None:
            x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1)
        else:
            # valid width after 4 stride-2 stages and the 5-wide valid conv
            lv = lengths
            for _ in range(self.repeat_num):
                lv = (lv + 1) // 2
            lv = jnp.maximum(lv - 4, 1)
            W = x.shape[2]
            wmask = (jnp.arange(W)[None, :] < lv[:, None]).astype(x.dtype)
            x = jnp.sum(x * wmask[:, None, :, None], axis=(1, 2)) / (
                x.shape[1] * lv[:, None]
            )
        x = leaky_relu(x)
        return nn.Dense(self.style_dim, name="unshared")(x)
