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
    def __call__(self, mel, update_stats: bool = False):
        x = mel[..., None]  # (B, n_mels, T, 1) as NHWC image
        x = SNConv2d(self.dim_in, (3, 3), padding=(1, 1), name="stem")(x, update_stats)
        d = self.dim_in
        for i in range(self.repeat_num):
            d_out = min(d * 2, self.max_conv_dim)
            x = ResBlk2d(d_out, name=f"block_{i}")(x, update_stats)
            d = d_out
        x = leaky_relu(x)
        x = SNConv2d(d, (5, 5), padding=(0, 0), name="conv5x5")(x, update_stats)
        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1)
        x = leaky_relu(x)
        return nn.Dense(self.style_dim, name="unshared")(x)
