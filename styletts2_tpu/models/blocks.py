"""Shared style-conditioned 1D residual blocks.

AdainResBlk1d: reference models.py:372-416 / Modules/istftnet.py:410-454 —
AdaIN → LeakyReLU(0.2) → [depthwise ConvTranspose 2x when upsampling] →
Conv(3) → AdaIN → LeakyReLU → Conv(3), with nearest-2x (+1x1) shortcut,
scaled by 1/sqrt(2). NWC layout.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn

from styletts2_tpu.models.layers import (
    AdaIN1d,
    WNConv1d,
    WNConvTranspose1d,
    leaky_relu,
    upsample_nearest_2x,
)


class AdainResBlk1d(nn.Module):
    dim_out: int
    upsample: bool = False
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, s, train: bool = False):
        dim_in = x.shape[-1]
        h = AdaIN1d(dim_in, name="norm1")(x, s)
        h = leaky_relu(h)
        if self.upsample:
            h = WNConvTranspose1d(
                dim_in, kernel_size=3, stride=2, padding=1, output_padding=1,
                groups=dim_in, name="pool",
            )(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = WNConv1d(self.dim_out, 3, padding=1, name="conv1")(h)
        h = AdaIN1d(self.dim_out, name="norm2")(h, s)
        h = leaky_relu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = WNConv1d(self.dim_out, 3, padding=1, name="conv2")(h)

        sc = x
        if self.upsample:
            sc = upsample_nearest_2x(sc)
        if dim_in != self.dim_out:
            sc = WNConv1d(self.dim_out, 1, use_bias=False, name="conv1x1")(sc)
        return (h + sc) / math.sqrt(2.0)
