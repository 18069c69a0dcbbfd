"""JDCNet pitch extractor (joint detection & classification of F0).

Reference semantics: Utils/JDC/model.py — conv stem (2×3×3 conv + BN +
LeakyReLU 0.01), three ResBlocks that halve the mel axis via (1,2) maxpool,
pool block with (1,4) maxpool, BiLSTM classifier over (B, T, 512) and
Linear→num_class(1); forward returns (|F0| per frame, GAN_feature,
poolblock_out). Pretrained on mel input (B, 1, n_mels, T); frozen at load,
optionally trained after TMA (models.py:584-592, train_first.py:304-306).

NHWC layout: mel (B, n_mels, T) is carried as (B, T, n_mels, C) images so
the time axis stays the batch-friendly leading spatial dim. BatchNorm runs
in inference mode against converted running stats by default (`use_stats`),
matching the frozen-model usage; train mode uses batch statistics.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from styletts2_tpu.models.layers import BiLSTM


class BatchNorm(nn.Module):
    """torch BatchNorm2d parity: stats in 'batch_stats', affine params."""

    features: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        gamma = self.param("scale", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features)
        )
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(self.features))
        if train:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            if not self.is_initializing():
                n = x.size / self.features
                unbiased = var * n / max(n - 1, 1)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * gamma + beta


def _conv2d_nobias(x, features, kernel, name_scope, module, padding=1):
    return nn.Conv(
        features, kernel, padding=padding, use_bias=False, name=name_scope
    )(x)


class JDCResBlock(nn.Module):
    out_channels: int
    slope: float = 0.01

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        h = BatchNorm(in_ch, name="pre_bn")(x, train)
        h = jnp.where(h >= 0, h, self.slope * h)
        # maxpool (1, 2): halve the mel (freq) axis — x is (B, T, M, C)
        B, T, M, C = h.shape
        h = h.reshape(B, T, M // 2, 2, C).max(axis=3)
        x0 = h
        h = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False, name="conv1")(h)
        h = BatchNorm(self.out_channels, name="bn1")(h, train)
        h = jnp.where(h >= 0, h, self.slope * h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False, name="conv2")(h)
        if in_ch != self.out_channels:
            sc = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="conv1x1")(x0)
        else:
            sc = x0
        return h + sc


class JDCNet(nn.Module):
    num_class: int = 1
    slope: float = 0.01

    @nn.compact
    def __call__(self, mel, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """mel: (B, n_mels, T) normalized log mel ->
        (F0 (B, T) in Hz (abs), GAN_feature, poolblock_out)."""
        x = jnp.transpose(mel, (0, 2, 1))[..., None]  # (B, T, M, 1)
        B, T, M, _ = x.shape

        h = nn.Conv(64, (3, 3), padding=1, use_bias=False, name="conv0")(x)
        h = BatchNorm(64, name="bn0")(h, train)
        h = jnp.where(h >= 0, h, self.slope * h)
        h = nn.Conv(64, (3, 3), padding=1, use_bias=False, name="conv1")(h)

        h = JDCResBlock(128, name="res1")(h, train)
        h = JDCResBlock(192, name="res2")(h, train)
        h = JDCResBlock(256, name="res3")(h, train)

        h = BatchNorm(256, name="pool_bn")(h, train)
        h = jnp.where(h >= 0, h, self.slope * h)
        gan_feature = h
        # maxpool (1, 4) on mel axis: (B, T, 10, 256) -> (B, T, 2, 256)
        # (torch MaxPool2d floors: trailing elements beyond (M//4)*4 dropped)
        Bp, Tp, Mp, Cp = h.shape
        pool = h[:, :, : (Mp // 4) * 4, :].reshape(Bp, Tp, Mp // 4, 4, Cp).max(axis=3)
        # (B, T, 2, 256) -> (B, T, 512); torch permutes channel-major:
        # (b, 256, T, 2) → (b, T, 256, 2) → view (b, T, 512)
        pool_t = jnp.swapaxes(pool, 2, 3).reshape(Bp, Tp, 2 * Cp)

        lstm_out = BiLSTM(256, name="bilstm_classifier")(
            pool_t, jnp.full((B,), T, jnp.int32)
        )
        logits = nn.Dense(self.num_class, name="classifier")(lstm_out)
        f0 = jnp.abs(logits[..., 0] if self.num_class == 1 else logits)
        return f0, gan_feature, pool_t
