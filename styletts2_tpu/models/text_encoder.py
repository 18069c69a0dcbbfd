"""Phoneme text encoder.

Reference semantics: models.py:284-345 — Embedding + depth×(Conv1d(k=5) +
channel-LayerNorm + LeakyReLU(0.2) + Dropout(0.2)) + single-layer BiLSTM,
masked at padded positions throughout. NWC layout, mask-aware scan LSTM.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from styletts2_tpu.models.layers import (
    BiLSTM,
    ChannelLayerNorm,
    WNConv1d,
    leaky_relu,
)


class TextEncoder(nn.Module):
    channels: int = 512
    kernel_size: int = 5
    depth: int = 3
    n_symbols: int = 178
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, tokens, lengths, train: bool = False):
        """tokens: (B, T) int32, lengths: (B,) -> (B, T, channels)."""
        T = tokens.shape[1]
        valid = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]  # (B,T,1)
        x = nn.Embed(self.n_symbols, self.channels, name="embedding")(tokens)
        x = jnp.where(valid, x, 0.0)
        pad = (self.kernel_size - 1) // 2
        for i in range(self.depth):
            x = WNConv1d(self.channels, self.kernel_size, padding=pad, name=f"cnn_{i}")(x)
            x = ChannelLayerNorm(name=f"norm_{i}")(x)
            x = leaky_relu(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
            x = jnp.where(valid, x, 0.0)
        x = BiLSTM(self.channels // 2, name="lstm")(x, lengths)
        return jnp.where(valid, x, 0.0)
