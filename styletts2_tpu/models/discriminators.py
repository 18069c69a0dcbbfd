"""GAN discriminators: multi-period, multi-resolution spectrogram, WavLM head.

Reference semantics: Modules/discriminators.py —
  DiscriminatorP (96-129): period-folded waveform → stacked (5,1)-kernel
  stride-(3,1) Conv2d, weight norm, LeakyReLU(0.1), feature maps returned;
  periods (2,3,5,7,11) (132-156);
  SpecDiscriminator (29-63): |STFT| image → (3,9) conv stack with width
  stride 2; resolutions (1024/120/600, 2048/240/1200, 512/50/240) (65-93);
  WavLMDiscriminator (158-187): Conv1d head over stacked WavLM states.
NHWC/NWC layouts.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from styletts2_tpu.models.layers import uniform_centered, WNConv1d, leaky_relu
from styletts2_tpu.ops.stft import stft


class WNConv2d(nn.Module):
    """Weight-normalized 2D conv (NHWC), torch weight_norm semantics."""

    features: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        import math

        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        fan_in = kh * kw * in_ch
        bound = 1.0 / math.sqrt(fan_in)
        v = self.param("v", uniform_centered(bound), (kh, kw, in_ch, self.features))
        g = self.param("g", nn.initializers.constant(bound * math.sqrt(fan_in)), (self.features,))
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2), keepdims=True) + 1e-12)
        w = v / norm * g[None, None, None, :]
        b = self.param("bias", uniform_centered(bound), (self.features,))
        y = jax.lax.conv_general_dilated(
            # weight dtype = compute dtype (bf16 mixed precision: the MRSD
            # spectrogram arrives f32 from the complex STFT magnitude)
            x.astype(w.dtype), w, self.stride,
            [(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b


class DiscriminatorP(nn.Module):
    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, wav):
        """wav: (B, T) -> (logits (B, n), fmap list)."""
        B, T = wav.shape
        p = self.period
        if T % p != 0:
            n_pad = p - (T % p)
            wav = jnp.concatenate([wav, wav[:, -n_pad - 1 : -1][:, ::-1]], axis=1)
            T = T + n_pad
        x = wav.reshape(B, T // p, p, 1)  # NHWC: (B, T/p, p, 1)
        fmap = []
        pad = (self.kernel_size - 1) // 2
        for i, ch in enumerate([32, 128, 512, 1024]):
            x = WNConv2d(ch, (self.kernel_size, 1), (self.stride, 1), (pad, 0), name=f"conv_{i}")(x)
            x = leaky_relu(x, 0.1)
            fmap.append(x)
        x = WNConv2d(1024, (self.kernel_size, 1), (1, 1), (2, 0), name="conv_4")(x)
        x = leaky_relu(x, 0.1)
        fmap.append(x)
        x = WNConv2d(1, (3, 1), (1, 1), (1, 0), name="conv_post")(x)
        fmap.append(x)
        return x.reshape(B, -1), fmap


class SpecDiscriminator(nn.Module):
    fft_size: int = 1024
    shift_size: int = 120
    win_length: int = 600

    @nn.compact
    def __call__(self, wav):
        """wav: (B, T) -> (logits, fmap)."""
        mag = jnp.abs(stft(wav, self.fft_size, self.shift_size, self.win_length))
        x = jnp.swapaxes(mag, -1, -2)[..., None]  # (B, frames, freq, 1)
        fmap = []
        specs = [
            ((3, 9), (1, 1), (1, 4)),
            ((3, 9), (1, 2), (1, 4)),
            ((3, 9), (1, 2), (1, 4)),
            ((3, 9), (1, 2), (1, 4)),
            ((3, 3), (1, 1), (1, 1)),
        ]
        for i, (k, s, p) in enumerate(specs):
            x = WNConv2d(32 if i > 0 else 32, k, s, p, name=f"conv_{i}")(x)
            x = leaky_relu(x, 0.1)
            fmap.append(x)
        x = WNConv2d(1, (3, 3), (1, 1), (1, 1), name="out")(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y, y_hat):
        rs, gs, fr, fg = [], [], [], []
        for p in self.periods:
            d = DiscriminatorP(p, name=f"p{p}")
            out_r, fmap_r = d(y)
            out_g, fmap_g = d(y_hat)
            rs.append(out_r)
            gs.append(out_g)
            fr.append(fmap_r)
            fg.append(fmap_g)
        return rs, gs, fr, fg


class MultiResSpecDiscriminator(nn.Module):
    fft_sizes: Sequence[int] = (1024, 2048, 512)
    hop_sizes: Sequence[int] = (120, 240, 50)
    win_lengths: Sequence[int] = (600, 1200, 240)

    @nn.compact
    def __call__(self, y, y_hat):
        rs, gs, fr, fg = [], [], [], []
        for i, (f, h, w) in enumerate(
            zip(self.fft_sizes, self.hop_sizes, self.win_lengths)
        ):
            d = SpecDiscriminator(f, h, w, name=f"r{i}")
            out_r, fmap_r = d(y)
            out_g, fmap_g = d(y_hat)
            rs.append(out_r)
            gs.append(out_g)
            fr.append(fmap_r)
            fg.append(fmap_g)
        return rs, gs, fr, fg


class WavLMDiscriminator(nn.Module):
    """SLM discriminator head over stacked WavLM hidden states
    (discriminators.py:158-187). Input (B, T, slm_hidden*slm_layers)."""

    slm_hidden: int = 768
    slm_layers: int = 13
    initial_channel: int = 64

    @nn.compact
    def __call__(self, x):
        c = self.initial_channel
        x = WNConv1d(c, 1, name="pre")(x)
        for i, ch in enumerate([c * 2, c * 4, c * 4]):
            x = WNConv1d(ch, 5, padding=2, name=f"conv_{i}")(x)
            x = leaky_relu(x, 0.1)
        x = WNConv1d(1, 3, padding=1, name="conv_post")(x)
        return x.reshape(x.shape[0], -1)
