"""iSTFTNet waveform decoder with harmonic-plus-noise NSF source.

Reference semantics: Modules/istftnet.py —
  SineGen/SourceModuleHnNSF (111-297): harmonic sine source with phase
  accumulated at the *frame* rate (downsample rad, cumsum, upsample ×300),
  U/V-gated noise; AdaINResBlock1 (27-75): snake activation with per-channel
  alpha; Generator (302-398): ConvTranspose upsampling [10, 6] with STFT'd
  source injection per scale, final conv → (exp magnitude, sin phase) → iSTFT
  (n_fft 20, hop 5); Decoder (467-528): AdaIN-conditioned encode/decode blocks
  with asr/F0/N re-concat and train-time random F0/N box smoothing.

TPU-first notes: NWC layout; the sine source phase cumsum is a single
jnp.cumsum at frame rate; iSTFT is the static overlap-add from ops/stft.py;
all randomness via an explicit 'noise' rng collection.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from styletts2_tpu.models.blocks import AdainResBlk1d
from styletts2_tpu.models.layers import (
    AdaIN1d,
    Conv1d,
    WNConv1d,
    WNConvTranspose1d,
    leaky_relu,
    snake,
)
from styletts2_tpu.ops.stft import istft, stft_magphase


def interp_linear(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """F.interpolate(mode='linear', align_corners=False) over time of (B, T, C)."""
    T = x.shape[1]
    scale = out_len / T
    coords = (jnp.arange(out_len) + 0.5) / scale - 0.5
    coords = jnp.clip(coords, 0.0, T - 1.0)
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, T - 1)
    w = (coords - lo)[None, :, None]
    return x[:, lo, :] * (1.0 - w) + x[:, hi, :] * w


def upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-neighbor time upsample of (B, T, C) by integer factor."""
    B, T, C = x.shape
    return jnp.broadcast_to(x[:, :, None, :], (B, T, factor, C)).reshape(
        B, T * factor, C
    )


class SineGen(nn.Module):
    """Harmonic sine source (istftnet.py:111-247), no trainable params."""

    samp_rate: int = 24000
    upsample_scale: int = 300
    harmonic_num: int = 8
    sine_amp: float = 0.1
    noise_std: float = 0.003
    voiced_threshold: float = 10.0

    @nn.compact
    def __call__(self, f0):
        """f0: (B, L, 1) at sample rate -> (sine_waves (B, L, H+1), uv (B, L, 1)).

        Computed in f32 regardless of the serving dtype: the cumulative
        phase reaches thousands of radians, far beyond bf16 resolution."""
        f0 = f0.astype(jnp.float32)
        B, L, _ = f0.shape
        dim = self.harmonic_num + 1
        harmonics = jnp.arange(1, dim + 1, dtype=f0.dtype)
        fn = f0 * harmonics[None, None, :]  # (B, L, dim)
        rad = jnp.mod(fn / self.samp_rate, 1.0)
        k_ini = self.make_rng("noise")
        rand_ini = jax.random.uniform(k_ini, (B, dim), dtype=f0.dtype)
        rand_ini = rand_ini.at[:, 0].set(0.0)
        rad = rad.at[:, 0, :].add(rand_ini)
        # phase accumulated at frame rate then upsampled (istftnet.py:174-186)
        rad_frame = interp_linear(rad, L // self.upsample_scale)
        phase_frame = jnp.cumsum(rad_frame, axis=1) * 2.0 * np.pi
        phase = interp_linear(phase_frame * self.upsample_scale, L)
        sines = jnp.sin(phase)

        uv = (f0 > self.voiced_threshold).astype(f0.dtype)
        k_noise = self.make_rng("noise")
        noise_amp = uv * self.noise_std + (1.0 - uv) * self.sine_amp / 3.0
        noise = noise_amp * jax.random.normal(k_noise, sines.shape, dtype=f0.dtype)
        sine_waves = sines * self.sine_amp * uv + noise
        return sine_waves, uv


class SourceModuleHnNSF(nn.Module):
    """Merge harmonics into one excitation (istftnet.py:250-297)."""

    upsample_scale: int = 300
    harmonic_num: int = 8
    sine_amp: float = 0.1

    @nn.compact
    def __call__(self, f0):
        sine_wavs, uv = SineGen(
            upsample_scale=self.upsample_scale,
            harmonic_num=self.harmonic_num,
            sine_amp=self.sine_amp,
            name="l_sin_gen",
        )(f0)
        sine_wavs = jax.lax.stop_gradient(sine_wavs)
        sine_merge = jnp.tanh(nn.Dense(1, name="l_linear")(sine_wavs))
        return sine_merge, uv


class _StyleAffine(nn.Module):
    """AdaIN's style→(γ, β) projection with AdaIN1d's param layout
    (fc kernel/bias) so checkpoints convert identically."""

    num_features: int

    @nn.compact
    def __call__(self, s):
        h = nn.Dense(self.num_features * 2, name="fc")(s)
        return jnp.split(h, 2, axis=-1)


class AdaINResBlock1(nn.Module):
    """Snake-activated AdaIN residual block (istftnet.py:27-75).

    The instance-norm + style affine + snake chain runs as one fused Pallas
    VMEM pass on TPU (ops/pallas_kernels.py), jnp composition elsewhere."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)

    @nn.compact
    def __call__(self, x, s):
        from styletts2_tpu.ops.pallas_kernels import adain_snake

        C = self.channels
        for j, d in enumerate(self.dilations):
            a1 = self.param(f"alpha1_{j}", nn.initializers.ones, (1, 1, C))
            a2 = self.param(f"alpha2_{j}", nn.initializers.ones, (1, 1, C))
            g1, b1 = _StyleAffine(C, name=f"adain1_{j}")(s)
            h = adain_snake(x, g1, b1, a1.reshape(-1))
            pad = (self.kernel_size - 1) * d // 2
            h = WNConv1d(C, self.kernel_size, padding=pad, dilation=d, name=f"conv1_{j}")(h)
            g2, b2 = _StyleAffine(C, name=f"adain2_{j}")(s)
            h = adain_snake(h, g2, b2, a2.reshape(-1))
            pad1 = (self.kernel_size - 1) // 2
            h = WNConv1d(C, self.kernel_size, padding=pad1, name=f"conv2_{j}")(h)
            x = x + h
        return x


class Generator(nn.Module):
    """NSF + iSTFT vocoder head (istftnet.py:302-398)."""

    style_dim: int = 128
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    upsample_rates: Sequence[int] = (10, 6)
    upsample_initial_channel: int = 512
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_kernel_sizes: Sequence[int] = (20, 12)
    gen_istft_n_fft: int = 20
    gen_istft_hop_size: int = 5

    @nn.compact
    def __call__(self, x, s, f0_curve):
        """x: (B, T_mel, C0), s: (B, style), f0_curve: (B, T_mel) -> wav (B, T_mel*300)."""
        num_kernels = len(self.resblock_kernel_sizes)
        total_up = int(np.prod(self.upsample_rates)) * self.gen_istft_hop_size

        # --- NSF source (no grad; istftnet.py:351-357)
        f0 = upsample_nearest(f0_curve[..., None], total_up)  # (B, L, 1)
        har_source, _ = SourceModuleHnNSF(
            upsample_scale=total_up, harmonic_num=8, name="m_source"
        )(f0)
        har_source = jax.lax.stop_gradient(har_source[..., 0])
        har_spec, har_phase = stft_magphase(
            har_source, self.gen_istft_n_fft, self.gen_istft_hop_size, self.gen_istft_n_fft
        )
        har = jnp.concatenate([har_spec, har_phase], axis=-2)  # (B, n_fft+2, F)
        har = jnp.swapaxes(har, -1, -2)  # NWC (B, F, n_fft+2)
        har = jax.lax.stop_gradient(har).astype(x.dtype)  # join serving dtype

        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            c_cur = self.upsample_initial_channel // (2 ** (i + 1))
            x = leaky_relu(x, 0.1)
            if i + 1 < len(self.upsample_rates):
                stride_f0 = int(np.prod(self.upsample_rates[i + 1 :]))
                xs_src = Conv1d(
                    c_cur, kernel_size=stride_f0 * 2, stride=stride_f0,
                    padding=(stride_f0 + 1) // 2, name=f"noise_convs_{i}",
                )(har)
                xs_src = AdaINResBlock1(c_cur, 7, (1, 3, 5), name=f"noise_res_{i}")(xs_src, s)
            else:
                xs_src = Conv1d(c_cur, kernel_size=1, name=f"noise_convs_{i}")(har)
                xs_src = AdaINResBlock1(c_cur, 11, (1, 3, 5), name=f"noise_res_{i}")(xs_src, s)

            x = WNConvTranspose1d(
                c_cur, kernel_size=k, stride=u, padding=(k - u) // 2,
                output_padding=0, name=f"ups_{i}",
            )(x)
            if i == len(self.upsample_rates) - 1:
                # reflection pad (1, 0) on time (istftnet.py:346, 365-366)
                x = jnp.concatenate([x[:, 1:2, :], x], axis=1)
            x = x + xs_src

            acc = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                y = AdaINResBlock1(c_cur, rk, tuple(rd), name=f"resblocks_{i}_{j}")(x, s)
                acc = y if acc is None else acc + y
            x = acc / num_kernels

        x = leaky_relu(x)
        x = WNConv1d(self.gen_istft_n_fft + 2, 7, padding=3, name="conv_post")(x)
        x = x.astype(jnp.float32)  # exp/sin + iSTFT head in f32
        n_half = self.gen_istft_n_fft // 2 + 1
        spec = jnp.exp(x[..., :n_half])  # (B, F, 11)
        phase = jnp.sin(x[..., n_half:])
        wav = istft(
            jnp.swapaxes(spec, -1, -2),
            jnp.swapaxes(phase, -1, -2),
            self.gen_istft_n_fft,
            self.gen_istft_hop_size,
            self.gen_istft_n_fft,
        )
        return wav


def _box_smooth(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Box-filter smoothing of (B, T) with kernel k, pad k//2 (istftnet.py:506-508)."""
    w = jnp.ones((k, 1, 1), dtype=x.dtype) / k
    y = jax.lax.conv_general_dilated(
        x[..., None], w, (1,), [(k // 2, k // 2)], dimension_numbers=("NWC", "WIO", "NWC")
    )
    return y[..., 0]


class Decoder(nn.Module):
    """AdaIN decoder driving the Generator (istftnet.py:467-528).

    asr: (B, T_en, dim_in) text features at half-mel rate;
    F0_curve, N: (B, 2*T_en) at mel rate; s: (B, style_dim).
    Returns wav (B, T_en*600).
    """

    dim_in: int = 512
    style_dim: int = 128
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    upsample_rates: Sequence[int] = (10, 6)
    upsample_initial_channel: int = 512
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_kernel_sizes: Sequence[int] = (20, 12)
    gen_istft_n_fft: int = 20
    gen_istft_hop_size: int = 5
    bottleneck: int = 1024  # reference hardcodes 1024 (istftnet.py:479-484)
    # rematerialize the Generator in backward passes (config.remat_decoder):
    # its 24 kHz activations dominate training-step memory (batch-16
    # max_len-400 f32 stage-1 needs ~25 G HBM without it vs ~16 G per v5e
    # chip). Scoped to the Generator only — wrapping the whole Decoder trips
    # an XLA:TPU post-optimization bitcast bug on the F0 broadcast under
    # remat's optimization barriers.
    remat: bool = False

    @nn.compact
    def __call__(self, asr, f0_curve, n_curve, s, train: bool = False):
        if train:
            # random box smoothing of F0/N (istftnet.py:500-508)
            key = self.make_rng("noise")
            kf, kn = jax.random.split(key)
            f0_down = jax.random.randint(kf, (), 0, 3)  # index into [0, 3, 7]
            n_down = jax.random.randint(kn, (), 0, 4)  # index into [0, 3, 7, 15]
            f0_curve = jax.lax.switch(
                f0_down,
                [lambda v: v, lambda v: _box_smooth(v, 3), lambda v: _box_smooth(v, 7)],
                f0_curve,
            )
            n_curve = jax.lax.switch(
                n_down,
                [
                    lambda v: v,
                    lambda v: _box_smooth(v, 3),
                    lambda v: _box_smooth(v, 7),
                    lambda v: _box_smooth(v, 15),
                ],
                n_curve,
            )

        # full-precision pitch for the sine source (phase accuracy); the
        # conv conditioning branches run in the serving dtype (bf16-safe)
        f0_full = f0_curve.astype(jnp.float32)
        f0c = f0_curve.astype(asr.dtype)
        nc = n_curve.astype(asr.dtype)
        F0 = WNConv1d(1, 3, stride=2, padding=1, name="F0_conv")(f0c[..., None])
        N = WNConv1d(1, 3, stride=2, padding=1, name="N_conv")(nc[..., None])

        x = jnp.concatenate([asr, F0, N], axis=-1)
        bn = self.bottleneck
        x = AdainResBlk1d(bn, name="encode")(x, s, train=train)
        asr_res = WNConv1d(64, 1, name="asr_res")(asr)

        specs = [(bn, False), (bn, False), (bn, False), (self.upsample_initial_channel, True)]
        for bi, (dim_out, up) in enumerate(specs):
            x = jnp.concatenate([x, asr_res, F0, N], axis=-1)
            x = AdainResBlk1d(dim_out, upsample=up, name=f"decode_{bi}")(x, s, train=train)

        gen_cls = nn.remat(Generator) if self.remat else Generator
        return gen_cls(
            style_dim=self.style_dim,
            resblock_kernel_sizes=tuple(self.resblock_kernel_sizes),
            upsample_rates=tuple(self.upsample_rates),
            upsample_initial_channel=self.upsample_initial_channel,
            resblock_dilation_sizes=tuple(map(tuple, self.resblock_dilation_sizes)),
            upsample_kernel_sizes=tuple(self.upsample_kernel_sizes),
            gen_istft_n_fft=self.gen_istft_n_fft,
            gen_istft_hop_size=self.gen_istft_hop_size,
            name="generator",
        )(x, s, f0_full)
