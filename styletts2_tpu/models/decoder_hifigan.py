"""HiFi-GAN waveform decoder variant (time-domain NSF head).

Reference semantics: Modules/hifigan.py —
  Generator (272-347): snake pre-activation per scale via a per-stage alpha
  ParameterList, 4× ConvTranspose upsampling (rates [10,5,3,2], padding
  u//2+u%2, output_padding u%2), the raw harmonic source waveform injected
  per scale through strided noise_convs, final Conv1d(k=7)+tanh;
  Decoder (416-476): identical AdaIN encode/decode head to the iSTFTNet
  variant. SineGen/SourceModuleHnNSF math is shared with decoder_istft
  (hifigan.py:83-268 matches istftnet.py:111-297, upsample_scale=prod(rates)).
NWC layout; same 'noise' rng conventions as decoder_istft.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from styletts2_tpu.models.blocks import AdainResBlk1d
from styletts2_tpu.models.decoder_istft import (
    SourceModuleHnNSF,
    AdaINResBlock1,
    _box_smooth,
    upsample_nearest,
)
from styletts2_tpu.models.layers import (
    Conv1d,
    WNConv1d,
    WNConvTranspose1d,
    snake,
)


class Generator(nn.Module):
    style_dim: int = 128
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    upsample_rates: Sequence[int] = (10, 5, 3, 2)
    upsample_initial_channel: int = 512
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_kernel_sizes: Sequence[int] = (20, 10, 6, 4)

    @nn.compact
    def __call__(self, x, s, f0_curve):
        """x: (B, T_mel, C0) -> wav (B, T_mel * prod(rates))."""
        num_kernels = len(self.resblock_kernel_sizes)
        total_up = int(np.prod(self.upsample_rates))

        f0 = upsample_nearest(f0_curve[..., None], total_up)  # (B, L, 1)
        har_source, _ = SourceModuleHnNSF(
            upsample_scale=total_up, harmonic_num=8, name="m_source"
        )(f0)
        # SineGen runs f32 internally; rejoin the serving dtype here
        har_source = jax.lax.stop_gradient(har_source).astype(x.dtype)  # (B, L, 1)

        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch_in = self.upsample_initial_channel // (2 ** i)
            c_cur = self.upsample_initial_channel // (2 ** (i + 1))
            alpha = self.param(f"alpha_{i}", nn.initializers.ones, (1, 1, ch_in))
            x = snake(x, alpha)
            if i + 1 < len(self.upsample_rates):
                stride_f0 = int(np.prod(self.upsample_rates[i + 1 :]))
                xs_src = Conv1d(
                    c_cur, kernel_size=stride_f0 * 2, stride=stride_f0,
                    padding=(stride_f0 + 1) // 2, name=f"noise_convs_{i}",
                )(har_source)
                xs_src = AdaINResBlock1(c_cur, 7, (1, 3, 5), name=f"noise_res_{i}")(xs_src, s)
            else:
                xs_src = Conv1d(c_cur, kernel_size=1, name=f"noise_convs_{i}")(har_source)
                xs_src = AdaINResBlock1(c_cur, 11, (1, 3, 5), name=f"noise_res_{i}")(xs_src, s)

            x = WNConvTranspose1d(
                c_cur, kernel_size=k, stride=u, padding=(u // 2 + u % 2),
                output_padding=u % 2, name=f"ups_{i}",
            )(x)
            x = x + xs_src

            acc = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                y = AdaINResBlock1(c_cur, rk, tuple(rd), name=f"resblocks_{i}_{j}")(x, s)
                acc = y if acc is None else acc + y
            x = acc / num_kernels

        alpha_last = self.param(
            f"alpha_{len(self.upsample_rates)}", nn.initializers.ones,
            (1, 1, self.upsample_initial_channel // (2 ** len(self.upsample_rates))),
        )
        x = snake(x, alpha_last).astype(jnp.float32)  # f32 output head
        x = WNConv1d(1, 7, padding=3, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


class Decoder(nn.Module):
    """Same AdaIN head as decoder_istft.Decoder, HiFi-GAN generator
    (hifigan.py:416-476)."""

    dim_in: int = 512
    style_dim: int = 128
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    upsample_rates: Sequence[int] = (10, 5, 3, 2)
    upsample_initial_channel: int = 512
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_kernel_sizes: Sequence[int] = (20, 10, 6, 4)
    bottleneck: int = 1024
    # rematerialize the Generator in backward passes (config.remat_decoder;
    # see decoder_istft.Decoder.remat for scope rationale)
    remat: bool = False

    @nn.compact
    def __call__(self, asr, f0_curve, n_curve, s, train: bool = False):
        if train:
            key = self.make_rng("noise")
            kf, kn = jax.random.split(key)
            f0_down = jax.random.randint(kf, (), 0, 3)
            n_down = jax.random.randint(kn, (), 0, 4)
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

        # full-precision pitch for the sine source; conv branches in the
        # serving dtype (see decoder_istft.Decoder)
        f0_full = f0_curve.astype(jnp.float32)
        f0_curve = f0_curve.astype(asr.dtype)
        n_curve = n_curve.astype(asr.dtype)
        F0 = WNConv1d(1, 3, stride=2, padding=1, name="F0_conv")(f0_curve[..., None])
        N = WNConv1d(1, 3, stride=2, padding=1, name="N_conv")(n_curve[..., None])

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
            name="generator",
        )(x, s, f0_full)
