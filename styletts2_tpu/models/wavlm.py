"""WavLM speech language model (frozen feature extractor for SLM losses).

Native JAX reimplementation of microsoft/wavlm-base-plus as used by the
reference WavLMLoss (losses.py:193-252): 16 kHz waveform → 7-layer conv
feature extractor (GroupNorm on the first layer) → feature projection →
post-LN transformer encoder with WavLM's gated relative position bias —
returning all 13 hidden states (embeddings + 12 layers) for feature
matching and the SLM discriminator head.

Parity target is the HF `transformers` WavLMModel (eval mode, no masking):
bucketed relative position bias computed once and shared across layers,
per-layer gates g_a·(g_b·c − 1) + 2 from the query states. Weights convert
1:1 from the torch state_dict (weight-normed pos-conv folded to effective
weights — the model is frozen).
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


CONV_KERNELS = (10, 3, 3, 3, 3, 2, 2)
CONV_STRIDES = (5, 2, 2, 2, 2, 2, 2)
CONV_DIM = 512


def _rel_pos_bucket(relative_positions: np.ndarray, num_buckets: int, max_distance: int) -> np.ndarray:
    nb = num_buckets // 2
    buckets = (relative_positions > 0).astype(np.int64) * nb
    rel = np.abs(relative_positions)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = (
        max_exact
        + (
            np.log(np.maximum(rel, 1).astype(np.float64) / max_exact)
            / math.log(max_distance / max_exact)
            * (nb - max_exact)
        ).astype(np.int64)
    )
    large = np.minimum(large, nb - 1)
    buckets += np.where(is_small, rel, large)
    return buckets


class WavLMAttention(nn.Module):
    hidden: int = 768
    heads: int = 12
    num_buckets: int = 320
    max_distance: int = 800
    has_rel_embed: bool = False

    @nn.compact
    def __call__(self, x, position_bias):
        B, T, H = x.shape
        nh = self.heads
        dh = H // nh

        if self.has_rel_embed:
            rel_embed = self.param(
                "rel_attn_embed", nn.initializers.normal(0.02), (self.num_buckets, nh)
            )
            rp = np.arange(T)[None, :] - np.arange(T)[:, None]
            bucket = jnp.asarray(_rel_pos_bucket(rp, self.num_buckets, self.max_distance))
            position_bias = jnp.transpose(rel_embed[bucket], (2, 0, 1))  # (nh, T, T)

        # gated relative position bias from the (pre-projection) hidden states
        gate_const = self.param("gru_rel_pos_const", nn.initializers.ones, (1, nh, 1, 1))
        gh = x.reshape(B, T, nh, dh).transpose(0, 2, 1, 3)  # (B, nh, T, dh)
        proj = nn.Dense(8, name="gru_rel_pos_linear")(gh)
        proj = proj.reshape(B, nh, T, 2, 4).sum(-1)  # (B, nh, T, 2)
        gates = jax.nn.sigmoid(proj)
        gate_a, gate_b = gates[..., 0:1], gates[..., 1:2]  # (B, nh, T, 1)
        gate_out = gate_a * (gate_b * gate_const - 1.0) + 2.0
        gated_bias = gate_out * position_bias[None]  # (B, nh, T, T)

        q = nn.Dense(H, name="q_proj")(x).reshape(B, T, nh, dh)
        k = nn.Dense(H, name="k_proj")(x).reshape(B, T, nh, dh)
        v = nn.Dense(H, name="v_proj")(x).reshape(B, T, nh, dh)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (dh ** -0.5) + gated_bias
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, H)
        return nn.Dense(H, name="out_proj")(out), position_bias


class WavLMEncoderLayer(nn.Module):
    hidden: int = 768
    heads: int = 12
    intermediate: int = 3072
    has_rel_embed: bool = False

    @nn.compact
    def __call__(self, x, position_bias):
        h, position_bias = WavLMAttention(
            self.hidden, self.heads, has_rel_embed=self.has_rel_embed, name="attention"
        )(x, position_bias)
        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x + h)
        f = nn.Dense(self.intermediate, name="ff_in")(x)
        f = jax.nn.gelu(f, approximate=False)
        f = nn.Dense(self.hidden, name="ff_out")(f)
        x = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x + f)
        return x, position_bias


class _LayerStep(nn.Module):
    """scan body: carry (x, position_bias) through one rel-embed-free
    encoder layer; emits the layer output for the hidden-state stack."""

    hidden: int
    heads: int
    intermediate: int

    @nn.compact
    def __call__(self, carry, _):
        x, pb = carry
        x, pb = WavLMEncoderLayer(
            self.hidden, self.heads, self.intermediate,
            has_rel_embed=False, name="layer",
        )(x, pb)
        return (x, pb), x


class WavLM(nn.Module):
    """16 kHz wav (B, T) -> list of 13 hidden states (B, frames, 768)."""

    hidden: int = 768
    heads: int = 12
    intermediate: int = 3072
    num_layers: int = 12

    @nn.compact
    def __call__(self, wav) -> List[jnp.ndarray]:
        x = wav[..., None]  # (B, T, 1)
        for i, (k, s) in enumerate(zip(CONV_KERNELS, CONV_STRIDES)):
            x = nn.Conv(
                CONV_DIM, (k,), strides=s, padding="VALID", use_bias=False,
                name=f"conv_{i}",
            )(x)
            if i == 0:
                # GroupNorm(num_groups=C): per-channel instance norm
                x = nn.GroupNorm(num_groups=CONV_DIM, epsilon=1e-5, name="conv_gn")(x)
            x = jax.nn.gelu(x, approximate=False)

        x = nn.LayerNorm(epsilon=1e-5, name="proj_ln")(x)
        x = nn.Dense(self.hidden, name="proj")(x)

        # positional conv embedding (k=128, groups=16, SAME-pad then drop last)
        pos = nn.Conv(
            self.hidden, (128,), padding=[(64, 64)], feature_group_count=16,
            name="pos_conv",
        )(x)
        pos = pos[:, :-1, :]
        pos = jax.nn.gelu(pos, approximate=False)
        x = x + pos
        x = nn.LayerNorm(epsilon=1e-5, name="encoder_ln")(x)

        states = [x]
        position_bias = None
        # layer 0 owns the gated rel-pos bias; layers 1..N-1 share structure
        # and run as ONE lax.scan body over stacked params (12× fewer HLO
        # ops per apply — the trainers apply WavLM up to 7×/step)
        x, position_bias = WavLMEncoderLayer(
            self.hidden, self.heads, self.intermediate,
            has_rel_embed=True, name="layer_0",
        )(x, position_bias)
        states.append(x)
        if self.num_layers > 1:
            Scan = nn.scan(
                _LayerStep,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.num_layers - 1,
            )
            (x, _), stack = Scan(
                self.hidden, self.heads, self.intermediate, name="layers"
            )((x, position_bias), None)
            states.extend(stack[i] for i in range(self.num_layers - 1))
        return states


def resample_24k_to_16k(wav: jnp.ndarray) -> jnp.ndarray:
    """torchaudio.transforms.Resample(24000, 16000) equivalent: polyphase
    windowed-sinc (lowpass_filter_width=6, rolloff 0.99, Hann window),
    expressed as a strided conv — gcd form: up 2, down 3.

    Implemented to mirror torchaudio's kernel construction so the SLM path
    (losses.py:199-205) sees the same 16 kHz signal.
    """
    orig_freq, new_freq = 3, 2  # reduced by gcd(24000,16000)=8000
    base_freq = min(orig_freq, new_freq) * 0.99  # rolloff applied
    width = math.ceil(6 * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None, :] / orig_freq
    t = np.arange(0, -new_freq, -1, dtype=np.float64)[:, None] / new_freq + idx
    t *= base_freq
    t = np.clip(t, -6, 6)
    window = np.cos(t * np.pi / 6 / 2) ** 2
    scale = base_freq / orig_freq
    kernels = np.where(t == 0, 1.0, np.sinc(t)) * window * scale
    # kernels: (new_freq, filter_len) — polyphase filters
    K = kernels.shape[1]
    B, T = wav.shape
    pad_l = width
    x = jnp.pad(wav, ((0, 0), (width, width + orig_freq)))[..., None]
    # sinc kernels join the wave's dtype (bf16-safe: raw conv won't promote)
    w = jnp.asarray(kernels.T[:, None, :], jnp.float32).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(orig_freq,), padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )  # (B, frames, new_freq)
    y = y.reshape(B, -1)
    target_len = int(math.ceil(new_freq * T / orig_freq))
    return y[:, :target_len]
