"""Style-latent diffusion denoiser transformers.

Reference semantics: Modules/diffusion/modules.py —
  Transformer1d (283-427) and StyleTransformer1d (40-234): the (B, 1, 256)
  style latent is broadcast along the PL-BERT embedding sequence, concatenated
  channel-wise (256+768=1024), run through 3 pre-LN (or AdaLayerNorm-
  conditioned) transformer blocks with a time/feature "mapping" vector added
  before each block, mean-pooled over the sequence and projected back to 256.
  FixedEmbedding (680-693) provides the unconditional embedding for CFG.

TPU-first difference: classifier-free guidance runs cond/uncond as one
batched forward (2B) instead of two sequential network calls
(modules.py:418-423) — halves the serial depth on the MXU.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from styletts2_tpu.models.layers import AdaLayerNorm


class FeedForward(nn.Module):
    multiplier: int = 2

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        h = nn.Dense(C * self.multiplier, name="in")(x)
        h = jax.nn.gelu(h, approximate=False)
        return nn.Dense(C, name="out")(h)


class SelfAttention(nn.Module):
    """Pre-LN self-attention (modules.py:538-584); if style_dim is set the
    norm is AdaLayerNorm conditioned on the style features (StyleAttention,
    modules.py:236-281)."""

    features: int
    num_heads: int
    head_features: int
    style_dim: int = 0

    @nn.compact
    def __call__(self, x, s: Optional[jnp.ndarray] = None,
                 valid: Optional[jnp.ndarray] = None):
        mid = self.num_heads * self.head_features
        # the reference normalizes q-input and kv-input with SEPARATE norms
        # (Attention.norm / norm_context, modules.py:553-583; AdaLayerNorm
        # pair in StyleAttention, modules.py:234-281) even for self-attention
        if self.style_dim > 0:
            h_q = AdaLayerNorm(name="norm")(x, s)
            h_kv = AdaLayerNorm(name="norm_context")(x, s)
        else:
            h_q = nn.LayerNorm(name="norm")(x)
            h_kv = nn.LayerNorm(name="norm_context")(x)
        q = nn.Dense(mid, use_bias=False, name="to_q")(h_q)
        kv = nn.Dense(mid * 2, use_bias=False, name="to_kv")(h_kv)
        k, v = jnp.split(kv, 2, axis=-1)
        B, T, _ = x.shape
        nh, dh = self.num_heads, self.head_features
        qh = q.reshape(B, T, nh, dh)
        kh = k.reshape(B, T, nh, dh)
        vh = v.reshape(B, T, nh, dh)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * (dh ** -0.5)
        if valid is not None:  # exclude padded keys (bucketed serving)
            logits = jnp.where(
                valid[:, None, None, :] > 0, logits, jnp.finfo(logits.dtype).min
            )
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(B, T, mid)
        return nn.Dense(self.features, name="to_out")(out)


class TransformerBlock(nn.Module):
    features: int
    num_heads: int
    head_features: int
    multiplier: int
    style_dim: int = 0

    @nn.compact
    def __call__(self, x, s: Optional[jnp.ndarray] = None,
                 valid: Optional[jnp.ndarray] = None):
        x = SelfAttention(
            self.features, self.num_heads, self.head_features, self.style_dim,
            name="attention",
        )(x, s, valid) + x
        x = FeedForward(self.multiplier, name="feed_forward")(x) + x
        return x


class TimePositionalEmbedding(nn.Module):
    """Continuous-time Fourier features (modules.py:657-678)."""

    dim: int
    out_features: int

    @nn.compact
    def __call__(self, t):
        w = self.param("weights", nn.initializers.normal(1.0), (self.dim // 2,))
        freqs = t[:, None] * w[None, :] * 2.0 * np.pi
        fourier = jnp.concatenate([jnp.sin(freqs), jnp.cos(freqs)], axis=-1)
        fourier = jnp.concatenate([t[:, None], fourier], axis=-1)
        return nn.Dense(self.out_features, name="proj")(fourier)


class StyleTransformer1d(nn.Module):
    """Denoiser net. channels=style_dim*2 (256); multispeaker variant uses
    AdaLayerNorm style conditioning on `features` (build_model, models.py:643-651).
    Set style_cond=False for the single-speaker Transformer1d."""

    channels: int = 256
    context_embedding_features: int = 768
    context_features: int = 256
    num_layers: int = 3
    num_heads: int = 8
    head_features: int = 64
    multiplier: int = 2
    embedding_max_length: int = 512
    style_cond: bool = True  # StyleTransformer1d vs Transformer1d

    @nn.compact
    def __call__(
        self,
        x,
        time,
        embedding,
        features: Optional[jnp.ndarray] = None,
        embedding_mask_proba: float = 0.0,
        embedding_scale: float = 1.0,
        train: bool = False,
        embedding_lengths: Optional[jnp.ndarray] = None,
    ):
        """x: (B, 1, channels) noisy style latent; time: (B,) noise level;
        embedding: (B, T, 768) PL-BERT features; features: (B, context_features)
        reference style (multispeaker) -> (B, 1, channels).

        embedding_lengths (B,) optionally masks padded embedding positions
        out of the attention and the mean pool, making BUCKET-padded serving
        numerically identical to the reference's exact-length inference
        (the reference trains on padded batches unmasked — trainers here do
        the same — but its notebooks always infer at exact length)."""
        B, T = embedding.shape[0], embedding.shape[1]
        mapping_features = self.channels + self.context_embedding_features

        fixed = self.param(
            "fixed_embedding",
            nn.initializers.normal(1.0),
            (self.embedding_max_length, self.context_embedding_features),
        )
        fixed_embedding = jnp.broadcast_to(
            fixed[None, :T, :], (B, T, self.context_embedding_features)
        )

        if train and embedding_mask_proba > 0.0:
            key = self.make_rng("noise")
            mask = jax.random.bernoulli(key, embedding_mask_proba, (B, 1, 1))
            embedding = jnp.where(mask, fixed_embedding, embedding)

        valid = None
        if embedding_lengths is not None:
            valid = (
                jnp.arange(T)[None, :] < embedding_lengths[:, None]
            ).astype(embedding.dtype)

        def run(x_, emb_, feats_, valid_):
            items = TimePositionalEmbedding(
                self.channels, mapping_features, name="to_time"
            )(time if x_.shape[0] == B else jnp.tile(time, 2))
            items = jax.nn.gelu(items, approximate=False)
            if self.context_features > 0 and feats_ is not None:
                fi = nn.Dense(mapping_features, name="to_features")(feats_)
                items = items + jax.nn.gelu(fi, approximate=False)
            mapping = nn.Dense(mapping_features, name="map1")(items)
            mapping = jax.nn.gelu(mapping, approximate=False)
            mapping = nn.Dense(mapping_features, name="map2")(mapping)
            mapping = jax.nn.gelu(mapping, approximate=False)

            h = jnp.concatenate(
                [jnp.broadcast_to(x_, (x_.shape[0], T, self.channels)), emb_], axis=-1
            )
            s = feats_ if self.style_cond else None
            for i in range(self.num_layers):
                h = h + mapping[:, None, :]
                h = TransformerBlock(
                    mapping_features,
                    self.num_heads,
                    self.head_features,
                    self.multiplier,
                    style_dim=self.context_features if self.style_cond else 0,
                    name=f"block_{i}",
                )(h, s, valid_)
            if valid_ is not None:
                h = jnp.sum(h * valid_[..., None], axis=1, keepdims=True) / (
                    jnp.sum(valid_, axis=1)[:, None, None] + 1e-8
                )
            else:
                h = jnp.mean(h, axis=1, keepdims=True)  # (B, 1, M)
            return nn.Dense(self.channels, name="to_out")(h)

        if embedding_scale != 1.0:
            # batched classifier-free guidance: cond + uncond in one pass
            x2 = jnp.concatenate([x, x], axis=0)
            emb2 = jnp.concatenate([embedding, fixed_embedding], axis=0)
            feats2 = (
                jnp.concatenate([features, features], axis=0)
                if features is not None
                else None
            )
            valid2 = (
                jnp.concatenate([valid, valid], axis=0) if valid is not None else None
            )
            out2 = run(x2, emb2, feats2, valid2)
            out, out_masked = out2[:B], out2[B:]
            return out_masked + (out - out_masked) * embedding_scale
        return run(x, embedding, features, valid)
