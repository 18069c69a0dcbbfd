"""PL-BERT: phoneme-level ALBERT text encoder.

Reference: Utils/PLBERT/util.py:6-42 loads an HF AlbertModel with
Utils/PLBERT/config.yml model_params (vocab 178, hidden 768, 12 heads,
intermediate 2048, max_pos 512, 12 layers, embedding_size 128) and returns
last_hidden_state. Re-implemented natively: ALBERT = factorized embedding
(vocab→128→768) + ONE shared transformer layer applied num_hidden_layers
times (parameter sharing — a single param set scanned over depth).
HF parity points: post-LN residuals, gelu_new activation, layer_norm_eps
1e-12, additive attention mask.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from styletts2_tpu.config import PLBERTParams


def gelu_new(x):
    """HF 'gelu_new' (tanh approximation)."""
    return (
        0.5
        * x
        * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * jnp.power(x, 3.0))))
    )


class AlbertLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    eps: float = 1e-12

    @nn.compact
    def __call__(self, h, attn_bias):
        H, nh = self.hidden_size, self.num_heads
        dh = H // nh
        B, T, _ = h.shape
        q = nn.Dense(H, name="q")(h).reshape(B, T, nh, dh)
        k = nn.Dense(H, name="k")(h).reshape(B, T, nh, dh)
        v = nn.Dense(H, name="v")(h).reshape(B, T, nh, dh)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(dh)
        logits = logits + attn_bias  # (B, 1, 1, T) additive mask
        attn = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, H)
        ctx = nn.Dense(H, name="attn_out")(ctx)
        h = nn.LayerNorm(epsilon=self.eps, name="attn_ln")(h + ctx)
        f = nn.Dense(self.intermediate_size, name="ffn")(h)
        f = gelu_new(f)
        f = nn.Dense(H, name="ffn_out")(f)
        return nn.LayerNorm(epsilon=self.eps, name="ffn_ln")(h + f)


class PLBERT(nn.Module):
    cfg: PLBERTParams

    @nn.compact
    def __call__(self, tokens, attention_mask):
        """tokens: (B, T) int32, attention_mask: (B, T) 1=valid ->
        last_hidden_state (B, T, hidden_size)."""
        c = self.cfg
        B, T = tokens.shape
        emb = nn.Embed(c.vocab_size, c.embedding_size, name="word_embeddings")(tokens)
        pos = self.param(
            "position_embeddings",
            nn.initializers.normal(0.02),
            (c.max_position_embeddings, c.embedding_size),
        )
        tok_type = self.param(
            "token_type_embeddings", nn.initializers.normal(0.02), (2, c.embedding_size)
        )
        emb = emb + pos[None, :T, :] + tok_type[None, 0][:, None, :]
        emb = nn.LayerNorm(epsilon=1e-12, name="emb_ln")(emb)
        h = nn.Dense(c.hidden_size, name="emb_proj")(emb)

        attn_bias = (1.0 - attention_mask.astype(h.dtype))[:, None, None, :] * -1e9
        layer = AlbertLayer(
            c.hidden_size, c.num_attention_heads, c.intermediate_size, name="layer"
        )
        # ALBERT shares one layer's params across depth — run the depth loop
        # as a lax.scan over the SAME param set (12× fewer ops than unrolling;
        # per-call dispatch cost on tunneled backends scales with graph size).
        scanned = nn.scan(
            lambda mdl, carry, _: (mdl(carry, attn_bias), None),
            variable_broadcast="params",
            split_rngs={"params": False},
            length=c.num_hidden_layers,
        )
        h, _ = scanned(layer, h, None)
        return h
