"""ASR text aligner: CTC conv encoder + location-sensitive seq2seq decoder.

Reference semantics: Utils/ASR/models.py + layers.py —
  ASRCNN (8-72): mel → MFCC (ortho DCT over 80 mels → 40, layers.py:332-354)
  → stride-2 ConvNorm stem → 6×[ConvBlock(3 dilated convs + GroupNorm(8)) +
  GroupNorm(1)] → projection to 128 → CTC head;
  ASRS2S (74-186): teacher-forced LSTMCell decoder with location-sensitive
  attention (layers.py:133-208): energies = v·tanh(query + location + memory),
  attention fed by [prev, cumulative] weights through a k=63 conv.

TPU-native: the python while-loop decode becomes one lax.scan with carry
(h, c, attn, attn_cum, context); the memory projection is hoisted out of the
scan. Config: Utils/ASR/config.yml (hidden 256, n_token 178, emb 512).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from styletts2_tpu.models.layers import uniform_centered


def dct_matrix(n_mfcc: int = 40, n_mels: int = 80) -> np.ndarray:
    """Ortho-normalized DCT-II basis (torchaudio create_dct parity):
    returns (n_mels, n_mfcc)."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)
    basis = np.cos(np.pi / n_mels * (n[:, None] + 0.5) * k[None, :])
    basis *= np.sqrt(2.0 / n_mels)
    basis[:, 0] *= 1.0 / np.sqrt(2.0)
    return basis.astype(np.float32)


class ConvBlock(nn.Module):
    """Three dilated residual conv sub-blocks (layers.py:105-131)."""

    hidden: int = 256
    n_conv: int = 3
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n_conv):
            d = 3 ** i
            h = nn.Conv(self.hidden, (3,), kernel_dilation=d, padding=d, name=f"c{i}_1")(x)
            h = jax.nn.relu(h)
            h = nn.GroupNorm(num_groups=8, epsilon=1e-5, name=f"gn{i}")(h)
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
            h = nn.Conv(self.hidden, (3,), padding=1, name=f"c{i}_2")(h)
            h = jax.nn.relu(h)
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
            x = x + h
        return x


class ASRS2S(nn.Module):
    embedding_dim: int = 512
    hidden_dim: int = 128
    n_location_filters: int = 32
    location_kernel_size: int = 63
    n_token: int = 178
    sos: int = 1
    unk: int = 3
    random_mask: float = 0.1

    @nn.compact
    def __call__(self, memory, memory_valid, text_input, train: bool = False):
        """memory: (B, L, H) encoder outputs; memory_valid: (B, L) 1=valid;
        text_input: (B, T) -> (hidden (B,T+1,H), logits (B,T+1,n_token),
        alignments (B,T+1,L))."""
        B, L, H = memory.shape
        T = text_input.shape[1]
        A = self.hidden_dim

        if train and self.random_mask > 0:
            key = self.make_rng("noise")
            mask = jax.random.uniform(key, text_input.shape) < self.random_mask
            text_input = jnp.where(mask, self.unk, text_input)

        emb = nn.Embed(
            self.n_token, self.embedding_dim,
            embedding_init=nn.initializers.uniform(scale=2 * math.sqrt(6 / A)),
            name="embedding",
        )
        dec_in = emb(text_input)  # (B, T, E)
        sos_vec = emb(jnp.full((B, 1), self.sos, jnp.int32))
        dec_in = jnp.concatenate([sos_vec, dec_in], axis=1)  # (B, T+1, E)

        processed_memory = nn.Dense(A, use_bias=False, name="memory_layer")(memory)
        neg_mask = jnp.where(memory_valid > 0, 0.0, -jnp.inf)[:, :, None]  # (B,L,1)

        # all scan-body weights as explicit params (flax submodules can't be
        # first-called inside lax.scan)
        xavier = nn.initializers.xavier_uniform()
        W_q = self.param("query_layer", xavier, (A, A))
        W_v = self.param("v", xavier, (A, 1))
        K_loc = self.param(
            "location_conv", xavier, (self.location_kernel_size, 2, self.n_location_filters)
        )
        W_loc = self.param("location_dense", xavier, (self.n_location_filters, A))
        # LSTMCell params (torch gate order i,f,g,o)
        cell_in = self.embedding_dim + A
        bound = 1.0 / math.sqrt(A)
        W_ih = self.param("W_ih", uniform_centered(bound), (cell_in, 4 * A))
        W_hh = self.param("W_hh", uniform_centered(bound), (A, 4 * A))
        b_cell = self.param("b_cell", uniform_centered(bound), (4 * A,))
        W_ph = self.param("project_to_hidden_w", xavier, (2 * A, A))
        b_ph = self.param("project_to_hidden_b", nn.initializers.zeros, (A,))
        W_pl = self.param("project_to_n_symbols_w", xavier, (A, self.n_token))
        b_pl = self.param("project_to_n_symbols_b", nn.initializers.zeros, (self.n_token,))
        loc_pad = (self.location_kernel_size - 1) // 2

        drop_rng = self.make_rng("dropout") if train else None

        def step(carry, inp):
            h, c, attn_w, attn_cum, ctx = carry
            x_t, k_t = inp  # (B, E), key
            gates = jnp.concatenate([x_t, ctx], axis=-1) @ W_ih + h @ W_hh + b_cell
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)

            attn_cat = jnp.stack([attn_w, attn_cum], axis=-1)  # (B, L, 2)
            loc = jax.lax.conv_general_dilated(
                attn_cat, K_loc, (1,), [(loc_pad, loc_pad)],
                dimension_numbers=("NWC", "WIO", "NWC"),
            )  # (B, L, n_filters)
            processed_loc = loc @ W_loc  # (B, L, A)
            energies = (
                jnp.tanh((h_new @ W_q)[:, None, :] + processed_loc + processed_memory)
                @ W_v
            ) + neg_mask  # (B, L, 1)
            attn_new = jax.nn.softmax(energies[..., 0], axis=-1)  # (B, L)
            ctx_new = jnp.einsum("bl,blh->bh", attn_new, memory)
            attn_cum_new = attn_cum + attn_new

            hidden = jnp.tanh(jnp.concatenate([h_new, ctx_new], -1) @ W_ph + b_ph)
            if train:
                keep = jax.random.bernoulli(k_t, 0.5, hidden.shape)
                hidden_do = jnp.where(keep, hidden / 0.5, 0.0)
            else:
                hidden_do = hidden
            logit = hidden_do @ W_pl + b_pl
            return (h_new, c_new, attn_new, attn_cum_new, ctx_new), (hidden, logit, attn_new)

        zeros = jnp.zeros((B, A), memory.dtype)
        carry0 = (zeros, zeros, jnp.zeros((B, L)), jnp.zeros((B, L)), zeros)
        keys = jax.random.split(
            drop_rng if drop_rng is not None else jax.random.PRNGKey(0), T + 1
        )
        xs = (jnp.swapaxes(dec_in, 0, 1), keys)
        _, (hiddens, logits, aligns) = jax.lax.scan(step, carry0, xs)
        return (
            jnp.swapaxes(hiddens, 0, 1),
            jnp.swapaxes(logits, 0, 1),
            jnp.swapaxes(aligns, 0, 1),
        )


class ASRCNN(nn.Module):
    input_dim: int = 80
    hidden_dim: int = 256
    n_token: int = 178
    n_layers: int = 6
    token_embedding_dim: int = 512

    def setup(self):
        self.init_cnn = nn.Conv(
            self.hidden_dim, (7,), strides=2, padding=3, name="init_cnn"
        )
        self.cnns = [ConvBlock(self.hidden_dim) for _ in range(self.n_layers)]
        self.cnn_norms = [
            nn.GroupNorm(num_groups=1, epsilon=1e-5) for _ in range(self.n_layers)
        ]
        self.projection = nn.Conv(self.hidden_dim // 2, (1,), name="projection")
        self.ctc1 = nn.Dense(self.hidden_dim, name="ctc1")
        self.ctc2 = nn.Dense(self.n_token, name="ctc2")
        self.asr_s2s = ASRS2S(
            embedding_dim=self.token_embedding_dim,
            hidden_dim=self.hidden_dim // 2,
            n_token=self.n_token,
        )

    def encode(self, mel, train: bool = False):
        """mel: (B, n_mels, T_mel) -> memory (B, T_mel//2, hidden//2)."""
        dct = jnp.asarray(dct_matrix(self.input_dim // 2, self.input_dim))
        mfcc = jnp.einsum("bmt,mk->btk", mel, dct)  # (B, T, 40)
        x = self.init_cnn(mfcc)  # stride 2 → (B, T/2, 256)
        for blk, gn in zip(self.cnns, self.cnn_norms):
            x = blk(x, train=train)
            x = gn(x)
        return self.projection(x)

    def ctc(self, memory):
        return self.ctc2(jax.nn.relu(self.ctc1(memory)))

    def __call__(self, mel, memory_valid, text_input, train: bool = False):
        """mel (B, n_mels, T_mel); memory_valid (B, T_mel//2) 1=valid;
        text (B, T_text). Returns (ctc_logits, s2s_logits, s2s_attn) —
        the aligner triple of train_first.py:189."""
        memory = self.encode(mel, train=train)
        ctc_logit = self.ctc(memory)
        _, s2s_logit, s2s_attn = self.asr_s2s(
            memory, memory_valid, text_input, train=train
        )
        return ctc_logit, s2s_logit, s2s_attn

    def get_feature(self, mel, train: bool = False):
        """Stage-2 feature hook (Utils/ASR/models.py:50-55): (B, T/2, 128)."""
        return self.encode(mel, train=train)
