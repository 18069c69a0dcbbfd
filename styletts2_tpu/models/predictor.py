"""Prosody predictor: duration + F0/energy heads.

Reference semantics: models.py:440-582.
  DurationEncoder (models.py:517-569): nlayers × [BiLSTM(d_model+sty → d_model)
  → AdaLayerNorm(style) → re-concat style], masked; output (B, T, d_model+sty).
  ProsodyPredictor.forward (models.py:468-495): duration BiLSTM +
  Linear(d_hid → max_dur) over dropout(0.5); en = dᵀ @ alignment.
  F0Ntrain (models.py:497-510): shared BiLSTM then per-branch
  3×AdainResBlk1d (middle one 2× upsampling) + 1x1 conv projections.
All sequences NWC; LSTMs are mask-aware scans.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from styletts2_tpu.models.blocks import AdainResBlk1d
from styletts2_tpu.models.layers import AdaLayerNorm, BiLSTM, Conv1d


class DurationEncoder(nn.Module):
    sty_dim: int = 128
    d_model: int = 512
    nlayers: int = 3
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, x, style, lengths, train: bool = False):
        """x: (B, T, d_model) text features, style: (B, sty_dim)
        -> (B, T, d_model + sty_dim)."""
        B, T, _ = x.shape
        valid = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]
        s_seq = jnp.broadcast_to(style[:, None, :], (B, T, self.sty_dim))
        x = jnp.concatenate([x, s_seq], axis=-1)
        x = jnp.where(valid, x, 0.0)
        for i in range(self.nlayers):
            h = BiLSTM(self.d_model // 2, name=f"lstm_{i}")(x, lengths)
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
            h = AdaLayerNorm(name=f"ada_{i}")(h, style)
            x = jnp.concatenate([h, s_seq], axis=-1)
            x = jnp.where(valid, x, 0.0)
        return x


class ProsodyPredictor(nn.Module):
    style_dim: int = 128
    d_hid: int = 512
    nlayers: int = 3
    max_dur: int = 50
    dropout_rate: float = 0.2

    def setup(self):
        self.text_encoder = DurationEncoder(
            sty_dim=self.style_dim,
            d_model=self.d_hid,
            nlayers=self.nlayers,
            dropout_rate=self.dropout_rate,
        )
        self.lstm = BiLSTM(self.d_hid // 2)
        self.duration_proj = nn.Dense(self.max_dur)
        self.dur_dropout = nn.Dropout(0.5)
        self.shared = BiLSTM(self.d_hid // 2)
        self.F0_blocks = [
            AdainResBlk1d(self.d_hid, dropout_rate=self.dropout_rate),
            AdainResBlk1d(self.d_hid // 2, upsample=True, dropout_rate=self.dropout_rate),
            AdainResBlk1d(self.d_hid // 2, dropout_rate=self.dropout_rate),
        ]
        self.N_blocks = [
            AdainResBlk1d(self.d_hid, dropout_rate=self.dropout_rate),
            AdainResBlk1d(self.d_hid // 2, upsample=True, dropout_rate=self.dropout_rate),
            AdainResBlk1d(self.d_hid // 2, dropout_rate=self.dropout_rate),
        ]
        self.F0_proj = Conv1d(1, 1)
        self.N_proj = Conv1d(1, 1)

    def encode_texts(self, texts, style, lengths, train: bool = False):
        """DurationEncoder pass: (B, T, d_hid) -> (B, T, d_hid + style_dim)."""
        return self.text_encoder(texts, style, lengths, train=train)

    def duration(self, d, lengths, train: bool = False):
        """Duration logits (B, T, max_dur) from encoded texts d."""
        x = self.lstm(d, lengths)
        x = self.dur_dropout(x, deterministic=not train)
        return self.duration_proj(x)

    def __call__(self, texts, style, lengths, alignment, train: bool = False):
        """texts: (B, T, d_hid); alignment: (B, T, T_frames).
        Returns (duration_logits (B, T, max_dur), en (B, T_frames, d_hid+sty))."""
        d = self.encode_texts(texts, style, lengths, train=train)
        dur = self.duration(d, lengths, train=train)
        en = jnp.einsum("btc,btf->bfc", d, alignment)
        return dur, en

    def init_all(self, texts, style, lengths, alignment, train: bool = False):
        """Trace every submodule once so flax init creates all params."""
        dur, en = self.__call__(texts, style, lengths, alignment, train=train)
        F0, N = self.F0Ntrain(en, style, train=train)
        return dur, en, F0, N

    def F0Ntrain(self, x, s, train: bool = False):
        """x: (B, T_frames, d_hid+sty) aligned prosody features ->
        (F0 (B, 2*T_frames), N (B, 2*T_frames))."""
        lengths = jnp.full((x.shape[0],), x.shape[1], dtype=jnp.int32)
        h = self.shared(x, lengths)
        f = h
        for blk in self.F0_blocks:
            f = blk(f, s, train=train)
        F0 = self.F0_proj(f)[..., 0]
        n = h
        for blk in self.N_blocks:
            n = blk(n, s, train=train)
        N = self.N_proj(n)[..., 0]
        return F0, N
