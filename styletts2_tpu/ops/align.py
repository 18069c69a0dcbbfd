"""Monotonic alignment: hard Viterbi path from soft attention, on-device.

The reference's single native component (external resemble-ai/monotonic_align
Cython `maximum_path_c`, wrapped with a GPU→CPU→GPU round-trip at
utils.py:14-27). Here the dynamic program runs *on device* as two lax.scans
over mel time (forward DP + backtrack), vectorized over batch and text —
no host transfer. A C++ implementation (native/monotonic_align.cpp, loaded
via ctypes) provides the same kernel for host-side tooling and as an
equivalence oracle in tests.

Semantics: value[i, j] = neg_cent[i, j] + max(value[i-1, j-1], value[i, j-1]);
path is the argmax backtrack from (t_text-1, t_mel-1), monotonic and surjective
in the same way as the Cython kernel.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_NEG_INF = -1e9


def maximum_path(neg_cent: jnp.ndarray, text_lengths: jnp.ndarray, mel_lengths: jnp.ndarray) -> jnp.ndarray:
    """neg_cent: (B, T_text, T_mel) alignment scores; lengths per batch.

    Returns hard path (B, T_text, T_mel) float 0/1. jit-safe, static shapes.
    """
    B, T_text, T_mel = neg_cent.shape
    i_idx = jnp.arange(T_text)

    # ---- forward DP: scan over mel frames, carry the value column ----
    def fwd(carry, inp):
        v_prev = carry  # (B, T_text)
        scores, j = inp  # scores (B, T_text), j scalar
        v_diag = jnp.concatenate(
            [jnp.full((B, 1), _NEG_INF, v_prev.dtype), v_prev[:, :-1]], axis=1
        )
        # at column j, rows i > j are unreachable (need at least i+1 frames);
        # strict > matches the Cython kernel's tie-breaking (stay on ties)
        take_diag = v_diag > v_prev
        best = jnp.maximum(v_diag, v_prev)
        v_new = scores + best
        reachable = i_idx[None, :] <= j
        v_new = jnp.where(reachable, v_new, _NEG_INF)
        # column 0 special case: only row 0 reachable, value = score
        v_new = jnp.where(j == 0, jnp.where(i_idx[None, :] == 0, scores, _NEG_INF), v_new)
        take_diag = jnp.where(j == 0, False, take_diag)
        return v_new, take_diag

    # arrange inputs as (T_mel, B, T_text)
    scores_seq = jnp.transpose(neg_cent, (2, 0, 1))
    v0 = jnp.full((B, T_text), _NEG_INF, neg_cent.dtype)
    _, take_diag_seq = jax.lax.scan(fwd, v0, (scores_seq, jnp.arange(T_mel)))
    # take_diag_seq: (T_mel, B, T_text) bool — whether cell (i, j) came via diagonal

    # ---- backtrack: scan j = T_mel-1 .. 0, carry current row index ----
    def bwd(carry, inp):
        i_cur = carry  # (B,) int32 current text index (or -1 when inactive)
        take_diag, j = inp  # (B, T_text), scalar
        active = (j < mel_lengths) & (i_cur >= 0)
        onehot = (i_idx[None, :] == i_cur[:, None]) & active[:, None]
        came_diag = jnp.take_along_axis(
            take_diag, jnp.clip(i_cur, 0)[:, None], axis=1
        )[:, 0]
        i_next = jnp.where(active & came_diag, i_cur - 1, i_cur)
        return i_next, onehot

    # initialize: before any column processed, i_cur = text_lengths-1 for
    # columns at j = mel_lengths-1 (handled via 'entering'), else inactive.
    i_init = jnp.where(mel_lengths > 0, text_lengths - 1, -1)
    _, onehots = jax.lax.scan(
        bwd,
        i_init,
        (take_diag_seq[::-1], jnp.arange(T_mel - 1, -1, -1)),
    )
    # onehots: (T_mel, B, T_text) in reversed j order
    path = jnp.transpose(onehots[::-1], (1, 2, 0)).astype(neg_cent.dtype)
    return path


# ---------------------------------------------------------------------------
# Native (C++) host kernel via ctypes — reference-parity oracle + host tooling
# ---------------------------------------------------------------------------

_LIB = None


def _load_native() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    so = os.path.join(here, "native", "libmonotonic_align.so")
    if not os.path.exists(so):
        src = os.path.join(here, "native", "monotonic_align.cpp")
        if os.path.exists(src):
            import subprocess

            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", so, src], check=True
                )
            except Exception:
                return None
        else:
            return None
    _LIB = ctypes.CDLL(so)
    _LIB.maximum_path_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    return _LIB


def maximum_path_native(
    neg_cent: np.ndarray, text_lengths: np.ndarray, mel_lengths: np.ndarray
) -> np.ndarray:
    """Host C++ Viterbi (native/monotonic_align.cpp); same contract as
    maximum_path but on numpy arrays."""
    lib = _load_native()
    if lib is None:
        raise RuntimeError("native monotonic_align library unavailable")
    B, T_text, T_mel = neg_cent.shape
    neg = np.ascontiguousarray(neg_cent, dtype=np.float32)
    path = np.zeros((B, T_text, T_mel), dtype=np.int32)
    tl = np.ascontiguousarray(text_lengths, dtype=np.int32)
    ml = np.ascontiguousarray(mel_lengths, dtype=np.int32)
    lib.maximum_path_batch(
        path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        neg.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        B,
        T_text,
        T_mel,
        tl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ml.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return path.astype(np.float32)
