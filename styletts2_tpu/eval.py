"""Fidelity metrics: MCD, F0 RMSE, and voiced/unvoiced accuracy.

The reference quality-controls by ear (SURVEY.md §4); here the BASELINE
targets (MCD ≤0.5 dB, F0-RMSE tolerance vs the PyTorch reference) are
computable: mel-cepstral distortion from the shared mel frontend, F0 from
the JDC pitch extractor, with DTW alignment for length-mismatched pairs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp

from styletts2_tpu.ops.stft import preprocess_mel


def mfcc_from_wav(wav: np.ndarray, n_mfcc: int = 13) -> np.ndarray:
    """Mel-cepstra (excluding c0) from a 24 kHz waveform: log-mel → DCT-II."""
    mel = np.asarray(preprocess_mel(jnp.asarray(wav[None], jnp.float32)))[0]
    logmel = mel * 4.0 - 4.0  # undo normalization → log mel
    M = logmel.shape[0]
    n = np.arange(M)
    k = np.arange(n_mfcc + 1)
    dct = np.cos(np.pi / M * (n[:, None] + 0.5) * k[None, :]) * np.sqrt(2.0 / M)
    dct[:, 0] /= np.sqrt(2.0)
    cep = logmel.T @ dct  # (T, n_mfcc+1)
    return cep[:, 1:]  # drop energy c0


_DTW_LIB = None


def _load_dtw_native():
    """Build/load the native DTW kernel (native/dtw.cpp), mirroring the
    monotonic-align loader (ops/align.py). Returns None when no toolchain."""
    global _DTW_LIB
    if _DTW_LIB is not None:
        return _DTW_LIB
    import ctypes
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(here, "native", "libdtw.so")
    if not os.path.exists(so):
        src = os.path.join(here, "native", "dtw.cpp")
        if not os.path.exists(src):
            return None
        import subprocess

        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, src], check=True
            )
        except Exception:
            return None
    lib = ctypes.CDLL(so)
    lib.dtw_path.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.dtw_path.restype = ctypes.c_int32
    _DTW_LIB = lib
    return lib


def _dtw_path_numpy(dist: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized-inner-loop fallback DP (no toolchain); O(Ta·Tb) numpy."""
    Ta, Tb = dist.shape
    acc = np.full((Ta + 1, Tb + 1), np.inf, np.float64)
    bp = np.zeros((Ta, Tb), np.uint8)
    acc[0, 0] = 0.0
    for i in range(1, Ta + 1):
        # left-dependency is a prefix min → running scan per row
        diag = acc[i - 1, :-1]
        up = acc[i - 1, 1:]
        best = np.minimum(diag, up)
        bp[i - 1] = np.where(up < diag, 1, 0)
        row = acc[i]
        left = np.inf
        d = dist[i - 1]
        for j in range(Tb):
            m = best[j]
            if left < m:
                m = left
                bp[i - 1, j] = 2
            left = row[j + 1] = d[j] + m
    i, j = Ta, Tb
    pa, pb = [], []
    while i > 0 and j > 0:
        pa.append(i - 1)
        pb.append(j - 1)
        step = bp[i - 1, j - 1]
        if step == 0:
            i, j = i - 1, j - 1
        elif step == 1:
            i -= 1
        else:
            j -= 1
    return np.asarray(pa[::-1]), np.asarray(pb[::-1])


def _dtw_path(
    a: np.ndarray, b: np.ndarray, band: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """DTW on frame-wise euclidean distance; returns index pairs.

    Native C++ DP (native/dtw.cpp, ~1000× the round-2 pure-Python loop) with
    a numpy fallback; `band` > 0 restricts to a Sakoe-Chiba band of that
    half-width for long corpus-level sequences."""
    import ctypes

    Ta, Tb = len(a), len(b)
    dist = np.linalg.norm(
        a[:, None, :].astype(np.float32) - b[None, :, :].astype(np.float32),
        axis=-1,
    )
    lib = _load_dtw_native()
    if lib is not None:
        dist_c = np.ascontiguousarray(dist, np.float32)
        pa = np.empty(Ta + Tb, np.int32)
        pb = np.empty(Ta + Tb, np.int32)
        n = lib.dtw_path(
            dist_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            np.int32(Ta), np.int32(Tb), np.int32(band),
            pa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            pb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if n > 0:
            return pa[:n].copy(), pb[:n].copy()
    return _dtw_path_numpy(dist)


def mcd(wav_a: np.ndarray, wav_b: np.ndarray, use_dtw: bool = True) -> float:
    """Mel-cepstral distortion in dB (lower is better; BASELINE target ≤0.5
    between this framework and the reference on identical inputs)."""
    ca, cb = mfcc_from_wav(wav_a), mfcc_from_wav(wav_b)
    if use_dtw and len(ca) != len(cb):
        ia, ib = _dtw_path(ca, cb)
        ca, cb = ca[ia], cb[ib]
    else:
        n = min(len(ca), len(cb))
        ca, cb = ca[:n], cb[:n]
    diff = ca - cb
    return float(
        (10.0 / np.log(10.0)) * np.sqrt(2.0) * np.mean(np.linalg.norm(diff, axis=-1))
    )


def f0_metrics(
    f0_a: np.ndarray, f0_b: np.ndarray, voiced_threshold: float = 10.0
) -> dict:
    """F0 RMSE (Hz, over mutually voiced frames) + V/UV agreement."""
    n = min(len(f0_a), len(f0_b))
    a, b = f0_a[:n], f0_b[:n]
    va, vb = a > voiced_threshold, b > voiced_threshold
    both = va & vb
    rmse = float(np.sqrt(np.mean((a[both] - b[both]) ** 2))) if both.any() else 0.0
    return {
        "f0_rmse_hz": rmse,
        "vuv_accuracy": float(np.mean(va == vb)),
        "voiced_frames": int(both.sum()),
    }
