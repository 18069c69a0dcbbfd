"""Signal/DSP primitives: STFT, iSTFT, mel spectrogram, log-norm.

TPU-native reimplementation of the reference's L1 signal layer:
  - mel frontend semantics of torchaudio MelSpectrogram(n_mels=80, n_fft=2048,
    win_length=1200, hop_length=300) with *default* sample_rate=16000
    (reference meldataset.py:58-62 leaves sample_rate at default, so the mel
    filterbank is computed against a 16 kHz nominal Nyquist — a quirk we
    replicate exactly for checkpoint parity).
  - log-mel normalization (log(1e-5+mel) - mean)/std with mean=-4, std=4
    (reference meldataset.py:63-66).
  - TorchSTFT-equivalent transform/inverse used by the iSTFTNet vocoder head
    (reference Modules/istftnet.py:83-109), with the overlap-add inverse
    decomposed into static reshape+shift streams (no scatter) so XLA fuses it.
  - log_norm energy (reference utils.py:48-53).

All shapes are static under jit; windows and mel filterbanks are baked as
numpy constants at trace time.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Windows and filterbanks (host-side constants)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    """Hann window; periodic=True matches torch.hann_window / scipy fftbins=True."""
    n = win_length + 1 if periodic else win_length
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / max(n - 1, 1))
    return w[:win_length].astype(np.float32)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int = 16000,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
) -> np.ndarray:
    """HTK-scale triangular mel filterbank, no area normalization.

    Shape (n_freqs, n_mels). Matches torchaudio melscale_fbanks(norm=None,
    mel_scale='htk') which the reference mel frontend uses implicitly.
    """
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_pts = np.linspace(_hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = np.diff(f_pts)  # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


# ---------------------------------------------------------------------------
# Framing / STFT
# ---------------------------------------------------------------------------


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """Extract overlapping frames: (..., T) -> (..., F, frame_length).

    F = 1 + (T - frame_length) // hop. Uses a single static gather.
    """
    T = x.shape[-1]
    n_frames = 1 + (T - frame_length) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    return x[..., idx]


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    window: Optional[np.ndarray] = None,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Complex STFT of (..., T) -> (..., n_fft//2+1, F); torch.stft semantics.

    The window (length win_length) is zero-padded centered to n_fft.
    """
    if window is None:
        window = hann_window(win_length)
    w = np.zeros(n_fft, dtype=np.float32)
    lpad = (n_fft - win_length) // 2
    w[lpad : lpad + win_length] = window
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode=pad_mode)
    frames = frame_signal(x, n_fft, hop_length)  # (..., F, n_fft)
    frames = frames * jnp.asarray(w)
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # (..., F, n_freq)
    return jnp.swapaxes(spec, -1, -2)  # (..., n_freq, F)


def stft_magphase(
    x: jnp.ndarray, n_fft: int, hop_length: int, win_length: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(|STFT|, angle) pair, used by the NSF source path
    (reference Modules/istftnet.py:91-97)."""
    s = stft(x, n_fft, hop_length, win_length)
    return jnp.abs(s), jnp.angle(s)


def _ola_window_sumsq(
    n_frames: int, n_fft: int, hop: int, window: np.ndarray
) -> np.ndarray:
    """Host-side OLA of the squared window over n_frames frames."""
    L = n_fft + hop * (n_frames - 1)
    acc = np.zeros(L, dtype=np.float64)
    w2 = window.astype(np.float64) ** 2
    for f in range(n_frames):
        acc[f * hop : f * hop + n_fft] += w2
    return acc.astype(np.float32)


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Overlap-add (..., F, n_fft) -> (..., n_fft + hop*(F-1)).

    When hop divides n_fft, decomposes into n_fft//hop shifted non-overlapping
    streams (pure reshape + pad + add — no scatter, XLA-fusable). Falls back to
    a segment-sum otherwise.
    """
    *batch, F, n_fft = frames.shape
    L = n_fft + hop * (F - 1)
    if n_fft % hop == 0:
        k = n_fft // hop
        # (..., F, k, hop) -> k streams each (..., F*hop)
        chunks = frames.reshape(*batch, F, k, hop)
        out = jnp.zeros((*batch, L), dtype=frames.dtype)
        for j in range(k):
            stream = chunks[..., j, :].reshape(*batch, F * hop)
            out = out.at[..., j * hop : j * hop + F * hop].add(stream)
        return out
    # general fallback: scatter-add per frame via one-hot matmul over offsets
    idx = np.arange(F)[:, None] * hop + np.arange(n_fft)[None, :]  # (F, n_fft)
    flat = frames.reshape(*batch, F * n_fft)
    onehot = np.zeros((F * n_fft, L), dtype=np.float32)
    onehot[np.arange(F * n_fft), idx.reshape(-1)] = 1.0
    return flat @ jnp.asarray(onehot)


def istft(
    magnitude: jnp.ndarray,
    phase: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    window: Optional[np.ndarray] = None,
    center: bool = True,
) -> jnp.ndarray:
    """Inverse STFT from (|S|, angle) pairs, torch.istft semantics.

    magnitude/phase: (..., n_fft//2+1, F) -> wave (..., hop*(F-1)) for
    center=True. Used by the iSTFTNet vocoder head (gen_istft_n_fft=20,
    hop=5; reference Modules/istftnet.py:99-104).
    """
    if window is None:
        window = hann_window(win_length)
    w = np.zeros(n_fft, dtype=np.float32)
    lpad = (n_fft - win_length) // 2
    w[lpad : lpad + win_length] = window

    spec = magnitude * jnp.exp(1j * phase)
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * jnp.asarray(w)
    F = frames.shape[-2]
    y = overlap_add(frames, hop_length)
    wss = _ola_window_sumsq(F, n_fft, hop_length, w)
    wss = np.where(wss > 1e-11, wss, 1.0)
    y = y / jnp.asarray(wss)
    if center:
        half = n_fft // 2
        y = y[..., half : y.shape[-1] - half]
    return y


# ---------------------------------------------------------------------------
# Mel frontend
# ---------------------------------------------------------------------------

MEL_MEAN = -4.0
MEL_STD = 4.0


def melspectrogram(
    wave: jnp.ndarray,
    n_fft: int = 2048,
    win_length: int = 1200,
    hop_length: int = 300,
    n_mels: int = 80,
    fb_sample_rate: int = 16000,
    power: float = 2.0,
) -> jnp.ndarray:
    """Power mel spectrogram: (..., T) -> (..., n_mels, F).

    fb_sample_rate=16000 deliberately replicates the reference's use of
    torchaudio defaults on 24 kHz audio (meldataset.py:58-62).
    """
    s = stft(wave, n_fft, hop_length, win_length)
    p = jnp.abs(s) ** power  # (..., n_freq, F)
    fb = jnp.asarray(mel_filterbank(n_fft // 2 + 1, n_mels, fb_sample_rate))
    return jnp.einsum("...ft,fm->...mt", p, fb)


def preprocess_mel(wave: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """wave -> normalized log mel, reference meldataset.py:61-66."""
    mel = melspectrogram(wave, **kwargs)
    return (jnp.log(1e-5 + mel) - MEL_MEAN) / MEL_STD


def log_norm(
    x: jnp.ndarray, mean: float = MEL_MEAN, std: float = MEL_STD, axis: int = -2
) -> jnp.ndarray:
    """Energy curve from normalized log mel: log of the L2 norm over mel bins
    of the de-normalized linear mel (reference utils.py:48-53)."""
    lin = jnp.exp(x * std + mean)
    return jnp.log(jnp.sqrt(jnp.sum(lin * lin, axis=axis)))
