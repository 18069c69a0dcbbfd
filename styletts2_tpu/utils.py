"""Small shared utilities: masks, alignment expansion, audio IO.

Reference parity notes: length_to_mask matches reference utils.py:44-47
(mask True at padded positions, computed against a static max length here
so it jit-compiles with fixed shapes).
"""

from __future__ import annotations

import wave as _wave
from typing import Optional

import jax.numpy as jnp
import numpy as np


def length_to_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) bool mask, True at PADDED positions.

    Matches reference utils.py:44-47 (torch.gt(arange+1, lengths)) but with a
    static max_len for XLA.
    """
    pos = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return pos + 1 > lengths[:, None]


def valid_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) float mask, 1.0 at valid positions."""
    return (~length_to_mask(lengths, max_len)).astype(jnp.float32)


def duration_to_alignment(durations: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """Expand integer durations (B, N_tokens) into a hard one-hot alignment
    (B, N_tokens, n_frames).

    TPU-native replacement of the reference's per-frame python loop building
    pred_aln_trg (Demo/Inference_LJSpeech.ipynb cell 17, train_second.py:753-757):
    frame t belongs to token i iff cumsum[i-1] <= t < cumsum[i].
    """
    cs = jnp.cumsum(durations, axis=-1)  # (B, N)
    starts = cs - durations
    t = jnp.arange(n_frames)[None, None, :]  # (1, 1, T)
    return (
        (t >= starts[..., None]) & (t < cs[..., None])
    ).astype(jnp.float32)


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Read a PCM WAV file to float32 [-1, 1] (mono; first channel if stereo).

    Pure-stdlib replacement for soundfile (not available in this image).
    """
    with _wave.open(path, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        ch = f.getnchannels()
        sw = f.getsampwidth()
        raw = f.readframes(n)
    if sw == 2:
        data = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    elif sw == 4:
        data = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483648.0
    elif sw == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {sw}")
    if ch > 1:
        data = data.reshape(-1, ch)[:, 0]
    return data, sr


def write_wav(path: str, data: np.ndarray, sr: int) -> None:
    """Write float32 [-1, 1] mono audio as 16-bit PCM WAV."""
    pcm = np.clip(np.asarray(data, dtype=np.float32), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    with _wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def resample_linear(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Cheap host-side linear resampler (e.g. 24k -> 16k for the SLM path)."""
    if sr_in == sr_out:
        return x
    n_out = int(round(len(x) * sr_out / sr_in))
    t = np.linspace(0.0, len(x) - 1.0, n_out)
    return np.interp(t, np.arange(len(x)), x).astype(np.float32)
