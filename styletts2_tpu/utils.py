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
    """Cheap host-side linear resampler (kept for tests/tooling; the data
    path uses resample_sinc below)."""
    if sr_in == sr_out:
        return x
    n_out = int(round(len(x) * sr_out / sr_in))
    t = np.linspace(0.0, len(x) - 1.0, n_out)
    return np.interp(t, np.arange(len(x)), x).astype(np.float32)


def resample_sinc(
    x: np.ndarray,
    sr_in: int,
    sr_out: int,
    zeros: int = 24,
    beta: float = 8.555,
    _chunk: int = 1 << 16,
) -> np.ndarray:
    """High-fidelity rational polyphase windowed-sinc resampler (host side).

    Matches the quality of the reference's librosa/soundfile load+resample
    path (/root/reference/meldataset.py:58-66) without its dependencies:
    upsample by L, Kaiser-windowed sinc low-pass at the tighter Nyquist,
    downsample by M — the same design as scipy.signal.resample_poly /
    torchaudio's sinc_interp_kaiser. Pure numpy, vectorized per output
    chunk; `zeros` sinc lobes per side.
    """
    if sr_in == sr_out:
        return np.asarray(x, dtype=np.float32)
    import math

    x = np.asarray(x, dtype=np.float32)
    g = math.gcd(int(sr_in), int(sr_out))
    up, down = int(sr_out) // g, int(sr_in) // g
    max_rate = max(up, down)
    half = zeros * max_rate
    n = np.arange(-half, half + 1, dtype=np.float64)
    f_c = 1.0 / (2.0 * max_rate)  # cutoff (cycles/sample at the up-rate)
    h = (2.0 * f_c * up) * np.sinc(2.0 * f_c * n) * np.kaiser(2 * half + 1, beta)
    n_in = len(x)
    n_out = -(-n_in * up // down)
    taps = 2 * half // up + 1  # input samples under the filter support
    # polyphase: y[j] = Σ_m H[m, r_j]·xp[kmax_j − m], with kmax_j =
    # ⌊(j·down + half)/up⌋ and phase r_j = (j·down + half) mod up. Pad h to
    # taps·up (≥ 2·half+1) so every (m, r) pair indexes real filter mass or
    # an explicit zero; outputs sharing a phase form arithmetic progressions
    # (j += up ⇒ kmax += down), so each phase is one strided matvec.
    hp = np.zeros(taps * up, dtype=np.float64)
    hp[: 2 * half + 1] = h
    H = hp.reshape(taps, up).astype(np.float32)
    xp = np.pad(x, (taps, taps))
    win = np.lib.stride_tricks.sliding_window_view(xp, taps)
    out = np.empty(n_out, dtype=np.float32)
    for j0 in range(min(up, n_out)):
        pos = j0 * down + half
        kmax, r = divmod(pos, up)
        js = np.arange(j0, n_out, up)
        q = kmax + (js - j0) // up * down
        # Σ_m H[m, r]·xp[q − m + taps]  ==  win[q + 1] @ H[::-1, r]
        out[js] = win[q + 1] @ H[::-1, r]
    return out


def host_cache_dir(base: str = "/root/repo/.jax_cache") -> str:
    """Persistent-compile-cache dir keyed by a host fingerprint.

    XLA:CPU AOT executables embed the compile machine's CPU feature set;
    loading them on a different host spams cpu_aot_loader errors and risks
    SIGILL (this burned the round-4 multichip artifact: the driver machine
    loaded a cache compiled on the builder machine). Keying the directory
    by cpuinfo flags + jaxlib version makes a foreign cache invisible
    instead of poisonous."""
    import hashlib
    import os
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = line.strip()
                    break
    except OSError:
        flags = platform.processor()
    try:
        import jaxlib

        jl = jaxlib.__version__
    except Exception:
        jl = "?"
    key = f"{flags}|{jl}|{platform.machine()}"
    h = hashlib.sha256(key.encode()).hexdigest()[:12]
    return os.path.join(base, h)
