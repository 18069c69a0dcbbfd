"""Helpers to import modules from the in-repo torch reference
(/root/reference) for parity testing, without copying any reference code.

The reference imports a few packages absent from this image (torchaudio,
munch, monotonic_align); lightweight stubs are installed where the imported
functionality is not itself under test.
"""

from __future__ import annotations

import importlib.machinery
import importlib.util
import sys
import types

REF = "/root/reference"


class Munch(dict):
    """Attribute-access dict standing in for the `munch` package (only the
    behavior the reference actually uses: attr get/set + dict init)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


def _mk_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    # transformers probes optional deps via importlib.util.find_spec, which
    # raises ValueError on a module whose __spec__ is None — give stubs one
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def recursive_munch(d):
    """utils.py:63-69 semantics for building reference model args."""
    if isinstance(d, dict):
        return Munch((k, recursive_munch(v)) for k, v in d.items())
    if isinstance(d, list):
        return [recursive_munch(v) for v in d]
    return d


def _ensure_stubs():
    if "munch" not in sys.modules:
        m = _mk_module("munch")
        m.Munch = Munch
        sys.modules["munch"] = m
    if "einops_exts" not in sys.modules:
        from einops import rearrange

        ee = _mk_module("einops_exts")

        def rearrange_many(tensors, pattern, **kwargs):
            return tuple(rearrange(t, pattern, **kwargs) for t in tensors)

        ee.rearrange_many = rearrange_many
        sys.modules["einops_exts"] = ee
    if "torchaudio" not in sys.modules:
        import torch

        ta = _mk_module("torchaudio")
        tr = _mk_module("torchaudio.transforms")
        fn = _mk_module("torchaudio.functional")

        class MelSpectrogram(torch.nn.Module):
            """Minimal torchaudio.transforms.MelSpectrogram: slaney-scale
            HTK-free mel filterbank + reflect-pad STFT power spectrogram,
            matching torchaudio defaults (power=2, center=True, norm=None,
            mel_scale='htk', f_min=0, f_max=sr/2)."""

            def __init__(
                self,
                sample_rate=16000,
                n_fft=400,
                win_length=None,
                hop_length=None,
                n_mels=128,
                **kw,
            ):
                super().__init__()
                self.sample_rate = sample_rate
                self.n_fft = n_fft
                self.win_length = win_length or n_fft
                self.hop_length = hop_length or self.win_length // 2
                self.n_mels = n_mels

                import numpy as np

                def hz_to_mel(f):
                    return 2595.0 * np.log10(1.0 + f / 700.0)

                def mel_to_hz(m):
                    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

                f_max = sample_rate / 2.0
                m_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(f_max), n_mels + 2)
                f_pts = mel_to_hz(m_pts)
                bins = np.linspace(0, sample_rate / 2, n_fft // 2 + 1)
                fb = np.zeros((n_fft // 2 + 1, n_mels), dtype=np.float32)
                for i in range(n_mels):
                    lo, ctr, hi = f_pts[i], f_pts[i + 1], f_pts[i + 2]
                    up = (bins - lo) / max(ctr - lo, 1e-10)
                    down = (hi - bins) / max(hi - ctr, 1e-10)
                    fb[:, i] = np.maximum(0.0, np.minimum(up, down))
                self.register_buffer("fb", torch.from_numpy(fb))
                self.register_buffer(
                    "window", torch.hann_window(self.win_length)
                )

            def forward(self, wav):
                spec = torch.stft(
                    wav,
                    n_fft=self.n_fft,
                    hop_length=self.hop_length,
                    win_length=self.win_length,
                    window=self.window,
                    center=True,
                    pad_mode="reflect",
                    return_complex=True,
                )
                power = spec.real**2 + spec.imag**2
                return torch.matmul(self.fb.T, power)

        def create_dct(n_mfcc, n_mels, norm=None):
            """torchaudio.functional.create_dct: (n_mels, n_mfcc) DCT-II
            basis, applied as mel @ dct."""
            import numpy as np

            n = np.arange(n_mels)[:, None]
            k = np.arange(n_mfcc)[None, :]
            dct = np.cos(np.pi / n_mels * (n + 0.5) * k)
            if norm == "ortho":
                dct *= np.sqrt(2.0 / n_mels)
                dct[:, 0] *= 1.0 / np.sqrt(2.0)
            else:
                dct *= 2.0
            return torch.from_numpy(dct.astype(np.float32))

        tr.MelSpectrogram = MelSpectrogram
        fn.create_dct = create_dct
        ta.transforms = tr
        ta.functional = fn
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tr
        sys.modules["torchaudio.functional"] = fn


_cache = {}


def load_ref_module(name: str, relpath: str):
    """Load a reference module by file path under a private name (no
    sys.path pollution); package-internal imports resolve via sys.path
    insertion of the reference root for the duration of the exec."""
    if name in _cache:
        return _cache[name]
    _ensure_stubs()
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    added = REF not in sys.path
    if added:
        sys.path.insert(0, REF)
    try:
        spec.loader.exec_module(mod)
    finally:
        if added:
            sys.path.remove(REF)
    _cache[name] = mod
    return mod
