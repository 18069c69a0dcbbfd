"""DSP parity tests: STFT/iSTFT vs torch.stft/istft, mel filterbank math,
round-trips, and log-norm semantics (reference meldataset.py:49-66, utils.py:48)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import styletts2_tpu.ops.stft as S


def test_hann_window_matches_torch():
    for n in (20, 1200):
        ours = S.hann_window(n)
        ref = torch.hann_window(n, periodic=True).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize(
    "n_fft,hop,win", [(2048, 300, 1200), (20, 5, 20), (1024, 120, 600)]
)
def test_stft_matches_torch(rng, n_fft, hop, win):
    x = rng.standard_normal(4096).astype(np.float32)
    ours = np.asarray(S.stft(jnp.asarray(x[None]), n_fft, hop, win))[0]
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft,
        hop,
        win,
        window=torch.hann_window(win),
        return_complex=True,
    ).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours.real, ref.real, atol=2e-3)
    np.testing.assert_allclose(ours.imag, ref.imag, atol=2e-3)


def test_istft_matches_torch(rng):
    # The vocoder-head configuration: n_fft 20, hop 5 (istftnet.py:347)
    n_fft, hop, win = 20, 5, 20
    x = rng.standard_normal(2000).astype(np.float32)
    spec = torch.stft(
        torch.from_numpy(x), n_fft, hop, win,
        window=torch.hann_window(win), return_complex=True,
    )
    mag, ph = spec.abs().numpy(), spec.angle().numpy()
    ours = np.asarray(
        S.istft(jnp.asarray(mag[None]), jnp.asarray(ph[None]), n_fft, hop, win)
    )[0]
    ref = torch.istft(
        torch.polar(torch.from_numpy(mag), torch.from_numpy(ph)),
        n_fft, hop, win, window=torch.hann_window(win),
    ).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_stft_istft_roundtrip(rng):
    n_fft, hop, win = 20, 5, 20
    x = rng.standard_normal(1000).astype(np.float32)
    mag, ph = S.stft_magphase(jnp.asarray(x[None]), n_fft, hop, win)
    y = np.asarray(S.istft(mag, ph, n_fft, hop, win))[0]
    # center-trimmed reconstruction matches interior of the input
    n = min(len(x), len(y))
    np.testing.assert_allclose(y[50 : n - 50], x[50 : n - 50], atol=1e-4)


def test_mel_filterbank_properties():
    fb = S.mel_filterbank(1025, 80, 16000)
    assert fb.shape == (1025, 80)
    assert fb.min() >= 0.0
    # every filter has support and peaks at or below 1
    assert (fb.max(axis=0) > 0).all()
    assert fb.max() <= 1.0 + 1e-6
    # filter peak positions strictly increase
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) > 0).all()
    # htk mel scale: reimplement independently and compare a sample filter
    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel2hz(m):
        return 700.0 * (10 ** (m / 2595.0) - 1.0)

    pts = mel2hz(np.linspace(hz2mel(0.0), hz2mel(8000.0), 82))
    freqs = np.linspace(0, 8000, 1025)
    # check the 40th filter's rising edge analytically
    m = 40
    k = np.searchsorted(freqs, pts[m + 1]) - 1
    expected = (freqs[k] - pts[m]) / (pts[m + 1] - pts[m])
    np.testing.assert_allclose(fb[k, m], expected, atol=1e-4)


def test_preprocess_mel_shapes(rng):
    wav = rng.standard_normal(24000).astype(np.float32)
    mel = np.asarray(S.preprocess_mel(jnp.asarray(wav[None])))
    assert mel.shape == (1, 80, 24000 // 300 + 1)
    assert np.isfinite(mel).all()


def test_log_norm(rng):
    x = rng.standard_normal((2, 80, 17)).astype(np.float32)
    ours = np.asarray(S.log_norm(jnp.asarray(x)))
    ref = torch.log(torch.exp(torch.from_numpy(x) * 4 + (-4)).norm(dim=1)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_overlap_add_general_path(rng):
    # hop that does not divide n_fft exercises the fallback
    frames = rng.standard_normal((2, 7, 10)).astype(np.float32)
    out = np.asarray(S.overlap_add(jnp.asarray(frames), 3))
    ref = np.zeros((2, 10 + 3 * 6), dtype=np.float32)
    for f in range(7):
        ref[:, f * 3 : f * 3 + 10] += frames[:, f]
    np.testing.assert_allclose(out, ref, atol=1e-5)
