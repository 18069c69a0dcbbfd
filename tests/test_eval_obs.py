"""Eval metrics + observability unit tests."""

import os

import numpy as np

from styletts2_tpu.eval import f0_metrics, mcd, mfcc_from_wav
from styletts2_tpu.observability import MetricsWriter, StepTimer, get_logger, nan_check
from styletts2_tpu.utils import read_wav, write_wav


def test_mcd_zero_for_identical(rng):
    wav = rng.standard_normal(24000).astype(np.float32) * 0.1
    assert mcd(wav, wav) < 1e-4
    other = rng.standard_normal(24000).astype(np.float32) * 0.1
    assert mcd(wav, other) > 0.5


def test_mcd_dtw_handles_length_mismatch(rng):
    wav = rng.standard_normal(12000).astype(np.float32) * 0.1
    stretched = np.repeat(wav, 2)[:18000]
    v = mcd(wav, stretched)
    assert np.isfinite(v)


def test_dtw_native_matches_numpy_fallback(rng):
    """Native C++ DTW (native/dtw.cpp) returns the same optimal path cost as
    the numpy DP, on sequences long enough to be unusable for the old
    pure-Python loop; banded mode stays close to unbanded."""
    from styletts2_tpu.eval import _dtw_path, _dtw_path_numpy, _load_dtw_native

    a = rng.standard_normal((400, 12)).astype(np.float32)
    b = np.repeat(a, 2, axis=0)[::3][:260] + 0.01 * rng.standard_normal(
        (260, 12)
    ).astype(np.float32)
    dist = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)

    ia, ib = _dtw_path(a, b)
    assert (np.diff(ia) >= 0).all() and (np.diff(ib) >= 0).all()
    assert ia[0] == 0 and ib[0] == 0 and ia[-1] == len(a) - 1 and ib[-1] == len(b) - 1
    cost = dist[ia, ib].sum()

    ja, jb = _dtw_path_numpy(dist)
    ref_cost = dist[ja, jb].sum()
    np.testing.assert_allclose(cost, ref_cost, rtol=1e-5)

    if _load_dtw_native() is not None:
        ba, bb = _dtw_path(a, b, band=80)
        assert dist[ba, bb].sum() <= ref_cost * 1.05  # band barely hurts


def test_f0_metrics():
    a = np.asarray([0.0, 120.0, 130.0, 0.0, 140.0])
    b = np.asarray([0.0, 125.0, 130.0, 5.0, 150.0])
    m = f0_metrics(a, b)
    assert m["vuv_accuracy"] == 1.0  # 5 Hz below threshold counts unvoiced
    assert 0 < m["f0_rmse_hz"] < 11


def test_wav_roundtrip(tmp_path, rng):
    wav = (rng.standard_normal(2400) * 0.2).astype(np.float32)
    p = str(tmp_path / "x.wav")
    write_wav(p, wav, 24000)
    back, sr = read_wav(p)
    assert sr == 24000
    np.testing.assert_allclose(back, np.clip(wav, -1, 1), atol=1e-3)


def test_metrics_writer_and_timer(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.scalars({"train/mel": 1.5}, step=3)
    w.close()
    assert os.path.exists(tmp_path / "metrics.jsonl")
    t = StepTimer()
    t.start()
    dt = t.stop()
    assert dt >= 0 and t.avg is not None
    logger = get_logger(str(tmp_path))
    logger.info("hello")
    assert os.path.exists(tmp_path / "train.log")


def test_nan_check():
    import jax.numpy as jnp

    good = {"a": jnp.ones(3)}
    bad = {"a": jnp.asarray([1.0, np.nan])}
    assert nan_check(good)
    assert not nan_check(bad)
