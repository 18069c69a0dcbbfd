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
