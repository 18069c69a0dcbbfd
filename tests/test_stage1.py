"""Stage-1 trainer smoke tests: one optimization step end-to-end on
synthetic batches (tiny model config), pre-TMA and TMA phases."""

import jax
import numpy as np
import pytest

from styletts2_tpu.data.meldataset import Batch
from styletts2_tpu.train.stage1 import Stage1Trainer


def make_setup():
    """Shrunk-width full-structure setup shared with the multi-chip dryrun
    (parallel/dryrun.py) — same programs, shared persistent compile cache."""
    from styletts2_tpu.parallel.dryrun import tiny_config, tiny_training_setup

    cfg = tiny_config()
    models, state = tiny_training_setup(cfg)
    return cfg, models, state


def make_batch(rng, B=2, wav_len=27000, bucket=48000, T_text=12) -> Batch:
    from styletts2_tpu.parallel.dryrun import synthetic_batch

    return synthetic_batch(rng, B, wav_len=wav_len, bucket=bucket, T_text=T_text)


@pytest.mark.slow
def test_stage1_pre_tma_step():
    cfg, models, state = make_setup()
    trainer = Stage1Trainer(cfg, models, state)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    before = float(np.asarray(
        jax.tree.leaves(state.params["decoder"])[0]).sum())
    m = trainer.train_step(batch, epoch=0, rng=rng)
    assert m is not None
    assert np.isfinite(m["g_loss"]) and np.isfinite(m["mel"])
    after = float(np.asarray(
        jax.tree.leaves(trainer.state.params["decoder"])[0]).sum())
    assert before != after  # decoder actually updated
    # validation path
    v = trainer.validate(batch, rng)
    assert v is None or np.isfinite(v)


@pytest.mark.slow
def test_stage1_tma_step():
    cfg, models, state = make_setup()
    cfg.loss_params.TMA_epoch = 0
    trainer = Stage1Trainer(cfg, models, state)
    rng = np.random.default_rng(1)
    batch = make_batch(rng)
    m = trainer.train_step(batch, epoch=1, rng=rng)
    assert m is not None
    for k in ("g_loss", "mel", "s2s", "mono", "gen", "slm", "d_loss"):
        assert np.isfinite(m[k]), k
