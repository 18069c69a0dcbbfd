"""Stage-2 trainer smoke tests across phases (pre-diff, diffusion, joint+SLM)."""

import dataclasses

import jax
import numpy as np
import pytest

from styletts2_tpu.config import Config
from styletts2_tpu.models.build import build_training_models, init_training_params
from styletts2_tpu.models.wavlm import WavLM
from styletts2_tpu.train.stage2 import Stage2Trainer, soft_alignment
from styletts2_tpu.train.state import TrainState, build_module_optimizers
from tests.test_stage1 import make_batch

import jax.numpy as jnp


def make_setup():
    cfg = Config()
    cfg.plbert_params.num_hidden_layers = 1
    cfg.model_params.diffusion.transformer.num_layers = 1
    cfg.max_len = 80
    cfg.slmadv_params.min_len = 80
    cfg.slmadv_params.max_len = 120
    # tiny WavLM: keep the wd head dims consistent (hidden*nlayers)
    cfg.model_params.slm.hidden = 64
    cfg.model_params.slm.nlayers = 3
    models = build_training_models(cfg)
    models = dataclasses.replace(
        models, wavlm=WavLM(hidden=64, heads=2, intermediate=96, num_layers=2)
    )
    variables = init_training_params(models, jax.random.PRNGKey(0), cfg)
    opt_keys = [
        "bert", "bert_encoder", "predictor", "decoder", "text_encoder",
        "predictor_encoder", "style_encoder", "diffusion", "text_aligner",
        "pitch_extractor", "mpd", "msd", "wd",
    ]
    txs = build_module_optimizers(cfg, opt_keys, stage2=True)
    state = TrainState.create(variables, txs)
    return cfg, models, state


def test_soft_alignment_properties():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((2, 6, 50)) * 2, jnp.float32)
    lengths = jnp.asarray([6, 4])
    attn, total = soft_alignment(logits, lengths, 220)
    attn = np.asarray(attn)
    total = np.asarray(total)
    # frames within total form distributions over valid tokens
    for b, t in enumerate(total):
        t = min(int(t), 220)
        np.testing.assert_allclose(attn[b, :, :t].sum(axis=0), 1.0, atol=1e-4)
        assert np.allclose(attn[b, :, t:], 0.0)
    # invalid tokens get no mass
    assert np.allclose(attn[1, 4:, :], 0.0)


@pytest.mark.slow
def test_stage2_prediff_step():
    cfg, models, state = make_setup()
    cfg.loss_params.diff_epoch = 10
    cfg.loss_params.joint_epoch = 20
    trainer = Stage2Trainer(cfg, models, state)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    m = trainer.train_step(batch, epoch=0, iters=0, rng=rng)
    assert m is not None
    for k in ("g_loss", "mel", "F0", "ce", "dur", "norm", "slm"):
        assert np.isfinite(m[k]), (k, m)


@pytest.mark.slow
def test_stage2_diff_step():
    cfg, models, state = make_setup()
    cfg.loss_params.diff_epoch = 0
    cfg.loss_params.joint_epoch = 20
    trainer = Stage2Trainer(cfg, models, state)
    rng = np.random.default_rng(1)
    batch = make_batch(rng)
    m = trainer.train_step(batch, epoch=1, iters=0, rng=rng)
    assert m is not None
    for k in ("g_loss", "diff", "sty", "d_loss"):
        assert np.isfinite(m[k]), (k, m)
    assert 0.0 < trainer.state.sigma_data < 10.0


@pytest.mark.slow
def test_stage2_joint_slm_step():
    cfg, models, state = make_setup()
    cfg.loss_params.diff_epoch = 0
    cfg.loss_params.joint_epoch = 0
    trainer = Stage2Trainer(cfg, models, state)
    rng = np.random.default_rng(2)
    batch = make_batch(rng, wav_len=40000, bucket=48000)
    m = trainer.train_step(batch, epoch=1, iters=9, rng=rng)
    assert m is not None
    for k in ("g_loss", "slm_gen", "slm_d"):
        assert np.isfinite(m[k]), (k, m)
