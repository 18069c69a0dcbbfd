"""Stage-1 trainer smoke tests: one optimization step end-to-end on
synthetic batches (tiny model config), pre-TMA and TMA phases."""

import dataclasses

import jax
import numpy as np
import pytest

from styletts2_tpu.config import Config
from styletts2_tpu.data.meldataset import Batch
from styletts2_tpu.models.build import build_training_models, init_training_params
from styletts2_tpu.models.wavlm import WavLM
from styletts2_tpu.train.state import TrainState, build_module_optimizers
from styletts2_tpu.train.stage1 import Stage1Trainer


def make_setup():
    cfg = Config()
    cfg.plbert_params.num_hidden_layers = 1
    cfg.model_params.diffusion.transformer.num_layers = 1
    cfg.max_len = 80  # small clips for test speed
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
    txs = build_module_optimizers(cfg, opt_keys)
    state = TrainState.create(variables, txs)
    return cfg, models, state


def make_batch(rng, B=2, wav_len=27000, bucket=48000, T_text=12):
    waves = np.zeros((B, bucket), np.float32)
    wave_lengths = np.zeros(B, np.int32)
    mel_lengths = np.zeros(B, np.int32)
    for b in range(B):
        n = wav_len + b * 1500
        waves[b, :n] = rng.standard_normal(n).astype(np.float32) * 0.1
        wave_lengths[b] = n
        ml = n // 300 + 1
        mel_lengths[b] = ml - ml % 2
    tokens = np.zeros((B, 32), np.int32)
    tokens[:, :T_text] = rng.integers(4, 178, (B, T_text))
    input_lengths = np.full(B, T_text, np.int32)
    return Batch(
        waves=waves, wave_lengths=wave_lengths, tokens=tokens,
        input_lengths=input_lengths, ref_tokens=tokens, ref_lengths=input_lengths,
        mel_lengths=mel_lengths, ref_waves=waves[:, :24000].copy(),
        ref_wave_lengths=np.full(B, 24000, np.int32), speakers=np.zeros(B, np.int32),
    )


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
