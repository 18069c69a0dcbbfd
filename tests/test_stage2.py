"""Stage-2 trainer smoke tests across phases (pre-diff, diffusion, joint+SLM)."""

import jax
import numpy as np
import pytest

from styletts2_tpu.train.stage2 import Stage2Trainer, soft_alignment
from tests.test_stage1 import make_batch

import jax.numpy as jnp


def make_setup():
    """Shrunk-width full-structure setup shared with the multi-chip dryrun
    (parallel/dryrun.py) — same programs, shared persistent compile cache."""
    from styletts2_tpu.parallel.dryrun import tiny_config, tiny_training_setup

    cfg = tiny_config()
    models, state = tiny_training_setup(cfg, stage2=True)
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


def test_soft_alignment_matches_reference_conv1d():
    """Closed-form soft_alignment vs the reference's per-sample grouped
    conv1d (slmadv.py:57-85): raw-logit kernel weighting, Gaussian centres
    at l - loc, padding=l-1 support truncation, token softmax."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    B, T, D, sig = 2, 5, 8, 1.5
    logits = rng.standard_normal((B, T, D)).astype(np.float32) * 1.5
    lengths = np.asarray([5, 3], np.int64)

    refs = []
    ls = []
    for b in range(B):
        _s2s_pred_org = torch.from_numpy(logits[b, : lengths[b], :])
        _s2s_pred = torch.sigmoid(_s2s_pred_org)
        _dur_pred = _s2s_pred.sum(axis=-1)
        l = int(torch.round(_s2s_pred.sum()).item())
        t = torch.arange(0, l).unsqueeze(0).expand((len(_s2s_pred), l))
        loc = torch.cumsum(_dur_pred, dim=0) - _dur_pred / 2
        h = torch.exp(-0.5 * torch.square(t - (l - loc.unsqueeze(-1))) / sig**2)
        out = F.conv1d(
            _s2s_pred_org.unsqueeze(0), h.unsqueeze(1),
            padding=h.shape[-1] - 1, groups=int(lengths[b]),
        )[..., :l]
        refs.append(F.softmax(out.squeeze(0), dim=0).numpy())
        ls.append(l)

    F_max = max(ls) + 4
    attn, total = soft_alignment(
        jnp.asarray(logits), jnp.asarray(lengths), F_max, sig=sig
    )
    attn = np.asarray(attn)
    for b in range(B):
        assert int(total[b]) == ls[b]
        np.testing.assert_allclose(
            attn[b, : lengths[b], : ls[b]], refs[b], atol=2e-5
        )
        assert np.allclose(attn[b, :, ls[b]:], 0.0)


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
    # spectral-norm u vectors were power-iterated this step (round-2 fix)
    import jax

    u0 = jax.tree.leaves(state.extras["style_encoder"]["spectral"])[0]
    assert np.asarray(u0).size > 0


@pytest.mark.slow
def test_stage2_joint_multispeaker_step():
    """LibriTTS-style multispeaker joint step: reference-feature diffusion
    conditioning (features=ref styles, train_second.py:322-330) + style
    blending paths exercised end-to-end in training (VERDICT round-1
    next-#10). Uses the shrunk widths from the dryrun config."""
    import dataclasses as _dc

    from styletts2_tpu.models.wavlm import WavLM
    from styletts2_tpu.parallel.dryrun import synthetic_batch, tiny_config
    from styletts2_tpu.models.build import build_training_models, init_training_params
    from styletts2_tpu.train.state import TrainState, build_module_optimizers

    cfg = tiny_config()
    cfg.model_params.multispeaker = True
    cfg.loss_params.diff_epoch = 0
    cfg.loss_params.joint_epoch = 0
    models = build_training_models(cfg)
    models = _dc.replace(
        models, wavlm=WavLM(hidden=64, heads=2, intermediate=96, num_layers=2)
    )
    variables = init_training_params(models, jax.random.PRNGKey(0), cfg)
    opt_keys = list(variables.keys())
    txs = build_module_optimizers(cfg, opt_keys, stage2=True)
    state = TrainState.create(variables, txs)
    trainer = Stage2Trainer(cfg, models, state)
    rng = np.random.default_rng(5)
    batch = synthetic_batch(rng, 2, wav_len=40000)
    m = trainer.train_step(batch, epoch=1, iters=9, rng=rng)
    assert m is not None
    assert m.get("_has_feats") == 1.0  # ref-feature conditioning active
    for k in ("g_loss", "diff", "sty", "slm_gen", "slm_d"):
        assert np.isfinite(m[k]), (k, m)
