"""bf16 mixed-precision training (train/mp.py): one stage-1 TMA step with
`mixed_precision: bf16` must track the f32 step's losses within bf16
tolerance and still produce f32 master weights/optimizer state.

The reference's counterpart is the fp16 accelerate finetune driver
(/root/reference/train_finetune_accelerate.py:33-35,245-249)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from styletts2_tpu.train.mp import BF16_MODULES, cast_module_params, cast_tree
from styletts2_tpu.train.stage1 import Stage1Trainer


def _setup(mp: str):
    from styletts2_tpu.parallel.tiny import (
        synthetic_batch,
        tiny_config,
        tiny_training_setup,
    )

    cfg = tiny_config()
    cfg.loss_params.TMA_epoch = 0
    cfg.mixed_precision = mp
    models, state = tiny_training_setup(cfg)
    batch = synthetic_batch(np.random.default_rng(0), 2)
    return cfg, models, state, batch


def test_cast_helpers_noop_when_disabled():
    p = {"decoder": {"w": jnp.ones((2, 2))}, "bert": {"w": jnp.ones(3)}}
    assert cast_module_params(p, False) is p
    c = cast_module_params(p, True)
    assert c["decoder"]["w"].dtype == jnp.bfloat16
    assert c["bert"]["w"].dtype == jnp.float32  # not a BF16 module
    back = cast_tree(c["decoder"], jnp.float32)
    assert back["w"].dtype == jnp.float32


@pytest.mark.slow
def test_stage1_bf16_step_tracks_f32():
    _, _, state_f, batch = _setup("")
    cfg_f, models_f, state_f, _ = _setup("")
    tr_f = Stage1Trainer(cfg_f, models_f, state_f)
    rng = np.random.default_rng(3)
    m_f = tr_f.train_step(batch, epoch=1, rng=rng)

    cfg_m, models_m, state_m, _ = _setup("bf16")
    tr_m = Stage1Trainer(cfg_m, models_m, state_m)
    rng = np.random.default_rng(3)  # same clip starts / coins / keys
    m_m = tr_m.train_step(batch, epoch=1, rng=rng)

    assert m_f is not None and m_m is not None
    for k in ("g_loss", "mel", "s2s", "mono", "gen", "slm", "d_loss"):
        assert np.isfinite(m_m[k]), k
        # bf16 has ~3 decimal digits; GAN/feature-matching terms compound
        # rounding, so the bound is loose but catches wiring errors (a wrong
        # cast shows up orders of magnitude off or non-finite)
        rel = abs(m_m[k] - m_f[k]) / max(abs(m_f[k]), 1e-3)
        assert rel < 0.15, (k, m_m[k], m_f[k])

    # master weights and optimizer state stayed f32
    for mod in BF16_MODULES:
        if mod not in tr_m.state.params:
            continue
        for leaf in jax.tree.leaves(tr_m.state.params[mod]):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.float32, mod
