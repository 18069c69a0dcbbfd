"""Checkpoint save/load round trip + stage-handoff filter semantics."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from styletts2_tpu.train.state import (
    TrainState,
    apply_module_updates,
    find_latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
    save_checkpoint_async,
    wait_for_saves,
)


def make_state():
    variables = {
        "decoder": {"params": {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}},
        "predictor": {"params": {"w": jnp.full((3,), 2.0)},
                      "spectral": {"u": jnp.ones(3)}},
    }
    txs = {k: optax.adamw(1e-3) for k in variables}
    return TrainState.create(variables, txs)


def test_checkpoint_roundtrip(tmp_path):
    st = make_state()
    st.step, st.epoch, st.sigma_data = 7, 3, 0.33
    p = str(tmp_path / "ck.ckpt")
    save_checkpoint(p, st)

    st2 = make_state()
    st2 = load_checkpoint(p, st2, load_only_params=False)
    assert st2.step == 7 and st2.epoch == 3 and abs(st2.sigma_data - 0.33) < 1e-9
    np.testing.assert_allclose(np.asarray(st2.params["predictor"]["w"]), 2.0)
    np.testing.assert_allclose(np.asarray(st2.extras["predictor"]["spectral"]["u"]), 1.0)


def test_checkpoint_ignore_modules(tmp_path):
    st = make_state()
    st.params["decoder"]["w"] = jnp.full((4, 4), 9.0)
    p = str(tmp_path / "ck.ckpt")
    save_checkpoint(p, st)
    st2 = make_state()
    st2 = load_checkpoint(p, st2, load_only_params=True, ignore_modules=("decoder",))
    # decoder skipped, predictor loaded
    np.testing.assert_allclose(np.asarray(st2.params["decoder"]["w"]), 1.0)
    assert st2.step == 0


def test_async_save_and_auto_resume_scan(tmp_path):
    """Async saves land atomically; find_latest_checkpoint picks the highest
    epoch and ignores tmp/partial files (SURVEY.md §5 recovery target)."""
    st = make_state()
    st.epoch = 2
    save_checkpoint_async(str(tmp_path / "epoch_1st_00002.ckpt"), st)
    st.epoch = 5
    st.params["predictor"]["w"] = jnp.full((3,), 7.0)
    save_checkpoint_async(str(tmp_path / "epoch_1st_00005.ckpt"), st)
    (tmp_path / "epoch_1st_00009.ckpt.tmp").write_bytes(b"partial")
    wait_for_saves()

    latest = find_latest_checkpoint(str(tmp_path), "epoch_1st_")
    assert latest is not None and latest.endswith("epoch_1st_00005.ckpt")
    st2 = load_checkpoint(latest, make_state())
    assert st2.epoch == 5
    np.testing.assert_allclose(np.asarray(st2.params["predictor"]["w"]), 7.0)
    assert find_latest_checkpoint(str(tmp_path / "nope"), "epoch_1st_") is None


def test_frozen_wavlm_not_checkpointed(tmp_path):
    """Frozen SLM params are never serialized (the reference reloads WavLM
    from the HF hub every run; saving it adds ~1.2 GB per epoch file), and
    load keeps the live copy for modules absent from the payload."""
    import pickle

    st = make_state()
    st.params["wavlm"] = {"w": jnp.full((2,), 5.0)}
    p = str(tmp_path / "ck.ckpt")
    save_checkpoint(p, st)
    with open(p, "rb") as f:
        payload = pickle.load(f)
    assert "wavlm" not in payload["net"]

    st2 = make_state()
    st2.params["wavlm"] = {"w": jnp.full((2,), 7.0)}
    st2 = load_checkpoint(p, st2)
    np.testing.assert_allclose(np.asarray(st2.params["wavlm"]["w"]), 7.0)
    np.testing.assert_allclose(np.asarray(st2.params["predictor"]["w"]), 2.0)


def test_selective_module_updates():
    st = make_state()
    grads = {
        "decoder": jax.tree.map(jnp.ones_like, st.params["decoder"]),
        "predictor": jax.tree.map(jnp.ones_like, st.params["predictor"]),
    }
    new_p, new_o = apply_module_updates(
        st.params, st.opt_states, grads, st.txs, ("decoder",)
    )
    assert not np.allclose(np.asarray(new_p["decoder"]["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(new_p["predictor"]["w"]), 2.0)
