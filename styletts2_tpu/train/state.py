"""Training state: per-module optimizers, selective stepping, checkpoints.

Reference semantics: optimizers.py — one AdamW(lr, betas (0.0, 0.99),
eps 1e-9, weight_decay 1e-4) *per module key*, with OneCycleLR configured to
div_factor=1/final_div_factor=1/pct_start≈0, i.e. effectively constant lr;
stage 2 overrides bert (bert_lr, betas (0.9, 0.99), wd 0.01) and
decoder/style_encoder (ft_lr) (train_second.py:186-208). The reference's
`optimizer.step(key)` call pattern becomes a per-module update gate: every
module's grads are computed in one backward, and a boolean gate decides
whether its optax update applies this step — the structural fix for the
reference's broken stage-2 DDP (README.md:20; SURVEY.md §5).

Checkpoints: flax.serialization msgpack of {params, extras, opt_states,
step, epoch, sigma_data} keyed per module — the pytree analog of the
reference's {net: {key: state_dict}, optimizer, iters, epoch}
(models.py:696-713, train_first.py:416-440).
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from styletts2_tpu.config import Config


def make_optimizer(lr: float, b1: float = 0.0, b2: float = 0.99, wd: float = 1e-4):
    return optax.adamw(lr, b1=b1, b2=b2, eps=1e-9, weight_decay=wd)


def build_module_optimizers(cfg: Config, module_keys, stage2: bool = False):
    """Per-module optax transforms mirroring build_optimizer + stage-2
    overrides."""
    op = cfg.optimizer_params
    txs = {}
    for k in module_keys:
        if stage2 and k == "bert":
            txs[k] = make_optimizer(op.bert_lr, b1=0.9, b2=0.99, wd=0.01)
        elif stage2 and k in ("decoder", "style_encoder"):
            txs[k] = make_optimizer(op.ft_lr)
        else:
            txs[k] = make_optimizer(op.lr)
    return txs


@dataclass
class TrainState:
    params: Dict[str, Any]  # {module: param tree} (the 'params' collections)
    extras: Dict[str, Any]  # {module: other collections (batch_stats, ...)}
    opt_states: Dict[str, Any]
    txs: Dict[str, Any] = field(repr=False)
    step: int = 0
    epoch: int = 0
    sigma_data: float = 0.2

    def variables(self, key: str) -> Dict[str, Any]:
        return {"params": self.params[key], **self.extras.get(key, {})}

    @staticmethod
    def create(variables: Dict[str, Any], txs: Dict[str, Any]) -> "TrainState":
        params = {k: v["params"] for k, v in variables.items()}
        extras = {
            k: {c: cc for c, cc in v.items() if c != "params"}
            for k, v in variables.items()
        }
        opt_states = {k: txs[k].init(params[k]) for k in txs}
        return TrainState(params, extras, opt_states, txs)


def apply_module_updates(state_params, opt_states, grads, txs, step_keys):
    """Apply per-module optax updates for modules in `step_keys` (a static
    set) — the jit-safe equivalent of selective optimizer.step(key) calls.
    The trainers pick step_keys from the epoch phase on the host (TMA /
    diff / joint gating), so each phase compiles once."""
    new_params, new_opt = dict(state_params), dict(opt_states)
    for k in step_keys:
        if k not in txs or k not in grads or grads[k] is None:
            continue
        updates, opt_k = txs[k].update(grads[k], opt_states[k], state_params[k])
        new_params[k] = optax.apply_updates(state_params[k], updates)
        new_opt[k] = opt_k
    return new_params, new_opt


FROZEN_MODULES = ("wavlm",)  # never checkpointed: the reference reloads the
# frozen SLM from the HF hub every run (models.py:583-589 load path has no
# wavlm entry) and its random/pretrained params add ~1.2 GB per epoch file


def _snapshot_payload(state: TrainState, extra_meta: Optional[dict]) -> dict:
    """Device→host snapshot of the full train state (the only part that must
    happen synchronously for an async save to be consistent). Frozen modules
    (FROZEN_MODULES) are dropped — load_checkpoint keeps the live copy for
    any module absent from the payload."""
    payload = {
        "net": serialization.to_state_dict(
            {k: v for k, v in state.params.items() if k not in FROZEN_MODULES}
        ),
        "extras": serialization.to_state_dict(
            {k: v for k, v in state.extras.items() if k not in FROZEN_MODULES}
        ),
        "opt": serialization.to_state_dict(
            jax.tree.map(lambda x: np.asarray(x), state.opt_states)
        ),
        "step": state.step,
        "epoch": state.epoch,
        "sigma_data": state.sigma_data,
        "meta": extra_meta or {},
    }
    return jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, payload
    )


def _write_payload(path: str, payload: dict):
    """Atomic write: tmp file + rename, so a crash mid-save never leaves a
    truncated checkpoint where auto-resume would find it."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def save_checkpoint(path: str, state: TrainState, extra_meta: Optional[dict] = None):
    _write_payload(path, _snapshot_payload(state, extra_meta))


_save_executor = None
_pending_saves: list = []


def save_checkpoint_async(path: str, state: TrainState,
                          extra_meta: Optional[dict] = None):
    """Orbax-style async save (SURVEY.md §5): snapshot to host numpy now
    (cheap device→host copies), serialize + write on a background thread so
    training never stalls on disk. Call wait_for_saves() before relying on
    the file (the drivers do at stage end)."""
    global _save_executor
    if _save_executor is None:
        from concurrent.futures import ThreadPoolExecutor

        _save_executor = ThreadPoolExecutor(max_workers=1,
                                            thread_name_prefix="ckpt_save")
    payload = _snapshot_payload(state, extra_meta)
    fut = _save_executor.submit(_write_payload, path, payload)
    _pending_saves.append((path, fut))
    # opportunistically surface completed-save failures
    for p, f in list(_pending_saves):
        if f.done():
            _pending_saves.remove((p, f))
            exc = f.exception()
            if exc is not None:
                import logging

                logging.getLogger("styletts2_tpu").error(
                    "async checkpoint save to %s failed: %s", p, exc
                )
    return fut


def wait_for_saves():
    """Block until all async checkpoint writes have landed; re-raise the
    first failure."""
    while _pending_saves:
        p, f = _pending_saves.pop(0)
        f.result()


def find_latest_checkpoint(log_dir: str, prefix: str) -> Optional[str]:
    """Auto-resume support: newest `{prefix}NNNNN.ckpt` in log_dir by epoch
    number (SURVEY.md §5 failure-recovery target — a crashed run restarts
    from the latest epoch without flags)."""
    import re

    if not os.path.isdir(log_dir):
        return None
    best, best_n = None, -1
    pat = re.compile(re.escape(prefix) + r"(\d+)\.ckpt$")
    for name in os.listdir(log_dir):
        m = pat.match(name)
        if m and int(m.group(1)) > best_n:
            best, best_n = name, int(m.group(1))
    return os.path.join(log_dir, best) if best else None


def load_checkpoint(
    path: str,
    state: TrainState,
    load_only_params: bool = False,
    ignore_modules: tuple = (),
) -> TrainState:
    """Reference load_checkpoint parity (models.py:696-713): per-module load
    with skip list; optionally restore step/epoch/optimizer."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    params = dict(state.params)
    extras = dict(state.extras)
    for k in params:
        if k in payload["net"] and k not in ignore_modules:
            params[k] = serialization.from_state_dict(state.params[k], payload["net"][k])
            if k in payload.get("extras", {}) and k in extras:
                extras[k] = serialization.from_state_dict(extras[k], payload["extras"][k])
    new = TrainState(params, extras, state.opt_states, state.txs,
                     step=state.step, epoch=state.epoch, sigma_data=state.sigma_data)
    if not load_only_params:
        new.step = int(payload.get("step", 0))
        new.epoch = int(payload.get("epoch", 0))
        new.sigma_data = float(payload.get("sigma_data", 0.2))
        try:
            new.opt_states = serialization.from_state_dict(
                state.opt_states, payload["opt"]
            )
        except Exception as e:
            # a silently-skipped restore would resume with fresh Adam moments
            # — a training-dynamics regression that's nearly impossible to
            # notice downstream, so make it loud
            import logging

            logging.getLogger("styletts2_tpu").warning(
                "optimizer-state restore from %s failed (%s: %s); continuing "
                "with freshly initialized optimizer moments",
                path, type(e).__name__, e,
            )
    return new
