"""Training drivers: the CLI entry points mirroring the reference scripts.

  python -m styletts2_tpu.train.run first    --config_path configs/config.yml
  python -m styletts2_tpu.train.run second   --config_path configs/config.yml
  python -m styletts2_tpu.train.run finetune --config_path configs/config_ft.yml

Reference parity: train_first.py / train_second.py / train_finetune.py CLI
(`--config_path` only, train_first.py:41-43), config copied into log_dir,
epoch loop with validation + checkpoint saves every save_freq epochs, stage
handoff (stage 2 loads first_stage.pth ignoring predictor/bert/diffusion/
discriminators and seeds predictor_encoder from style_encoder,
train_second.py:146-157), estimated sigma_data written back into the config
copy (train_second.py:784-789).
"""

from __future__ import annotations

import argparse
import copy
import os
import shutil

import jax
import numpy as np
import yaml

from styletts2_tpu.config import Config, load_config
from styletts2_tpu.data.meldataset import build_dataloader
from styletts2_tpu.models.build import build_training_models, init_training_params
from styletts2_tpu.observability import (
    MetricsWriter,
    StepTimer,
    get_logger,
    nan_check,
)
from styletts2_tpu.train.state import (
    TrainState,
    build_module_optimizers,
    find_latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
    save_checkpoint_async,
    wait_for_saves,
)

MODULE_KEYS = [
    "bert", "bert_encoder", "predictor", "decoder", "text_encoder",
    "predictor_encoder", "style_encoder", "diffusion", "text_aligner",
    "pitch_extractor", "mpd", "msd", "wd",
]


def setup(config_path: str, stage: str):
    cfg = load_config(config_path)
    log_dir = cfg.log_dir
    os.makedirs(log_dir, exist_ok=True)
    shutil.copy(config_path, os.path.join(log_dir, os.path.basename(config_path)))
    logger = get_logger(log_dir)
    writer = MetricsWriter(log_dir)

    train_loader = build_dataloader(
        cfg.data_params.train_data, cfg.data_params.root_path,
        shard_across_processes=True,  # no-op single-host; disjoint per-host
        # slices on pod slices (SURVEY.md §7.1)
        ood_path=cfg.data_params.OOD_data, min_length=cfg.data_params.min_length,
        batch_size=cfg.batch_size, validation=False,
    )
    val_loader = build_dataloader(
        cfg.data_params.val_data, cfg.data_params.root_path,
        ood_path=cfg.data_params.OOD_data, min_length=cfg.data_params.min_length,
        batch_size=cfg.batch_size, validation=True,
    )

    models = build_training_models(cfg)
    variables = init_training_params(models, jax.random.PRNGKey(0), cfg)
    # pretrained utility models (ASR aligner / JDC / PL-BERT), converted from
    # the reference torch checkpoints when present (models.py:584-612)
    from styletts2_tpu import convert

    for path, fn, key in (
        (cfg.ASR_path, getattr(convert, "convert_asr", None), "text_aligner"),
        (cfg.F0_path, getattr(convert, "convert_jdc", None), "pitch_extractor"),
    ):
        if fn is not None and path and os.path.exists(path):
            try:
                import torch

                sd = torch.load(path, map_location="cpu")
                sd = sd.get("model", sd.get("net", sd))
                variables[key] = fn({k: v.numpy() for k, v in sd.items()})
                logger.info(f"loaded pretrained {key} from {path}")
            except Exception as e:  # pragma: no cover
                logger.warning(f"could not load {key} from {path}: {e}")

    # PL-BERT pretrained checkpoint (Utils/PLBERT/step_*.t7, util.py:15-42)
    if cfg.PLBERT_dir and os.path.isdir(cfg.PLBERT_dir):
        try:
            import torch

            ckpts = sorted(
                f for f in os.listdir(cfg.PLBERT_dir) if f.startswith("step_")
            )
            if ckpts:
                sd = torch.load(
                    os.path.join(cfg.PLBERT_dir, ckpts[-1]), map_location="cpu"
                )["net"]
                sd = {
                    k[7:]: v for k, v in sd.items() if k.startswith("module.")
                }
                sd = {
                    (k[8:] if k.startswith("encoder.") else k): v.numpy()
                    for k, v in sd.items()
                }
                variables["bert"] = convert.convert_albert(sd)
                logger.info(f"loaded PL-BERT from {ckpts[-1]}")
        except Exception as e:  # pragma: no cover
            logger.warning(f"could not load PL-BERT: {e}")

    # frozen WavLM (microsoft/wavlm-base-plus) for the SLM losses
    try:
        from transformers import WavLMModel

        try:  # cached weights load instantly and need no network
            ref = WavLMModel.from_pretrained(
                cfg.model_params.slm.model, local_files_only=True
            )
        except Exception:
            # only hit the hub if DNS resolves quickly — an airgapped host
            # otherwise burns ~70 s in HTTP retries before falling back
            import socket

            socket.setdefaulttimeout(3.0)
            try:
                socket.getaddrinfo("huggingface.co", 443)
            finally:
                socket.setdefaulttimeout(None)
            ref = WavLMModel.from_pretrained(cfg.model_params.slm.model)
        variables["wavlm"] = convert.convert_wavlm(
            {k: v.numpy() for k, v in ref.state_dict().items()}
        )
        logger.info("loaded WavLM weights")
    except Exception as e:  # pragma: no cover
        logger.warning(
            f"WavLM weights unavailable ({type(e).__name__}); SLM losses use "
            "random features"
        )

    txs = build_module_optimizers(cfg, MODULE_KEYS, stage2=(stage != "first"))
    state = TrainState.create(variables, txs)
    state.sigma_data = cfg.model_params.diffusion.dist.sigma_data
    return cfg, models, state, train_loader, val_loader, logger, writer


def _auto_mesh(cfg, logger):
    """Data(-×tensor)-parallel mesh over all local devices when >1 present —
    the declarative replacement for the reference's accelerate-DDP /
    MyDataParallel layer (train_first.py:49-50, train_second.py:35-40).
    Disable with STYLETTS2_TPU_MESH=0; set tensor-parallel width with
    STYLETTS2_TPU_MODEL_PARALLEL=k."""
    if os.environ.get("STYLETTS2_TPU_MESH", "1") == "0":
        return None
    n = jax.device_count()
    if n <= 1:
        return None
    mp = int(os.environ.get("STYLETTS2_TPU_MODEL_PARALLEL", "1"))
    from styletts2_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n, model_parallel=mp)
    dp = int(mesh.shape["data"])
    if cfg.batch_size % dp != 0:
        logger.warning(
            f"batch_size {cfg.batch_size} not divisible by data axis {dp}; "
            "running single-device"
        )
        return None
    logger.info(f"mesh: {dict(mesh.shape)} over {n} devices")
    return mesh


def run_stage(stage: str, config_path: str, max_steps: int | None = None):
    cfg, models, state, train_loader, val_loader, logger, writer = setup(
        config_path, stage
    )
    log_dir = cfg.log_dir
    mesh = _auto_mesh(cfg, logger)

    if stage == "first":
        ckpt_fmt = "epoch_1st_{:05d}.ckpt"
    elif stage == "second":
        ckpt_fmt = "epoch_2nd_{:05d}.ckpt"
    else:
        ckpt_fmt = "epoch_ft_{:05d}.ckpt"

    # auto-resume: a crashed run restarts from the latest epoch checkpoint
    # of ITS OWN stage without any flags (SURVEY.md §5 recovery target;
    # upgrades the reference's explicit-path-only resume, models.py:696-713)
    latest = find_latest_checkpoint(log_dir, ckpt_fmt.split("{")[0])
    if latest is not None:
        state = load_checkpoint(latest, state)
        logger.info(f"auto-resuming from {latest} (epoch {state.epoch})")

    if stage == "first":
        from styletts2_tpu.train.stage1 import Stage1Trainer

        trainer = Stage1Trainer(cfg, models, state, mesh=mesh)
        epochs = cfg.epochs_1st
    elif stage == "second":
        from styletts2_tpu.train.stage2 import Stage2Trainer

        first_path = os.path.join(log_dir, cfg.first_stage_path)
        if latest is None and os.path.exists(first_path):
            state = _load_first_stage(state, first_path, logger)
        trainer = Stage2Trainer(cfg, models, state, mesh=mesh)
        epochs = cfg.epochs_2nd
    else:
        from styletts2_tpu.train.finetune import FinetuneTrainer

        if latest is None and cfg.pretrained_model and os.path.exists(
            cfg.pretrained_model
        ):
            state = load_checkpoint(
                cfg.pretrained_model, state, load_only_params=cfg.load_only_params
            )
        trainer = FinetuneTrainer(cfg, models, state, mesh=mesh)
        epochs = cfg.epochs_2nd

    rng = np.random.default_rng(1)
    timer = StepTimer()
    # STYLETTS2_DEBUG_NAN=1: stop on the first non-finite step metric and
    # report which params/metrics went bad — the debug-mode replacement for
    # the reference's NaN set_trace hook (train_second.py:455-457). Off by
    # default: the check syncs metrics to host every step (they are fetched
    # for logging anyway, so the cost is an early stop, not extra work).
    debug_nan = os.environ.get("STYLETTS2_DEBUG_NAN") == "1"
    iters = 0
    for epoch in range(state.epoch, epochs):
        for i, batch in enumerate(train_loader):
            timer.start()
            if stage == "first":
                m = trainer.train_step(batch, epoch, rng)
            else:
                m = trainer.train_step(batch, epoch, iters, rng)
            dt = timer.stop()
            if m is None:
                continue
            if debug_nan and not nan_check(m, logger):
                bad_params = [
                    jax.tree_util.keystr(p)
                    for p, x in jax.tree_util.tree_flatten_with_path(
                        trainer.state.params
                    )[0]
                    if not bool(np.all(np.isfinite(np.asarray(x))))
                ]
                logger.error(
                    f"non-finite metrics at epoch {epoch} it {iters}: {m}; "
                    f"non-finite params: {bad_params[:20]}"
                )
                raise FloatingPointError(
                    f"NaN/Inf detected at iter {iters} (STYLETTS2_DEBUG_NAN)"
                )
            iters += 1
            if iters % cfg.log_interval == 0:
                m["step_sec"] = dt
                writer.scalars({f"train/{k}": v for k, v in m.items()}, iters)
                logger.info(
                    f"epoch {epoch} it {iters}: "
                    + " ".join(f"{k}={v:.4f}" for k, v in m.items())
                )
            if max_steps and iters >= max_steps:
                break

        # validation
        if stage == "first":
            vals = [trainer.validate(b, rng) for b in val_loader]
            vals = [v for v in vals if v is not None]
            if vals:
                writer.scalars({"eval/mel": float(np.mean(vals))}, iters)
        else:
            vals = [trainer.validate(b, rng) for b in val_loader]
            vals = [v for v in vals if v is not None]
            if vals:
                agg = {f"eval/{k}": float(np.mean([v[k] for v in vals]))
                       for k in vals[0]}
                writer.scalars(agg, iters)

        # per-epoch eval artifacts: audio + attention map
        # (train_first.py:388-414; train_second.py:685-768 — full sampling
        # path from joint_epoch on)
        try:
            first_val = next(iter(val_loader), None)
            art = None
            if first_val is not None:
                if stage == "first":
                    art = trainer.eval_artifacts(first_val, rng)
                else:
                    art = trainer.eval_artifacts(
                        first_val, rng,
                        sample=(epoch >= cfg.loss_params.joint_epoch),
                    )
            if art:
                for tag, wav in art.get("audio", {}).items():
                    writer.audio(f"eval/{tag}", wav, epoch + 1)
                if "attn" in art:
                    writer.figure_attention("eval/attn", art["attn"], epoch + 1)
        except Exception as e:  # artifacts must never kill training
            logger.warning(f"eval artifacts failed: {type(e).__name__}: {e}")

        trainer.state.epoch = epoch + 1
        if (epoch + 1) % cfg.save_freq == 0:
            # async: snapshot now, write on a background thread so the next
            # epoch's steps aren't blocked on disk IO
            save_checkpoint_async(
                os.path.join(log_dir, ckpt_fmt.format(epoch + 1)), trainer.state
            )
        if max_steps and iters >= max_steps:
            break

    if stage == "first":
        save_checkpoint(os.path.join(log_dir, cfg.first_stage_path), trainer.state)
    else:
        # write estimated sigma_data back into the config copy
        # (train_second.py:784-789)
        cpath = os.path.join(log_dir, os.path.basename(config_path))
        with open(cpath) as f:
            raw = yaml.safe_load(f)
        raw.setdefault("model_params", {}).setdefault("diffusion", {}).setdefault(
            "dist", {}
        )["sigma_data"] = float(trainer.state.sigma_data)
        with open(cpath, "w") as f:
            yaml.safe_dump(raw, f)
        save_checkpoint(os.path.join(log_dir, f"{stage}_final.ckpt"), trainer.state)
    wait_for_saves()
    writer.close()
    return trainer.state


def _load_first_stage(state, path, logger):
    """Stage handoff: load first_stage, ignore 2nd-stage modules, seed
    predictor_encoder from style_encoder (train_second.py:146-157)."""
    from styletts2_tpu.train.state import load_checkpoint as _lc

    state = _lc(
        path, state, load_only_params=True,
        ignore_modules=(
            "bert", "bert_encoder", "predictor", "predictor_encoder",
            "msd", "mpd", "wd", "diffusion",
        ),
    )
    state.params["predictor_encoder"] = copy.deepcopy(state.params["style_encoder"])
    if "style_encoder" in state.extras:
        state.extras["predictor_encoder"] = copy.deepcopy(
            state.extras["style_encoder"]
        )
    logger.info(f"loaded first stage from {path}")
    return state


def main():
    ap = argparse.ArgumentParser(description="styletts2_tpu training driver")
    ap.add_argument("stage", choices=["first", "second", "finetune"])
    ap.add_argument("--config_path", required=True)
    ap.add_argument("--max_steps", type=int, default=None)
    args = ap.parse_args()
    run_stage(args.stage, args.config_path, args.max_steps)


if __name__ == "__main__":
    main()
