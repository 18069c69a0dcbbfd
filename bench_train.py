"""Training-throughput benchmark: steps/sec, audio-hours/hour, FLOPs + MFU
for the stage-1 (TMA) and stage-2 (joint) steps on synthetic batches.

Usage:
    python bench_train.py [--stage first|second] [--devices N] [--batch B]
                          [--full-size] [--steps N] [--mp bf16]

Defaults to the shrunk-width full-structure config (parallel/tiny.py) on
the current backend; `--full-size` runs PRODUCTION widths — the reference
recipe's batch 16 / max_len 400 mel frames / real 768-wide 12-layer WavLM
(reference Configs/config.yml:5-7) — and reports MFU from XLA's own
compiled-module cost analysis. `--devices N` builds the dp×tp mesh (virtual
CPU devices when the host platform is forced). The reference's comparable
number: LJSpeech stage-1+2 ≈ 2.5 days on 4×A100 (reference README.md:82);
results are recorded in docs/PERFORMANCE.md.
"""

import argparse
import json
import time

# peak dense-matmul throughput per chip, FLOP/s (bf16 / f32): public cloud
# specs; MFU is reported against the dtype actually used by the step
PEAK_FLOPS = {
    "TPU v4": (275e12, 137e12),
    "TPU v5e": (197e12, 98e12),
    "TPU v5 lite": (197e12, 98e12),
    "TPU v5p": (459e12, 229e12),
    "TPU v6e": (918e12, 459e12),
    "TPU v6 lite": (918e12, 459e12),
}


def peak_for(device, bf16: bool) -> float:
    kind = getattr(device, "device_kind", "")
    for k, (p_bf16, p_f32) in PEAK_FLOPS.items():
        if k.lower() in str(kind).lower():
            return p_bf16 if bf16 else p_f32
    return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["first", "second"], default="first")
    ap.add_argument("--devices", type=int, default=1)
    ap.add_argument("--batch", type=int, default=0,
                    help="0 = 16 full-size, devices*2 tiny")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--full-size", action="store_true",
                    help="production widths (batch 16, max_len 400, real WavLM)")
    ap.add_argument("--mp", choices=["", "bf16"], default="",
                    help="mixed-precision mode for the trainers")
    ap.add_argument("--exact-init", action="store_true",
                    help="exact flax init instead of the fast eval_shape+"
                         "numpy init (throughput does not depend on it)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize the decoder (config.remat_decoder): "
                         "trades one extra decoder forward for dropping its "
                         "24 kHz activations — required for batch 16 f32 on "
                         "a single 16 G chip")
    args = ap.parse_args()

    import numpy as np

    import jax

    if args.devices > 1 and jax.device_count() < args.devices:
        raise SystemExit(
            f"need {args.devices} devices, have {jax.device_count()} "
            "(set XLA_FLAGS=--xla_force_host_platform_device_count=N "
            "and force the cpu platform)"
        )

    from styletts2_tpu.config import Config
    from styletts2_tpu.parallel.tiny import (
        synthetic_batch,
        tiny_config,
        tiny_training_setup,
    )
    from styletts2_tpu.parallel.mesh import make_mesh

    if args.full_size:
        # the reference recipe: batch 16, max_len 400 mel frames
        # (reference Configs/config.yml:5-7), full WavLM widths
        cfg = Config()
        cfg.mixed_precision = args.mp
        cfg.remat_decoder = args.remat
        import dataclasses

        import jax.numpy as jnp

        from styletts2_tpu.models.build import (
            build_training_models,
            fast_init_training_params,
            init_training_params,
        )
        from styletts2_tpu.train.run import MODULE_KEYS
        from styletts2_tpu.train.state import TrainState, build_module_optimizers

        models = build_training_models(cfg)
        if args.exact_init:
            # init_training_params lands initializers on the host CPU when
            # a non-CPU backend is default (models/build.py:189-191)
            variables = init_training_params(models, jax.random.PRNGKey(0), cfg)
        else:
            # throughput is weight-value independent (static shapes/FLOPs);
            # eval_shape+numpy init skips minutes of eager init wall
            variables = fast_init_training_params(models, cfg)
        txs = build_module_optimizers(cfg, MODULE_KEYS, stage2=(args.stage == "second"))
        state = TrainState.create(variables, txs)
        # ≥402 mel frames → full 200-frame clips; bucket covers the longest
        # item (wav_len + (B-1)*1500 at B=16 → 148500)
        wav_len, bucket = 126000, 150000
    else:
        cfg = tiny_config()
        cfg.mixed_precision = args.mp
        cfg.remat_decoder = args.remat
        models, state = tiny_training_setup(cfg, stage2=(args.stage == "second"))
        wav_len, bucket = 27000, 48000

    mesh = None
    if args.devices > 1:
        mesh = make_mesh(args.devices, model_parallel=2 if args.devices % 2 == 0 else 1)
    B = args.batch or (16 if args.full_size else (int(mesh.shape["data"]) if mesh else 2))

    rng = np.random.default_rng(0)
    if args.full_size:
        # ~110 phoneme tokens matches real ~16 s LJSpeech utterances; the
        # tiny default of 12 would understate aligner/BERT/text-encoder FLOPs
        batch = synthetic_batch(rng, B, wav_len=wav_len, bucket=bucket,
                                T_text=110, T_buf=128)
    else:
        batch = synthetic_batch(rng, B, wav_len=wav_len, bucket=bucket)
    audio_sec_per_step = float(np.sum(batch.wave_lengths)) / 24000.0

    if args.stage == "first":
        from styletts2_tpu.train.stage1 import Stage1Trainer

        cfg.loss_params.TMA_epoch = 0
        trainer = Stage1Trainer(cfg, models, state, mesh=mesh)
        step = lambda: trainer.train_step(batch, epoch=1, rng=rng)
    else:
        from styletts2_tpu.train.stage2 import Stage2Trainer

        cfg.loss_params.diff_epoch = 0
        cfg.loss_params.joint_epoch = 0
        trainer = Stage2Trainer(cfg, models, state, mesh=mesh)
        it = [0]

        def step():
            it[0] += 1
            return trainer.train_step(batch, epoch=1, iters=it[0], rng=rng)

    t0 = time.perf_counter()
    m = step()  # compile
    compile_sec = time.perf_counter() - t0
    assert m is not None

    t0 = time.perf_counter()
    for _ in range(args.steps):
        m = step()
    dt = (time.perf_counter() - t0) / args.steps

    # FLOPs straight from XLA's cost analysis of the compiled step module
    # (no hand model): re-lower the exact cached step with the exact args.
    flops = 0.0
    try:
        step_fn, step_args = trainer._last_step
        flops = float(
            step_fn.lower(*step_args).compile().cost_analysis().get("flops", 0.0)
        )
    except Exception as e:
        print(f"# cost_analysis unavailable: {type(e).__name__}: {e}")

    dev = jax.devices()[0]
    n_dev = args.devices if args.devices > 1 else 1
    peak = peak_for(dev, bf16=(args.mp == "bf16")) * n_dev
    mfu = (flops / dt / peak) if (flops and peak) else None

    print(json.dumps({
        "stage": args.stage,
        "devices": n_dev,
        "mesh": dict(mesh.shape) if mesh else None,
        "batch": B,
        "widths": "full" if args.full_size else "tiny",
        "mixed_precision": args.mp or "f32",
        "backend": jax.default_backend(),
        "device_kind": str(getattr(dev, "device_kind", "")),
        "steps_per_sec": round(1.0 / dt, 4),
        "sec_per_step": round(dt, 4),
        "audio_hours_per_hour": round(audio_sec_per_step / dt / 1.0, 2),
        "flops_per_step": flops or None,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "compile_sec": round(compile_sec, 1),
        "g_loss": round(float(m["g_loss"]), 4),
    }))


if __name__ == "__main__":
    main()
