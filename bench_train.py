"""Training-throughput benchmark: steps/sec + audio-hours/hour for the
stage-1 (TMA) and stage-2 (joint) steps on synthetic batches.

Usage:
    python bench_train.py [--stage first|second] [--devices N] [--batch B]
                          [--full-size] [--steps N]

Defaults to the shrunk-width full-structure config (parallel/tiny.py) on
the current backend; --devices >1 builds the dp×tp mesh (virtual CPU devices
when the host platform is forced). The reference's recipe for comparison:
LJSpeech stage-1+2 ≈ 2.5 days on 4×A100 (reference README.md:82); results
are recorded in docs/PERFORMANCE.md.
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["first", "second"], default="first")
    ap.add_argument("--devices", type=int, default=1)
    ap.add_argument("--batch", type=int, default=0, help="0 = devices*2")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--full-size", action="store_true",
                    help="production widths instead of the shrunk config")
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
        cfg = Config()
        cfg.max_len = 80
        cfg.slmadv_params.min_len = 80
        cfg.slmadv_params.max_len = 120
        cfg.model_params.slm.hidden = 64
        cfg.model_params.slm.nlayers = 3
    else:
        cfg = tiny_config()
    models, state = tiny_training_setup(cfg, stage2=(args.stage == "second"))

    mesh = None
    if args.devices > 1:
        mesh = make_mesh(args.devices, model_parallel=2 if args.devices % 2 == 0 else 1)
    B = args.batch or (int(mesh.shape["data"]) if mesh else 2)

    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, B)
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

    print(json.dumps({
        "stage": args.stage,
        "devices": args.devices,
        "mesh": dict(mesh.shape) if mesh else None,
        "batch": B,
        "widths": "full" if args.full_size else "tiny",
        "backend": jax.default_backend(),
        "steps_per_sec": round(1.0 / dt, 4),
        "sec_per_step": round(dt, 4),
        "audio_hours_per_hour": round(audio_sec_per_step / dt / 1.0, 2),
        "compile_sec": round(compile_sec, 1),
        "g_loss": round(float(m["g_loss"]), 4),
    }))


if __name__ == "__main__":
    main()
