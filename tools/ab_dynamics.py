"""A/B harness for the two documented training-dynamics deviations
(docs/ROADMAP.md; reference train_second.py:295-307, Modules/slmadv.py:117-140):

  A. Spectral-norm power-iteration cadence: torch runs one iteration per
     train-mode *forward* and the reference makes several forwards per
     optimizer step; this framework runs one per step. Arm B emulates the
     torch cadence by running SN_POWER_ITERS=3 iterations per step.
  B. Static SLM-adversarial batch composition: the reference dynamically
     skips invalid OOD items (too-short predicted durations); here the batch
     is a fixed slice with validity weights. The per-step `slm_valid_frac`
     metric quantifies how often the two compositions differ — a fraction
     pinned at 1.0 means the static slice and the dynamic loop train on
     identical batches.

Usage (TPU or CPU):
    python tools/ab_dynamics.py [--steps 200] [--out /tmp/ab]

Runs stage-2 (joint phase: diffusion + SLM-adv live) twice on identical
synthetic data/seeds, differing ONLY in the SN cadence, and writes
metrics.jsonl per arm plus a summary JSON with per-loss mean |Δ| over the
last 50 steps and the observed slm_valid_frac. Results are recorded in
docs/ROADMAP.md.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_arm(name, sn_iters, steps, out_dir):
    import numpy as np

    from styletts2_tpu.models import layers
    from styletts2_tpu.parallel.tiny import synthetic_batch, tiny_config, tiny_training_setup
    from styletts2_tpu.train.stage2 import Stage2Trainer

    layers.SN_POWER_ITERS = sn_iters
    cfg = tiny_config()
    cfg.loss_params.diff_epoch = 0
    cfg.loss_params.joint_epoch = 0
    models, state = tiny_training_setup(cfg, stage2=True)
    trainer = Stage2Trainer(cfg, models, state, mesh=None)

    data_rng = np.random.default_rng(7)   # identical batches across arms
    step_rng = np.random.default_rng(11)  # identical coins/clips across arms
    path = os.path.join(out_dir, f"metrics_{name}.jsonl")
    rows = []
    with open(path, "w") as f:
        for it in range(steps):
            batch = synthetic_batch(data_rng, 2)
            m = trainer.train_step(batch, epoch=1, iters=it, rng=step_rng)
            if m is None:
                continue
            rec = {"step": it, **{k: float(v) for k, v in m.items()}}
            f.write(json.dumps(rec) + "\n")
            rows.append(rec)
            if it % 20 == 0:
                print(f"[{name}] step {it}: g_loss={rec['g_loss']:.4f} "
                      f"slm_valid_frac={rec.get('slm_valid_frac', -1):.2f}",
                      flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--out", default="/tmp/ab_dynamics")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import numpy as np

    arm_a = run_arm("sn1", 1, args.steps, args.out)  # framework default
    arm_b = run_arm("sn3", 3, args.steps, args.out)  # torch per-step cadence

    keys = sorted(set(arm_a[0]) & set(arm_b[0]) - {"step"})
    tail = min(50, len(arm_a), len(arm_b))
    summary = {"steps": args.steps, "tail_window": tail}
    for k in keys:
        a = np.asarray([r[k] for r in arm_a[-tail:]])
        b = np.asarray([r[k] for r in arm_b[-tail:]])
        denom = max(float(np.mean(np.abs(a))), 1e-8)
        summary[k] = {
            "mean_A_sn1": round(float(np.mean(a)), 5),
            "mean_B_sn3": round(float(np.mean(b)), 5),
            "rel_delta": round(float(np.mean(b) - np.mean(a)) / denom, 5),
        }
    vf = [r.get("slm_valid_frac") for r in arm_a if "slm_valid_frac" in r]
    summary["slm_valid_frac_min"] = round(float(np.min(vf)), 4) if vf else None
    summary["slm_valid_frac_mean"] = round(float(np.mean(vf)), 4) if vf else None
    out_path = os.path.join(args.out, "summary.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))
    print(f"written: {out_path}")


if __name__ == "__main__":
    main()
