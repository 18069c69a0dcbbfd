"""Demo CLI: the packaged equivalent of the reference inference notebooks.

  python -m styletts2_tpu.demo --text "ðɪs ɪz ɐ tˈɛst." --out out.wav \
      [--config configs/config.yml] [--ckpt model.ckpt|epoch_2nd_00100.pth] \
      [--ref_wav speaker.wav] [--steps 5] [--scale 1.0] [--longform]

Accepts either this framework's .ckpt checkpoints or the reference's .pth
(converted on the fly via styletts2_tpu.convert). Text is pre-phonemized IPA
unless `phonemizer` + espeak-ng are installed.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def load_synthesizer(config_path, ckpt_path=None, seed=0):
    from styletts2_tpu.config import Config, load_config
    from styletts2_tpu.inference import Synthesizer

    cfg = load_config(config_path) if config_path else Config()
    syn = Synthesizer(cfg, seed=seed)
    if ckpt_path:
        if ckpt_path.endswith((".pth", ".t7")):
            import torch

            from styletts2_tpu.convert import convert_styletts2_checkpoint

            state = torch.load(ckpt_path, map_location="cpu")
            converted = convert_styletts2_checkpoint(
                {
                    "net": {
                        k: {kk: vv.numpy() for kk, vv in v.items()}
                        for k, v in state["net"].items()
                    }
                },
                cfg,
            )
            for k, v in converted.items():
                syn.params[k] = v
            syn.sigma_data = float(
                cfg.model_params.diffusion.dist.sigma_data
            )
        else:
            import pickle

            from flax import serialization

            with open(ckpt_path, "rb") as f:
                payload = pickle.load(f)
            for k in syn.params:
                if k in payload.get("net", {}):
                    syn.params[k] = serialization.from_state_dict(
                        syn.params[k], payload["net"][k]
                    )
    return syn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--text", required=True, help="pre-phonemized IPA text")
    ap.add_argument("--out", default="out.wav")
    ap.add_argument("--config", default=None)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--ref_wav", default=None, help="reference speaker wav (multispeaker)")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--alpha", type=float, default=0.3)
    ap.add_argument("--beta", type=float, default=0.7)
    ap.add_argument("--longform", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from styletts2_tpu.utils import read_wav, resample_linear, write_wav

    syn = load_synthesizer(args.config, args.ckpt, args.seed)
    ref_s = None
    if args.ref_wav:
        wave, sr = read_wav(args.ref_wav)
        wave = resample_linear(wave, sr, 24000)
        ref_s = syn.compute_style(wave)

    t0 = time.time()
    if args.longform:
        wav = syn.long_form(
            args.text, ref_s=ref_s, diffusion_steps=args.steps,
            embedding_scale=args.scale,
        )
    else:
        wav, _ = syn.inference(
            args.text, ref_s=ref_s, alpha=args.alpha, beta=args.beta,
            diffusion_steps=args.steps, embedding_scale=args.scale,
            seed=args.seed,
        )
    dt = time.time() - t0
    rtf = (len(wav) / 24000.0) / dt
    write_wav(args.out, wav, 24000)
    print(f"wrote {args.out}: {len(wav)/24000.0:.2f}s audio in {dt:.2f}s "
          f"(RTF {rtf:.2f}x, incl. compile on first call)")


if __name__ == "__main__":
    main()
