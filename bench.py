"""Single-stream synthesis RTF benchmark on the flagship LJSpeech config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is RTF / 20 — the fraction of the ≥20× real-time per-chip
north-star target (BASELINE.json); >1.0 beats the target.
Runs on whatever jax.default_backend() provides (TPU under axon).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from styletts2_tpu.config import Config
    from styletts2_tpu.inference import Synthesizer

    cfg = Config()  # full-size LJSpeech istftnet config
    syn = Synthesizer(cfg, seed=0)

    text = (
        "ðɪ kwˈɪk bɹˈaʊn fˈɑːks dʒˈʌmps ˈoʊvɚ ðə lˈeɪzi dˈɔːɡ, "
        "ænd ðə sˈʌn sˈɛts slˈoʊli bɪhˈaɪnd ðə mˈaʊntənz."
    )
    steps = 5

    # warm-up / compile (phase A + phase B for these buckets)
    wav, _ = syn.inference(text, diffusion_steps=steps, seed=0)
    n_runs = 5
    t0 = time.perf_counter()
    for i in range(n_runs):
        wav, _ = syn.inference(text, diffusion_steps=steps, seed=0)
    dt = (time.perf_counter() - t0) / n_runs
    audio_sec = len(wav) / 24000.0
    rtf = audio_sec / dt

    print(
        json.dumps(
            {
                "metric": f"single-stream synthesis RTF (audio-sec/wall-sec), LJSpeech iSTFTNet, {steps} diffusion steps, {jax.default_backend()}",
                "value": round(rtf, 3),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 20.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
