"""Single-stream synthesis RTF benchmark on the flagship LJSpeech config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is RTF / 20 — the fraction of the ≥20× real-time per-chip
north-star target (BASELINE.json); >1.0 beats the target.

Measures the fused single-dispatch serving path (one jit graph per
utterance, static frame budget) on jax.default_backend().
"""

import json
import time


def main():
    import numpy as np

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

    # warm-up/compile the staged pipeline, then measure
    wav, _ = syn.inference(text, diffusion_steps=steps, seed=0, pcm16=True)
    n_runs = 5
    t0 = time.perf_counter()
    for _ in range(n_runs):
        wav, _ = syn.inference(text, diffusion_steps=steps, seed=0, pcm16=True)
    dt = (time.perf_counter() - t0) / n_runs
    audio_sec = len(wav) / 24000.0
    rtf = audio_sec / dt

    print(
        json.dumps(
            {
                "metric": f"single-stream synthesis RTF (audio-sec/wall-sec), LJSpeech iSTFTNet, {steps} diffusion steps, staged pipeline, {jax.default_backend()}",
                "value": round(rtf, 3),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 20.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
