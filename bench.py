"""Single-stream synthesis RTF + latency benchmark, flagship LJSpeech config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
vs_baseline is RTF / 20 — the fraction of the ≥20× real-time per-chip
north-star target (BASELINE.json); >1.0 beats the target.

Measures the staged serving path on jax.default_backend() with the decoder
in its default serving dtype (bf16 on TPU). Utterance length is pinned to
~8 s of speech via the speech-rate control so the fixed per-call dispatch
cost is amortized the way trained weights would amortize it (random-init
durations are ~8× longer, which flattered round-1's number —
VERDICT.md weak #3). Latency percentiles (p50/p95 per utterance) are
reported in "extra" per BASELINE.json's latency-tracking requirement.
"""

import json
import time

TARGET_AUDIO_SEC = 8.0


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

    # calibration call: natural duration of this text under these weights
    wav, _ = syn.inference(text, diffusion_steps=steps, seed=0, pcm16=True)
    natural_sec = len(wav) / 24000.0
    speed = max(natural_sec / TARGET_AUDIO_SEC, 1.0)

    # warm-up at the measured speed (compiles the target frame bucket)
    wav, _ = syn.inference(text, diffusion_steps=steps, seed=0, pcm16=True,
                           speed=speed)
    audio_sec = len(wav) / 24000.0

    lat = []
    n_runs = 20
    for _ in range(n_runs):
        t0 = time.perf_counter()
        wav, _ = syn.inference(text, diffusion_steps=steps, seed=0, pcm16=True,
                               speed=speed)
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat)
    rtf = audio_sec / float(np.mean(lat))

    print(
        json.dumps(
            {
                "metric": (
                    f"single-stream synthesis RTF (audio-sec/wall-sec), LJSpeech "
                    f"iSTFTNet, {steps} diffusion steps, ~{audio_sec:.1f}s "
                    f"utterances, staged pipeline, decoder "
                    f"{syn.decoder_dtype.name}, {jax.default_backend()}"
                ),
                "value": round(rtf, 3),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 20.0, 4),
                "extra": {
                    "audio_sec_per_utt": round(audio_sec, 2),
                    "latency_p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
                    "latency_p95_ms": round(float(np.percentile(lat, 95)) * 1e3, 1),
                    "latency_mean_ms": round(float(np.mean(lat)) * 1e3, 1),
                    "n_runs": n_runs,
                    "natural_uncalibrated_sec": round(natural_sec, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
