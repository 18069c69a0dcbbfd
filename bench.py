"""Serving benchmark, flagship LJSpeech config: single-stream RTF (headline)
plus batched and fused-path throughput in "extra".

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
vs_baseline is single-stream RTF / 20 — the fraction of the ≥20× real-time
per-chip north-star target (BASELINE.json); >1.0 beats the target.

Measures the staged serving path on jax.default_backend(). Utterance length
is pinned to ~8 s of speech via the speech-rate control so the fixed
per-call dispatch cost is amortized the way trained weights would amortize
it (random-init durations are ~8× longer, which flattered round-1's number —
round-1 VERDICT weak #3). "extra" adds (round-2 VERDICT #8): latency
percentiles, batched-serving aggregate RTF (inference_batch, B=8), the
single-dispatch fused path, and the opt-in bf16-decoder single-stream RTF.
"""

import json
import time

TARGET_AUDIO_SEC = 8.0


def _timed(fn, n):
    import numpy as np

    lat = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        lat.append(time.perf_counter() - t0)
    return np.asarray(lat)


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

    def single():
        return syn.inference(text, diffusion_steps=steps, seed=0, pcm16=True,
                             speed=speed)[0]

    wav = single()  # warm-up: compiles the target frame bucket
    audio_sec = len(wav) / 24000.0
    lat = _timed(single, 20)
    rtf = audio_sec / float(np.mean(lat))

    extra = {
        "audio_sec_per_utt": round(audio_sec, 2),
        "latency_p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
        "latency_p95_ms": round(float(np.percentile(lat, 95)) * 1e3, 1),
        "latency_mean_ms": round(float(np.mean(lat)) * 1e3, 1),
        "n_runs": 20,
        "natural_uncalibrated_sec": round(natural_sec, 2),
    }

    # batched serving: one fixed-shape program, 8 streams (VERDICT r2 #8)
    try:
        B = 8
        texts = [text] * B

        def batched():
            return syn.inference_batch(texts, diffusion_steps=steps,
                                       speed=speed)

        wavs = batched()  # warm
        batch_audio = sum(len(w) for w in wavs) / 24000.0
        blat = _timed(batched, 8)
        extra["batched_B8_rtf"] = round(batch_audio / float(np.mean(blat)), 1)
        extra["batched_B8_latency_ms"] = round(float(np.mean(blat)) * 1e3, 1)
    except Exception as e:  # keep the headline robust
        extra["batched_B8_error"] = f"{type(e).__name__}: {e}"

    # fused single-dispatch path (chases the staged pipeline's ~0.15 s
    # fixed per-call dispatch floor)
    try:
        def fused():
            return syn.inference_fused(text, diffusion_steps=steps, seed=0,
                                       speed=speed)

        fwav = fused()  # warm
        flat = _timed(fused, 10)
        extra["fused_rtf"] = round(len(fwav) / 24000.0 / float(np.mean(flat)), 1)
        extra["fused_latency_p50_ms"] = round(
            float(np.percentile(flat, 50)) * 1e3, 1
        )
    except Exception as e:
        extra["fused_error"] = f"{type(e).__name__}: {e}"

    # opt-in bf16 decoder single-stream (fidelity budget discussion in
    # docs/PERFORMANCE.md; serving default stays f32)
    try:
        syn16 = Synthesizer(cfg, seed=0, decoder_dtype="bfloat16")

        def single16():
            return syn16.inference(text, diffusion_steps=steps, seed=0,
                                   pcm16=True, speed=speed)[0]

        w16 = single16()  # warm
        l16 = _timed(single16, 10)
        extra["bf16_decoder_rtf"] = round(
            len(w16) / 24000.0 / float(np.mean(l16)), 1
        )
    except Exception as e:
        extra["bf16_decoder_error"] = f"{type(e).__name__}: {e}"

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
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
