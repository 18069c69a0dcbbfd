"""Serving benchmark, flagship LJSpeech config: single-stream RTF (headline)
plus batched and fused-path throughput in "extra".

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
vs_baseline is single-stream RTF / 20 — the fraction of the ≥20× real-time
per-chip north-star target (BASELINE.json); >1.0 beats the target.
The headline value is the MEDIAN over STYLETTS2_BENCH_PROCS (default 3)
process-separated runs; the spread is reported in extra.rtf_{min,max,runs}
(the TPU tunnel drifts ±15-20% run-to-run).

Measures the staged serving path on jax.default_backend(). Utterance length
is pinned to ~8 s of speech via the speech-rate control so the fixed
per-call dispatch cost is amortized the way trained weights would amortize
it (random-init durations are ~8× longer, which flattered round-1's number —
round-1 VERDICT weak #3). "extra" adds (round-2 VERDICT #8): latency
percentiles, batched-serving aggregate RTF (inference_batch, B=8), the
single-dispatch fused path, and the opt-in bf16-decoder single-stream RTF.
"""

import json
import os
import subprocess
import sys
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


def _enable_compile_cache():
    """Persistent compile cache keyed by host fingerprint so the extra
    fresh-process headline runs skip recompilation (utils.host_cache_dir;
    a foreign machine's AOT entries are invisible by construction)."""
    import jax

    from styletts2_tpu.utils import host_cache_dir

    try:
        jax.config.update("jax_compilation_cache_dir", host_cache_dir())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


def _headline_once():
    """One fresh-process single-stream measurement. Returns the stats dict
    (worker mode prints it as JSON; the parent also calls this in-process
    for run #1 and reuses the Synthesizer for the 'extra' measurements)."""
    import numpy as np

    from styletts2_tpu.config import Config
    from styletts2_tpu.inference import Synthesizer

    _enable_compile_cache()
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
    stats = {
        "rtf": round(audio_sec / float(np.mean(lat)), 3),
        "audio_sec_per_utt": round(audio_sec, 2),
        "latency_p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
        "latency_p95_ms": round(float(np.percentile(lat, 95)) * 1e3, 1),
        "latency_mean_ms": round(float(np.mean(lat)) * 1e3, 1),
        "n_runs": 20,
        "natural_uncalibrated_sec": round(natural_sec, 2),
    }
    return stats, syn, text, steps, speed


def bench_extended():
    """BASELINE.json configs 2-4 (run with STYLETTS2_BENCH_FULL=1; results
    committed to BENCH_EXTENDED.json + docs/PERFORMANCE.md — kept off the
    driver's headline path to bound its wall clock):
      2. LibriTTS zero-shot: multispeaker StyleTransformer1d denoiser w/
         reference-wav style, 10 diffusion steps, embedding_scale 1.5 (CFG
         doubles denoiser evals) — Demo/Inference_LibriTTS.ipynb cell 16.
      3. Batched synthesis: 32 length-masked utterances + long-form
         paragraph stitching, HiFi-GAN decoder variant.
      4. Diffusion sweep: steps x CFG-scale grid, compile-per-setting
         (static shapes), per-setting RTF + style consistency."""
    import numpy as np

    from styletts2_tpu.config import Config, load_config
    from styletts2_tpu.inference import Synthesizer

    out = {}
    text = (
        "ðɪ kwˈɪk bɹˈaʊn fˈɑːks dʒˈʌmps ˈoʊvɚ ðə lˈeɪzi dˈɔːɡ, "
        "ænd ðə sˈʌn sˈɛts slˈoʊli bɪhˈaɪnd ðə mˈaʊntənz."
    )

    # ---- config 2: LibriTTS zero-shot ------------------------------
    cfg_ms = load_config("configs/config_libritts.yml")
    syn_ms = Synthesizer(cfg_ms, seed=0)
    rng = np.random.default_rng(0)
    ref_wav = rng.standard_normal(24000 * 3).astype(np.float32) * 0.05
    ref_s = syn_ms.compute_style(ref_wav)
    wav, _ = syn_ms.inference(  # calibrate natural length -> ~8 s speed pin
        text, ref_s=ref_s, diffusion_steps=10, embedding_scale=1.5, seed=0
    )
    speed_ms = max(len(wav) / 24000.0 / TARGET_AUDIO_SEC, 1.0)

    def zs():
        return syn_ms.inference(text, ref_s=ref_s, diffusion_steps=10,
                                embedding_scale=1.5, seed=0, pcm16=True,
                                speed=speed_ms)[0]

    w = zs()  # warm the frame bucket
    lat = _timed(zs, 10)
    out["libritts_zeroshot"] = {
        "diffusion_steps": 10, "embedding_scale": 1.5,
        "audio_sec": round(len(w) / 24000.0, 2),
        "rtf": round(len(w) / 24000.0 / float(np.mean(lat)), 1),
        "latency_p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
    }
    del syn_ms

    # ---- config 3: B=32 batched + long-form, HiFi-GAN decoder ------
    cfg_hg = Config()
    cfg_hg.model_params.decoder.type = "hifigan"
    # reference HiFi-GAN variant rates (Configs/config_libritts.yml analog)
    cfg_hg.model_params.decoder.upsample_rates = [10, 5, 3, 2]
    cfg_hg.model_params.decoder.upsample_kernel_sizes = [20, 10, 6, 4]
    syn_hg = Synthesizer(cfg_hg, seed=0)
    texts = [
        text,
        "ðɪs ɪz ɐ ʃˈɔːɹtɚ sˈɛntəns.",
        "wˈʌn mˈoːɹ ˈʌtɚɹəns wɪð ɐ dˈɪfɹənt lˈɛŋkθ fɔːɹ mˈæskɪŋ.",
        "ænd ɐ fˈoːɹθ wˈʌn tə ɹˈaʊnd ˈaʊt ðə bˈʌkɪts hˈɪɹ tədˈeɪ.",
    ] * 8  # 32 utterances, 4 distinct lengths
    wav0, _ = syn_hg.inference(texts[0], diffusion_steps=5, seed=0)
    speed_hg = max(len(wav0) / 24000.0 / TARGET_AUDIO_SEC, 1.0)

    def b32():
        return syn_hg.inference_batch(texts, diffusion_steps=5,
                                      speed=speed_hg)

    wavs = b32()  # warm
    blat = _timed(b32, 4)
    batch_audio = sum(len(x) for x in wavs) / 24000.0
    out["batched_B32_hifigan"] = {
        "batch": 32,
        "audio_sec_total": round(batch_audio, 1),
        "aggregate_rtf": round(batch_audio / float(np.mean(blat)), 1),
        "batch_latency_ms": round(float(np.mean(blat)) * 1e3, 1),
    }

    para = ("ðɪs ɪz ðə fˈɜːst sˈɛntəns. hˈɪɹ ɪz ɐ sˈɛkənd wˈʌn. "
            "ðə θˈɜːd kˈæɹiz ðə stˈaɪl fˈoːɹwɚd. ænd ðə lˈæst klˈoʊzɪz ɪt.")
    w_lf = syn_hg.long_form(para, t=0.7, diffusion_steps=5, speed=speed_hg)
    llat = _timed(lambda: syn_hg.long_form(para, t=0.7, diffusion_steps=5,
                                           speed=speed_hg), 4)
    out["long_form_hifigan"] = {
        "sentences": 4,
        "audio_sec": round(len(w_lf) / 24000.0, 2),
        "rtf": round(len(w_lf) / 24000.0 / float(np.mean(llat)), 1),
    }
    del syn_hg

    # ---- config 4: diffusion steps x CFG-scale sweep (LJSpeech) ----
    syn = Synthesizer(Config(), seed=0)
    wav0, _ = syn.inference(text, diffusion_steps=5, seed=0)
    speed = max(len(wav0) / 24000.0 / TARGET_AUDIO_SEC, 1.0)
    sweep = []
    styles = {}
    for steps in (3, 5, 10):
        for scale in (1.0, 1.5):
            t0 = time.perf_counter()
            w, s_out = syn.inference(text, diffusion_steps=steps,
                                     embedding_scale=scale, seed=0,
                                     pcm16=True, speed=speed)
            cold = time.perf_counter() - t0  # includes per-setting compile
            lat = _timed(
                lambda: syn.inference(text, diffusion_steps=steps,
                                      embedding_scale=scale, seed=0,
                                      pcm16=True, speed=speed), 5)
            styles[(steps, scale)] = np.asarray(s_out)
            sweep.append({
                "steps": steps, "scale": scale,
                "rtf": round(len(w) / 24000.0 / float(np.mean(lat)), 1),
                "latency_p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
                "first_call_s": round(cold, 2),
            })
    # style consistency across step counts (same seed/noise): the sampler
    # should converge to nearby style vectors as steps grow
    c35 = float(np.abs(styles[(3, 1.0)] - styles[(5, 1.0)]).mean())
    c510 = float(np.abs(styles[(5, 1.0)] - styles[(10, 1.0)]).mean())
    out["diffusion_sweep"] = {
        "grid": sweep,
        "style_mean_abs_delta_3v5": round(c35, 4),
        "style_mean_abs_delta_5v10": round(c510, 4),
    }
    return out


def main():
    import numpy as np

    import jax

    from styletts2_tpu.config import Config
    from styletts2_tpu.inference import Synthesizer

    # Headline de-noising (round-4 VERDICT weak #6): the TPU tunnel shows
    # ±15-20% run-to-run drift, so the headline is the MEDIAN single-stream
    # RTF over N process-separated runs (this process + N-1 fresh worker
    # subprocesses, compile cache shared via the host-keyed persistent
    # cache). min/max/all-runs ride along in "extra".
    stats, syn, text, steps, speed = _headline_once()
    rtf_runs = [stats["rtf"]]
    n_procs = max(int(os.environ.get("STYLETTS2_BENCH_PROCS", "3")), 1)
    for _ in range(n_procs - 1):
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--headline-worker"],
                capture_output=True, text=True, timeout=900,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = out.stdout.strip().splitlines()[-1]
            rtf_runs.append(json.loads(line)["rtf"])
        except Exception as e:  # keep the headline robust to a worker loss
            stats[f"worker_error_{len(rtf_runs)}"] = f"{type(e).__name__}: {e}"
    rtf = float(np.median(rtf_runs))

    extra = dict(stats)
    del extra["rtf"]
    extra.update({
        "rtf_runs": rtf_runs,
        "rtf_min": min(rtf_runs),
        "rtf_max": max(rtf_runs),
        "n_procs": len(rtf_runs),
    })
    audio_sec = stats["audio_sec_per_utt"]

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
        syn16 = Synthesizer(Config(), seed=0, decoder_dtype="bfloat16")

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
    if "--headline-worker" in sys.argv:
        # fresh-process single-stream run for the median-of-N headline
        stats, _, _, _, _ = _headline_once()
        print(json.dumps(stats))
    elif os.environ.get("STYLETTS2_BENCH_FULL"):
        # extended matrix only (BASELINE configs 2-4); results are committed
        # to BENCH_EXTENDED.json — the driver's single-line contract runs
        # main() below instead
        print(json.dumps(bench_extended(), indent=1))
    else:
        main()
