"""Train the tiny config to a NON-CHAOTIC decoder and measure fidelity
numbers that random weights cannot give (VERDICT round-3 missing #3):

  1. stage-1 pre-TMA mel-reconstruction training (the reference's
     train_first.py:270-294 pre-TMA phase: g_loss = loss_mel) on synthetic
     harmonic "speech-like" audio for --steps optimization steps;
  2. bf16-vs-f32 decoder MCD on the TRAINED weights over held-out
     reconstruction inputs (the serving-dtype question docs/PERFORMANCE.md
     could previously only answer with chaos-amplified random weights);
  3. the mel-loss trajectory, demonstrating the decoder actually converged
     away from its chaotic init.

Usage:  python tools/train_tiny_fidelity.py [--steps 300] [--out /tmp/fid]

The pytest mirror (tests/test_trained_fidelity.py) runs a shortened version;
measured numbers are recorded in docs/PERFORMANCE.md.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def speechlike_batch(rng, B, bucket=48000, wav_len=27000, T_text=12):
    """Harmonic pseudo-speech: F0 contour + decaying harmonics + breath
    noise + syllabic amplitude envelope. Gives the mel-recon loss real
    structure to learn (pure noise would train the decoder toward a noise
    generator, which stays chaotic)."""
    import numpy as np

    from styletts2_tpu.data.meldataset import Batch

    sr = 24000
    waves = np.zeros((B, bucket), np.float32)
    wave_lengths = np.zeros(B, np.int32)
    mel_lengths = np.zeros(B, np.int32)
    for b in range(B):
        n = wav_len + int(rng.integers(0, 3000))
        t = np.arange(n) / sr
        f0 = 120.0 + 60.0 * np.sin(2 * np.pi * rng.uniform(0.5, 2.0) * t) \
            + rng.uniform(-20, 40)
        phase = 2 * np.pi * np.cumsum(f0) / sr
        sig = np.zeros(n)
        for h in range(1, 9):
            sig += np.sin(h * phase + rng.uniform(0, 2 * np.pi)) / h
        env = 0.4 + 0.6 * np.clip(
            np.sin(2 * np.pi * rng.uniform(2.0, 5.0) * t + rng.uniform(0, 6)),
            0, None,
        )
        sig = sig * env + 0.01 * rng.standard_normal(n)
        sig = (0.3 * sig / (np.abs(sig).max() + 1e-6)).astype(np.float32)
        waves[b, :n] = sig
        wave_lengths[b] = n
        ml = n // 300 + 1
        mel_lengths[b] = ml - ml % 2
    tokens = np.zeros((B, 32), np.int32)
    tokens[:, :T_text] = rng.integers(4, 178, (B, T_text))
    input_lengths = np.full(B, T_text, np.int32)
    return Batch(
        waves=waves, wave_lengths=wave_lengths, tokens=tokens,
        input_lengths=input_lengths, ref_tokens=tokens,
        ref_lengths=input_lengths, mel_lengths=mel_lengths,
        ref_waves=waves[:, :24000].copy(),
        ref_wave_lengths=np.full(B, 24000, np.int32),
        speakers=np.zeros(B, np.int32),
    )


def decoder_mcd_f32_vs_bf16(trainer, batch, rng):
    """Held-out reconstruction through the trained decoder in f32 vs bf16
    (bf16 params + bf16 activations, the serving path's cast), MCD between
    the two waveforms."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from styletts2_tpu.eval import mcd

    clip_len = 40
    starts = np.zeros(len(batch.mel_lengths), np.int32)
    bdict = {
        "waves": jnp.asarray(batch.waves),
        "tokens": jnp.asarray(batch.tokens),
        "input_lengths": jnp.asarray(batch.input_lengths),
        "mel_lengths": jnp.asarray(batch.mel_lengths),
    }

    @jax.jit
    def recon_io(params, extras, bdict, starts, key):
        _, _, aux = trainer._forward_recon(
            params, extras, bdict, starts, starts, key, clip_len,
            use_mono=jnp.asarray(1), train=False, return_io=True,
        )
        return aux["decoder_io"]

    key = jax.random.PRNGKey(0)
    en, F0, norm, s = recon_io(
        trainer.state.params, trainer.state.extras, bdict,
        jnp.asarray(starts), key,
    )

    dec_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        trainer.state.params["decoder"],
    )

    # IDENTICAL noise key for both precisions (SineGen draws phase/noise
    # in f32 islands on both paths, so the stochastic inputs match and the
    # delta isolates compute/param precision)
    @jax.jit
    def recon(dec_params, en, F0, norm, s, key):
        return trainer.models.decoder.apply(
            {"params": dec_params}, en.astype(en.dtype), F0, norm, s,
            rngs={"noise": key},
        ).astype(jnp.float32)

    @jax.jit
    def recon16(dec_params, en, F0, norm, s, key):
        return trainer.models.decoder.apply(
            {"params": dec_params}, en.astype(jnp.bfloat16),
            F0.astype(jnp.bfloat16), norm.astype(jnp.bfloat16),
            s.astype(jnp.bfloat16), rngs={"noise": key},
        ).astype(jnp.float32)

    y32 = recon(trainer.state.params["decoder"], en, F0, norm, s, key)
    y16 = recon16(dec_params, en, F0, norm, s, key)
    scores = [
        float(mcd(np.asarray(y16[b]), np.asarray(y32[b]), use_dtw=False))
        for b in range(y32.shape[0])
    ]
    return float(np.mean(scores)), scores


def torch_parity_mcd(trainer, cfg, held_out, clip_len=40):
    """Decoder torch-parity on the trainer's CURRENT weights: export via
    styletts2_tpu.export into the reference Decoder classes
    (/root/reference/Modules/istftnet.py) rebuilt at this config's widths,
    compare waveforms on identical inputs with zeroed stochastic sources.
    Returns (mean_mcd_dB, per_item, waveform_rel_err). Requires the
    decoder's resblock_dilation_sizes to have 3 entries (the reference
    AdaINResBlock1 hardcodes dilation[2], istftnet.py:29-40)."""
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.path.join(repo, "tests") not in sys.path:
        sys.path.insert(0, os.path.join(repo, "tests"))
    import numpy as np
    import torch
    from torch import nn
    from torch.nn.utils import weight_norm

    import jax
    import jax.numpy as jnp

    from test_ref_parity import stable_har_phase, zero_noise
    from ref_compat import load_ref_module
    from styletts2_tpu.eval import mcd
    from styletts2_tpu.export import export_decoder_istftnet

    load_ref_module("ref_models_mod", "models.py")  # installs import stubs
    sys.path.insert(0, "/root/reference")
    try:
        import Modules.istftnet as ist
    finally:
        sys.path.remove("/root/reference")

    bdict = {
        "waves": jnp.asarray(held_out.waves),
        "tokens": jnp.asarray(held_out.tokens),
        "input_lengths": jnp.asarray(held_out.input_lengths),
        "mel_lengths": jnp.asarray(held_out.mel_lengths),
    }
    starts = jnp.zeros(len(held_out.mel_lengths), jnp.int32)
    mp = cfg.model_params

    with zero_noise(), stable_har_phase():

        @jax.jit
        def recon_io(params, extras, bdict, starts, key):
            y, _, aux = trainer._forward_recon(
                params, extras, bdict, starts, starts, key, clip_len,
                use_mono=jnp.asarray(1), train=False, return_io=True,
            )
            return y, aux["decoder_io"]

        y_jax, (en, F0, norm, s) = recon_io(
            trainer.state.params, trainer.state.extras, bdict, starts,
            jax.random.PRNGKey(0),
        )

        # reference decoder at the SAME widths; the reference hardcodes the
        # last decode width (512) and asr_res input (512) — rebuild those
        # two submodules with the reference's own classes
        dec = ist.Decoder(
            dim_in=mp.hidden_dim, style_dim=mp.style_dim,
            resblock_kernel_sizes=list(mp.decoder.resblock_kernel_sizes),
            upsample_rates=list(mp.decoder.upsample_rates),
            upsample_initial_channel=mp.decoder.upsample_initial_channel,
            resblock_dilation_sizes=[list(d) for d in mp.decoder.resblock_dilation_sizes],
            upsample_kernel_sizes=list(mp.decoder.upsample_kernel_sizes),
        )
        dec.decode[-1] = ist.AdainResBlk1d(
            1024 + 2 + 64, mp.decoder.upsample_initial_channel,
            mp.style_dim, upsample=True,
        )
        dec.asr_res = nn.Sequential(
            weight_norm(nn.Conv1d(mp.hidden_dim, 64, kernel_size=1))
        )
        dec.eval()
        sd = export_decoder_istftnet(
            jax.tree.map(np.asarray, trainer.state.params["decoder"])
        )
        missing, unexpected = dec.load_state_dict(
            {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False
        )
        assert not unexpected, unexpected
        assert not missing, missing

        with torch.no_grad():
            y_ref = dec(
                torch.from_numpy(np.asarray(en)).transpose(1, 2),
                torch.from_numpy(np.asarray(F0)),
                torch.from_numpy(np.asarray(norm)),
                torch.from_numpy(np.asarray(s)),
            ).squeeze(1).numpy()

    y_jax = np.asarray(y_jax)
    n = min(y_jax.shape[-1], y_ref.shape[-1])
    scores = [
        float(mcd(y_jax[b, :n], y_ref[b, :n], use_dtw=False))
        for b in range(y_jax.shape[0])
    ]
    rel = float(
        np.linalg.norm(y_jax[:, :n] - y_ref[:, :n])
        / (np.linalg.norm(y_ref[:, :n]) + 1e-9)
    )
    return float(np.mean(scores)), scores, rel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--torch-parity", action="store_true",
                    help="also export to the reference torch decoder and "
                         "measure cross-framework MCD on the trained weights")
    ap.add_argument("--out", default="/tmp/tiny_fidelity")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import numpy as np

    from styletts2_tpu.parallel.tiny import tiny_config, tiny_training_setup
    from styletts2_tpu.train.stage1 import Stage1Trainer

    cfg = tiny_config()
    cfg.loss_params.TMA_epoch = 10 ** 9  # pre-TMA: pure mel reconstruction
    # 3 dilations: required by the reference AdaINResBlock1 for the
    # torch-parity export twin (and a closer production structure)
    cfg.model_params.decoder.resblock_dilation_sizes = [[1, 3, 5]]
    # fast_init: the exact flax init dispatches ~1500 programs through the
    # tunneled remote-compile path (observed to die mid-init on tunnel
    # resets); the numpy fast init is distributionally identical
    # (tests/test_fast_init.py) and compiles nothing.
    models, state = tiny_training_setup(cfg, fast_init=True)
    trainer = Stage1Trainer(cfg, models, state)

    rng = np.random.default_rng(3)
    held_out = speechlike_batch(np.random.default_rng(999), args.batch)

    mcd0, _ = decoder_mcd_f32_vs_bf16(trainer, held_out, rng)
    losses = []
    for it in range(args.steps):
        batch = speechlike_batch(rng, args.batch)
        m = trainer.train_step(batch, epoch=0, rng=rng)
        if m is None:
            continue
        losses.append(float(m["mel"]))
        if it % 25 == 0:
            print(f"step {it}: mel={losses[-1]:.4f}", flush=True)

    mcd1, per_item = decoder_mcd_f32_vs_bf16(trainer, held_out, rng)
    first = float(np.mean(losses[:10]))
    last = float(np.mean(losses[-10:]))
    result = {
        "steps": args.steps,
        "mel_loss_first10": round(first, 4),
        "mel_loss_last10": round(last, 4),
        "mel_loss_drop_pct": round(100 * (first - last) / max(first, 1e-8), 1),
        "bf16_vs_f32_mcd_dB_random_init": round(mcd0, 3),
        "bf16_vs_f32_mcd_dB_trained": round(mcd1, 3),
        "bf16_vs_f32_mcd_dB_trained_per_item": [round(x, 3) for x in per_item],
    }
    if args.torch_parity:
        tp_mcd, tp_items, tp_rel = torch_parity_mcd(trainer, cfg, held_out)
        result["torch_parity_mcd_dB_trained"] = round(tp_mcd, 3)
        result["torch_parity_mcd_dB_per_item"] = [round(x, 3) for x in tp_items]
        result["torch_parity_waveform_rel_err"] = round(tp_rel, 4)
    with open(os.path.join(args.out, "fidelity.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
