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
        y32, _, aux = trainer._forward_recon(
            params, extras, bdict, starts, starts, key, clip_len,
            use_mono=jnp.asarray(1), train=False, return_io=True,
        )
        return y32, aux["decoder_io"]

    key = jax.random.PRNGKey(0)
    y32, (en, F0, norm, s) = recon_io(
        trainer.state.params, trainer.state.extras, bdict,
        jnp.asarray(starts), key,
    )

    dec_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        trainer.state.params["decoder"],
    )

    @jax.jit
    def recon16(dec_params, en, F0, norm, s, key):
        return trainer.models.decoder.apply(
            {"params": dec_params}, en.astype(jnp.bfloat16),
            F0.astype(jnp.bfloat16), norm.astype(jnp.bfloat16),
            s.astype(jnp.bfloat16), rngs={"noise": key},
        ).astype(jnp.float32)

    y16 = recon16(dec_params, en, F0, norm, s, key)
    scores = [
        float(mcd(np.asarray(y16[b]), np.asarray(y32[b]), use_dtw=False))
        for b in range(y32.shape[0])
    ]
    return float(np.mean(scores)), scores


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--out", default="/tmp/tiny_fidelity")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import numpy as np

    from styletts2_tpu.parallel.tiny import tiny_config, tiny_training_setup
    from styletts2_tpu.train.stage1 import Stage1Trainer

    cfg = tiny_config()
    cfg.loss_params.TMA_epoch = 10 ** 9  # pre-TMA: pure mel reconstruction
    models, state = tiny_training_setup(cfg)
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
    with open(os.path.join(args.out, "fidelity.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
