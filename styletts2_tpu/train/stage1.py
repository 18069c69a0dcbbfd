"""Stage-1 training: mel reconstruction + transferable monotonic alignment.

Reference semantics (train_first.py:174-319): aligner forward (with grad) →
masked soft attention → hard monotonic path (no grad) → 50/50 soft/mono
choice → random fixed-length clips → style encode → decoder reconstruction;
discriminator step from TMA_epoch; generator loss λ_mel·MRSTFT + (TMA:)
λ_mono·10·L1(attn, mono) + λ_s2s·CE + λ_gen·GAN + λ_slm·WavLM; selective
per-module steps (text_encoder/style_encoder/decoder, + text_aligner and
pitch_extractor after TMA — the latter receives no gradient in the
reference either, its 'training' is AdamW weight decay only).

TPU-native structure: everything (mel frontend, alignment DP, clip slicing
via vmapped dynamic_slice) runs inside two jitted steps per phase —
a D step and a G step sharing the same rng so y_rec matches; clip length and
sequence buckets are static; the D update happens before the G backward, as
in the reference (train_first.py:259-264).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from styletts2_tpu import losses as L
from styletts2_tpu.config import Config
from styletts2_tpu.data.meldataset import Batch
from styletts2_tpu.models.build import TrainingModels
from styletts2_tpu.ops.align import maximum_path
from styletts2_tpu.ops.stft import log_norm, preprocess_mel
from styletts2_tpu.models.wavlm import resample_24k_to_16k
from styletts2_tpu.train.mp import cast_in, cast_module_params, cast_tree
from styletts2_tpu.train.state import TrainState, apply_module_updates

HOP = 300

_jit_mrstft = jax.jit(L.multires_stft_loss)


def clip_slice(x: jnp.ndarray, starts: jnp.ndarray, length: int, axis: int = 1):
    """vmapped dynamic_slice over the batch dim: x (B, ..., T, ...)."""

    def one(xi, s):
        return jax.lax.dynamic_slice_in_dim(xi, s, length, axis=axis - 1)

    return jax.vmap(one)(x, starts)


def aligner_pass(models, params, mels, mel_lengths, tokens, input_lengths, key, train):
    """Shared aligner forward: returns (s2s_pred, s2s_attn (B,T,L), mono)."""
    B, T_text = tokens.shape
    L_mem = mels.shape[-1] // 2
    mem_valid = (jnp.arange(L_mem)[None, :] < (mel_lengths // 2)[:, None]).astype(
        jnp.float32
    )
    rngs = {"noise": key, "dropout": jax.random.fold_in(key, 1)} if train else None
    ctc, s2s_pred, attn_all = models.text_aligner.apply(
        params["text_aligner"], mels, mem_valid, tokens, train=train,
        rngs=rngs,
    )
    s2s_attn = attn_all[:, 1:, :]  # drop the sos step (train_first.py:191-193)
    text_valid = (jnp.arange(T_text)[None, :] < input_lengths[:, None]).astype(
        jnp.float32
    )
    attn_mask = text_valid[:, :, None] * mem_valid[:, None, :]
    s2s_attn = s2s_attn * attn_mask
    mono = jax.lax.stop_gradient(
        maximum_path(jax.lax.stop_gradient(s2s_attn), input_lengths, mel_lengths // 2)
    )
    return ctc, s2s_pred, s2s_attn, mono


def s2s_ce_loss(s2s_pred, tokens, input_lengths):
    """Per-sample CE over the first text_length decoder steps
    (train_first.py:273-276)."""
    B, T1, V = s2s_pred.shape
    T = tokens.shape[1]
    logp = jax.nn.log_softmax(s2s_pred[:, :T, :], axis=-1)
    nll = -jnp.take_along_axis(logp, tokens[..., None], axis=-1)[..., 0]  # (B, T)
    valid = (jnp.arange(T)[None, :] < input_lengths[:, None]).astype(nll.dtype)
    per = jnp.sum(nll * valid, axis=1) / jnp.maximum(input_lengths, 1)
    return jnp.mean(per)


class Stage1Trainer:
    def __init__(self, cfg: Config, models: TrainingModels, state: TrainState,
                 mesh=None):
        self.cfg = cfg
        self.models = models
        self.state = state
        self.multispeaker = cfg.model_params.multispeaker
        # bf16 mixed precision (train/mp.py): bf16 compute in the FLOP-heavy
        # modules, f32 master weights (the reference's fp16 accelerate
        # analog, train_finetune_accelerate.py:33-35)
        self.mp = getattr(cfg, "mixed_precision", "") == "bf16"
        self.mesh = mesh
        if mesh is not None:
            from styletts2_tpu.parallel.mesh import shard_train_state

            shard_train_state(state, mesh)
        self._steps = {}
        self._eval_fns = {}

    # ------------------------------------------------------------------
    def _eval_forward(self, clip_len: int):
        """Jitted eval-mode forward (validation + artifacts). Eager apply is
        not an option on TPU: ops like the iSTFT's irfft only lower inside
        jit on the axon backend (UNIMPLEMENTED eagerly)."""
        if clip_len not in self._eval_fns:

            @jax.jit
            def f(params, extras, bdict, starts, key):
                return self._forward_recon(
                    params, extras, bdict, starts, starts, key, clip_len,
                    use_mono=jnp.asarray(1), train=False,
                )

            self._eval_fns[clip_len] = f
        return self._eval_fns[clip_len]

    # ------------------------------------------------------------------
    def _forward_recon(self, params, extras, batch, starts, st_starts, key,
                       clip_len, use_mono, train=True, return_io=False):
        # use_mono: traced 0/1 scalar — 50/50 soft/mono alignment choice
        # (train_first.py:209-213) without doubling compilations
        """Common forward to y_rec; returns (y_rec, wav_clip, aux)."""
        models = self.models
        # bf16 compute in the heavy modules during training; the mel
        # frontend, aligner and pitch extractor stay f32
        mpa = self.mp and train
        params = cast_module_params(params, mpa)
        mels = preprocess_mel(batch["waves"])  # (B, 80, F)
        mels = mels[:, :, : (mels.shape[-1] // 2) * 2]
        k_align, k_dec, k_noise = jax.random.split(key, 3)

        ctc, s2s_pred, s2s_attn, mono = aligner_pass(
            models, {"text_aligner": {"params": params["text_aligner"]}},
            mels, batch["mel_lengths"], batch["tokens"], batch["input_lengths"],
            k_align, train,
        )
        t_en = models.text_encoder.apply(
            {"params": params["text_encoder"]}, batch["tokens"],
            batch["input_lengths"], train=train,
            rngs={"dropout": jax.random.fold_in(k_align, 7)} if train else None,
        )
        attn_used = jnp.where(use_mono > 0, mono, s2s_attn)
        asr = jnp.einsum("btc,btl->blc", t_en, attn_used)  # (B, L_mem, C)

        en = clip_slice(asr, starts, clip_len)  # (B, clip, C)
        gt = clip_slice(mels, starts * 2, 2 * clip_len, axis=2)  # (B, 80, 2clip)
        wav_clip = clip_slice(batch["waves"], starts * 600, clip_len * 600)
        st = clip_slice(mels, st_starts * 2, 2 * clip_len, axis=2)

        real_norm = jax.lax.stop_gradient(log_norm(gt))
        F0_real, _, _ = models.pitch_extractor.apply(
            {"params": params["pitch_extractor"], **extras.get("pitch_extractor", {})},
            gt,
        )
        F0_real = jax.lax.stop_gradient(F0_real)

        style_in = st if self.multispeaker else gt
        s, se_mut = models.style_encoder.apply(
            {"params": params["style_encoder"], **extras.get("style_encoder", {})},
            cast_in(style_in, mpa), update_stats=train,
            mutable=["spectral"] if train else [],
        )
        se_mut = cast_tree(se_mut, jnp.float32)  # SN u vectors stored f32
        # `train` passed positionally: under cfg.remat_decoder the decoder
        # is nn.remat-lifted with static_argnums=(5,) (models/build.py)
        y_rec = models.decoder.apply(
            {"params": params["decoder"]}, cast_in(en, mpa),
            cast_in(F0_real, mpa), cast_in(real_norm, mpa), s,
            train, rngs={"noise": k_noise},
        )
        aux = {
            "s2s_pred": s2s_pred,
            "s2s_attn": s2s_attn,
            "mono": mono,
            "gt": gt,
            "se_mut": se_mut,
        }
        if return_io:
            # decoder inputs for fidelity tooling (tools/train_tiny_fidelity
            # measures bf16-vs-f32 decoder MCD on TRAINED weights); opt-in so
            # the default jaxpr — and the primed dryrun executables — are
            # unchanged
            aux["decoder_io"] = (en, F0_real, real_norm, s)
        return y_rec, wav_clip, aux

    # ------------------------------------------------------------------
    def _make_step(self, shapes_key, clip_len, tma):
        cfg = self.cfg
        models = self.models
        lp = cfg.loss_params
        txs = self.state.txs

        g_keys = ("text_encoder", "style_encoder", "decoder") + (
            ("text_aligner", "pitch_extractor") if tma else ()
        )
        d_keys = ("msd", "mpd")

        def gen_forward(g_params, params, extras, batch, starts, st_starts, key,
                        use_mono):
            """ONE generator forward per step (the reference computes y_rec
            once and feeds it detached to the D loss, train_first.py:253-264;
            round-2 code recomputed the whole forward in the D pass). Returns
            grad-carrying (partial_g_loss, y_rec) — the adversarial term is
            added outside against the POST-update discriminators, with its
            y_rec cotangent pulled back through the stored vjp."""
            p = dict(params)
            p.update(g_params)
            y_rec, wav_clip, aux = self._forward_recon(
                p, extras, batch, starts, st_starts, key, clip_len, use_mono
            )
            loss_mel = L.multires_stft_loss(y_rec, wav_clip)
            metrics = {"mel": loss_mel}
            # pre-TMA the reference uses UNSCALED loss_mel (train_first.py:293:
            # `g_loss = loss_mel`); lambda_mel applies only in the TMA branch
            g_loss = (lp.lambda_mel * loss_mel) if tma else loss_mel
            if tma:
                loss_s2s = s2s_ce_loss(
                    aux["s2s_pred"], batch["tokens"], batch["input_lengths"]
                )
                loss_mono = jnp.mean(jnp.abs(aux["s2s_attn"] - aux["mono"])) * 10.0
                sg = jax.lax.stop_gradient
                # WavLM feature-matching loss (losses.py:201-212)
                wav16 = cast_in(resample_24k_to_16k(wav_clip), self.mp)
                rec16 = cast_in(resample_24k_to_16k(y_rec), self.mp)
                wl_params = {
                    "params": cast_module_params(
                        {"wavlm": sg(p.get("wavlm", params["wavlm"]))}, self.mp
                    )["wavlm"]
                }
                real_states = [
                    sg(h) for h in models.wavlm.apply(wl_params, wav16)
                ]
                rec_states = models.wavlm.apply(wl_params, rec16)
                loss_slm = L.wavlm_feature_loss(real_states, rec_states)
                g_loss = (
                    g_loss
                    + lp.lambda_mono * loss_mono
                    + lp.lambda_s2s * loss_s2s
                    + lp.lambda_slm * loss_slm
                )
                metrics.update(s2s=loss_s2s, mono=loss_mono, slm=loss_slm)
            return (g_loss, y_rec), (metrics, wav_clip, aux["se_mut"])

        @jax.jit
        def step(params, extras, opt_states, batch, starts, st_starts, key, use_mono):
            metrics = {}
            sg = jax.lax.stop_gradient
            g_params = {k: params[k] for k in g_keys}
            (partial_loss, y_rec), vjp_fn, (g_metrics, wav_clip, se_mut) = jax.vjp(
                lambda gp: gen_forward(
                    gp, params, extras, batch, starts, st_starts, key, use_mono
                ),
                g_params,
                has_aux=True,
            )
            # --- discriminator update first, on detached y_rec
            # (train_first.py:259-264)
            if tma:
                y_sg = cast_in(sg(y_rec), self.mp)
                wav_c = cast_in(wav_clip, self.mp)

                def d_loss_fn(d_params):
                    dp = cast_module_params(d_params, self.mp)
                    mpd_out = models.mpd.apply({"params": dp["mpd"]}, wav_c, y_sg)
                    msd_out = models.msd.apply({"params": dp["msd"]}, wav_c, y_sg)
                    return L.discriminator_adv_loss(mpd_out, msd_out)

                d_params = {k: params[k] for k in d_keys}
                d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_params)
                params, opt_states = apply_module_updates(
                    params, opt_states, d_grads, txs, d_keys
                )
                metrics["d_loss"] = d_loss
            # --- generator update: adversarial term against the updated Ds
            if tma:

                def adv_fn(y):
                    dp = cast_module_params(
                        {"mpd": sg(params["mpd"]), "msd": sg(params["msd"])},
                        self.mp,
                    )
                    y = cast_in(y, self.mp)
                    mpd_out = models.mpd.apply({"params": dp["mpd"]}, wav_c, y)
                    msd_out = models.msd.apply({"params": dp["msd"]}, wav_c, y)
                    return L.generator_adv_loss(mpd_out, msd_out)

                loss_gen, y_cot = jax.value_and_grad(adv_fn)(y_rec)
                g_loss = partial_loss + lp.lambda_gen * loss_gen
                (g_grads,) = vjp_fn(
                    (jnp.ones_like(partial_loss), lp.lambda_gen * y_cot)
                )
                g_metrics = dict(g_metrics, gen=loss_gen)
            else:
                g_loss = partial_loss
                (g_grads,) = vjp_fn(
                    (jnp.ones_like(partial_loss), jnp.zeros_like(y_rec))
                )
            params, opt_states = apply_module_updates(
                params, opt_states, g_grads, txs, g_keys
            )
            if se_mut:
                extras = dict(extras)
                extras["style_encoder"] = dict(extras.get("style_encoder", {}))
                extras["style_encoder"].update(se_mut)
            metrics.update(g_metrics)
            metrics["g_loss"] = g_loss
            return params, extras, opt_states, metrics

        return step

    # ------------------------------------------------------------------
    def train_step(self, batch: Batch, epoch: int, rng: np.random.Generator):
        cfg = self.cfg
        tma = epoch >= cfg.loss_params.TMA_epoch
        use_mono = bool(rng.integers(0, 2))

        half = batch.mel_lengths // 2
        clip_len = int(min(int(half.min()) - 1, cfg.max_len // 2))
        cb = self.cfg.clip_frame_bucket
        clip_len = max(cb, (clip_len // cb) * cb)  # static bucket
        if int(half.min()) - 1 < cb:
            return None  # skip too-short batch (reference: continue)
        starts = rng.integers(0, np.maximum(half - clip_len, 1)).astype(np.int32)
        st_starts = rng.integers(0, np.maximum(half - clip_len, 1)).astype(np.int32)

        skey = (
            batch.tokens.shape[1],
            batch.waves.shape[1],
            clip_len,
            tma,
        )
        if skey not in self._steps:
            self._steps[skey] = self._make_step(skey, clip_len, tma)
        step = self._steps[skey]

        from styletts2_tpu.parallel.mesh import place_batch

        bdict = place_batch(
            {
                "waves": np.asarray(batch.waves),
                "tokens": np.asarray(batch.tokens),
                "input_lengths": np.asarray(batch.input_lengths),
                "mel_lengths": np.asarray(batch.mel_lengths),
                "starts": starts,
                "st_starts": st_starts,
            },
            self.mesh,
        )
        key = jax.random.PRNGKey(int(rng.integers(0, 2 ** 31)))
        step_args = (
            self.state.params, self.state.extras, self.state.opt_states,
            {k: bdict[k] for k in ("waves", "tokens", "input_lengths", "mel_lengths")},
            bdict["starts"], bdict["st_starts"], key,
            jnp.asarray(1 if use_mono else 0),
        )
        # bench_train.py re-lowers the cached step with these to pull FLOPs
        # from XLA's compiled-module cost analysis (MFU reporting)
        self._last_step = (step, step_args)
        params, extras, opt_states, metrics = step(*step_args)
        self.state.params = params
        self.state.extras = extras
        self.state.opt_states = opt_states
        self.state.step += 1
        return {k: float(v) for k, v in metrics.items()}

    # ------------------------------------------------------------------
    def eval_artifacts(self, batch: Batch, rng: np.random.Generator):
        """Per-epoch TB artifacts (train_first.py:388-414): reconstruction
        audio for the first few samples + the first sample's soft-attention
        map. Returns {'audio': {tag: wav}, 'attn': (T_text, L_mem)} or None."""
        half = batch.mel_lengths // 2
        clip_len = int(min(int(half.min()) - 1, self.cfg.max_len // 2))
        cb = self.cfg.clip_frame_bucket
        clip_len = max(cb, (clip_len // cb) * cb)
        if int(half.min()) - 1 < cb:
            return None
        starts = rng.integers(0, np.maximum(half - clip_len, 1)).astype(np.int32)
        bdict = {
            "waves": jnp.asarray(batch.waves),
            "tokens": jnp.asarray(batch.tokens),
            "input_lengths": jnp.asarray(batch.input_lengths),
            "mel_lengths": jnp.asarray(batch.mel_lengths),
        }
        key = jax.random.PRNGKey(0)
        y_rec, wav_clip, aux = self._eval_forward(clip_len)(
            self.state.params, self.state.extras, bdict, jnp.asarray(starts), key
        )
        audio = {}
        for b in range(min(3, y_rec.shape[0])):
            audio[f"y_rec_{b}"] = np.asarray(y_rec[b])
            audio[f"gt_{b}"] = np.asarray(wav_clip[b])
        attn = np.asarray(aux["s2s_attn"][0])[
            : int(batch.input_lengths[0]), : int(batch.mel_lengths[0]) // 2
        ]
        return {"audio": audio, "attn": attn}

    # ------------------------------------------------------------------
    def validate(self, batch: Batch, rng: np.random.Generator) -> Optional[float]:
        """Validation mel loss (train_first.py:329-386)."""
        half = batch.mel_lengths // 2
        clip_len = int(min(int(half.min()) - 1, self.cfg.max_len // 2))
        cb = self.cfg.clip_frame_bucket
        clip_len = max(cb, (clip_len // cb) * cb)
        if int(half.min()) - 1 < cb:
            return None
        starts = rng.integers(0, np.maximum(half - clip_len, 1)).astype(np.int32)
        bdict = {
            "waves": jnp.asarray(batch.waves),
            "tokens": jnp.asarray(batch.tokens),
            "input_lengths": jnp.asarray(batch.input_lengths),
            "mel_lengths": jnp.asarray(batch.mel_lengths),
        }
        key = jax.random.PRNGKey(int(rng.integers(0, 2 ** 31)))
        y_rec, wav_clip, _ = self._eval_forward(clip_len)(
            self.state.params, self.state.extras, bdict, jnp.asarray(starts), key
        )
        return float(_jit_mrstft(y_rec, wav_clip))
