"""Stage-2 training: style diffusion + prosody prediction + SLM-adversarial.

Reference semantics (train_second.py:244-560):
  no-grad aligner → hard mono path → asr features and d_gt durations;
  full-utterance prosodic/acoustic styles (batched masked pooling here vs the
  reference's per-item loop, train_second.py:295-307); σ_data estimated from
  the batch (316-318); EDM diffusion loss + sampled-style L1 (320-336);
  duration CE/L1, F0/energy smooth-L1 (404-405, 426-441); D-then-G updates
  with per-phase module gating (459-469); from joint_epoch the
  SLM-adversarial pass (Modules/slmadv.py) with differentiable duration:
  sigmoid duration logits → Gaussian kernels at cumsum centers (sig 1.5) →
  soft alignment → full synthesis → WavLM discriminator, with the reference's
  gradient-norm rescale (÷‖g_predictor‖ above thresh) and ×0.01 scaling of
  duration_proj/lstm/diffusion grads (train_second.py:495-530).

TPU-native notes: the per-item duration→alignment conv becomes a batched
closed form soft_alignment() (50 accumulated Gaussian terms, no python-side
loops); variable SLM batch composition becomes a fixed slice + validity
weights; all randomness is explicit (host coins for phase choices, jax PRNG
in-graph).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import optax
import jax.numpy as jnp
import numpy as np

from styletts2_tpu import losses as L
from styletts2_tpu.config import Config
from styletts2_tpu.data.meldataset import Batch
from styletts2_tpu.models.build import TrainingModels
from styletts2_tpu.models.diffusion.sampler import (
    kdiffusion_loss,
    make_denoise_fn,
    sample_adpm2,
)
from styletts2_tpu.models.wavlm import resample_24k_to_16k
from styletts2_tpu.ops.stft import log_norm, preprocess_mel
from styletts2_tpu.train.mp import cast_in, cast_module_params, cast_tree
from styletts2_tpu.train.stage1 import aligner_pass, clip_slice
from styletts2_tpu.train.state import TrainState, apply_module_updates


def soft_alignment(dur_logits, lengths, n_frames, sig=1.5):
    """Differentiable duration → soft alignment (slmadv.py:57-75).

    out[b,i,j] = Σ_{n≤j} dur_logits[b,i,n] · exp(-(loc_i + n - 1 - j)²/2σ²)
    then softmax over tokens i, masked to valid tokens and j < round(Σ dur).
    The Gaussian terms are weighted by the RAW logits — the reference
    convolves `_s2s_pred_org` (pre-sigmoid) with the kernels (slmadv.py:71-74);
    sigmoid enters only the duration/centre/total computations. The n ≤ j
    constraint reproduces the conv1d `[..., :l]` kernel-support truncation
    (kernel index k = n - j + l - 1 must lie in [0, l)).
    Returns (attn (B, T, F), out_frames (B,) int)."""
    B, T, D = dur_logits.shape
    sg = jax.nn.sigmoid(dur_logits)
    valid_tok = (jnp.arange(T)[None, :] < lengths[:, None]).astype(sg.dtype)
    sg = sg * valid_tok[..., None]
    dur = sg.sum(-1)  # (B, T)
    loc = jnp.cumsum(dur, axis=1) - dur / 2.0  # (B, T)
    total = jnp.round(jnp.sum(dur, axis=1)).astype(jnp.int32)  # (B,)
    j = jnp.arange(n_frames)[None, None, :]

    # one scan body instead of D(=50) unrolled Gaussian terms — same
    # sequential accumulation order (bit-identical), ~50× fewer HLO ops
    def body(acc, nd):
        n, dln = nd  # scalar step index, (B, T) logits at that step
        w = jnp.exp(-0.5 * jnp.square(loc[..., None] + n - 1.0 - j) / (sig ** 2))
        w = jnp.where(n <= j, w, 0.0)
        return acc + dln[..., None] * w, None

    out, _ = jax.lax.scan(
        body,
        jnp.zeros((B, T, n_frames), sg.dtype),
        (jnp.arange(D, dtype=sg.dtype), jnp.moveaxis(dur_logits, 2, 0)),
    )
    # softmax over tokens, invalid tokens excluded
    out = jnp.where(valid_tok[..., None] > 0, out, -jnp.inf)
    attn = jax.nn.softmax(out, axis=1)
    frame_valid = (jnp.arange(n_frames)[None, :] < total[:, None]).astype(sg.dtype)
    attn = attn * frame_valid[:, None, :]
    return attn, total


class Stage2Trainer:
    """Stage-2 driver; with finetune=True becomes the train_finetune variant
    (SURVEY.md §3.4): discriminators + TMA losses active from epoch 0,
    text_encoder/text_aligner/style_encoder/decoder trained throughout."""

    def __init__(self, cfg: Config, models: TrainingModels, state: TrainState,
                 finetune: bool = False, mesh=None):
        self.cfg = cfg
        self.models = models
        self.state = state
        self.multispeaker = cfg.model_params.multispeaker
        self.finetune = finetune
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
        self.running_std = []

    # ------------------------------------------------------------------
    def _make_step(self, clip_len, diff_on, joint_on, slm_frames, slm_clip,
                   slm_bs, num_steps):
        cfg = self.cfg
        models = self.models
        lp = cfg.loss_params
        sa = cfg.slmadv_params
        txs = self.state.txs
        ms = self.multispeaker

        ft = self.finetune
        g_keys = ("bert_encoder", "bert", "predictor", "predictor_encoder")
        if diff_on:
            g_keys = g_keys + ("diffusion",)
        if joint_on or ft:
            g_keys = g_keys + ("style_encoder", "decoder")
        if ft:
            g_keys = g_keys + ("text_encoder", "text_aligner")
        d_keys = ("msd", "mpd")
        slm_keys = ("bert_encoder", "bert", "predictor", "diffusion")

        def mv(p, extras, k):
            return {"params": p[k], **extras.get(k, {})}

        def shared_forward(p, extras, batch, key, train=True, update_stats=False):
            """Aligner + styles + bert (train_second.py:265-310). In finetune
            mode the aligner/text-encoder run WITH gradients and their TMA
            losses re-enter g_loss (train_finetune.py vs train_second diff).

            update_stats=True runs one spectral-norm power iteration in the
            full-utterance style-encoder passes and returns the updated u
            vectors (torch runs one per train-mode forward,
            nn.utils.spectral_norm semantics; here: one per optimizer step)."""
            mels = preprocess_mel(batch["waves"])
            mels = mels[:, :, : (mels.shape[-1] // 2) * 2]
            sg = jax.lax.stop_gradient
            if ft:
                al_params = {"text_aligner": {"params": p["text_aligner"]}}
            else:
                al_params = {"text_aligner": {"params": sg(p["text_aligner"])}}
            _, s2s_pred, s2s_attn, mono = aligner_pass(
                models, al_params,
                mels, batch["mel_lengths"], batch["tokens"],
                batch["input_lengths"], key, train=(train and ft),
            )
            t_en = models.text_encoder.apply(
                {"params": p["text_encoder"] if ft else sg(p["text_encoder"])},
                batch["tokens"], batch["input_lengths"],
            )
            if not ft:
                t_en = sg(t_en)
                s2s_attn = sg(s2s_attn)
            asr = jnp.einsum("btc,btl->blc", t_en, mono)
            d_gt = mono.sum(axis=-1)  # (B, T_text)

            # full-utterance styles, batched masked pooling; one spectral-norm
            # power iteration here when update_stats (mutations → sn_mut)
            mpa = self.mp and train
            mels_c = cast_in(mels, mpa)
            mut = ["spectral"] if update_stats else []
            s_dur_full, pe_mut = models.predictor_encoder.apply(
                mv(p, extras, "predictor_encoder"), mels_c,
                lengths=batch["mel_lengths"], update_stats=update_stats,
                mutable=mut,
            )
            gs_full, se_mut = models.style_encoder.apply(
                mv(p, extras, "style_encoder"), mels_c,
                lengths=batch["mel_lengths"], update_stats=update_stats,
                mutable=mut,
            )
            # style vectors re-enter the f32 sequence stack (predictor,
            # diffusion) — upcast at the bf16 module boundary; SN u vectors
            # stored f32
            s_dur_full = cast_tree(s_dur_full, jnp.float32)
            gs_full = cast_tree(gs_full, jnp.float32)
            pe_mut = cast_tree(pe_mut, jnp.float32)
            se_mut = cast_tree(se_mut, jnp.float32)
            sn_mut = {"predictor_encoder": pe_mut, "style_encoder": se_mut}
            s_trg = sg(jnp.concatenate([gs_full, s_dur_full], axis=-1))

            bert_dur = models.bert.apply(
                {"params": p["bert"]}, batch["tokens"],
                (jnp.arange(batch["tokens"].shape[1])[None, :]
                 < batch["input_lengths"][:, None]).astype(jnp.int32),
            )
            d_en = models.bert_encoder.apply({"params": p["bert_encoder"]}, bert_dur)
            return (mels, asr, mono, d_gt, s_dur_full, s_trg, bert_dur, d_en,
                    s2s_pred, s2s_attn, sn_mut)

        # --------------------------------------------------------------
        def gen_forward(g_params, params, extras, batch, starts, st_starts, key,
                        sigma_data):
            """ONE generator forward per step (the reference computes y_rec
            once and feeds it detached to the D loss,
            train_second.py:400-412; round-2 code recomputed the whole
            forward in the D pass). Returns grad-carrying
            (partial_g_loss, y_rec); the adversarial term is added outside
            against the POST-update discriminators via the stored vjp."""
            p = dict(params)
            p.update(g_params)
            # bf16 compute in the heavy modules (decoder, style encoders,
            # Ds, WavLM); sequence stack stays f32 (train/mp.py)
            p = cast_module_params(p, self.mp)
            sg = jax.lax.stop_gradient
            k_al, k_diff, k_samp, k_dec, k_dec2, k_drop = jax.random.split(key, 6)
            (mels, asr, mono, d_gt, s_dur_full, s_trg, bert_dur, d_en,
             s2s_pred, s2s_attn, sn_mut) = shared_forward(
                p, extras, batch, k_al, update_stats=True
            )
            metrics = {}

            # ---- diffusion (train_second.py:313-336)
            if diff_on:
                feats = None
                if ms:
                    ref_mels = cast_in(preprocess_mel(batch["ref_waves"]), self.mp)
                    ref_ss = models.style_encoder.apply(
                        mv(p, extras, "style_encoder"), ref_mels,
                        lengths=batch["ref_mel_lengths"],
                    )
                    ref_sp = models.predictor_encoder.apply(
                        mv(p, extras, "predictor_encoder"), ref_mels,
                        lengths=batch["ref_mel_lengths"],
                    )
                    # features feed the f32 diffusion transformer
                    feats = cast_tree(
                        sg(jnp.concatenate([ref_ss, ref_sp], axis=-1)),
                        jnp.float32,
                    )
                    metrics["_has_feats"] = 1.0

                def net_apply(x, c_noise, train=False, **kw):
                    return models.diffusion.apply(
                        {"params": p["diffusion"]}, x, c_noise, bert_dur,
                        features=feats, embedding_mask_proba=0.1, train=train,
                        rngs={"noise": k_diff},
                    )

                loss_diff = kdiffusion_loss(
                    lambda x, c, **kw: net_apply(x, c, train=True),
                    s_trg[:, None, :], k_diff, sigma_data,
                    dist_mean=cfg.model_params.diffusion.dist.mean,
                    dist_std=cfg.model_params.diffusion.dist.std,
                )
                denoise = make_denoise_fn(net_apply, sigma_data)
                noise = jax.random.normal(k_samp, s_trg[:, None, :].shape)
                # trainer samples 3 or 4 steps (train_second.py:314); the
                # step count must be static → branch on a host coin
                # 3-or-4 sampler steps is a STATIC choice per compiled step
                # variant (train_second.py:314 samples it per iteration; the
                # round-2 code computed BOTH trajectories every step and
                # jnp.where-selected — 2× sampler compute, larger compile)
                s_preds = sample_adpm2(
                    denoise, noise, k_samp, num_steps=num_steps
                )[:, 0]
                loss_sty = jnp.mean(jnp.abs(s_preds - sg(s_trg)))
                metrics.update(diff=loss_diff, sty=loss_sty)
            else:
                loss_diff = 0.0
                loss_sty = 0.0

            # ---- prosody predictor (train_second.py:341-344)
            dur_logits, p_seq = models.predictor.apply(
                {"params": p["predictor"]}, d_en, s_dur_full,
                batch["input_lengths"], mono, train=True,
                rngs={"dropout": k_drop},
            )

            # ---- clips (train_second.py:346-377)
            en = clip_slice(asr, starts, clip_len)
            p_en = clip_slice(p_seq, starts, clip_len)
            gt = clip_slice(mels, starts * 2, 2 * clip_len, axis=2)
            st = clip_slice(mels, st_starts * 2, 2 * clip_len, axis=2)
            wav_clip = clip_slice(batch["waves"], starts * 600, clip_len * 600)

            style_in = cast_in(st if ms else gt, self.mp)
            s_dur_clip = cast_tree(  # → f32: consumed by the f32 predictor
                models.predictor_encoder.apply(
                    mv(p, extras, "predictor_encoder"), style_in,
                    update_stats=False,
                ),
                jnp.float32,
            )
            s_clip = models.style_encoder.apply(  # stays bf16 → decoder
                mv(p, extras, "style_encoder"), style_in, update_stats=False
            )

            F0_real, _, _ = models.pitch_extractor.apply(
                mv(p, extras, "pitch_extractor"), gt
            )
            F0_real = sg(F0_real)
            N_real = sg(log_norm(gt))
            en_c = cast_in(en, self.mp)
            # `train` positional everywhere the decoder is applied in the
            # trainers: cfg.remat_decoder lifts it through nn.remat with
            # static_argnums=(5,) (models/build.py)
            y_rec_gt_pred = sg(
                models.decoder.apply(
                    {"params": sg(p["decoder"])}, en_c, cast_in(F0_real, self.mp),
                    cast_in(N_real, self.mp), sg(s_clip), False,
                    rngs={"noise": k_dec},
                )
            )
            wav_tgt = wav_clip if joint_on else y_rec_gt_pred

            F0_fake, N_fake = models.predictor.apply(
                {"params": p["predictor"]}, p_en, s_dur_clip, method="F0Ntrain",
                train=True, rngs={"dropout": k_drop},
            )
            y_rec = models.decoder.apply(
                {"params": p["decoder"]}, en_c, cast_in(F0_fake, self.mp),
                cast_in(N_fake, self.mp), s_clip,
                joint_on, rngs={"noise": k_dec2},
            )

            loss_F0 = L.smooth_l1(F0_real, F0_fake) / 10.0
            loss_norm = L.smooth_l1(N_real, N_fake)
            loss_mel = L.multires_stft_loss(y_rec, wav_tgt)

            wav16 = cast_in(resample_24k_to_16k(sg(wav_tgt)), self.mp)
            rec16 = cast_in(resample_24k_to_16k(y_rec), self.mp)
            wl_params = {
                "params": cast_module_params(
                    {"wavlm": sg(params["wavlm"])}, self.mp
                )["wavlm"]
            }
            real_states = [sg(h) for h in models.wavlm.apply(wl_params, wav16)]
            rec_states = models.wavlm.apply(wl_params, rec16)
            loss_slm = L.wavlm_feature_loss(real_states, rec_states)

            dur_pred_sum = jax.nn.sigmoid(dur_logits).sum(-1)
            loss_ce = L.duration_ce_loss(dur_logits, d_gt, batch["input_lengths"])
            loss_dur = L.duration_l1_loss(dur_pred_sum, d_gt, batch["input_lengths"])

            # NOTE: the λ_gen adversarial term is intentionally absent here —
            # it is computed in `step` against the post-update discriminators
            # and folded in through the vjp cotangent on y_rec.
            g_loss = (
                lp.lambda_mel * loss_mel
                + lp.lambda_F0 * loss_F0
                + lp.lambda_ce * loss_ce
                + lp.lambda_norm * loss_norm
                + lp.lambda_dur * loss_dur
                + lp.lambda_slm * loss_slm
                + lp.lambda_sty * loss_sty
                + lp.lambda_diff * loss_diff
            )
            if ft:
                from styletts2_tpu.train.stage1 import s2s_ce_loss

                loss_s2s = s2s_ce_loss(
                    s2s_pred, batch["tokens"], batch["input_lengths"]
                )
                loss_mono = jnp.mean(jnp.abs(s2s_attn - mono)) * 10.0
                g_loss = g_loss + lp.lambda_s2s * loss_s2s + lp.lambda_mono * loss_mono
                metrics.update(s2s=loss_s2s, mono=loss_mono)
            metrics.update(
                mel=loss_mel, F0=loss_F0, ce=loss_ce, norm=loss_norm,
                dur=loss_dur, slm=loss_slm, g_loss=g_loss,
            )
            aux = {
                "s_trg": s_trg,
                "bert_dur": bert_dur,
                "d_en": d_en,
                "wav_tgt": wav_tgt,
                "y_rec_gt": wav_clip,
                "y_rec_gt_pred": y_rec_gt_pred,
                "sn_mut": sn_mut,
            }
            if diff_on and ms:
                aux["ref_feats"] = feats
            return (g_loss, y_rec), (metrics, aux)

        # --------------------------------------------------------------
        def slm_gen_loss_fn(slm_params, params, extras, batch, key,
                            sigma_data, aux, use_ind_flag):
            """SLM-adversarial generator pass (slmadv.py:20-190)."""
            p = dict(params)
            p.update(slm_params)
            sg = jax.lax.stop_gradient
            k_samp, k_start, k_start2, k_drop = jax.random.split(key, 4)
            K = slm_bs
            ref_tokens = batch["ref_tokens"][:K]
            ref_lengths = batch["ref_lengths"][:K]
            T_ref = ref_tokens.shape[1]
            valid = (jnp.arange(T_ref)[None, :] < ref_lengths[:, None]).astype(jnp.int32)

            bert_dur = models.bert.apply({"params": p["bert"]}, ref_tokens, valid)
            d_en = models.bert_encoder.apply({"params": p["bert_encoder"]}, bert_dur)

            s_trg = aux["s_trg"][:K]

            def net_apply(x, c_noise, **kw):
                return models.diffusion.apply(
                    {"params": p["diffusion"]}, x, c_noise, bert_dur,
                    features=aux.get("ref_feats"), embedding_mask_proba=0.1,
                    train=True, rngs={"noise": k_samp},
                )

            denoise = make_denoise_fn(net_apply, sigma_data)
            noise = jax.random.normal(k_samp, s_trg[:, None, :].shape)
            s_sampled = sample_adpm2(
                denoise, noise, k_samp, num_steps=num_steps
            )[:, 0]
            s_preds = jnp.where(use_ind_flag > 0, s_trg, s_sampled)

            sdim = cfg.model_params.style_dim  # ref hardcodes 128 (slmadv.py:44-45)
            s_dur = s_preds[:, sdim:]
            s_ac = s_preds[:, :sdim]

            d_only = models.predictor.apply(
                {"params": p["predictor"]}, d_en, s_dur, ref_lengths,
                method="encode_texts", train=True, rngs={"dropout": k_drop},
            )
            dur_logits = models.predictor.apply(
                {"params": p["predictor"]}, d_only, ref_lengths,
                method="duration", train=True, rngs={"dropout": k_drop},
            )
            attn, total = soft_alignment(
                dur_logits, ref_lengths, slm_frames, sig=sa.sig
            )

            t_en = sg(
                models.text_encoder.apply(
                    {"params": sg(params["text_encoder"])}, ref_tokens, ref_lengths
                )
            )
            asr_pred = jnp.einsum("btc,btf->bfc", t_en, attn)
            _, p_pred = models.predictor.apply(
                {"params": p["predictor"]}, d_en, s_dur, ref_lengths, attn,
                train=True, rngs={"dropout": k_drop},
            )

            # validity + random clip starts (slmadv.py:117-140)
            gt_half = batch["mel_lengths"][:K] // 2
            valid_b = (total > slm_clip) & (gt_half > slm_clip)
            max_start = jnp.maximum(jnp.minimum(total, slm_frames) - slm_clip, 1)
            starts = (
                jax.random.uniform(k_start, (K,)) * max_start
            ).astype(jnp.int32)
            en = clip_slice(asr_pred, starts, slm_clip)
            p_en = clip_slice(p_pred, starts, slm_clip)

            F0_fake, N_fake = models.predictor.apply(
                {"params": p["predictor"]}, p_en, s_dur, method="F0Ntrain",
                train=True, rngs={"dropout": k_drop},
            )
            dec_wl = cast_module_params(
                {"decoder": sg(params["decoder"]), "wavlm": sg(params["wavlm"])},
                self.mp,
            )
            y_pred = models.decoder.apply(
                {"params": dec_wl["decoder"]}, cast_in(en, self.mp),
                cast_in(F0_fake, self.mp), cast_in(N_fake, self.mp),
                cast_in(s_ac, self.mp), False,
                rngs={"noise": k_start2},
            )
            # generator LSGAN loss through frozen WavLM + wd head
            rec16 = cast_in(resample_24k_to_16k(y_pred), self.mp)
            states = models.wavlm.apply({"params": dec_wl["wavlm"]}, rec16)
            d_g = models.wd.apply(
                {"params": sg(params["wd"])}, L.stack_wavlm_states(states)
            )
            w = valid_b.astype(jnp.float32)[:, None]
            gen_loss = jnp.sum(((1.0 - d_g) ** 2) * w) / jnp.maximum(
                jnp.sum(w) * d_g.shape[1], 1.0
            )
            return gen_loss, (y_pred, valid_b)

        # --------------------------------------------------------------
        def slm_d_loss_fn(wd_params, params, batch, y_pred, aux, valid_b,
                          use_rec_flag, key):
            """SLM discriminator update (slmadv.py:142-180 + recon reg)."""
            sg = jax.lax.stop_gradient
            K = slm_bs
            wd_vars = {"params": wd_params["wd"]}
            wl_params = {
                "params": cast_module_params(
                    {"wavlm": sg(params["wavlm"])}, self.mp
                )["wavlm"]
            }

            gt_half = batch["mel_lengths"][:K] // 2
            max_start = jnp.maximum(gt_half - slm_clip, 1)
            starts = (jax.random.uniform(key, (K,)) * max_start).astype(jnp.int32)
            wav = clip_slice(batch["waves"][:K], starts * 600, slm_clip * 600)
            real = jnp.where(use_rec_flag > 0, aux["y_rec_gt_pred_slm"], wav)

            def wd_of(x):
                x16 = cast_in(resample_24k_to_16k(sg(x)), self.mp)
                st = models.wavlm.apply(wl_params, x16)
                return models.wd.apply(wd_vars, L.stack_wavlm_states([sg(h) for h in st]))

            d_r = wd_of(real)
            d_g = wd_of(y_pred)
            w = valid_b.astype(jnp.float32)[:, None]
            denom = jnp.maximum(jnp.sum(w) * d_r.shape[1], 1.0)
            d_loss = (
                jnp.sum(((1.0 - d_r) ** 2) * w) + jnp.sum((d_g ** 2) * w)
            ) / denom
            # reconstruction-invariance regularizer (slmadv.py:172-177)
            out_gt = wd_of(aux["y_rec_gt"])
            out_rec = wd_of(aux["y_rec_gt_pred"])
            d_loss = d_loss + jnp.mean(jnp.abs(out_gt - out_rec)) * (
                use_rec_flag > 0
            ).astype(jnp.float32)
            return d_loss

        # --------------------------------------------------------------
        @jax.jit
        def step(params, extras, opt_states, batch, starts, st_starts, key,
                 sigma_data, coins):
            sg = jax.lax.stop_gradient
            metrics = {}
            k_d, k_g, k_slm, k_slmd = jax.random.split(key, 4)

            # σ_data batch estimate (train_second.py:316-318) needs s_trg:
            # computed inside gen_forward; we fold the update after the step.

            g_params = {k: params[k] for k in g_keys}
            (partial_loss, y_rec), vjp_fn, (g_metrics, aux) = jax.vjp(
                lambda gp: gen_forward(
                    gp, params, extras, batch, starts, st_starts, k_g,
                    sigma_data,
                ),
                g_params,
                has_aux=True,
            )
            wav_tgt = cast_in(sg(aux["wav_tgt"]), self.mp)

            if diff_on or ft:
                # --- discriminator update first, on detached y_rec
                # (train_second.py:407-412)
                y_sg = cast_in(sg(y_rec), self.mp)

                def d_loss_fn(d_params):
                    dp = cast_module_params(d_params, self.mp)
                    mpd_out = models.mpd.apply({"params": dp["mpd"]}, wav_tgt, y_sg)
                    msd_out = models.msd.apply({"params": dp["msd"]}, wav_tgt, y_sg)
                    return L.discriminator_adv_loss(mpd_out, msd_out)

                d_params = {k: params[k] for k in d_keys}
                d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_params)
                params, opt_states = apply_module_updates(
                    params, opt_states, d_grads, txs, d_keys
                )
                metrics["d_loss"] = d_loss

                # --- generator adversarial term against the updated Ds
                def adv_fn(y):
                    dp = cast_module_params(
                        {"mpd": sg(params["mpd"]), "msd": sg(params["msd"])},
                        self.mp,
                    )
                    y = cast_in(y, self.mp)
                    mpd_out = models.mpd.apply({"params": dp["mpd"]}, wav_tgt, y)
                    msd_out = models.msd.apply({"params": dp["msd"]}, wav_tgt, y)
                    return L.generator_adv_loss(mpd_out, msd_out)

                loss_gen, y_cot = jax.value_and_grad(adv_fn)(y_rec)
                (g_grads,) = vjp_fn(
                    (jnp.ones_like(partial_loss), lp.lambda_gen * y_cot)
                )
                g_metrics = dict(
                    g_metrics,
                    gen=loss_gen,
                    g_loss=g_metrics["g_loss"] + lp.lambda_gen * loss_gen,
                )
            else:
                (g_grads,) = vjp_fn(
                    (jnp.ones_like(partial_loss), jnp.zeros_like(y_rec))
                )
            params, opt_states = apply_module_updates(
                params, opt_states, g_grads, txs, g_keys
            )
            metrics.update(g_metrics)

            # fold the spectral-norm u updates into the carried extras
            # (stage-1 does the same for style_encoder, stage1.py:229-232)
            sn_mut = jax.lax.stop_gradient(aux.pop("sn_mut"))
            extras = dict(extras)
            for mk, mm in sn_mut.items():
                if mm:
                    extras[mk] = dict(extras.get(mk, {}))
                    extras[mk].update(mm)

            new_sigma = jnp.mean(jnp.std(aux["s_trg"], axis=-1))

            if joint_on:
                rec = sg(aux["y_rec_gt_pred"])[:slm_bs]
                need = slm_clip * 600
                if rec.shape[1] < need:
                    rec = jnp.pad(rec, ((0, 0), (0, need - rec.shape[1])))
                else:
                    rec = rec[:, :need]
                aux_slm = {
                    "s_trg": sg(aux["s_trg"]),
                    "y_rec_gt": sg(aux["y_rec_gt"]),
                    "y_rec_gt_pred": sg(aux["y_rec_gt_pred"]),
                    "y_rec_gt_pred_slm": rec,
                }
                if "ref_feats" in aux:
                    aux_slm["ref_feats"] = sg(aux["ref_feats"])[:slm_bs]
                slm_params = {k: params[k] for k in slm_keys}
                (slm_loss, (y_pred, valid_b)), slm_grads = jax.value_and_grad(
                    slm_gen_loss_fn, has_aux=True
                )(slm_params, params, extras, batch, k_slm, sigma_data, aux_slm,
                  coins["use_ind"])

                # reference grad post-processing (train_second.py:498-525)
                pred_norm = optax.global_norm(slm_grads["predictor"])
                scale_all = jnp.where(
                    pred_norm > sa.thresh, 1.0 / jnp.maximum(pred_norm, 1e-8), 1.0
                )
                slm_grads = jax.tree.map(lambda g: g * scale_all, slm_grads)

                def scale_sub(tree, subkeys, factor):
                    t = dict(tree)
                    for skk in subkeys:
                        if skk in t:
                            t[skk] = jax.tree.map(lambda g: g * factor, t[skk])
                    return t

                slm_grads["predictor"] = scale_sub(
                    slm_grads["predictor"], ("duration_proj", "lstm"), sa.scale
                )
                slm_grads["diffusion"] = jax.tree.map(
                    lambda g: g * sa.scale, slm_grads["diffusion"]
                )
                params, opt_states = apply_module_updates(
                    params, opt_states, slm_grads, txs, slm_keys
                )
                metrics["slm_gen"] = slm_loss
                # fraction of SLM items contributing (validity weight > 0):
                # quantifies the static-composition deviation vs the
                # reference's dynamic skip/resample loop (slmadv.py:117-140)
                # — if this sits at 1.0 over training, the fixed slice and
                # the dynamic loop see the same batches (docs/ROADMAP.md A/B)
                metrics["slm_valid_frac"] = jnp.mean(
                    valid_b.astype(jnp.float32)
                )

                # SLM discriminator every `iter` steps (coins["slm_d"])
                def run_wd(params, opt_states):
                    wd_params = {"wd": params["wd"]}
                    wd_loss, wd_grads = jax.value_and_grad(slm_d_loss_fn)(
                        wd_params, params, batch, sg(y_pred), aux_slm, valid_b,
                        coins["use_rec"], k_slmd,
                    )
                    pp, oo = apply_module_updates(
                        params, opt_states, wd_grads, txs, ("wd",)
                    )
                    return pp, oo, wd_loss

                def skip_wd(params, opt_states):
                    return params, opt_states, jnp.asarray(0.0)

                do_wd = coins["slm_d"] > 0
                # static python branch is not possible (traced coin) → run
                # both via cond on the small wd update only
                params, opt_states, wd_loss = jax.lax.cond(
                    do_wd, run_wd, skip_wd, params, opt_states
                )
                metrics["slm_d"] = wd_loss

            return params, extras, opt_states, metrics, new_sigma

        return step

    # ------------------------------------------------------------------
    def _val_fn(self, clip_len: int):
        """Jitted validation losses (train_second.py:569-676). Must be jit:
        ops like the iSTFT's irfft only lower inside jit on TPU."""
        key_ = ("val", clip_len)
        if key_ in self._eval_fns:
            return self._eval_fns[key_]
        models = self.models

        @jax.jit
        def f(p, extras, bdict, starts, key):
            mels = preprocess_mel(bdict["waves"])
            mels = mels[:, :, : (mels.shape[-1] // 2) * 2]
            _, _, _, mono = aligner_pass(
                models, {"text_aligner": {"params": p["text_aligner"]}},
                mels, bdict["mel_lengths"], bdict["tokens"],
                bdict["input_lengths"], key, train=False,
            )
            t_en = models.text_encoder.apply(
                {"params": p["text_encoder"]}, bdict["tokens"], bdict["input_lengths"]
            )
            asr = jnp.einsum("btc,btl->blc", t_en, mono)
            d_gt = mono.sum(axis=-1)
            s_dur_full = models.predictor_encoder.apply(
                {"params": p["predictor_encoder"], **extras.get("predictor_encoder", {})},
                mels, lengths=bdict["mel_lengths"],
            )
            valid = (jnp.arange(bdict["tokens"].shape[1])[None, :]
                     < bdict["input_lengths"][:, None]).astype(jnp.int32)
            bert_dur = models.bert.apply({"params": p["bert"]}, bdict["tokens"], valid)
            d_en = models.bert_encoder.apply({"params": p["bert_encoder"]}, bert_dur)
            dur_logits, p_seq = models.predictor.apply(
                {"params": p["predictor"]}, d_en, s_dur_full,
                bdict["input_lengths"], mono,
            )
            en = clip_slice(asr, starts, clip_len)
            p_en = clip_slice(p_seq, starts, clip_len)
            gt = clip_slice(mels, starts * 2, 2 * clip_len, axis=2)
            wav_clip = clip_slice(bdict["waves"], starts * 600, clip_len * 600)
            s_dur_clip = models.predictor_encoder.apply(
                {"params": p["predictor_encoder"], **extras.get("predictor_encoder", {})}, gt
            )
            s_clip = models.style_encoder.apply(
                {"params": p["style_encoder"], **extras.get("style_encoder", {})}, gt
            )
            F0_real, _, _ = models.pitch_extractor.apply(
                {"params": p["pitch_extractor"], **extras.get("pitch_extractor", {})}, gt
            )
            F0_fake, N_fake = models.predictor.apply(
                {"params": p["predictor"]}, p_en, s_dur_clip, method="F0Ntrain"
            )
            y_rec = models.decoder.apply(
                {"params": p["decoder"]}, en, F0_fake, N_fake, s_clip, False,
                rngs={"noise": key},
            )
            dur_pred_sum = jax.nn.sigmoid(dur_logits).sum(-1)
            return {
                "mel": L.multires_stft_loss(y_rec, wav_clip),
                "dur": L.duration_l1_loss(dur_pred_sum, d_gt, bdict["input_lengths"]),
                "F0": L.smooth_l1(F0_real, F0_fake) / 10.0,
            }

        self._eval_fns[key_] = f
        return f

    def validate(self, batch: Batch, rng: np.random.Generator) -> Optional[Dict[str, float]]:
        """Validation mel/dur/F0 losses (train_second.py:569-676)."""
        cfg = self.cfg
        half = batch.mel_lengths // 2
        clip_len = int(min(int(half.min()) - 1, cfg.max_len // 2))
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
        out = self._val_fn(clip_len)(
            self.state.params, self.state.extras, bdict, jnp.asarray(starts), key
        )
        return {k: float(v) for k, v in out.items()}

    # ------------------------------------------------------------------
    def eval_artifacts(self, batch: Batch, rng: np.random.Generator,
                       sample: bool = False):
        """Per-epoch TB audio (train_second.py:685-768): predicted-prosody
        reconstruction before joint training; from joint_epoch on, the FULL
        text→speech sampling path (diffusion style + predicted durations),
        mirroring the inference flow."""
        cfg = self.cfg
        models = self.models
        p = self.state.params
        extras = self.state.extras
        key = jax.random.PRNGKey(int(rng.integers(0, 2 ** 31)))
        audio = {}

        if not sample:
            half = batch.mel_lengths // 2
            clip_len = int(min(int(half.min()) - 1, cfg.max_len // 2))
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
            y_rec, wav_clip = self._artifact_recon_fn(clip_len)(
                p, extras, bdict, jnp.asarray(starts), key
            )
            for b in range(min(3, y_rec.shape[0])):
                audio[f"y_rec_{b}"] = np.asarray(y_rec[b])
                audio[f"gt_{b}"] = np.asarray(wav_clip[b])
            return {"audio": audio}

        # ---- full sampling path (epoch >= joint_epoch): two jitted stages
        # with one host sync for the realized frame count
        bdict = {
            "waves": jnp.asarray(batch.waves[:1]),
            "tokens": jnp.asarray(batch.tokens[:1]),
            "input_lengths": jnp.asarray(batch.input_lengths[:1]),
            "mel_lengths": jnp.asarray(batch.mel_lengths[:1]),
        }
        d, s, ref, t_en, pred_dur = self._artifact_sample_a_fn()(
            p, extras, bdict, jnp.asarray(float(self.state.sigma_data)), key
        )
        total = int(np.asarray(pred_dur).sum())
        # bucket the data-dependent frame total to a 100-frame grid (as
        # inference.py's _bucket does) so sampled durations don't compile a
        # fresh executable every epoch; trim the decoded wav back to the
        # realized length (600 samples/frame at the predictor frame rate)
        bucket = max(100, -(-total // 100) * 100)
        wav = self._artifact_sample_b_fn(bucket)(
            p, t_en, d, s, ref, pred_dur, jax.random.fold_in(key, 3)
        )
        audio["sampled_0"] = np.asarray(wav[0])[: total * 600]
        audio["gt_0"] = np.asarray(
            batch.waves[0][: int(batch.wave_lengths[0])]
        )
        return {"audio": audio}

    def _artifact_recon_fn(self, clip_len: int):
        key_ = ("art_recon", clip_len)
        if key_ in self._eval_fns:
            return self._eval_fns[key_]
        models = self.models

        @jax.jit
        def f(p, extras, bdict, starts, key):
            mels = preprocess_mel(bdict["waves"])
            mels = mels[:, :, : (mels.shape[-1] // 2) * 2]
            _, _, _, mono = aligner_pass(
                models, {"text_aligner": {"params": p["text_aligner"]}},
                mels, bdict["mel_lengths"], bdict["tokens"],
                bdict["input_lengths"], key, train=False,
            )
            t_en = models.text_encoder.apply(
                {"params": p["text_encoder"]}, bdict["tokens"], bdict["input_lengths"]
            )
            asr = jnp.einsum("btc,btl->blc", t_en, mono)
            valid = (jnp.arange(bdict["tokens"].shape[1])[None, :]
                     < bdict["input_lengths"][:, None]).astype(jnp.int32)
            bert_dur = models.bert.apply({"params": p["bert"]}, bdict["tokens"], valid)
            d_en = models.bert_encoder.apply({"params": p["bert_encoder"]}, bert_dur)
            s_dur_full = models.predictor_encoder.apply(
                {"params": p["predictor_encoder"], **extras.get("predictor_encoder", {})},
                mels, lengths=bdict["mel_lengths"],
            )
            _, p_seq = models.predictor.apply(
                {"params": p["predictor"]}, d_en, s_dur_full,
                bdict["input_lengths"], mono,
            )
            en = clip_slice(asr, starts, clip_len)
            p_en = clip_slice(p_seq, starts, clip_len)
            gt = clip_slice(mels, starts * 2, 2 * clip_len, axis=2)
            wav_clip = clip_slice(bdict["waves"], starts * 600, clip_len * 600)
            s_dur_clip = models.predictor_encoder.apply(
                {"params": p["predictor_encoder"], **extras.get("predictor_encoder", {})}, gt
            )
            s_clip = models.style_encoder.apply(
                {"params": p["style_encoder"], **extras.get("style_encoder", {})}, gt
            )
            F0_fake, N_fake = models.predictor.apply(
                {"params": p["predictor"]}, p_en, s_dur_clip, method="F0Ntrain"
            )
            y_rec = models.decoder.apply(
                {"params": p["decoder"]}, en, F0_fake, N_fake, s_clip, False,
                rngs={"noise": key},
            )
            return y_rec, wav_clip

        self._eval_fns[key_] = f
        return f

    def _artifact_sample_a_fn(self):
        key_ = "art_sample_a"
        if key_ in self._eval_fns:
            return self._eval_fns[key_]
        models = self.models
        cfg = self.cfg
        sd = cfg.model_params.style_dim
        ms = self.multispeaker

        @jax.jit
        def f(p, extras, bdict, sigma_data, key):
            from styletts2_tpu.models.diffusion.sampler import (
                make_denoise_fn as _mk, sample_adpm2 as _samp,
            )

            tokens = bdict["tokens"]
            lengths = bdict["input_lengths"]
            valid = (jnp.arange(tokens.shape[1])[None, :]
                     < lengths[:, None]).astype(jnp.int32)
            bert_dur = models.bert.apply({"params": p["bert"]}, tokens, valid)
            d_en = models.bert_encoder.apply({"params": p["bert_encoder"]}, bert_dur)

            feats = None
            if ms:
                mels = preprocess_mel(bdict["waves"])
                gs = models.style_encoder.apply(
                    {"params": p["style_encoder"], **extras.get("style_encoder", {})},
                    mels, lengths=bdict["mel_lengths"],
                )
                sp = models.predictor_encoder.apply(
                    {"params": p["predictor_encoder"], **extras.get("predictor_encoder", {})},
                    mels, lengths=bdict["mel_lengths"],
                )
                feats = jnp.concatenate([gs, sp], axis=-1)

            def net_apply(x, c_noise, **kw):
                return models.diffusion.apply(
                    {"params": p["diffusion"]}, x, c_noise, bert_dur,
                    features=feats, embedding_lengths=lengths,
                )

            denoise = _mk(net_apply, sigma_data)
            k_n, k_s = jax.random.split(key)
            noise = jax.random.normal(k_n, (tokens.shape[0], 1, 2 * sd))
            s_pred = _samp(denoise, noise, k_s, num_steps=5)[:, 0, :]
            s, ref = s_pred[:, sd:], s_pred[:, :sd]
            d = models.predictor.apply(
                {"params": p["predictor"]}, d_en, s, lengths, method="encode_texts"
            )
            dur_logits = models.predictor.apply(
                {"params": p["predictor"]}, d, lengths, method="duration"
            )
            pred_dur = jnp.maximum(
                jnp.round(jax.nn.sigmoid(dur_logits).sum(-1)), 1.0
            )
            pred_dur = jnp.where(
                jnp.arange(tokens.shape[1])[None, :] < lengths[:, None],
                pred_dur, 0.0,
            ).astype(jnp.int32)
            t_en = models.text_encoder.apply(
                {"params": p["text_encoder"]}, tokens, lengths
            )
            return d, s, ref, t_en, pred_dur

        self._eval_fns[key_] = f
        return f

    def _artifact_sample_b_fn(self, total: int):
        key_ = ("art_sample_b", total)
        if key_ in self._eval_fns:
            return self._eval_fns[key_]
        models = self.models

        @jax.jit
        def f(p, t_en, d, s, ref, pred_dur, key):
            from styletts2_tpu.utils import duration_to_alignment

            aln = duration_to_alignment(pred_dur, total)
            en = jnp.einsum("btc,btf->bfc", d, aln)
            F0_pred, N_pred = models.predictor.apply(
                {"params": p["predictor"]}, en, s, method="F0Ntrain"
            )
            asr = jnp.einsum("btc,btf->bfc", t_en, aln)
            return models.decoder.apply(
                {"params": p["decoder"]}, asr, F0_pred, N_pred, ref, False,
                rngs={"noise": key},
            )

        self._eval_fns[key_] = f
        return f

    # ------------------------------------------------------------------
    def train_step(self, batch: Batch, epoch: int, iters: int,
                   rng: np.random.Generator) -> Optional[Dict[str, float]]:
        cfg = self.cfg
        diff_on = epoch >= cfg.loss_params.diff_epoch
        joint_on = epoch >= cfg.loss_params.joint_epoch

        half = batch.mel_lengths // 2
        clip_len = int(min(int(half.min()) - 1, cfg.max_len // 2))
        cb = self.cfg.clip_frame_bucket
        clip_len = max(cb, (clip_len // cb) * cb)
        if int(half.min()) - 1 < cb:
            return None
        starts = rng.integers(0, np.maximum(half - clip_len, 1)).astype(np.int32)
        st_starts = rng.integers(0, np.maximum(half - clip_len, 1)).astype(np.int32)

        sa = cfg.slmadv_params
        slm_clip = sa.min_len // 2
        slm_frames = max(sa.max_len, 2 * slm_clip + 40)
        slm_bs = max(2, int(len(batch.mel_lengths) * sa.batch_percentage))

        # 3-or-4 diffusion sampler steps (train_second.py:314): static per
        # compiled variant — two executables total, each running ONE sampler
        num_steps = 3 + int(rng.integers(0, 2))
        skey = (batch.tokens.shape[1], batch.waves.shape[1],
                batch.ref_tokens.shape[1], clip_len, diff_on, joint_on,
                num_steps)
        if skey not in self._steps:
            self._steps[skey] = self._make_step(
                clip_len, diff_on, joint_on, slm_frames, slm_clip, slm_bs,
                num_steps,
            )
        step = self._steps[skey]

        use_ind = rng.random() < 0.5
        from styletts2_tpu.parallel.mesh import place_batch

        bdict = place_batch(
            {
                "waves": np.asarray(batch.waves),
                "tokens": np.asarray(batch.tokens),
                "input_lengths": np.asarray(batch.input_lengths),
                "mel_lengths": np.asarray(batch.mel_lengths),
                "ref_tokens": np.asarray(
                    batch.tokens if use_ind else batch.ref_tokens
                ),
                "ref_lengths": np.asarray(
                    batch.input_lengths if use_ind else batch.ref_lengths
                ),
                "ref_waves": np.asarray(batch.ref_waves),
                "ref_mel_lengths": np.asarray(
                    np.minimum(batch.ref_wave_lengths // 300 + 1, batch.ref_waves.shape[1] // 300)
                ),
            },
            self.mesh,
        )
        coins = {
            "use_ind": jnp.asarray(int(use_ind and rng.random() < 0.5)),
            "use_rec": jnp.asarray(int(rng.integers(0, 2))),
            "slm_d": jnp.asarray(int((iters + 1) % sa.iter == 0)),
        }
        placed = place_batch({"starts": starts, "st_starts": st_starts}, self.mesh)
        key = jax.random.PRNGKey(int(rng.integers(0, 2 ** 31)))
        step_args = (
            self.state.params, self.state.extras, self.state.opt_states,
            bdict, placed["starts"], placed["st_starts"], key,
            jnp.asarray(self.state.sigma_data, jnp.float32), coins,
        )
        # bench_train.py re-lowers the cached step with these to pull FLOPs
        # from XLA's compiled-module cost analysis (MFU reporting)
        self._last_step = (step, step_args)
        params, extras, opt_states, metrics, new_sigma = step(*step_args)
        self.state.params = params
        self.state.extras = extras
        self.state.opt_states = opt_states
        self.state.step += 1
        if diff_on and cfg.model_params.diffusion.dist.estimate_sigma_data:
            self.state.sigma_data = float(new_sigma)
            self.running_std.append(self.state.sigma_data)
        return {k: float(v) for k, v in metrics.items()}

