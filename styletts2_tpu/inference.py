"""End-to-end synthesis: the packaged equivalent of the reference notebooks.

API parity (Demo/Inference_LJSpeech.ipynb cell 17, Inference_LibriTTS.ipynb
cells 5/16/42/45): `Synthesizer.inference(text, ...)`, `compute_style(wave)`,
`LFinference(...)` with style carry-over, `STinference(...)`; plus batched
length-masked synthesis, which the reference does not offer.

TPU-native structure: the pipeline runs as a chain of medium-size jitted
stages with static shape buckets — phase A (text+BERT encoding, lax.scan
ADPM2 style diffusion per steps/CFG-scale, duration) in one dispatch, then
per-frame-bucket prosody/alignment and decoder stages. Weights live on the
accelerator; the only host syncs per utterance are the integer durations
(frame-bucket choice) and the final PCM16 waveform. See
docs/PERFORMANCE.md for why this layout wins on tunneled TPU runtimes.
`inference_fused` offers the single-dispatch whole-graph alternative.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from styletts2_tpu.config import Config
from styletts2_tpu.models.build import Models, build_models, init_params
from styletts2_tpu.models.diffusion.sampler import make_denoise_fn, sample_adpm2
from styletts2_tpu.ops.stft import preprocess_mel
from styletts2_tpu.text import encode_text
from styletts2_tpu.utils import duration_to_alignment


def _bucket(n: int, step: int, minimum: int) -> int:
    return max(minimum, ((n + step - 1) // step) * step)


class Synthesizer:
    """Holds model defs + params and exposes the reference inference API."""

    def __init__(
        self,
        cfg: Config,
        params: Optional[Dict] = None,
        seed: int = 0,
        text_bucket: int = 64,
        frame_bucket: int = 100,
        sigma_data: float = 0.2,
        decoder_dtype: Optional[str] = None,
        phase_a: str = "staged",
    ):
        """decoder_dtype: 'float32' (default) | 'bfloat16'.
        The bf16 decoder path (the reference's fp16 analog,
        train_finetune_accelerate.py:33-35) keeps f32 islands for sine
        phase, normalization statistics, weight-norm and the iSTFT head, and
        roughly halves decoder HBM traffic on TPU. It is OPT-IN: on
        random/converted weights the measured compute-precision MCD delta is
        ~1 dB (TPU, identical bf16-rounded params) — the random-init decoder
        chaotically amplifies activation rounding, so the ≤0.5 dB budget is
        not demonstrably met without trained checkpoints. Methodology and
        numbers in docs/PERFORMANCE.md; regression bound in
        tests/test_bf16.py.

        phase_a: 'staged' (default) | 'fused'. Single-stream inference()
        runs its text→style→duration phase either as three chained
        medium-size executables or as one fused dispatch. On the tunneled
        TPU runtime per-call cost GROWS with executable size
        (docs/PERFORMANCE.md "What mattered" #2), and fusing phase A was
        the round-3 single-stream regression (53.8×→43.9×, p50 144→174 ms)
        — so staged is the default; 'fused' remains for backends with a
        true fixed per-dispatch floor. Batched inference always uses the
        fused phase A (B amortizes the size-dependent cost)."""
        self.cfg = cfg
        self.models = build_models(cfg)
        self.multispeaker = cfg.model_params.multispeaker
        self.hifigan = cfg.model_params.decoder.type == "hifigan"
        self.style_dim = cfg.model_params.style_dim
        self.sigma_data = sigma_data
        self.text_bucket = text_bucket
        self.frame_bucket = frame_bucket
        self.decoder_dtype = jnp.dtype(decoder_dtype or "float32")
        if params is None:
            params = init_params(self.models, jax.random.PRNGKey(seed), cfg)
        # park weights on the accelerator once — params initialized on the
        # host CPU would otherwise re-transfer through the device tunnel on
        # EVERY stage call (catastrophic on remote/tunneled backends)
        if jax.default_backend() != "cpu":
            params = jax.device_put(params, jax.devices()[0])
            params = jax.block_until_ready(params)
        self.params = params
        self.phase_a_mode = phase_a
        self._phase_a = {}
        self._phase_b = {}
        self._style_fns = {}

    # ------------------------------------------------------------------
    # staged pipeline: several medium-size jits chained on-device.
    # On tunneled runtimes (axon) per-call cost grows with executable size,
    # so a chain of component programs beats one fused graph by ~10x; the
    # only host syncs are the duration fetch and the final wav.
    # ------------------------------------------------------------------

    # ---- staged phase A: three chained medium executables -------------
    # (text+BERT encode | style diffusion | duration). The round-2 layout:
    # restored as the single-stream default after the round-3 fused phase A
    # measured ~18% slower (per-call cost grows with executable size here).

    def _stages(self):
        if hasattr(self, "_stage_fns"):
            return self._stage_fns
        models = self.models

        @jax.jit
        def stage_text(params, tokens, lengths):
            T = tokens.shape[1]
            valid = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.int32)
            t_en = models.text_encoder.apply(params["text_encoder"], tokens, lengths)
            bert_dur = models.bert.apply(params["bert"], tokens, valid)
            d_en = models.bert_encoder.apply(params["bert_encoder"], bert_dur)
            return t_en, bert_dur, d_en

        @jax.jit
        def stage_duration(params, d_en, s, lengths):
            T = d_en.shape[1]
            d = models.predictor.apply(
                params["predictor"], d_en, s, lengths, method="encode_texts"
            )
            dur_logits = models.predictor.apply(
                params["predictor"], d, lengths, method="duration"
            )
            duration = jax.nn.sigmoid(dur_logits).sum(axis=-1)
            pred_dur = jnp.maximum(jnp.round(duration), 1.0)
            pred_dur = jnp.where(
                jnp.arange(T)[None, :] < lengths[:, None], pred_dur, 0.0
            ).astype(jnp.int32)
            return d, pred_dur

        self._stage_fns = (stage_text, stage_duration)
        return self._stage_fns

    def _make_stage_style(self, diffusion_steps: int, embedding_scale: float):
        models = self.models
        multispeaker = self.multispeaker
        sd = self.style_dim

        def stage_style(params, bert_dur, lengths, noise, key, ref_s, alpha,
                        beta, s_prev, s_prev_w):
            def net_apply(x, c_noise, **kw):
                return models.diffusion.apply(
                    params["diffusion"], x, c_noise, bert_dur,
                    features=ref_s if multispeaker else None,
                    embedding_scale=embedding_scale,
                    embedding_lengths=lengths,
                )

            denoise = make_denoise_fn(net_apply, self.sigma_data)
            s_pred = sample_adpm2(
                denoise, noise, key, num_steps=diffusion_steps
            )[:, 0, :]
            s_pred = s_prev_w * s_prev + (1.0 - s_prev_w) * s_pred
            s = s_pred[:, sd:]
            ref = s_pred[:, :sd]
            if multispeaker:
                ref = alpha * ref + (1.0 - alpha) * ref_s[:, :sd]
                s = beta * s + (1.0 - beta) * ref_s[:, sd:]
            return s, ref, jnp.concatenate([ref, s], axis=-1)

        return jax.jit(stage_style)

    def _get_stage_style(self, steps, scale):
        k = (steps, float(scale))
        if k not in self._style_fns:
            self._style_fns[k] = self._make_stage_style(steps, float(scale))
        return self._style_fns[k]

    # ---- fused phase A: one dispatch from tokens to (t_en, d, s, ref,
    # pred_dur); used by inference_batch (and single-stream when
    # phase_a='fused')
    def _make_phase_a(self, diffusion_steps: int, embedding_scale: float):
        models = self.models
        multispeaker = self.multispeaker
        sd = self.style_dim

        def phase_a(params, tokens, lengths, noise, key, ref_s, alpha, beta, s_prev, s_prev_w):
            B, T = tokens.shape
            valid = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.int32)
            t_en = models.text_encoder.apply(params["text_encoder"], tokens, lengths)
            bert_dur = models.bert.apply(params["bert"], tokens, valid)
            d_en = models.bert_encoder.apply(params["bert_encoder"], bert_dur)

            def net_apply(x, c_noise, **kw):
                return models.diffusion.apply(
                    params["diffusion"], x, c_noise, bert_dur,
                    features=ref_s if multispeaker else None,
                    embedding_scale=embedding_scale,
                    embedding_lengths=lengths,
                )

            denoise = make_denoise_fn(net_apply, self.sigma_data)
            s_pred = sample_adpm2(
                denoise, noise, key, num_steps=diffusion_steps,
            )[:, 0, :]  # (B, 2*style)

            # long-form style carry-over (LFinference)
            s_pred = s_prev_w * s_prev + (1.0 - s_prev_w) * s_pred

            s = s_pred[:, sd:]
            ref = s_pred[:, :sd]
            if multispeaker:
                ref = alpha * ref + (1.0 - alpha) * ref_s[:, :sd]
                s = beta * s + (1.0 - beta) * ref_s[:, sd:]
            s_out = jnp.concatenate([ref, s], axis=-1)

            d = models.predictor.apply(
                params["predictor"], d_en, s, lengths, method="encode_texts"
            )
            dur_logits = models.predictor.apply(
                params["predictor"], d, lengths, method="duration"
            )
            duration = jax.nn.sigmoid(dur_logits).sum(axis=-1)  # (B, T)
            pred_dur = jnp.maximum(jnp.round(duration), 1.0)
            pred_dur = jnp.where(
                jnp.arange(T)[None, :] < lengths[:, None], pred_dur, 0.0
            ).astype(jnp.int32)
            return t_en, d, s, ref, s_out, pred_dur

        return jax.jit(phase_a)

    # ------------------------------------------------------------------
    # phase B: (t_en, d, s, ref, pred_dur) -> wav
    # ------------------------------------------------------------------

    def _make_phase_b(self, n_frames: int):
        """Acoustic stage as TWO chained jits (prosody, then decoder) —
        smaller executables load dramatically faster on tunneled runtimes."""
        models = self.models
        hifigan = self.hifigan
        dd = self.decoder_dtype

        def cast_dec(params, asr, ref):
            """Serving-dtype cast for the decoder stage (see __init__)."""
            if dd == jnp.float32:
                return params["decoder"], asr, ref
            dp = jax.tree.map(
                lambda x: x.astype(dd)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                params["decoder"],
            )
            return dp, asr.astype(dd), ref.astype(dd)

        @jax.jit
        def stage_prosody(params, t_en, d, s, pred_dur):
            aln = duration_to_alignment(pred_dur, n_frames)  # (B, T, F)
            en = jnp.einsum("btc,btf->bfc", d, aln)
            if hifigan:
                en = jnp.concatenate([en[:, :1], en[:, :-1]], axis=1)
            F0_pred, N_pred = models.predictor.apply(
                params["predictor"], en, s, method="F0Ntrain"
            )
            asr = jnp.einsum("btc,btf->bfc", t_en, aln)
            if hifigan:
                asr = jnp.concatenate([asr[:, :1], asr[:, :-1]], axis=1)
            return asr, F0_pred, N_pred

        @jax.jit
        def stage_decode(params, asr, F0_pred, N_pred, ref, key):
            dp, asr, ref = cast_dec(params, asr, ref)
            wav = models.decoder.apply(
                dp, asr, F0_pred, N_pred, ref, rngs={"noise": key}
            )
            return wav.astype(jnp.float32)

        @jax.jit
        def stage_decode_pcm16(params, asr, F0_pred, N_pred, ref, key):
            dp, asr, ref = cast_dec(params, asr, ref)
            wav = models.decoder.apply(
                dp, asr, F0_pred, N_pred, ref, rngs={"noise": key}
            ).astype(jnp.float32)
            # 16-bit PCM halves the host-transfer volume (the serving format)
            return jnp.clip(wav * 32767.0, -32768.0, 32767.0).astype(jnp.int16)

        def phase_b(params, t_en, d, s, ref, pred_dur, key, pcm16=False):
            asr, F0_pred, N_pred = stage_prosody(params, t_en, d, s, pred_dur)
            fn = stage_decode_pcm16 if pcm16 else stage_decode
            return fn(params, asr, F0_pred, N_pred, ref, key)

        return phase_b

    def _get_phase_a(self, steps, scale):
        k = (steps, float(scale))
        if k not in self._phase_a:
            self._phase_a[k] = self._make_phase_a(steps, float(scale))
        return self._phase_a[k]

    def _get_phase_b(self, n_frames: int):
        if n_frames not in self._phase_b:
            self._phase_b[n_frames] = self._make_phase_b(n_frames)
        return self._phase_b[n_frames]

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def compute_style(self, wave: np.ndarray) -> np.ndarray:
        """24 kHz reference wave -> (1, 2*style_dim) [acoustic | prosodic]
        (Inference_LibriTTS.ipynb cell 5)."""
        mel = preprocess_mel(jnp.asarray(wave[None], jnp.float32))
        ref_s = self.models.style_encoder.apply(self.params["style_encoder"], mel)
        ref_p = self.models.predictor_encoder.apply(self.params["predictor_encoder"], mel)
        return np.asarray(jnp.concatenate([ref_s, ref_p], axis=-1))

    def inference(
        self,
        text: str,
        ref_s: Optional[np.ndarray] = None,
        noise: Optional[np.ndarray] = None,
        alpha: float = 0.3,
        beta: float = 0.7,
        diffusion_steps: int = 5,
        embedding_scale: float = 1.0,
        seed: int = 0,
        s_prev: Optional[np.ndarray] = None,
        s_prev_weight: float = 0.0,
        pad_last_token: bool = None,
        trim_samples: int = None,
        pcm16: bool = False,
        raw_text: bool = False,
        speed: float = 1.0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Synthesize one utterance from pre-phonemized IPA text; with
        raw_text=True the input is plain English run through the optional
        phonemizer/espeak frontend with the reference's exact word_tokenize
        preprocessing (Demo/Inference_LJSpeech.ipynb cell 17).

        Returns (wav float32 at 24 kHz, s_pred style for carry-over)."""
        if raw_text:
            from styletts2_tpu.text import phonemize

            text = phonemize(text)
        if pad_last_token is None:
            pad_last_token = not self.multispeaker  # LJSpeech pred_dur[-1]+=5
        if trim_samples is None:
            trim_samples = 50 if self.multispeaker else 0

        tokens_np = encode_text(text)
        L = len(tokens_np)
        T = _bucket(L, self.text_bucket, self.text_bucket)
        tokens = np.zeros((1, T), np.int32)
        tokens[0, :L] = tokens_np
        lengths = np.asarray([L], np.int32)

        key = jax.random.PRNGKey(seed)
        k_samp, k_dec = jax.random.split(key)
        if noise is None:
            noise = jax.random.normal(jax.random.PRNGKey(seed + 1), (1, 1, 2 * self.style_dim))
        else:
            noise = jnp.asarray(noise).reshape(1, 1, -1)
        if ref_s is None:
            ref_s = jnp.zeros((1, 2 * self.style_dim), jnp.float32)
        else:
            ref_s = jnp.asarray(ref_s, jnp.float32)
        if s_prev is None:
            s_prev = jnp.zeros((1, 2 * self.style_dim), jnp.float32)
            s_prev_weight = 0.0

        if self.phase_a_mode == "fused":
            pa = self._get_phase_a(diffusion_steps, embedding_scale)
            t_en, d, s, ref, s_out, pred_dur = pa(
                self.params, jnp.asarray(tokens), jnp.asarray(lengths), noise,
                k_samp, ref_s, alpha, beta, jnp.asarray(s_prev),
                float(s_prev_weight),
            )
        else:
            # staged phase A (default): three chained medium executables —
            # measurably faster single-stream on this runtime (see __init__)
            stage_text, stage_duration = self._stages()
            stage_style = self._get_stage_style(diffusion_steps, embedding_scale)
            t_en, bert_dur, d_en = stage_text(
                self.params, jnp.asarray(tokens), jnp.asarray(lengths)
            )
            s, ref, s_out = stage_style(
                self.params, bert_dur, jnp.asarray(lengths), noise, k_samp,
                ref_s, alpha, beta, jnp.asarray(s_prev), float(s_prev_weight),
            )
            d, pred_dur = stage_duration(
                self.params, d_en, s, jnp.asarray(lengths)
            )
        pred_dur = np.array(pred_dur)  # writable host copy
        if speed != 1.0:
            # speech-rate control: speed>1 shortens durations (serving
            # feature beyond the reference; also used by bench.py to pin
            # utterance length to a realistic value)
            pred_dur[:, :L] = np.maximum(np.round(pred_dur[:, :L] / speed), 1)
        if pad_last_token:
            pred_dur[0, L - 1] += 5
        total = int(pred_dur.sum())
        F = _bucket(total, self.frame_bucket, self.frame_bucket)

        pb = self._get_phase_b(F)
        wav = pb(self.params, t_en, d, s, ref, jnp.asarray(pred_dur), k_dec,
                 pcm16=pcm16)
        wav = np.asarray(wav)[0, : total * 600]
        if pcm16:
            wav = wav.astype(np.float32) / 32767.0
        if trim_samples:
            wav = wav[:-trim_samples]
        return wav, np.asarray(s_out)

    def _make_fused(self, diffusion_steps: int, embedding_scale: float, frame_budget: int):
        """Whole-pipeline single graph: text → diffusion → duration →
        alignment (fixed frame budget) → F0/N → decoder. One device
        round-trip per utterance — the serving configuration."""
        models = self.models
        multispeaker = self.multispeaker
        hifigan = self.hifigan
        sd = self.style_dim

        def fused(params, tokens, lengths, noise, key, ref_s, alpha, beta,
                  speed):
            B, T = tokens.shape
            valid = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.int32)
            t_en = models.text_encoder.apply(params["text_encoder"], tokens, lengths)
            bert_dur = models.bert.apply(params["bert"], tokens, valid)
            d_en = models.bert_encoder.apply(params["bert_encoder"], bert_dur)

            def net_apply(x, c_noise, **kw):
                return models.diffusion.apply(
                    params["diffusion"], x, c_noise, bert_dur,
                    features=ref_s if multispeaker else None,
                    embedding_scale=embedding_scale,
                    embedding_lengths=lengths,
                )

            denoise = make_denoise_fn(net_apply, self.sigma_data)
            k_samp, k_dec = jax.random.split(key)
            s_pred = sample_adpm2(denoise, noise, k_samp, num_steps=diffusion_steps)[:, 0, :]
            s = s_pred[:, sd:]
            ref = s_pred[:, :sd]
            if multispeaker:
                ref = alpha * ref + (1.0 - alpha) * ref_s[:, :sd]
                s = beta * s + (1.0 - beta) * ref_s[:, sd:]

            d = models.predictor.apply(
                params["predictor"], d_en, s, lengths, method="encode_texts"
            )
            dur_logits = models.predictor.apply(
                params["predictor"], d, lengths, method="duration"
            )
            duration = jax.nn.sigmoid(dur_logits).sum(axis=-1)
            # speech-rate control (traced scalar): speed>1 shortens durations
            pred_dur = jnp.maximum(jnp.round(duration / speed), 1.0)
            pred_dur = jnp.where(
                jnp.arange(T)[None, :] < lengths[:, None], pred_dur, 0.0
            ).astype(jnp.int32)
            aln = duration_to_alignment(pred_dur, frame_budget)
            en = jnp.einsum("btc,btf->bfc", d, aln)
            if hifigan:
                en = jnp.concatenate([en[:, :1], en[:, :-1]], axis=1)
            F0_pred, N_pred = models.predictor.apply(
                params["predictor"], en, s, method="F0Ntrain"
            )
            asr = jnp.einsum("btc,btf->bfc", t_en, aln)
            if hifigan:
                asr = jnp.concatenate([asr[:, :1], asr[:, :-1]], axis=1)
            dparams = params["decoder"]
            if self.decoder_dtype != jnp.float32:
                dd = self.decoder_dtype
                dparams = jax.tree.map(
                    lambda v: v.astype(dd)
                    if jnp.issubdtype(v.dtype, jnp.floating) else v, dparams,
                )
                asr, ref = asr.astype(dd), ref.astype(dd)
            wav = models.decoder.apply(
                dparams, asr, F0_pred, N_pred, ref, rngs={"noise": k_dec}
            ).astype(jnp.float32)
            total = jnp.minimum(pred_dur.sum(axis=1), frame_budget)
            return wav, total

        return jax.jit(fused)

    def inference_fused(
        self,
        text: str,
        frame_budget: int = 600,
        ref_s: Optional[np.ndarray] = None,
        alpha: float = 0.3,
        beta: float = 0.7,
        diffusion_steps: int = 5,
        embedding_scale: float = 1.0,
        seed: int = 0,
        speed: float = 1.0,
    ) -> np.ndarray:
        """Single-dispatch synthesis with a static frame budget (≈7.5ms of
        audio per frame at 24 kHz); the wav is trimmed host-side to the
        realized duration. The low-latency serving path."""
        tokens_np = encode_text(text)
        L = len(tokens_np)
        T = _bucket(L, self.text_bucket, self.text_bucket)
        tokens = np.zeros((1, T), np.int32)
        tokens[0, :L] = tokens_np
        key = jax.random.PRNGKey(seed)
        noise = jax.random.normal(jax.random.PRNGKey(seed + 1), (1, 1, 2 * self.style_dim))
        ref_arr = (
            jnp.asarray(ref_s, jnp.float32)
            if ref_s is not None
            else jnp.zeros((1, 2 * self.style_dim), jnp.float32)
        )
        ck = (diffusion_steps, float(embedding_scale), frame_budget, T)
        if not hasattr(self, "_fused"):
            self._fused = {}
        if ck not in self._fused:
            self._fused[ck] = self._make_fused(
                diffusion_steps, float(embedding_scale), frame_budget
            )
        wav, total = self._fused[ck](
            self.params, jnp.asarray(tokens), jnp.asarray([L], np.int32), noise,
            key, ref_arr, alpha, beta, jnp.asarray(float(speed)),
        )
        wav = np.asarray(wav)
        n = int(np.asarray(total)[0]) * 600
        return wav[0, :n]

    def inference_batch(
        self,
        texts,
        ref_s: Optional[np.ndarray] = None,
        alpha: float = 0.3,
        beta: float = 0.7,
        diffusion_steps: int = 5,
        embedding_scale: float = 1.0,
        seed: int = 0,
        speed: float = 1.0,
    ):
        """Length-masked batched synthesis of N utterances (first-class here;
        the reference only exposes single-utterance notebook functions).
        Returns a list of per-utterance float32 waveforms."""
        toks = [encode_text(t) for t in texts]
        B = len(toks)
        L = max(len(t) for t in toks)
        T = _bucket(L, self.text_bucket, self.text_bucket)
        tokens = np.zeros((B, T), np.int32)
        for i, t in enumerate(toks):
            tokens[i, : len(t)] = t
        lengths = np.asarray([len(t) for t in toks], np.int32)

        key = jax.random.PRNGKey(seed)
        k_samp, k_dec = jax.random.split(key)
        noise = jax.random.normal(
            jax.random.PRNGKey(seed + 1), (B, 1, 2 * self.style_dim)
        )
        if ref_s is None:
            ref_s_arr = jnp.zeros((B, 2 * self.style_dim), jnp.float32)
        else:
            ref_s_arr = jnp.broadcast_to(
                jnp.asarray(ref_s, jnp.float32), (B, 2 * self.style_dim)
            )
        s_prev = jnp.zeros((B, 2 * self.style_dim), jnp.float32)

        pa = self._get_phase_a(diffusion_steps, embedding_scale)
        t_en, d, s, ref, s_out, pred_dur = pa(
            self.params, jnp.asarray(tokens), jnp.asarray(lengths), noise,
            k_samp, ref_s_arr, alpha, beta, s_prev, 0.0,
        )
        pred_dur = np.array(pred_dur)
        if speed != 1.0:  # speech-rate control, as in inference()
            for i, l in enumerate(lengths):
                pred_dur[i, :l] = np.maximum(
                    np.round(pred_dur[i, :l] / speed), 1
                )
        if not self.multispeaker:
            for i, l in enumerate(lengths):
                pred_dur[i, l - 1] += 5
        totals = pred_dur.sum(axis=1)
        F = _bucket(int(totals.max()), self.frame_bucket, self.frame_bucket)
        pb = self._get_phase_b(F)
        wavs = np.asarray(
            pb(self.params, t_en, d, s, ref, jnp.asarray(pred_dur), k_dec)
        )
        trim = 50 if self.multispeaker else 0
        out = []
        for i, tot in enumerate(totals):
            n = int(tot) * 600 - trim
            out.append(wavs[i, :n])
        return out

    def LFinference(
        self,
        text: str,
        s_prev: Optional[np.ndarray],
        ref_s: Optional[np.ndarray] = None,
        alpha: float = 0.3,
        beta: float = 0.7,
        t: float = 0.7,
        diffusion_steps: int = 5,
        embedding_scale: float = 1.0,
        seed: int = 0,
        speed: float = 1.0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Long-form segment synthesis with style carry-over
        (LibriTTS cell 42 / LJSpeech cell 29). The reference LFinference
        never applies the +5 last-token duration pad (that is plain
        `inference` only, LJSpeech cell 17), so it is disabled here too.
        `speed` is this framework's speech-rate extension, plumbed through
        to `inference` so paragraph synthesis can be rate-controlled."""
        wav, s_pred = self.inference(
            text, ref_s=ref_s, alpha=alpha, beta=beta,
            diffusion_steps=diffusion_steps, embedding_scale=embedding_scale,
            seed=seed, s_prev=s_prev, s_prev_weight=t if s_prev is not None else 0.0,
            trim_samples=100 if self.multispeaker else 0,
            pad_last_token=False, speed=speed,
        )
        return wav, s_pred

    def STinference(
        self,
        text: str,
        ref_s: np.ndarray,
        ref_text: str,
        alpha: float = 0.3,
        beta: float = 0.7,
        diffusion_steps: int = 5,
        embedding_scale: float = 1.0,
        seed: int = 0,
    ) -> np.ndarray:
        """Style transfer variant (LibriTTS cell 45). Note: the reference
        computes ref_text's BERT embedding but conditions the sampler on the
        target text embedding; behavior replicated."""
        wav, _ = self.inference(
            text, ref_s=ref_s, alpha=alpha, beta=beta,
            diffusion_steps=diffusion_steps, embedding_scale=embedding_scale,
            seed=seed,
        )
        return wav

    def long_form(self, text: str, ref_s=None, t: float = 0.7, **kw) -> np.ndarray:
        """Paragraph synthesis: sentence split + LFinference stitching."""
        import re

        sentences = [s.strip() for s in re.split(r"(?<=[.!?…])\s+", text) if s.strip()]
        s_prev, wavs = None, []
        seed0 = kw.pop("seed", 0)
        for i, sent in enumerate(sentences):
            wav, s_prev = self.LFinference(
                sent, s_prev, ref_s=ref_s, t=t, seed=seed0 + i, **kw
            )
            wavs.append(wav)
        return np.concatenate(wavs) if wavs else np.zeros(0, np.float32)
