"""Multi-chip dry run: one full training step on tiny shapes over a Mesh.

Exercises the real parallel layout (dp over 'data', tp over 'model' for the
wide transformer matmuls) with a representative joint training step: text
encoding + PL-BERT + duration loss + EDM diffusion loss + decoder mel
reconstruction, grads for every module, optax adamw update. The driver runs
this with N virtual CPU devices to validate the sharding compiles+executes.
"""

from __future__ import annotations

import os

# On a virtual N-device CPU mesh (often more devices than cores) the XLA
# in-process collectives can trip the stuck-call watchdog purely from
# time-sharing; raise the timeouts before the backend initializes.
_flags = os.environ.get("XLA_FLAGS", "")
for _f in (
    "--xla_cpu_collective_call_warn_stuck_timeout_seconds=600",
    "--xla_cpu_collective_call_terminate_timeout_seconds=1200",
):
    if _f.split("=")[0] not in _flags:
        _flags += " " + _f
os.environ["XLA_FLAGS"] = _flags.strip()

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from styletts2_tpu.config import Config
from styletts2_tpu.models.build import build_models, init_params
from styletts2_tpu.models.diffusion.sampler import kdiffusion_loss
from styletts2_tpu.ops.stft import preprocess_mel
from styletts2_tpu.parallel.mesh import make_mesh, shard_params
from styletts2_tpu.utils import duration_to_alignment


def run_dryrun(n_devices: int) -> None:
    # persistent compile cache inside the repo: repeated driver invocations
    # (and CI) skip the expensive XLA compile
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    cfg = Config()
    # full training-step STRUCTURE at tiny widths (shapes only; every module
    # and sharding of the real step is exercised)
    cfg.plbert_params.num_hidden_layers = 2
    cfg.plbert_params.hidden_size = 128
    cfg.plbert_params.intermediate_size = 1536
    cfg.plbert_params.num_attention_heads = 4
    cfg.plbert_params.embedding_size = 64
    cfg.model_params.hidden_dim = 128
    cfg.model_params.max_conv_dim = 128
    cfg.model_params.style_dim = 64
    cfg.model_params.dim_in = 32
    cfg.model_params.diffusion.transformer.num_layers = 1
    cfg.model_params.decoder.upsample_initial_channel = 128
    models = build_models(cfg)
    variables = init_params(models, jax.random.PRNGKey(0), cfg)
    # trainable 'params' collections vs auxiliary state (spectral-norm u, ...)
    params = {k: v["params"] for k, v in variables.items()}
    extras = {
        k: {c: cc for c, cc in v.items() if c != "params"}
        for k, v in variables.items()
    }

    mesh = make_mesh(n_devices, model_parallel=2 if n_devices % 2 == 0 else 1)
    params = shard_params(params, mesh)
    extras = jax.device_put(extras, NamedSharding(mesh, P()))
    tx = optax.adamw(1e-4, b1=0.0, b2=0.99, eps=1e-9, weight_decay=1e-4)
    opt_state = tx.init(params)

    def mv(key):
        return lambda p: {"params": p, **extras[key]}

    B = mesh.shape["data"]
    T_text, T_en = 8, 8
    T_mel = 2 * T_en
    rng = np.random.default_rng(0)
    batch = {
        "tokens": rng.integers(1, 178, (B, T_text)).astype(np.int32),
        "lengths": np.full((B,), T_text, np.int32),
        "durations": rng.integers(1, 3, (B, T_text)).astype(np.int32),
        "mel": rng.standard_normal((B, 80, 96)).astype(np.float32),
        "wav": rng.standard_normal((B, T_en * 600)).astype(np.float32) * 0.01,
        "style_target": rng.standard_normal((B, cfg.model_params.style_dim * 2)).astype(np.float32) * 0.1,
    }
    bsh = NamedSharding(mesh, P("data"))
    batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}

    def loss_fn(params, batch, key):
        tokens, lengths = batch["tokens"], batch["lengths"]
        Bc, T = tokens.shape
        valid = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.int32)
        k1, k2, k3, k4 = jax.random.split(key, 4)

        t_en = models.text_encoder.apply(mv("text_encoder")(params["text_encoder"]), tokens, lengths)
        bert_dur = models.bert.apply(mv("bert")(params["bert"]), tokens, valid)
        d_en = models.bert_encoder.apply(mv("bert_encoder")(params["bert_encoder"]), bert_dur)

        s = models.style_encoder.apply(mv("style_encoder")(params["style_encoder"]), batch["mel"])
        sp = models.predictor_encoder.apply(mv("predictor_encoder")(params["predictor_encoder"]), batch["mel"])

        aln = duration_to_alignment(batch["durations"], T_en)
        dur_logits, en = models.predictor.apply(
            mv("predictor")(params["predictor"]), d_en, sp, lengths, aln,
            rngs={"dropout": k1}, train=True,
        )
        dur_pred = jax.nn.sigmoid(dur_logits).sum(-1)
        loss_dur = jnp.mean(jnp.abs(dur_pred - batch["durations"]))

        F0, N = models.predictor.apply(
            mv("predictor")(params["predictor"]), en, sp, method="F0Ntrain",
            rngs={"dropout": k1}, train=True,
        )
        asr = jnp.einsum("btc,btf->bfc", t_en, aln)
        wav = models.decoder.apply(
            mv("decoder")(params["decoder"]), asr, F0, N, s, rngs={"noise": k2}
        )
        mel_rec = preprocess_mel(wav)
        mel_tgt = preprocess_mel(batch["wav"])
        loss_mel = jnp.mean(jnp.abs(mel_rec - mel_tgt))

        def net_apply(x, c_noise, **kw):
            return models.diffusion.apply(
                mv("diffusion")(params["diffusion"]), x, c_noise, bert_dur,
                features=None if not cfg.model_params.multispeaker else batch["style_target"],
            )

        loss_diff = kdiffusion_loss(
            net_apply, batch["style_target"][:, None, :], k3, 0.2
        )
        return loss_mel + loss_dur + loss_diff

    @jax.jit
    def train_step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    with mesh:
        params, opt_state, loss = train_step(
            params, opt_state, batch, jax.random.PRNGKey(1)
        )
        loss.block_until_ready()
    assert np.isfinite(float(loss)), f"non-finite dryrun loss {loss}"
    print(f"dryrun_multichip({n_devices}): loss={float(loss):.4f} mesh={dict(mesh.shape)}")
