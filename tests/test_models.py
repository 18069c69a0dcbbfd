"""Shape/compile tests for the core model blocks (SURVEY.md §4: unit tests
per block with jit-static shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from styletts2_tpu.config import Config
from styletts2_tpu.models.build import build_models, init_params, param_count


@pytest.fixture(scope="module")
def cfg():
    c = Config()
    # tiny PLBERT for test speed
    c.plbert_params.num_hidden_layers = 2
    return c


@pytest.fixture(scope="module")
def models_and_params(cfg):
    models = build_models(cfg)
    params = init_params(models, jax.random.PRNGKey(0), cfg)
    return models, params


def test_init_all_modules(models_and_params):
    models, params = models_and_params
    assert set(params.keys()) == {
        "text_encoder", "bert", "bert_encoder", "predictor",
        "style_encoder", "predictor_encoder", "decoder", "diffusion",
    }
    assert param_count(params) > 1_000_000


def test_text_encoder_masking(models_and_params):
    models, params = models_and_params
    B, T = 2, 12
    tokens = jnp.asarray(np.random.default_rng(0).integers(1, 178, (B, T)))
    lengths = jnp.asarray([12, 7])
    out = models.text_encoder.apply(params["text_encoder"], tokens, lengths)
    assert out.shape == (B, T, 512)
    # padded positions exactly zero
    np.testing.assert_allclose(np.asarray(out[1, 7:]), 0.0)
    # valid positions depend only on valid tokens: change a padded token
    tokens2 = tokens.at[1, 9].set(5)
    out2 = models.text_encoder.apply(params["text_encoder"], tokens2, lengths)
    np.testing.assert_allclose(np.asarray(out[1, :7]), np.asarray(out2[1, :7]), atol=1e-6)


def test_style_encoder_output(models_and_params):
    models, params = models_and_params
    mel = jnp.asarray(np.random.default_rng(1).standard_normal((2, 80, 96)), jnp.float32)
    s = models.style_encoder.apply(params["style_encoder"], mel)
    assert s.shape == (2, 128)
    assert np.isfinite(np.asarray(s)).all()


def test_predictor_shapes(models_and_params):
    models, params = models_and_params
    B, T, F = 2, 10, 20
    texts = jnp.asarray(np.random.default_rng(2).standard_normal((B, T, 512)), jnp.float32)
    style = jnp.asarray(np.random.default_rng(3).standard_normal((B, 128)), jnp.float32)
    lengths = jnp.asarray([10, 6])
    align = jnp.zeros((B, T, F)).at[:, 0, :].set(1.0)
    dur, en = models.predictor.apply(params["predictor"], texts, style, lengths, align)
    assert dur.shape == (B, T, 50)
    assert en.shape == (B, F, 512 + 128)
    F0, N = models.predictor.apply(
        params["predictor"], en, style, method="F0Ntrain"
    )
    assert F0.shape == (B, 2 * F)
    assert N.shape == (B, 2 * F)


def test_bert_and_encoder(models_and_params, cfg):
    models, params = models_and_params
    tokens = jnp.asarray([[0, 5, 9, 11, 0, 0]])
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]])
    h = models.bert.apply(params["bert"], tokens, mask)
    assert h.shape == (1, 6, 768)
    d = models.bert_encoder.apply(params["bert_encoder"], h)
    assert d.shape == (1, 6, 512)


def test_decoder_istftnet_output_length(models_and_params):
    models, params = models_and_params
    B, T_en = 1, 24
    asr = jnp.asarray(np.random.default_rng(4).standard_normal((B, T_en, 512)) * 0.1, jnp.float32)
    f0 = jnp.abs(jnp.asarray(np.random.default_rng(5).standard_normal((B, 2 * T_en)), jnp.float32)) * 100
    n = jnp.asarray(np.random.default_rng(6).standard_normal((B, 2 * T_en)), jnp.float32)
    s = jnp.asarray(np.random.default_rng(7).standard_normal((B, 128)) * 0.1, jnp.float32)
    wav = models.decoder.apply(
        params["decoder"], asr, f0, n, s, rngs={"noise": jax.random.PRNGKey(0)}
    )
    # 600 samples per half-mel (en) frame: 2 frames mel * 300 hop
    assert wav.shape == (B, T_en * 600)
    assert np.isfinite(np.asarray(wav)).all()


def test_diffusion_denoiser_cfg(models_and_params):
    models, params = models_and_params
    B, T = 2, 8
    x = jnp.asarray(np.random.default_rng(8).standard_normal((B, 1, 256)), jnp.float32)
    t = jnp.asarray([0.5, 1.0])
    emb = jnp.asarray(np.random.default_rng(9).standard_normal((B, T, 768)), jnp.float32)
    out = models.diffusion.apply(params["diffusion"], x, t, emb)
    assert out.shape == (B, 1, 256)
    out_cfg = models.diffusion.apply(
        params["diffusion"], x, t, emb, embedding_scale=2.0
    )
    assert out_cfg.shape == (B, 1, 256)
    assert not np.allclose(np.asarray(out), np.asarray(out_cfg))
