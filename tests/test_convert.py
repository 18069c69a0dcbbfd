"""Converter structure tests: synthetic torch-layout state_dicts are
converted and must match the flax init pytrees exactly (structure + shapes),
and load-then-apply must run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from styletts2_tpu import convert as C
from styletts2_tpu.models.text_encoder import TextEncoder
from styletts2_tpu.models.discriminators import WavLMDiscriminator


def tree_shapes(tree):
    return jax.tree.map(lambda x: tuple(np.shape(x)), tree)


def fake_lstm_sd(prefix, C_in, H, sd):
    rng = np.random.default_rng(0)
    for suf in ("", "_reverse"):
        sd[f"{prefix}.weight_ih_l0{suf}"] = rng.standard_normal((4 * H, C_in)).astype(np.float32)
        sd[f"{prefix}.weight_hh_l0{suf}"] = rng.standard_normal((4 * H, H)).astype(np.float32)
        sd[f"{prefix}.bias_ih_l0{suf}"] = rng.standard_normal(4 * H).astype(np.float32)
        sd[f"{prefix}.bias_hh_l0{suf}"] = rng.standard_normal(4 * H).astype(np.float32)


def test_convert_text_encoder_structure():
    rng = np.random.default_rng(0)
    Cch, K, V = 512, 5, 178
    sd = {"embedding.weight": rng.standard_normal((V, Cch)).astype(np.float32)}
    for i in range(3):
        sd[f"cnn.{i}.0.weight_v"] = rng.standard_normal((Cch, Cch, K)).astype(np.float32)
        sd[f"cnn.{i}.0.weight_g"] = np.abs(rng.standard_normal((Cch, 1, 1))).astype(np.float32)
        sd[f"cnn.{i}.0.bias"] = rng.standard_normal(Cch).astype(np.float32)
        sd[f"cnn.{i}.1.gamma"] = np.ones(Cch, np.float32)
        sd[f"cnn.{i}.1.beta"] = np.zeros(Cch, np.float32)
    fake_lstm_sd("lstm", Cch, Cch // 2, sd)

    converted = C.convert_text_encoder(sd)
    m = TextEncoder()
    init = m.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32), jnp.asarray([8])
    )
    assert tree_shapes(init) == tree_shapes(converted)
    out = m.apply(converted, jnp.zeros((1, 8), jnp.int32), jnp.asarray([8]))
    assert np.isfinite(np.asarray(out)).all()


def test_convert_wd_structure():
    rng = np.random.default_rng(1)
    sd = {}
    dims = [(13 * 768, 64, 1), (64, 128, 5), (128, 256, 5), (256, 256, 5)]
    sd["pre.weight_v"] = rng.standard_normal((64, 13 * 768, 1)).astype(np.float32)
    sd["pre.weight_g"] = np.abs(rng.standard_normal((64, 1, 1))).astype(np.float32)
    sd["pre.bias"] = rng.standard_normal(64).astype(np.float32)
    for i, (cin, cout, k) in enumerate(dims[1:]):
        sd[f"convs.{i}.weight_v"] = rng.standard_normal((cout, cin, k)).astype(np.float32)
        sd[f"convs.{i}.weight_g"] = np.abs(rng.standard_normal((cout, 1, 1))).astype(np.float32)
        sd[f"convs.{i}.bias"] = rng.standard_normal(cout).astype(np.float32)
    sd["conv_post.weight_v"] = rng.standard_normal((1, 256, 3)).astype(np.float32)
    sd["conv_post.weight_g"] = np.abs(rng.standard_normal((1, 1, 1))).astype(np.float32)
    sd["conv_post.bias"] = rng.standard_normal(1).astype(np.float32)

    converted = C.convert_wd(sd)
    m = WavLMDiscriminator()
    init = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 13 * 768)))
    assert tree_shapes(init) == tree_shapes(converted)
    out = m.apply(converted, jnp.zeros((1, 6, 13 * 768)))
    assert out.shape == (1, 6)


def test_strip_module_prefix():
    sd = {"module.a.b": 1, "c.d": 2}
    out = C.strip_module_prefix(sd)
    assert set(out) == {"a.b", "c.d"}
