"""PyTorch → JAX weight converters.

Maps reference-format state_dicts (HF WavLM / ALBERT, and the StyleTTS2
checkpoint layout {net: {module: state_dict}}, models.py:696-713) onto this
framework's flax param trees. Layout rules:
  Linear (out,in) → (in,out); Conv1d (out,in,k) → (k,in,out);
  ConvTranspose1d (in,out/g,k) → (k,·,·) per group structure;
  weight-normed convs keep (v,g); LSTM (4H,in) → (in,4H), b = b_ih + b_hh.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def t(x):
    return np.asarray(x, dtype=np.float32)


def lin(sd, name):
    return {"kernel": t(sd[f"{name}.weight"]).T, "bias": t(sd[f"{name}.bias"])}


def lin_nobias(sd, name):
    return {"kernel": t(sd[f"{name}.weight"]).T}


def conv1d(sd, name, bias=True):
    out = {"kernel": t(sd[f"{name}.weight"]).transpose(2, 1, 0)}
    if bias:
        out["bias"] = t(sd[f"{name}.bias"])
    return out


def ln(sd, name):
    return {"scale": t(sd[f"{name}.weight"]), "bias": t(sd[f"{name}.bias"])}


def embed(sd, name):
    return {"embedding": t(sd[f"{name}.weight"])}


# ---------------------------------------------------------------------------
# WavLM (HF WavLMModel state_dict → styletts2_tpu.models.wavlm.WavLM)
# ---------------------------------------------------------------------------


def convert_wavlm(sd: Dict[str, Any], num_layers: int = 12) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    for i in range(7):
        p[f"conv_{i}"] = {
            "kernel": t(sd[f"feature_extractor.conv_layers.{i}.conv.weight"]).transpose(2, 1, 0)
        }
    p["conv_gn"] = ln(sd, "feature_extractor.conv_layers.0.layer_norm")
    p["proj_ln"] = ln(sd, "feature_projection.layer_norm")
    p["proj"] = lin(sd, "feature_projection.projection")

    # pos conv: weight-normed (dim=2); fold to effective weight
    base = "encoder.pos_conv_embed.conv"
    if f"{base}.parametrizations.weight.original0" in sd:
        g = t(sd[f"{base}.parametrizations.weight.original0"])
        v = t(sd[f"{base}.parametrizations.weight.original1"])
    else:
        g = t(sd[f"{base}.weight_g"])
        v = t(sd[f"{base}.weight_v"])
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True) + 0.0)
    w = v / np.maximum(norm, 1e-12) * g  # (out, in/g, k), dim=2 norm
    p["pos_conv"] = {
        "kernel": w.transpose(2, 1, 0),
        "bias": t(sd[f"{base}.bias"]),
    }
    p["encoder_ln"] = ln(sd, "encoder.layer_norm")

    for i in range(num_layers):
        b = f"encoder.layers.{i}"
        att = {
            "q_proj": lin(sd, f"{b}.attention.q_proj"),
            "k_proj": lin(sd, f"{b}.attention.k_proj"),
            "v_proj": lin(sd, f"{b}.attention.v_proj"),
            "out_proj": lin(sd, f"{b}.attention.out_proj"),
            "gru_rel_pos_linear": lin(sd, f"{b}.attention.gru_rel_pos_linear"),
            "gru_rel_pos_const": t(sd[f"{b}.attention.gru_rel_pos_const"]),
        }
        if i == 0:
            att["rel_attn_embed"] = t(sd[f"{b}.attention.rel_attn_embed.weight"])
        p[f"layer_{i}"] = {
            "attention": att,
            "layer_norm": ln(sd, f"{b}.layer_norm"),
            "final_layer_norm": ln(sd, f"{b}.final_layer_norm"),
            "ff_in": lin(sd, f"{b}.feed_forward.intermediate_dense"),
            "ff_out": lin(sd, f"{b}.feed_forward.output_dense"),
        }
    return {"params": p}


# ---------------------------------------------------------------------------
# PL-BERT (HF AlbertModel state_dict → styletts2_tpu.models.plbert.PLBERT)
# ---------------------------------------------------------------------------


def convert_albert(sd: Dict[str, Any]) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    p["word_embeddings"] = embed(sd, "embeddings.word_embeddings")
    p["position_embeddings"] = t(sd["embeddings.position_embeddings.weight"])
    p["token_type_embeddings"] = t(sd["embeddings.token_type_embeddings.weight"])
    p["emb_ln"] = ln(sd, "embeddings.LayerNorm")
    p["emb_proj"] = lin(sd, "encoder.embedding_hidden_mapping_in")
    b = "encoder.albert_layer_groups.0.albert_layers.0"
    p["layer"] = {
        "q": lin(sd, f"{b}.attention.query"),
        "k": lin(sd, f"{b}.attention.key"),
        "v": lin(sd, f"{b}.attention.value"),
        "attn_out": lin(sd, f"{b}.attention.dense"),
        "attn_ln": ln(sd, f"{b}.attention.LayerNorm"),
        "ffn": lin(sd, f"{b}.ffn"),
        "ffn_out": lin(sd, f"{b}.ffn_output"),
        "ffn_ln": ln(sd, f"{b}.full_layer_layer_norm"),
    }
    return {"params": p}
