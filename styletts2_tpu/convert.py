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

    def one_layer(i):
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
        return {
            "attention": att,
            "layer_norm": ln(sd, f"{b}.layer_norm"),
            "final_layer_norm": ln(sd, f"{b}.final_layer_norm"),
            "ff_in": lin(sd, f"{b}.feed_forward.intermediate_dense"),
            "ff_out": lin(sd, f"{b}.feed_forward.output_dense"),
        }

    # layer 0 stands alone (rel-pos embed); layers 1..N-1 are STACKED along
    # a leading axis for the model's nn.scan body (models/wavlm.py)
    p["layer_0"] = one_layer(0)
    rest = [one_layer(i) for i in range(1, num_layers)]
    if rest:
        import jax

        p["layers"] = {
            "layer": jax.tree.map(lambda *xs: np.stack(xs, axis=0), *rest)
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


# ---------------------------------------------------------------------------
# Weight-normed torch conv helpers
# ---------------------------------------------------------------------------


def wnconv1d(sd, name):
    """torch weight_norm Conv1d → WNConv1d params {v, g[, bias]}."""
    out = {
        "v": t(sd[f"{name}.weight_v"]).transpose(2, 1, 0),
        "g": t(sd[f"{name}.weight_g"]).reshape(-1),
    }
    if f"{name}.bias" in sd:
        out["bias"] = t(sd[f"{name}.bias"])
    return out


def wnconvtr1d(sd, name):
    """torch weight_norm ConvTranspose1d → WNConvTranspose1d params (v kept
    in torch (in, out/g, K) layout)."""
    out = {
        "v": t(sd[f"{name}.weight_v"]),
        "g": t(sd[f"{name}.weight_g"]).reshape(-1),
    }
    if f"{name}.bias" in sd:
        out["bias"] = t(sd[f"{name}.bias"])
    return out


def wnconv2d(sd, name):
    out = {
        "v": t(sd[f"{name}.weight_v"]).transpose(2, 3, 1, 0),
        "g": t(sd[f"{name}.weight_g"]).reshape(-1),
    }
    if f"{name}.bias" in sd:
        out["bias"] = t(sd[f"{name}.bias"])
    return out


def snconv2d(sd, name):
    """torch spectral_norm Conv2d → (params, spectral) pair."""
    w = t(sd[f"{name}.weight_orig"])  # (out, in, kh, kw)
    out_ch, in_ch, kh, kw = w.shape
    params = {"kernel": w.transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        params["bias"] = t(sd[f"{name}.bias"])
    u = t(sd[f"{name}.weight_u"])
    v = t(sd[f"{name}.weight_v"]).reshape(in_ch, kh, kw).transpose(1, 2, 0).reshape(-1)
    return params, {"u": u, "v": v}


def conv2d_plain(sd, name, bias=True):
    out = {"kernel": t(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if bias and f"{name}.bias" in sd:
        out["bias"] = t(sd[f"{name}.bias"])
    return out


def bilstm(sd, name):
    """torch bidirectional LSTM → BiLSTM params."""
    return {
        "fwd": {
            "W_ih": t(sd[f"{name}.weight_ih_l0"]).T,
            "W_hh": t(sd[f"{name}.weight_hh_l0"]).T,
            "b": t(sd[f"{name}.bias_ih_l0"]) + t(sd[f"{name}.bias_hh_l0"]),
        },
        "bwd": {
            "W_ih": t(sd[f"{name}.weight_ih_l0_reverse"]).T,
            "W_hh": t(sd[f"{name}.weight_hh_l0_reverse"]).T,
            "b": t(sd[f"{name}.bias_ih_l0_reverse"]) + t(sd[f"{name}.bias_hh_l0_reverse"]),
        },
    }


def bn(sd, name):
    """torch BatchNorm → (params, stats)."""
    return (
        {"scale": t(sd[f"{name}.weight"]), "bias": t(sd[f"{name}.bias"])},
        {"mean": t(sd[f"{name}.running_mean"]), "var": t(sd[f"{name}.running_var"])},
    )


def groupnorm(sd, name):
    return {"scale": t(sd[f"{name}.weight"]), "bias": t(sd[f"{name}.bias"])}


# ---------------------------------------------------------------------------
# JDC pitch extractor (Utils/JDC/model.py → models/jdc.py)
# ---------------------------------------------------------------------------


def convert_jdc(sd: Dict[str, Any]) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["conv0"] = conv2d_plain(sd, "conv_block.0", bias=False)
    params["bn0"], stats["bn0"] = bn(sd, "conv_block.1")
    params["conv1"] = conv2d_plain(sd, "conv_block.3", bias=False)
    for i in (1, 2, 3):
        r = f"res_block{i}"
        blk = {}
        blk["pre_bn"], st_pre = bn(sd, f"{r}.pre_conv.0")
        blk["conv1"] = conv2d_plain(sd, f"{r}.conv.0", bias=False)
        blk["bn1"], st_b1 = bn(sd, f"{r}.conv.1")
        blk["conv2"] = conv2d_plain(sd, f"{r}.conv.3", bias=False)
        if f"{r}.conv1by1.weight" in sd:
            blk["conv1x1"] = conv2d_plain(sd, f"{r}.conv1by1", bias=False)
        params[f"res{i}"] = blk
        stats[f"res{i}"] = {"pre_bn": st_pre, "bn1": st_b1}
    params["pool_bn"], stats["pool_bn"] = bn(sd, "pool_block.0")
    params["bilstm_classifier"] = bilstm(sd, "bilstm_classifier")
    params["classifier"] = lin(sd, "classifier")
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# ASR aligner (Utils/ASR → models/asr.py)
# ---------------------------------------------------------------------------


def convert_asr(sd: Dict[str, Any]) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    p["init_cnn"] = {
        "kernel": t(sd["init_cnn.conv.weight"]).transpose(2, 1, 0),
        "bias": t(sd["init_cnn.conv.bias"]),
    }
    for i in range(6):
        blk = {}
        for j in range(3):
            base = f"cnns.{i}.0.blocks.{j}"
            blk[f"c{j}_1"] = {
                "kernel": t(sd[f"{base}.0.conv.weight"]).transpose(2, 1, 0),
                "bias": t(sd[f"{base}.0.conv.bias"]),
            }
            blk[f"gn{j}"] = groupnorm(sd, f"{base}.2")
            blk[f"c{j}_2"] = {
                "kernel": t(sd[f"{base}.4.conv.weight"]).transpose(2, 1, 0),
                "bias": t(sd[f"{base}.4.conv.bias"]),
            }
        p[f"cnns_{i}"] = blk
        p[f"cnn_norms_{i}"] = groupnorm(sd, f"cnns.{i}.1")
    p["projection"] = {
        "kernel": t(sd["projection.conv.weight"]).transpose(2, 1, 0),
        "bias": t(sd["projection.conv.bias"]),
    }
    p["ctc1"] = {
        "kernel": t(sd["ctc_linear.0.linear_layer.weight"]).T,
        "bias": t(sd["ctc_linear.0.linear_layer.bias"]),
    }
    p["ctc2"] = {
        "kernel": t(sd["ctc_linear.2.linear_layer.weight"]).T,
        "bias": t(sd["ctc_linear.2.linear_layer.bias"]),
    }
    s2s = "asr_s2s"
    p["asr_s2s"] = {
        "embedding": {"embedding": t(sd[f"{s2s}.embedding.weight"])},
        "memory_layer": {
            "kernel": t(sd[f"{s2s}.attention_layer.memory_layer.linear_layer.weight"]).T
        },
        "query_layer": t(sd[f"{s2s}.attention_layer.query_layer.linear_layer.weight"]).T,
        "v": t(sd[f"{s2s}.attention_layer.v.linear_layer.weight"]).T,
        "location_conv": t(
            sd[f"{s2s}.attention_layer.location_layer.location_conv.conv.weight"]
        ).transpose(2, 1, 0),
        "location_dense": t(
            sd[f"{s2s}.attention_layer.location_layer.location_dense.linear_layer.weight"]
        ).T,
        "W_ih": t(sd[f"{s2s}.decoder_rnn.weight_ih"]).T,
        "W_hh": t(sd[f"{s2s}.decoder_rnn.weight_hh"]).T,
        "b_cell": t(sd[f"{s2s}.decoder_rnn.bias_ih"]) + t(sd[f"{s2s}.decoder_rnn.bias_hh"]),
        "project_to_hidden_w": t(sd[f"{s2s}.project_to_hidden.0.linear_layer.weight"]).T,
        "project_to_hidden_b": t(sd[f"{s2s}.project_to_hidden.0.linear_layer.bias"]),
        "project_to_n_symbols_w": t(sd[f"{s2s}.project_to_n_symbols.weight"]).T,
        "project_to_n_symbols_b": t(sd[f"{s2s}.project_to_n_symbols.bias"]),
    }
    return {"params": p}


# ---------------------------------------------------------------------------
# StyleTTS2 main modules (models.py / Modules/istftnet.py → this framework)
# ---------------------------------------------------------------------------


def convert_text_encoder(sd: Dict[str, Any], depth: int = 3) -> Dict[str, Any]:
    p: Dict[str, Any] = {"embedding": embed(sd, "embedding")}
    for i in range(depth):
        p[f"cnn_{i}"] = wnconv1d(sd, f"cnn.{i}.0")
        p[f"norm_{i}"] = {
            "gamma": t(sd[f"cnn.{i}.1.gamma"]),
            "beta": t(sd[f"cnn.{i}.1.beta"]),
        }
    p["lstm"] = bilstm(sd, "lstm")
    return {"params": p}


def convert_style_encoder(sd: Dict[str, Any], repeat_num: int = 4) -> Dict[str, Any]:
    """models.py:139-164: shared = [stem, 4×ResBlk, LReLU, conv5x5, pool, LReLU]."""
    p: Dict[str, Any] = {}
    spec: Dict[str, Any] = {}
    p["stem"], spec["stem"] = snconv2d(sd, "shared.0")
    for i in range(repeat_num):
        b = f"shared.{1 + i}"
        blk, sblk = {}, {}
        blk["conv1"], sblk["conv1"] = snconv2d(sd, f"{b}.conv1")
        blk["conv2"], sblk["conv2"] = snconv2d(sd, f"{b}.conv2")
        blk["downsample_res"], sblk["downsample_res"] = snconv2d(
            sd, f"{b}.downsample_res.conv"
        )
        if f"{b}.conv1x1.weight_orig" in sd:
            blk["conv1x1"], sblk["conv1x1"] = snconv2d(sd, f"{b}.conv1x1")
        p[f"block_{i}"] = blk
        spec[f"block_{i}"] = sblk
    p["conv5x5"], spec["conv5x5"] = snconv2d(sd, f"shared.{repeat_num + 2}")
    p["unshared"] = lin(sd, "unshared")
    return {"params": p, "spectral": spec}


def _adain_res_blk1d(sd, base, upsample=False, learned_sc=True):
    blk = {
        "norm1": {"fc": lin(sd, f"{base}.norm1.fc")},
        "norm2": {"fc": lin(sd, f"{base}.norm2.fc")},
        "conv1": wnconv1d(sd, f"{base}.conv1"),
        "conv2": wnconv1d(sd, f"{base}.conv2"),
    }
    if upsample:
        blk["pool"] = wnconvtr1d(sd, f"{base}.pool")
    if f"{base}.conv1x1.weight_v" in sd:
        blk["conv1x1"] = wnconv1d(sd, f"{base}.conv1x1")
    return blk


def convert_predictor(sd: Dict[str, Any], nlayers: int = 3) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    te = {}
    for i in range(nlayers):
        te[f"lstm_{i}"] = bilstm(sd, f"text_encoder.lstms.{2 * i}")
        te[f"ada_{i}"] = {"fc": lin(sd, f"text_encoder.lstms.{2 * i + 1}.fc")}
    p["text_encoder"] = te
    p["lstm"] = bilstm(sd, "lstm")
    p["duration_proj"] = lin(sd, "duration_proj.linear_layer")
    p["shared"] = bilstm(sd, "shared")
    for branch, mine in (("F0", "F0_blocks"), ("N", "N_blocks")):
        for j in range(3):
            p[f"{mine}_{j}"] = _adain_res_blk1d(
                sd, f"{branch}.{j}", upsample=(j == 1)
            )
    p["F0_proj"] = conv1d(sd, "F0_proj")
    p["N_proj"] = conv1d(sd, "N_proj")
    return {"params": p}


def _adain_res_block1(sd, base, n=3):
    """AdaINResBlock1 (istftnet.py:27-75) → my AdaINResBlock1 names."""
    blk = {}
    for j in range(n):
        blk[f"conv1_{j}"] = wnconv1d(sd, f"{base}.convs1.{j}")
        blk[f"conv2_{j}"] = wnconv1d(sd, f"{base}.convs2.{j}")
        blk[f"adain1_{j}"] = {"fc": lin(sd, f"{base}.adain1.{j}.fc")}
        blk[f"adain2_{j}"] = {"fc": lin(sd, f"{base}.adain2.{j}.fc")}
        blk[f"alpha1_{j}"] = t(sd[f"{base}.alpha1.{j}"]).transpose(0, 2, 1)
        blk[f"alpha2_{j}"] = t(sd[f"{base}.alpha2.{j}"]).transpose(0, 2, 1)
    return blk


def convert_decoder_istftnet(
    sd: Dict[str, Any], num_upsamples: int = 2, num_kernels: int = 3
) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    p["encode"] = _adain_res_blk1d(sd, "encode")
    for i in range(4):
        p[f"decode_{i}"] = _adain_res_blk1d(sd, f"decode.{i}", upsample=(i == 3))
    p["F0_conv"] = wnconv1d(sd, "F0_conv")
    p["N_conv"] = wnconv1d(sd, "N_conv")
    p["asr_res"] = wnconv1d(sd, "asr_res.0")
    g: Dict[str, Any] = {}
    g["m_source"] = {"l_linear": lin(sd, "generator.m_source.l_linear")}
    for i in range(num_upsamples):
        g[f"ups_{i}"] = wnconvtr1d(sd, f"generator.ups.{i}")
        g[f"noise_convs_{i}"] = conv1d(sd, f"generator.noise_convs.{i}")
        g[f"noise_res_{i}"] = _adain_res_block1(sd, f"generator.noise_res.{i}")
        for j in range(num_kernels):
            g[f"resblocks_{i}_{j}"] = _adain_res_block1(
                sd, f"generator.resblocks.{i * num_kernels + j}"
            )
    g["conv_post"] = wnconv1d(sd, "generator.conv_post")
    p["generator"] = g
    return {"params": p}


def convert_diffusion(
    sd: Dict[str, Any], num_layers: int = 3, multispeaker: bool = False
) -> Dict[str, Any]:
    """StyleTransformer1d / Transformer1d (Modules/diffusion/modules.py) —
    checkpoint keys carry the 'unet.' prefix from AudioDiffusionConditional."""
    pre = "unet." if any(k.startswith("unet.") for k in sd) else ""
    p: Dict[str, Any] = {}
    p["fixed_embedding"] = t(sd[f"{pre}fixed_embedding.embedding.weight"])
    # to_time = Sequential(TimePositionalEmbedding(=Seq(LPE, Linear)), GELU)
    # in BOTH variants (modules.py:100-106, 343-347)
    p["to_time"] = {
        "weights": t(sd[f"{pre}to_time.0.0.weights"]),
        "proj": lin(sd, f"{pre}to_time.0.1"),
    }
    if multispeaker:
        p["to_features"] = lin(sd, f"{pre}to_features.0")
    p["map1"] = lin(sd, f"{pre}to_mapping.0")
    p["map2"] = lin(sd, f"{pre}to_mapping.2")
    for i in range(num_layers):
        b = f"{pre}blocks.{i}"
        att = {
            "to_q": lin_nobias(sd, f"{b}.attention.to_q"),
            "to_kv": lin_nobias(sd, f"{b}.attention.to_kv"),
            "to_out": lin(sd, f"{b}.attention.attention.to_out"),
        }
        if multispeaker:
            att["norm"] = {"fc": lin(sd, f"{b}.attention.norm.fc")}
            att["norm_context"] = {"fc": lin(sd, f"{b}.attention.norm_context.fc")}
        else:
            att["norm"] = ln(sd, f"{b}.attention.norm")
            att["norm_context"] = ln(sd, f"{b}.attention.norm_context")
        p[f"block_{i}"] = {
            "attention": att,
            "feed_forward": {
                "in": lin(sd, f"{b}.feed_forward.0"),
                "out": lin(sd, f"{b}.feed_forward.2"),
            },
        }
    p["to_out"] = {
        "kernel": t(sd[f"{pre}to_out.1.weight"])[:, :, 0].T,
        "bias": t(sd[f"{pre}to_out.1.bias"]),
    }
    return {"params": p}


def convert_mpd(sd: Dict[str, Any], periods=(2, 3, 5, 7, 11)) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    for i, period in enumerate(periods):
        b = f"discriminators.{i}"
        blk = {}
        for j in range(5):
            blk[f"conv_{j}"] = wnconv2d(sd, f"{b}.convs.{j}")
        blk["conv_post"] = wnconv2d(sd, f"{b}.conv_post")
        p[f"p{period}"] = blk
    return {"params": p}


def convert_msd(sd: Dict[str, Any]) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    for i in range(3):
        b = f"discriminators.{i}"
        blk = {}
        for j in range(5):
            blk[f"conv_{j}"] = wnconv2d(sd, f"{b}.discriminators.{j}")
        blk["out"] = wnconv2d(sd, f"{b}.out")
        p[f"r{i}"] = blk
    return {"params": p}


def convert_wd(sd: Dict[str, Any]) -> Dict[str, Any]:
    p: Dict[str, Any] = {"pre": wnconv1d(sd, "pre")}
    for i in range(3):
        p[f"conv_{i}"] = wnconv1d(sd, f"convs.{i}")
    p["conv_post"] = wnconv1d(sd, "conv_post")
    return {"params": p}


def strip_module_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    """DataParallel checkpoints carry a 'module.' prefix
    (Inference_LJSpeech.ipynb cell 12)."""
    return {
        (k[7:] if k.startswith("module.") else k): v for k, v in sd.items()
    }


def convert_styletts2_checkpoint(state: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Full reference checkpoint {net: {module: state_dict}} → variables dict
    keyed by the same module names (models.py:672-692)."""
    net = state.get("net", state)
    mp = cfg.model_params
    out: Dict[str, Any] = {}
    conv = {
        "text_encoder": lambda sd: convert_text_encoder(sd, mp.n_layer),
        "style_encoder": convert_style_encoder,
        "predictor_encoder": convert_style_encoder,
        "predictor": lambda sd: convert_predictor(sd, mp.n_layer),
        "decoder": (convert_decoder_istftnet if mp.decoder.type == "istftnet" else lambda sd: convert_decoder_hifigan(sd, len(mp.decoder.upsample_rates))),
        "diffusion": lambda sd: convert_diffusion(
            sd, mp.diffusion.transformer.num_layers, mp.multispeaker
        ),
        "bert": convert_albert,
        "bert_encoder": lambda sd: {"params": {"proj": {
            "kernel": t(sd["weight"]).T, "bias": t(sd["bias"])
        }}},
        "mpd": convert_mpd,
        "msd": convert_msd,
        "wd": convert_wd,
        "text_aligner": convert_asr,
        "pitch_extractor": convert_jdc,
    }
    for key, fn in conv.items():
        if key in net:
            sd = strip_module_prefix(
                {k: np.asarray(v) for k, v in net[key].items()}
            )
            try:
                out[key] = fn(sd)
            except KeyError as e:  # pragma: no cover
                raise KeyError(f"converting module '{key}': missing {e}") from e
    return out


def convert_decoder_hifigan(
    sd: Dict[str, Any], num_upsamples: int = 4, num_kernels: int = 3
) -> Dict[str, Any]:
    """HiFi-GAN decoder variant (Modules/hifigan.py:272-347, 416-476)."""
    p: Dict[str, Any] = {}
    p["encode"] = _adain_res_blk1d(sd, "encode")
    for i in range(4):
        p[f"decode_{i}"] = _adain_res_blk1d(sd, f"decode.{i}", upsample=(i == 3))
    p["F0_conv"] = wnconv1d(sd, "F0_conv")
    p["N_conv"] = wnconv1d(sd, "N_conv")
    p["asr_res"] = wnconv1d(sd, "asr_res.0")
    g: Dict[str, Any] = {}
    g["m_source"] = {"l_linear": lin(sd, "generator.m_source.l_linear")}
    for i in range(num_upsamples + 1):
        g[f"alpha_{i}"] = t(sd[f"generator.alphas.{i}"]).transpose(0, 2, 1)
    for i in range(num_upsamples):
        g[f"ups_{i}"] = wnconvtr1d(sd, f"generator.ups.{i}")
        g[f"noise_convs_{i}"] = conv1d(sd, f"generator.noise_convs.{i}")
        g[f"noise_res_{i}"] = _adain_res_block1(sd, f"generator.noise_res.{i}")
        for j in range(num_kernels):
            g[f"resblocks_{i}_{j}"] = _adain_res_block1(
                sd, f"generator.resblocks.{i * num_kernels + j}"
            )
    g["conv_post"] = wnconv1d(sd, "generator.conv_post")
    p["generator"] = g
    return {"params": p}
