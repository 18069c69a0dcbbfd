"""JAX → PyTorch weight export (inverse of convert.py) for the iSTFTNet
decoder.

Purpose: fidelity validation on TRAINED weights. The torch→jax converter
(convert.py) proves itself against the published checkpoint layout with
random weights; this inverse lets a briefly-trained jax decoder be loaded
into the in-repo reference decoder (Modules/istftnet.py:467-528) so
cross-framework MCD can be measured on NON-chaotic weights — the number the
random-weight parity harness structurally cannot produce
(tests/test_ref_parity.py docstring, docs/ROADMAP.md).

Layout rules are the exact inverses of convert.py:
  Linear (in,out) → (out,in); Conv1d (k,in,out) → (out,in,k);
  ConvTranspose1d v kept in torch (in,out/g,k) layout; weight-norm g
  reshaped back to torch's (d0,1,1); snake alpha (1,1,C) → (1,C,1).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _t(x):
    return np.asarray(x, dtype=np.float32)


def inv_lin(p, sd, name):
    sd[f"{name}.weight"] = _t(p["kernel"]).T
    if "bias" in p:
        sd[f"{name}.bias"] = _t(p["bias"])


def inv_wnconv1d(p, sd, name):
    sd[f"{name}.weight_v"] = _t(p["v"]).transpose(2, 1, 0)  # (k,in,out)→(out,in,k)
    sd[f"{name}.weight_g"] = _t(p["g"]).reshape(-1, 1, 1)
    if "bias" in p:
        sd[f"{name}.bias"] = _t(p["bias"])


def inv_wnconvtr1d(p, sd, name):
    sd[f"{name}.weight_v"] = _t(p["v"])  # stored in torch (in,out/g,k) layout
    sd[f"{name}.weight_g"] = _t(p["g"]).reshape(-1, 1, 1)
    if "bias" in p:
        sd[f"{name}.bias"] = _t(p["bias"])


def inv_conv1d(p, sd, name):
    sd[f"{name}.weight"] = _t(p["kernel"]).transpose(2, 1, 0)
    if "bias" in p:
        sd[f"{name}.bias"] = _t(p["bias"])


def _inv_adain_res_blk1d(p, sd, base):
    inv_lin(p["norm1"]["fc"], sd, f"{base}.norm1.fc")
    inv_lin(p["norm2"]["fc"], sd, f"{base}.norm2.fc")
    inv_wnconv1d(p["conv1"], sd, f"{base}.conv1")
    inv_wnconv1d(p["conv2"], sd, f"{base}.conv2")
    if "pool" in p:
        inv_wnconvtr1d(p["pool"], sd, f"{base}.pool")
    if "conv1x1" in p:
        inv_wnconv1d(p["conv1x1"], sd, f"{base}.conv1x1")


def _inv_adain_res_block1(p, sd, base):
    n = sum(1 for k in p if k.startswith("conv1_"))
    for j in range(n):
        inv_wnconv1d(p[f"conv1_{j}"], sd, f"{base}.convs1.{j}")
        inv_wnconv1d(p[f"conv2_{j}"], sd, f"{base}.convs2.{j}")
        inv_lin(p[f"adain1_{j}"]["fc"], sd, f"{base}.adain1.{j}.fc")
        inv_lin(p[f"adain2_{j}"]["fc"], sd, f"{base}.adain2.{j}.fc")
        sd[f"{base}.alpha1.{j}"] = _t(p[f"alpha1_{j}"]).transpose(0, 2, 1)
        sd[f"{base}.alpha2.{j}"] = _t(p[f"alpha2_{j}"]).transpose(0, 2, 1)


def export_decoder_istftnet(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """flax decoder params (models/decoder_istft.py) → reference-format
    state_dict (Modules/istftnet.py Decoder). Exact inverse of
    convert.convert_decoder_istftnet."""
    p = params["params"] if "params" in params else params
    sd: Dict[str, np.ndarray] = {}
    _inv_adain_res_blk1d(p["encode"], sd, "encode")
    for i in range(4):
        _inv_adain_res_blk1d(p[f"decode_{i}"], sd, f"decode.{i}")
    inv_wnconv1d(p["F0_conv"], sd, "F0_conv")
    inv_wnconv1d(p["N_conv"], sd, "N_conv")
    inv_wnconv1d(p["asr_res"], sd, "asr_res.0")
    g = p["generator"]
    inv_lin(g["m_source"]["l_linear"], sd, "generator.m_source.l_linear")
    ups = sorted(int(k.split("_")[1]) for k in g if k.startswith("ups_"))
    num_kernels = len({k.split("_")[2] for k in g if k.startswith("resblocks_")})
    for i in ups:
        inv_wnconvtr1d(g[f"ups_{i}"], sd, f"generator.ups.{i}")
        inv_conv1d(g[f"noise_convs_{i}"], sd, f"generator.noise_convs.{i}")
        _inv_adain_res_block1(g[f"noise_res_{i}"], sd, f"generator.noise_res.{i}")
        for j in range(num_kernels):
            _inv_adain_res_block1(
                g[f"resblocks_{i}_{j}"], sd,
                f"generator.resblocks.{i * num_kernels + j}",
            )
    inv_wnconv1d(g["conv_post"], sd, "generator.conv_post")
    return sd
