"""Numerical parity of core layers against torch with copied weights:
convolutions (plain/weight-normed/transposed/grouped), mask-aware BiLSTM vs
pack_padded_sequence, instance/layer norms."""

import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from styletts2_tpu.models import layers as Ly


def test_wnconv1d_matches_torch(rng):
    B, T, Cin, Cout, K = 2, 16, 8, 12, 3
    x = rng.standard_normal((B, Cin, T)).astype(np.float32)
    conv = tnn.utils.weight_norm(tnn.Conv1d(Cin, Cout, K, padding=1))
    with torch.no_grad():
        want = conv(torch.from_numpy(x)).numpy()
    m = Ly.WNConv1d(Cout, K, padding=1)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((B, T, Cin)))
    sd = {k: v.detach().numpy() for k, v in conv.state_dict().items()}
    params = {"params": {
        "v": sd["weight_v"].transpose(2, 1, 0),
        "g": sd["weight_g"].reshape(-1),
        "bias": sd["bias"],
    }}
    got = np.asarray(m.apply(params, jnp.asarray(x.transpose(0, 2, 1))))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=1e-5)


def test_wnconvtranspose1d_matches_torch(rng):
    # ungrouped (generator ups) and depthwise (AdainResBlk1d pool)
    for groups, Cin, Cout, K, stride, pad, opad in (
        (1, 6, 4, 12, 6, 3, 0),
        (6, 6, 6, 3, 2, 1, 1),
    ):
        B, T = 2, 10
        x = rng.standard_normal((B, Cin, T)).astype(np.float32)
        conv = tnn.utils.weight_norm(
            tnn.ConvTranspose1d(Cin, Cout, K, stride, padding=pad,
                                output_padding=opad, groups=groups)
        )
        with torch.no_grad():
            want = conv(torch.from_numpy(x)).numpy()
        m = Ly.WNConvTranspose1d(Cout, K, stride, pad, opad, groups)
        sd = {k: v.detach().numpy() for k, v in conv.state_dict().items()}
        params = {"params": {
            "v": sd["weight_v"],
            "g": sd["weight_g"].reshape(-1),
            "bias": sd["bias"],
        }}
        got = np.asarray(m.apply(params, jnp.asarray(x.transpose(0, 2, 1))))
        np.testing.assert_allclose(
            got.transpose(0, 2, 1), want, atol=1e-5,
            err_msg=f"groups={groups}",
        )


def test_bilstm_matches_torch_packed(rng):
    B, T, C, H = 3, 11, 6, 5
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    lengths = np.asarray([11, 7, 4])
    lstm = tnn.LSTM(C, H, 1, batch_first=True, bidirectional=True)
    with torch.no_grad():
        packed = tnn.utils.rnn.pack_padded_sequence(
            torch.from_numpy(x), lengths, batch_first=True, enforce_sorted=False
        )
        out, _ = lstm(packed)
        want, _ = tnn.utils.rnn.pad_packed_sequence(
            out, batch_first=True, total_length=T
        )
        want = want.numpy()
    sd = {k: v.detach().numpy() for k, v in lstm.state_dict().items()}
    params = {"params": {
        "fwd": {
            "W_ih": sd["weight_ih_l0"].T,
            "W_hh": sd["weight_hh_l0"].T,
            "b": sd["bias_ih_l0"] + sd["bias_hh_l0"],
        },
        "bwd": {
            "W_ih": sd["weight_ih_l0_reverse"].T,
            "W_hh": sd["weight_hh_l0_reverse"].T,
            "b": sd["bias_ih_l0_reverse"] + sd["bias_hh_l0_reverse"],
        },
    }}
    m = Ly.BiLSTM(H)
    got = np.asarray(m.apply(params, jnp.asarray(x), jnp.asarray(lengths)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_adain_matches_torch(rng):
    B, T, C, S = 2, 9, 6, 4
    x = rng.standard_normal((B, C, T)).astype(np.float32)
    s = rng.standard_normal((B, S)).astype(np.float32)
    fc = tnn.Linear(S, 2 * C)
    norm = tnn.InstanceNorm1d(C, affine=False)
    with torch.no_grad():
        h = fc(torch.from_numpy(s))[..., None]
        gamma, beta = torch.chunk(h, 2, dim=1)
        want = ((1 + gamma) * norm(torch.from_numpy(x)) + beta).numpy()
    m = Ly.AdaIN1d(C)
    params = {"params": {"fc": {
        "kernel": fc.weight.detach().numpy().T, "bias": fc.bias.detach().numpy()
    }}}
    got = np.asarray(m.apply(params, jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(s)))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=1e-5)


def test_snconv2d_matches_torch(rng):
    B, H, W, Cin, Cout = 2, 8, 8, 3, 5
    x = rng.standard_normal((B, Cin, H, W)).astype(np.float32)
    conv = tnn.utils.spectral_norm(tnn.Conv2d(Cin, Cout, 3, padding=1))
    conv.eval()
    with torch.no_grad():
        want = conv(torch.from_numpy(x)).numpy()
        sd = {k: v.detach().numpy() for k, v in conv.state_dict().items()}
    m = Ly.SNConv2d(Cout, (3, 3), padding=(1, 1))
    # torch's weight_v is flattened in (in, kh, kw) order; ours in (kh, kw, in)
    v_perm = sd["weight_v"].reshape(Cin, 3, 3).transpose(1, 2, 0).reshape(-1)
    params = {
        "params": {
            "kernel": sd["weight_orig"].transpose(2, 3, 1, 0),
            "bias": sd["bias"],
        },
        "spectral": {"u": sd["weight_u"], "v": v_perm},
    }
    got = np.asarray(
        m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), update_stats=False)
    )
    # eval-mode torch uses stored u without extra iteration; ours recomputes
    # v from u — matches after torch's train-mode iterations have converged u
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-3, rtol=1e-3)
