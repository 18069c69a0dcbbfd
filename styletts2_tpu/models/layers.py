"""Core neural building blocks, TPU-first.

Conventions (deliberately different from the reference's torch NCW layout):
  * sequences are NWC — (batch, time, channels) — matching XLA's preferred
    conv layout on TPU;
  * every module is a pure flax.linen Module; dropout keys via rngs;
  * recurrences (LSTM) precompute the input projection as one large matmul
    (MXU-friendly) and scan only the small recurrent matmul;
  * weight norm / spectral norm are explicit reparametrizations so published
    PyTorch checkpoints convert exactly.

Reference semantics covered here: models.py:27-137 (ResBlk/Down/Upsample),
models.py:270-282 (channel LayerNorm), models.py:349-438 (AdaIN1d,
AdainResBlk1d, AdaLayerNorm), Modules/istftnet.py:15-25 (AdaIN), plus the
five BiLSTMs noted in SURVEY.md §7.3.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


LRELU_SLOPE_02 = 0.2
LRELU_SLOPE_01 = 0.1


def uniform_centered(bound):
    """U(-bound, bound) initializer (torch default conv/linear init)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def leaky_relu(x, slope=LRELU_SLOPE_02):
    return jnp.where(x >= 0, x, slope * x)


def snake(x, alpha):
    """Snake1D activation x + sin^2(alpha x)/alpha (Modules/istftnet.py:69-72)."""
    s = jnp.sin(alpha * x)
    return x + (s * s) / alpha


# ---------------------------------------------------------------------------
# Convolutions (weight-normalized / spectral-normalized / plain)
# ---------------------------------------------------------------------------


def _conv1d(x, w, stride=1, padding=0, dilation=1, groups=1):
    """x: (B, T, Cin), w: (K, Cin/groups, Cout) -> (B, T', Cout).

    Computes in the WEIGHT dtype (raw lax.conv does not promote): under bf16
    mixed precision an f32 activation meeting a bf16 kernel runs bf16."""
    return jax.lax.conv_general_dilated(
        x.astype(w.dtype),
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )


def _conv1d_transpose(x, w, stride=2, padding=1, output_padding=1, groups=1):
    """PyTorch-semantics ConvTranspose1d via lhs-dilated conv.

    x: (B, T, Cin); w: (K, Cin/groups, Cout) already in forward-conv layout
    (converter flips/permutes the torch (Cin, Cout/groups, K) weight).
    Output length = (T-1)*stride - 2*padding + K + output_padding.
    """
    K = w.shape[0]
    pad_l = K - 1 - padding
    pad_r = K - 1 - padding + output_padding
    return jax.lax.conv_general_dilated(
        x.astype(w.dtype),
        jnp.flip(w, axis=0),
        window_strides=(1,),
        padding=[(pad_l, pad_r)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )


class WNConv1d(nn.Module):
    """Weight-normalized 1D conv (NWC). w = g * v / ||v||, norm per out-channel,
    matching torch.nn.utils.weight_norm on Conv1d."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k_shape = (self.kernel_size, in_ch // self.groups, self.features)
        fan_in = self.kernel_size * in_ch // self.groups
        bound = 1.0 / math.sqrt(fan_in)
        v = self.param(
            "v", uniform_centered(bound), k_shape
        )
        g = self.param("g", nn.initializers.constant(bound * math.sqrt(fan_in)), (self.features,))
        # normalize in f32: bf16 sum-accumulation over the kernel elements
        # loses ~1% per layer, compounding to several dB of MCD downstream
        v32 = v.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(v32 * v32, axis=(0, 1), keepdims=True) + 1e-12)
        w = (v32 / norm * g.astype(jnp.float32)[None, None, :]).astype(v.dtype)
        y = _conv1d(x, w, self.stride, self.padding, self.dilation, self.groups)
        if self.use_bias:
            b = self.param("bias", uniform_centered(bound), (self.features,))
            y = y + b
        return y


class Conv1d(nn.Module):
    """Plain 1D conv (NWC), torch-default init."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k_shape = (self.kernel_size, in_ch // self.groups, self.features)
        fan_in = self.kernel_size * in_ch // self.groups
        bound = 1.0 / math.sqrt(fan_in)
        w = self.param("kernel", uniform_centered(bound), k_shape)
        y = _conv1d(x, w, self.stride, self.padding, self.dilation, self.groups)
        if self.use_bias:
            b = self.param("bias", uniform_centered(bound), (self.features,))
            y = y + b
        return y


class WNConvTranspose1d(nn.Module):
    """Weight-normalized ConvTranspose1d (NWC), torch semantics."""

    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        # v kept in the torch ConvTranspose1d layout (in, out/groups, K) so
        # weight_norm normalizes per *input* channel (torch dim=0 semantics)
        # and checkpoints convert 1:1.
        k_shape = (in_ch, self.features // self.groups, self.kernel_size)
        fan_in = self.kernel_size * in_ch // self.groups
        bound = 1.0 / math.sqrt(fan_in)
        v = self.param("v", uniform_centered(bound), k_shape)
        g = self.param("g", nn.initializers.constant(bound * math.sqrt(fan_in)), (in_ch,))
        v32 = v.astype(jnp.float32)  # f32 normalization (see WNConv1d)
        norm = jnp.sqrt(jnp.sum(v32 * v32, axis=(1, 2), keepdims=True) + 1e-12)
        w_t = (v32 / norm * g.astype(jnp.float32)[:, None, None]).astype(
            v.dtype
        )  # (in, out/g, K)
        if self.groups == 1:
            w = jnp.transpose(w_t, (2, 0, 1))  # (K, in, out)
        elif self.groups == in_ch and self.features == in_ch:
            w = jnp.transpose(w_t, (2, 1, 0))  # depthwise: (K, 1, C)
        else:
            raise NotImplementedError("grouped transpose only depthwise or g=1")
        y = _conv1d_transpose(
            x, w, self.stride, self.padding, self.output_padding, self.groups
        )
        if self.use_bias:
            b = self.param("bias", uniform_centered(bound), (self.features,))
            y = y + b
        return y


# Spectral-norm power iterations per stats update (see SNConv2d.__call__).
SN_POWER_ITERS = 1


class SNConv2d(nn.Module):
    """Spectral-normalized 2D conv (NHWC) with one power iteration per call,
    torch.nn.utils.spectral_norm semantics (u persisted in 'spectral' collection)."""

    features: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        k_shape = (kh, kw, in_ch // self.groups, self.features)
        fan_in = kh * kw * in_ch // self.groups
        bound = 1.0 / math.sqrt(fan_in)
        w = self.param("kernel", uniform_centered(bound), k_shape)
        # power-iteration state: torch reshapes w to (out, -1) and persists
        # BOTH u and v; at eval it reuses them without iterating. The flat
        # 'rest' ordering here is (kh, kw, in) — converters permute torch's
        # (in, kh, kw)-ordered weight_v accordingly.
        w_mat = w.reshape(-1, self.features).T  # (out, rest)
        rest = w_mat.shape[1]
        rng0 = (
            self.make_rng("params") if self.has_rng("params") else jax.random.PRNGKey(0)
        )
        u_var = self.variable(
            "spectral", "u", lambda: jax.random.normal(rng0, (self.features,))
        )
        v_var = self.variable(
            "spectral", "v", lambda: jax.random.normal(jax.random.fold_in(rng0, 1), (rest,))
        )
        u, v = u_var.value, v_var.value
        # f32 island: the power iteration + sigma accumulate in f32 even on
        # the bf16 mixed-precision path (train/mp.py) — u/v persist f32 in
        # the 'spectral' collection and sigma rejoins the compute dtype
        w_mat32 = w_mat.astype(jnp.float32)
        if update_stats:
            # SN_POWER_ITERS (module global, default 1): iterations per
            # update. torch runs ONE iteration per train-mode *forward* and
            # the reference makes several forwards per optimizer step
            # (full-utterance + clip + ref style passes, train_second.py:
            # 295-307); here stats update once per step. Setting this to ~3
            # emulates the torch per-step cadence — used by the A/B in
            # tools/ab_dynamics.py (measured deltas in docs/ROADMAP.md).
            for _ in range(SN_POWER_ITERS):
                v = w_mat32.T @ u
                v = v / (jnp.linalg.norm(v) + 1e-12)
                u = w_mat32 @ v
                u = u / (jnp.linalg.norm(u) + 1e-12)
            u = jax.lax.stop_gradient(u)
            v = jax.lax.stop_gradient(v)
            u_var.value = u
            v_var.value = v
        sigma = u @ (w_mat32 @ v)
        w_sn = w / sigma.astype(w.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(w_sn.dtype),
            w_sn,
            window_strides=self.stride,
            padding=[(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            b = self.param("bias", uniform_centered(bound), (self.features,))
            y = y + b
        return y


# ---------------------------------------------------------------------------
# Normalizations
# ---------------------------------------------------------------------------


def instance_norm(x, axis=1, eps=1e-5):
    """InstanceNorm over the time axis for NWC input (torch InstanceNorm1d
    normalizes each (b, c) over time). Statistics accumulate in f32 so the
    bf16 serving path keeps full normalization accuracy."""
    xs = x.astype(jnp.float32)
    mean = jnp.mean(xs, axis=axis, keepdims=True)
    var = jnp.var(xs, axis=axis, keepdims=True)
    return ((xs - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel dim of (B, T, C) with learned affine —
    the reference's LayerNorm used inside TextEncoder (models.py:270-282)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (C,))
        beta = self.param("beta", nn.initializers.zeros, (C,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * gamma + beta


class AdaIN1d(nn.Module):
    """Style-conditional instance norm (istftnet.py:15-25, models.py:349-359).
    x: (B, T, C), s: (B, style_dim)."""

    num_features: int

    @nn.compact
    def __call__(self, x, s):
        h = nn.Dense(self.num_features * 2, name="fc")(s)  # (B, 2C)
        gamma, beta = jnp.split(h, 2, axis=-1)
        y = instance_norm(x, axis=1)
        return (1.0 + gamma[:, None, :]) * y + beta[:, None, :]


class AdaLayerNorm(nn.Module):
    """Style-conditional LayerNorm over channels (models.py:418-438;
    the reference's chain of transposes reduces to a per-channel LN).
    x: (B, T, C), s: (B, style_dim)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, s):
        C = x.shape[-1]
        h = nn.Dense(C * 2, name="fc")(s)
        gamma, beta = jnp.split(h, 2, axis=-1)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return (1.0 + gamma[:, None, :]) * y + beta[:, None, :]


# ---------------------------------------------------------------------------
# Up/down-sampling
# ---------------------------------------------------------------------------


def upsample_nearest_2x(x):
    """(B, T, C) -> (B, 2T, C), nearest (F.interpolate scale 2 'nearest')."""
    B, T, C = x.shape
    return jnp.broadcast_to(x[:, :, None, :], (B, T, 2, C)).reshape(B, 2 * T, C)


def avg_pool_1d_2x(x):
    """(B, T, C) -> (B, ceil(T/2), C) with edge-repeat for odd T
    (models.py:235-241)."""
    if x.shape[1] % 2 != 0:
        x = jnp.concatenate([x, x[:, -1:, :]], axis=1)
    B, T, C = x.shape
    return x.reshape(B, T // 2, 2, C).mean(axis=2)


def avg_pool_2d_2x(x):
    """NHWC half downsample with edge-repeat on odd W (models.py:62-75:
    'half' pads the last *width* dim when odd, then avg_pool2d(2))."""
    if x.shape[2] % 2 != 0:
        x = jnp.concatenate([x, x[:, :, -1:, :]], axis=2)
    if x.shape[1] % 2 != 0:
        # torch avg_pool2d floors the output; replicate by trimming
        x = x[:, : x.shape[1] - 1, :, :]
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))


# ---------------------------------------------------------------------------
# LSTM (mask-aware bidirectional, scan-based)
# ---------------------------------------------------------------------------


class _LSTMDirection(nn.Module):
    hidden: int
    reverse: bool = False
    unroll: int = 1

    @nn.compact
    def __call__(self, x, lengths):
        """x: (B, T, C), lengths: (B,) -> (B, T, H). Padded steps produce 0
        and (for the reverse direction) do not pollute the carry, replicating
        pack_padded_sequence semantics (models.py:314-321)."""
        B, T, C = x.shape
        H = self.hidden
        bound = 1.0 / math.sqrt(H)
        W_ih = self.param("W_ih", uniform_centered(bound), (C, 4 * H))
        W_hh = self.param("W_hh", uniform_centered(bound), (H, 4 * H))
        b = self.param("b", uniform_centered(bound), (4 * H,))

        x_proj = x @ W_ih + b  # one big MXU matmul over (B*T, C)
        ts = jnp.arange(T)
        if self.reverse:
            x_proj = x_proj[:, ::-1]
            ts = ts[::-1]

        def step(carry, inp):
            h, c = carry
            xp, t = inp
            gates = xp + h @ W_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            valid = (t < lengths)[:, None]
            h = jnp.where(valid, h_new, h)
            c = jnp.where(valid, c_new, c)
            out = jnp.where(valid, h_new, 0.0)
            return (h, c), out

        init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
        xs = (jnp.swapaxes(x_proj, 0, 1), ts)
        _, ys = jax.lax.scan(step, init, xs, unroll=self.unroll)
        ys = jnp.swapaxes(ys, 0, 1)  # (B, T, H)
        if self.reverse:
            ys = ys[:, ::-1]
        return ys


class BiLSTM(nn.Module):
    """Bidirectional single-layer LSTM, output (B, T, 2H), masked to 0 at
    padded positions; exact pack/pad parity with the reference's five BiLSTMs.
    unroll=1: on tunneled backends per-call dispatch scales with program
    size, so smaller graphs beat unrolled scans."""

    hidden: int
    unroll: int = 1

    @nn.compact
    def __call__(self, x, lengths):
        fwd = _LSTMDirection(self.hidden, reverse=False, unroll=self.unroll, name="fwd")(x, lengths)
        bwd = _LSTMDirection(self.hidden, reverse=True, unroll=self.unroll, name="bwd")(x, lengths)
        return jnp.concatenate([fwd, bwd], axis=-1)
