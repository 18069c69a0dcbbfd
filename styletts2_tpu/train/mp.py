"""Mixed-precision (bf16) training support.

The TPU analog of the reference's fp16 accelerate finetune driver
(/root/reference/train_finetune_accelerate.py:33-35,245-249), designed the
bf16 way: master weights and optimizer moments stay f32 in the TrainState;
inside the loss function the FLOP-heavy modules' params and inputs are cast
to bf16 (`astype` is linear, so its VJP casts the cotangent straight back to
f32 — gradients arrive f32 with no GradScaler, since bf16 shares f32's
exponent range); losses are reduced in f32 (losses.py upcasts at entry).

Only the conv/transformer-heavy modules run bf16 — decoder, MPD/MRSD
discriminators, frozen WavLM, and the two style encoders. These are ~90% of
the step FLOPs and are exactly the layers already hardened for the bf16
serving path (f32 islands for weight-norm/instance-norm statistics, sine
phase cumsum, iSTFT head — models/layers.py, models/decoder_istft.py). The
sequence stack (aligner, PL-BERT, predictor LSTMs, diffusion) stays f32:
scan carries and EDM preconditioning are precision-sensitive and a small
FLOP fraction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Modules cast to bf16 under mixed_precision='bf16'
BF16_MODULES = (
    "decoder",
    "mpd",
    "msd",
    "wavlm",
    "style_encoder",
    "predictor_encoder",
)


def cast_tree(tree, dtype):
    """Cast every f32/bf16 leaf to `dtype` (other dtypes untouched)."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and x.dtype in (jnp.float32, jnp.bfloat16)
        else x,
        tree,
    )


def cast_module_params(params: dict, enabled: bool) -> dict:
    """Return params with the BF16_MODULES subtrees cast to bf16 (a no-op
    returning the input dict unchanged when disabled — keeps the traced HLO
    byte-identical to the f32 path so compile caches stay valid)."""
    if not enabled:
        return params
    return {
        k: cast_tree(v, jnp.bfloat16) if k in BF16_MODULES else v
        for k, v in params.items()
    }


def cast_in(x, enabled: bool):
    """Cast an activation to the compute dtype of a bf16 module's input
    (no-op when disabled)."""
    if not enabled:
        return x
    return cast_tree(x, jnp.bfloat16)
