"""Fast (eval_shape+numpy) param init: structure-exact vs the real flax init
without compiling a single XLA program (models/build.fast_init_training_params,
used by the multichip dryrun — VERDICT round-4 item #1b).

Checks: identical pytree structure/shapes/dtypes as the traced real init,
finite values, torch-style weight-norm pairing (g = ||v|| per channel), and
spectral-norm u/v aligned to the kernel's top singular pair (random u/v
underestimate sigma and the W/sigma division then amplifies ~50x per layer
through the normalization-free SN ResBlk stacks)."""

import jax
import numpy as np

from styletts2_tpu.models.build import fast_init_training_params, init_training_params
from styletts2_tpu.parallel.tiny import tiny_config, tiny_models_and_variables


def _paths(tree):
    return {
        jax.tree_util.keystr(p): (tuple(x.shape), str(x.dtype))
        for p, x in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_fast_init_structure_matches_real_init_trace():
    cfg = tiny_config()
    models, variables = tiny_models_and_variables(cfg, style_repeat=2, fast_init=True)
    shapes = jax.eval_shape(
        lambda k: init_training_params(models, k, cfg), jax.random.PRNGKey(0)
    )
    assert _paths(variables) == _paths(shapes)
    for p, x in jax.tree_util.tree_flatten_with_path(variables)[0]:
        assert np.all(np.isfinite(np.asarray(x))), jax.tree_util.keystr(p)


def test_fast_init_weight_norm_and_spectral_conventions():
    cfg = tiny_config()
    _, variables = tiny_models_and_variables(cfg, style_repeat=2, fast_init=True)

    # weight-norm pairing: g = ||v|| over the non-gain axes (layers.py WN
    # reparametrization; torch _weight_norm dim semantics)
    found_wn = found_sn = 0

    def walk(tree, par=None):
        nonlocal found_wn, found_sn
        if not isinstance(tree, dict):
            return
        g, v = tree.get("g"), tree.get("v")
        if g is not None and v is not None and getattr(v, "ndim", 0) >= 2:
            found_wn += 1
            vv = np.asarray(v, np.float64)
            gg = np.asarray(g, np.float64)
            if gg.size == v.shape[-1]:
                # WNConv1d: g per out channel (last axis), layers.py:119
                expect = np.sqrt((vv ** 2).reshape(-1, v.shape[-1]).sum(0))
            else:
                # WNConvTranspose1d / depthwise pool: g per first axis
                # (torch dim=0), layers.py:176
                assert gg.size == v.shape[0], (gg.shape, v.shape)
                expect = np.sqrt((vv ** 2).reshape(v.shape[0], -1).sum(1))
            np.testing.assert_allclose(gg, expect, rtol=1e-4)
        for k, sv in tree.items():
            if isinstance(sv, dict):
                walk(sv)

    walk(variables)
    assert found_wn > 0

    # spectral-norm u/v: sigma estimate u^T W v within ~15% of the true top
    # singular value (3 power iterations from an aligned start)
    def walk_sn(spec, par):
        nonlocal found_sn
        if not isinstance(spec, dict):
            return
        if "u" in spec and "v" in spec and isinstance(par, dict) and "kernel" in par:
            w = np.asarray(par["kernel"], np.float64)
            wm = w.reshape(-1, w.shape[-1]).T
            u = np.asarray(spec["u"], np.float64)
            v = np.asarray(spec["v"], np.float64)
            sigma = float(u @ wm @ v)
            sigma_true = float(np.linalg.svd(wm, compute_uv=False)[0])
            assert sigma > 0.85 * sigma_true, (sigma, sigma_true)
            found_sn += 1
            return
        for k, sv in spec.items():
            walk_sn(sv, par.get(k) if isinstance(par, dict) else None)

    for mod in variables.values():
        if isinstance(mod, dict) and "spectral" in mod and "params" in mod:
            walk_sn(mod["spectral"], mod["params"])
    assert found_sn > 0
