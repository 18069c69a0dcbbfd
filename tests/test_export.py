"""jax→torch export (styletts2_tpu/export.py) consistency: exporting decoder
params and re-importing them through the parity-proven torch→jax converter
(convert.py) must reproduce the original tree exactly. Pure numpy — fast."""

import numpy as np

import jax


def test_decoder_export_roundtrip():
    from styletts2_tpu.config import Config
    from styletts2_tpu.convert import convert_decoder_istftnet
    from styletts2_tpu.export import export_decoder_istftnet
    from styletts2_tpu.models.build import build_models, init_params

    cfg = Config()
    cfg.plbert_params.num_hidden_layers = 1
    cfg.model_params.hidden_dim = 128
    cfg.model_params.max_conv_dim = 128
    cfg.model_params.style_dim = 64
    cfg.model_params.dim_in = 32
    cfg.model_params.diffusion.transformer.num_layers = 1
    cfg.model_params.decoder.upsample_initial_channel = 128
    cfg.model_params.decoder.resblock_kernel_sizes = [3]
    cfg.model_params.decoder.resblock_dilation_sizes = [[1, 3, 5]]

    models = build_models(cfg)
    params = init_params(models, jax.random.PRNGKey(0), cfg)["decoder"]

    sd = export_decoder_istftnet(params)
    back = convert_decoder_istftnet(
        sd,
        num_upsamples=len(cfg.model_params.decoder.upsample_rates),
        num_kernels=len(cfg.model_params.decoder.resblock_kernel_sizes),
    )

    want = params["params"] if "params" in params else params
    got = back["params"]
    w_leaves = jax.tree_util.tree_leaves_with_path(want)
    g_map = dict(jax.tree_util.tree_leaves_with_path(got))
    assert len(w_leaves) == len(g_map), (len(w_leaves), len(g_map))
    for path, leaf in w_leaves:
        assert path in g_map, f"missing after roundtrip: {path}"
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(g_map[path]),
            err_msg=str(path),
        )
