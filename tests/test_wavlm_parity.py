"""Numerical parity of the JAX WavLM/ALBERT against HF torch models with
converted weights (random-init — no network needed). This validates the
architecture transcription exactly (SURVEY.md §4 golden-tolerance strategy)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_wavlm_matches_hf():
    from transformers import WavLMConfig, WavLMModel

    from styletts2_tpu.convert import convert_wavlm
    from styletts2_tpu.models.wavlm import WavLM

    cfg = WavLMConfig(
        hidden_size=96,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        num_conv_pos_embeddings=128,
        num_conv_pos_embedding_groups=16,
    )
    torch.manual_seed(0)
    ref = WavLMModel(cfg).eval()
    wav = np.random.default_rng(0).standard_normal((2, 3200)).astype(np.float32)
    with torch.no_grad():
        out = ref(torch.from_numpy(wav), output_hidden_states=True)
    want = [h.numpy() for h in out.hidden_states]

    ours_mod = WavLM(hidden=96, heads=4, intermediate=128, num_layers=3)
    params = convert_wavlm(
        {k: v.numpy() for k, v in ref.state_dict().items()}, num_layers=3
    )
    got = ours_mod.apply(params, jnp.asarray(wav))
    assert len(got) == len(want) == 4
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g), w, atol=2e-4, rtol=1e-3, err_msg=f"state {i}"
        )


@pytest.mark.slow
def test_albert_matches_hf():
    from transformers import AlbertConfig, AlbertModel

    from styletts2_tpu.config import PLBERTParams
    from styletts2_tpu.convert import convert_albert
    from styletts2_tpu.models.plbert import PLBERT

    cfg = AlbertConfig(
        vocab_size=178,
        hidden_size=96,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=64,
        num_hidden_layers=3,
        embedding_size=32,
    )
    torch.manual_seed(1)
    ref = AlbertModel(cfg, add_pooling_layer=False).eval()
    tokens = np.random.default_rng(1).integers(0, 178, (2, 17)).astype(np.int64)
    mask = np.ones_like(tokens)
    mask[1, 12:] = 0
    with torch.no_grad():
        want = ref(
            torch.from_numpy(tokens), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()

    pp = PLBERTParams(
        vocab_size=178, hidden_size=96, num_attention_heads=4,
        intermediate_size=128, max_position_embeddings=64,
        num_hidden_layers=3, embedding_size=32,
    )
    ours = PLBERT(pp)
    params = convert_albert({k: v.numpy() for k, v in ref.state_dict().items()})
    got = np.asarray(ours.apply(params, jnp.asarray(tokens), jnp.asarray(mask)))
    # compare only valid positions (padding handling differs by -inf vs -1e9)
    np.testing.assert_allclose(got[0], want[0], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got[1, :12], want[1, :12], atol=2e-4, rtol=1e-3)
