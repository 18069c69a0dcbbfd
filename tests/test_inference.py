"""End-to-end inference smoke tests on random weights (tiny config):
text -> tokens -> diffusion -> durations -> alignment -> decoder -> wav."""

import numpy as np
import pytest

from styletts2_tpu.config import Config
from styletts2_tpu.inference import Synthesizer
from styletts2_tpu.utils import duration_to_alignment

import jax.numpy as jnp


def tiny_cfg(multispeaker=False):
    c = Config()
    c.plbert_params.num_hidden_layers = 1
    c.model_params.multispeaker = multispeaker
    c.model_params.diffusion.transformer.num_layers = 1
    return c


def test_duration_to_alignment():
    dur = jnp.asarray([[2, 3, 1], [1, 1, 0]])
    aln = np.asarray(duration_to_alignment(dur, 8))
    assert aln.shape == (2, 3, 8)
    np.testing.assert_allclose(aln[0, 0], [1, 1, 0, 0, 0, 0, 0, 0])
    np.testing.assert_allclose(aln[0, 1], [0, 0, 1, 1, 1, 0, 0, 0])
    np.testing.assert_allclose(aln[0, 2], [0, 0, 0, 0, 0, 1, 0, 0])
    # each frame belongs to at most one token; frames beyond total are empty
    assert (aln.sum(axis=1) <= 1.0 + 1e-6).all()
    np.testing.assert_allclose(aln[1, :, 2:], 0.0)


@pytest.mark.slow
def test_single_speaker_inference():
    syn = Synthesizer(tiny_cfg(False), seed=0)
    wav, s_pred = syn.inference("ðɪs ɪz ɐ tˈɛst.", diffusion_steps=3)
    assert wav.ndim == 1
    assert len(wav) > 600  # at least some frames
    assert np.isfinite(wav).all()
    assert s_pred.shape == (1, 256)


@pytest.mark.slow
def test_multispeaker_inference_and_lf():
    syn = Synthesizer(tiny_cfg(True), seed=0)
    ref = np.random.default_rng(0).standard_normal((1, 256)).astype(np.float32)
    wav, s1 = syn.inference("hˈɛloʊ wˈɜːld.", ref_s=ref, diffusion_steps=3,
                            embedding_scale=1.5)
    assert np.isfinite(wav).all()
    wav2, s2 = syn.LFinference("sˈɛkənd sˈɛntəns.", s1, ref_s=ref, diffusion_steps=3)
    assert np.isfinite(wav2).all()
    assert s2.shape == (1, 256)


@pytest.mark.slow
def test_bucketed_inference_matches_exact_length():
    """Token-bucket padding must not change the output: the denoiser masks
    padded embedding positions (embedding_lengths), so a 64-bucket run
    equals an exact-length run. Guards the serving configuration's fidelity
    vs the reference's exact-length notebooks."""
    text = "ðɪs ɪz ɐ tˈɛst."
    cfg = tiny_cfg(False)
    syn_exact = Synthesizer(cfg, seed=0, text_bucket=1, frame_bucket=1)
    syn_bucket = Synthesizer(cfg, seed=0, text_bucket=64, frame_bucket=1)
    noise = np.random.default_rng(3).standard_normal((1, 1, 256)).astype(np.float32)
    wav_e, s_e = syn_exact.inference(text, noise=noise, diffusion_steps=3, seed=5)
    wav_b, s_b = syn_bucket.inference(text, noise=noise, diffusion_steps=3, seed=5)
    np.testing.assert_allclose(s_b, s_e, atol=2e-5)
    assert wav_e.shape == wav_b.shape
    denom = np.abs(wav_e).max() + 1e-6
    np.testing.assert_allclose(wav_b / denom, wav_e / denom, atol=1e-3)
