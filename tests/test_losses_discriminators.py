"""Losses + discriminators + frozen utility models: shape and semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from styletts2_tpu import losses as L
from styletts2_tpu.models.asr import ASRCNN, dct_matrix
from styletts2_tpu.models.discriminators import (
    MultiPeriodDiscriminator,
    MultiResSpecDiscriminator,
    WavLMDiscriminator,
)
from styletts2_tpu.models.jdc import JDCNet


def test_tprls_matches_torch(rng):
    dr = rng.standard_normal((4, 33)).astype(np.float32)
    dg = rng.standard_normal((4, 33)).astype(np.float32)
    ours = float(L.tprls_loss([jnp.asarray(dr)], [jnp.asarray(dg)]))
    tdr, tdg = torch.from_numpy(dr), torch.from_numpy(dg)
    tau = 0.04
    m = torch.median(tdr - tdg)
    L_rel = torch.mean((((tdr - tdg) - m) ** 2)[tdr < tdg + m])
    want = float(tau - torch.relu(torch.tensor(tau) - L_rel))
    np.testing.assert_allclose(ours, want, atol=1e-5)


def test_adv_aggregates_match_reference(rng):
    """All four G/D LSGAN+FM+TPRLS aggregates vs the actual reference
    losses.py (loaded from /root/reference). In particular the generator
    TPRLS binds diff = gen − real (generator_TPRLS_loss zips
    `for dg, dr in zip(real, gen)`, losses.py:140-147) — the formula is not
    sign-symmetric, so this fails if the arguments are swapped."""
    from ref_compat import load_ref_module

    ref = load_ref_module("ref_losses", "losses.py")

    def rand_outs(shapes):
        return [rng.standard_normal(s).astype(np.float32) * 0.5 for s in shapes]

    mpd_shapes = [(2, 11), (2, 13), (2, 17), (2, 23), (2, 9)]
    msd_shapes = [(2, 21), (2, 15), (2, 19)]
    y_df_r, y_df_g = rand_outs(mpd_shapes), rand_outs(mpd_shapes)
    y_ds_r, y_ds_g = rand_outs(msd_shapes), rand_outs(msd_shapes)
    fmap_f_r = [rand_outs([(2, 4, 6)] * 3) for _ in mpd_shapes]
    fmap_f_g = [rand_outs([(2, 4, 6)] * 3) for _ in mpd_shapes]
    fmap_s_r = [rand_outs([(2, 5, 7)] * 3) for _ in msd_shapes]
    fmap_s_g = [rand_outs([(2, 5, 7)] * 3) for _ in msd_shapes]

    tt = torch.from_numpy
    t_list = lambda xs: [tt(x) for x in xs]
    t_nest = lambda xss: [[tt(x) for x in xs] for xs in xss]

    want_g = float(
        ref.generator_loss(t_list(y_df_g))[0]
        + ref.generator_loss(t_list(y_ds_g))[0]
        + ref.feature_loss(t_nest(fmap_f_r), t_nest(fmap_f_g))
        + ref.feature_loss(t_nest(fmap_s_r), t_nest(fmap_s_g))
        + ref.generator_TPRLS_loss(t_list(y_df_r), t_list(y_df_g))
        + ref.generator_TPRLS_loss(t_list(y_ds_r), t_list(y_ds_g))
    )
    want_d = float(
        ref.discriminator_loss(t_list(y_df_r), t_list(y_df_g))[0]
        + ref.discriminator_loss(t_list(y_ds_r), t_list(y_ds_g))[0]
        + ref.discriminator_TPRLS_loss(t_list(y_df_r), t_list(y_df_g))
        + ref.discriminator_TPRLS_loss(t_list(y_ds_r), t_list(y_ds_g))
    )

    j_list = lambda xs: [jnp.asarray(x) for x in xs]
    j_nest = lambda xss: [[jnp.asarray(x) for x in xs] for xs in xss]
    mpd_out = (j_list(y_df_r), j_list(y_df_g), j_nest(fmap_f_r), j_nest(fmap_f_g))
    msd_out = (j_list(y_ds_r), j_list(y_ds_g), j_nest(fmap_s_r), j_nest(fmap_s_g))
    got_g = float(L.generator_adv_loss(mpd_out, msd_out))
    got_d = float(L.discriminator_adv_loss(mpd_out, msd_out))
    np.testing.assert_allclose(got_g, want_g, atol=1e-5)
    np.testing.assert_allclose(got_d, want_d, atol=1e-5)


def test_lsgan_losses(rng):
    dr = [jnp.asarray(rng.standard_normal((2, 5)).astype(np.float32))]
    dg = [jnp.asarray(rng.standard_normal((2, 5)).astype(np.float32))]
    d = float(L.lsgan_d_loss(dr, dg))
    g = float(L.lsgan_g_loss(dg))
    assert d > 0 and g > 0


def test_multires_stft_loss_zero_for_identical(rng):
    x = jnp.asarray(rng.standard_normal((2, 4800)).astype(np.float32))
    assert float(L.multires_stft_loss(x, x)) < 1e-6
    y = jnp.asarray(rng.standard_normal((2, 4800)).astype(np.float32))
    assert float(L.multires_stft_loss(x, y)) > 0.01


def test_duration_losses():
    logits = jnp.zeros((2, 6, 50))
    durs = jnp.asarray([[2, 3, 1, 4, 0, 0], [1, 1, 1, 0, 0, 0]], jnp.float32)
    lengths = jnp.asarray([4, 3])
    ce = float(L.duration_ce_loss(logits, durs, lengths))
    assert np.isfinite(ce) and ce > 0
    dur_pred = jax.nn.sigmoid(logits).sum(-1)
    l1 = float(L.duration_l1_loss(dur_pred, durs, lengths))
    assert np.isfinite(l1)


def test_mpd_msd_shapes(rng):
    wav_r = jnp.asarray(rng.standard_normal((1, 4800)).astype(np.float32))
    wav_g = jnp.asarray(rng.standard_normal((1, 4800)).astype(np.float32))
    mpd = MultiPeriodDiscriminator()
    p = mpd.init(jax.random.PRNGKey(0), wav_r, wav_g)
    rs, gs, fr, fg = mpd.apply(p, wav_r, wav_g)
    assert len(rs) == 5 and len(fr[0]) == 6
    gl = float(L.generator_adv_loss((rs, gs, fr, fg), (rs, gs, fr, fg)))
    assert np.isfinite(gl)

    msd = MultiResSpecDiscriminator()
    p2 = msd.init(jax.random.PRNGKey(1), wav_r, wav_g)
    rs2, gs2, fr2, fg2 = msd.apply(p2, wav_r, wav_g)
    assert len(rs2) == 3 and len(fr2[0]) == 6
    dl = float(L.discriminator_adv_loss((rs, gs, fr, fg), (rs2, gs2, fr2, fg2)))
    assert np.isfinite(dl)


def test_wavlm_discriminator_head(rng):
    x = jnp.asarray(rng.standard_normal((2, 20, 13 * 768)).astype(np.float32))
    wd = WavLMDiscriminator()
    p = wd.init(jax.random.PRNGKey(0), x)
    out = wd.apply(p, x)
    assert out.shape == (2, 20)


def test_jdc_pitch_extractor(rng):
    mel = jnp.asarray(rng.standard_normal((2, 80, 48)).astype(np.float32))
    jdc = JDCNet(num_class=1)
    variables = jdc.init(jax.random.PRNGKey(0), mel)
    f0, gan_feat, pool = jdc.apply(variables, mel)
    assert f0.shape == (2, 48)
    assert (np.asarray(f0) >= 0).all()
    assert pool.shape == (2, 48, 512)


def test_dct_matrix_matches_torch_create_dct():
    # independent check: DCT-II ortho basis orthonormality
    d = dct_matrix(40, 80)
    gram = d.T @ d
    np.testing.assert_allclose(gram, np.eye(40), atol=1e-5)


def test_asr_aligner_shapes(rng):
    mel = jnp.asarray(rng.standard_normal((2, 80, 40)).astype(np.float32))
    texts = jnp.asarray(rng.integers(4, 178, (2, 7)), jnp.int32)
    valid = jnp.ones((2, 20), jnp.float32)
    asr = ASRCNN()
    variables = asr.init(jax.random.PRNGKey(0), mel, valid, texts)
    ctc, s2s, attn = asr.apply(variables, mel, valid, texts)
    assert ctc.shape == (2, 20, 178)
    assert s2s.shape == (2, 8, 178)
    assert attn.shape == (2, 8, 20)
    # attention rows are distributions
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-5)
