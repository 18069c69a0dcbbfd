"""Monotonic alignment: on-device lax.scan DP vs native C++ kernel vs a
direct numpy transcription of the reference Cython semantics
(resemble-ai/monotonic_align core, wrapped at reference utils.py:14-27)."""

import numpy as np
import pytest

import jax.numpy as jnp

from styletts2_tpu.ops.align import maximum_path, maximum_path_native


def numpy_oracle(neg_cent, t_x, t_y):
    """Direct transcription of the Cython maximum_path_c semantics."""
    T_text, T_mel = neg_cent.shape
    value = np.full((T_text, T_mel), -1e9, dtype=np.float64)
    for y in range(t_y):
        for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
            stay = value[x, y - 1] if x != y else -1e9
            if x == 0:
                d = 0.0 if y == 0 else -1e9
            else:
                d = value[x - 1, y - 1]
            value[x, y] = neg_cent[x, y] + max(stay, d)
    path = np.zeros((T_text, T_mel), dtype=np.float32)
    index = t_x - 1
    for y in range(t_y - 1, -1, -1):
        path[index, y] = 1
        if index != 0 and (index == y or value[index, y - 1] < value[index - 1, y - 1]):
            index -= 1
    return path


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_jax_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    B, T_text, T_mel = 3, 11, 29
    neg = rng.standard_normal((B, T_text, T_mel)).astype(np.float32)
    tls = np.asarray([11, 7, 4], np.int32)
    mls = np.asarray([29, 20, 9], np.int32)
    got = np.asarray(maximum_path(jnp.asarray(neg), jnp.asarray(tls), jnp.asarray(mls)))
    for b in range(B):
        want = numpy_oracle(neg[b], tls[b], mls[b])
        np.testing.assert_array_equal(got[b], want, err_msg=f"batch {b}")


def test_native_matches_oracle():
    rng = np.random.default_rng(42)
    B, T_text, T_mel = 2, 9, 25
    neg = rng.standard_normal((B, T_text, T_mel)).astype(np.float32)
    tls = np.asarray([9, 5], np.int32)
    mls = np.asarray([25, 13], np.int32)
    got = maximum_path_native(neg, tls, mls)
    for b in range(B):
        want = numpy_oracle(neg[b], tls[b], mls[b])
        np.testing.assert_array_equal(got[b], want, err_msg=f"batch {b}")


def test_path_properties():
    rng = np.random.default_rng(7)
    neg = rng.standard_normal((1, 6, 15)).astype(np.float32)
    p = np.asarray(maximum_path(jnp.asarray(neg), jnp.asarray([6]), jnp.asarray([15])))[0]
    # every valid frame assigned exactly one token
    np.testing.assert_array_equal(p.sum(axis=0), np.ones(15))
    # every token covered at least once; durations sum to mel length
    assert (p.sum(axis=1) >= 1).all()
    assert p.sum() == 15
    # monotonic: token index non-decreasing over frames
    tok = p.argmax(axis=0)
    assert (np.diff(tok) >= 0).all()
