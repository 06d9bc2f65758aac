"""Pallas exact-histogram kernel: differential vs bincount and vs the XLA
``_exact_hist`` path (interpret mode — CI has no TPU)."""

import numpy as np
import pytest

from grafimo_tpu.ops.pallas_hist import (
    _tile_n,
    hist_pallas,
    hist_pallas2,
    hist_pallas3,
    hist_pallas4,
    hist_pallas_reference,
)


@pytest.mark.parametrize("use_int8", [False, True])
def test_hist_pallas_matches_bincount(use_int8):
    rng = np.random.default_rng(3)
    hist_size = 19 * 1000 + 1
    # scores spread over the full range, some invalid (-1), 2 columns
    scores = rng.integers(-1, hist_size, (37, 113, 2)).astype(np.int32)
    got = np.asarray(
        hist_pallas(scores, hist_size, interpret=True, use_int8=use_int8)
    )
    want = hist_pallas_reference(scores, hist_size)
    assert got.shape == (hist_size, 2)
    np.testing.assert_array_equal(got, want)


def test_hist_pallas_matches_xla_path():
    import jax.numpy as jnp

    from grafimo_tpu.ops.score_runs import _exact_hist

    rng = np.random.default_rng(5)
    hist_size = 801
    scores = rng.integers(-1, hist_size, (64, 30, 3)).astype(np.int32)
    got = np.asarray(hist_pallas(scores, hist_size, interpret=True))
    want = np.asarray(_exact_hist(jnp.asarray(scores), hist_size))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("lo_w", [256, 128])
def test_hist_pallas_lo_radix_matches_bincount(lo_w):
    """The lo-radix parameterisation (one-vreg lo plane) stays
    bit-identical to the host oracle."""
    rng = np.random.default_rng(23)
    hist_size = 19 * 1000 + 1
    scores = rng.integers(-1, hist_size, (37, 99, 3)).astype(np.int32)
    got = np.asarray(
        hist_pallas(scores, hist_size, interpret=True, lo_w=lo_w)
    )
    want = hist_pallas_reference(scores, hist_size)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("use_int8", [False, True])
def test_hist_pallas2_matches_bincount(use_int8):
    """v2 (lo=128 radix, dtype-native one-hot build) is bit-identical to
    the host oracle across the full k=19 score range incl. invalids."""
    rng = np.random.default_rng(11)
    hist_size = 19 * 1000 + 1
    scores = rng.integers(-1, hist_size, (41, 107, 2)).astype(np.int32)
    got = np.asarray(
        hist_pallas2(scores, hist_size, interpret=True, use_int8=use_int8)
    )
    want = hist_pallas_reference(scores, hist_size)
    assert got.shape == (hist_size, 2)
    np.testing.assert_array_equal(got, want)


def test_hist_pallas2_edges_and_multitile():
    """Bin 0, the last bin, the spill row and multi-tile accumulation."""
    rng = np.random.default_rng(13)
    hist_size = 32 * 1000 + 1  # k=32: the v2 exactness bound (n_hi=251)
    n = _tile_n(1) + 55
    scores = rng.integers(-1, hist_size, (1, n, 1)).astype(np.int32)
    scores[0, :4, 0] = [0, hist_size - 1, -1, 127]
    got = np.asarray(hist_pallas2(scores, hist_size, interpret=True))
    want = hist_pallas_reference(scores, hist_size)
    np.testing.assert_array_equal(got, want)
    assert got.sum() == (scores >= 0).sum()


@pytest.mark.parametrize("use_f32", [False, True])
def test_hist_pallas3_matches_bincount(use_f32):
    """v3 (scratch-persisted iotas) is bit-identical to the host oracle
    across the full k=19 score range incl. invalids and >1 tiles."""
    rng = np.random.default_rng(17)
    hist_size = 19 * 1000 + 1
    scores = rng.integers(-1, hist_size, (11, 650, 2)).astype(np.int32)
    scores[0, :4, 0] = [0, hist_size - 1, -1, 127]
    got = np.asarray(
        hist_pallas3(
            scores, hist_size, interpret=True, use_f32=use_f32, tile=2048
        )
    )
    want = hist_pallas_reference(scores, hist_size)
    assert got.shape == (hist_size, 2)
    np.testing.assert_array_equal(got, want)
    assert got.sum() == (scores >= 0).sum()


def test_hist_pallas4_matches_bincount():
    """v4 ((tile, m) blocks, no input transpose) is bit-identical to the
    host oracle across the full range incl. invalids and >1 tiles."""
    rng = np.random.default_rng(23)
    hist_size = 7426  # compressed-size regime (its target use)
    scores = rng.integers(-1, hist_size, (11, 650, 3)).astype(np.int32)
    scores[0, :4, 0] = [0, hist_size - 1, -1, 127]
    got = np.asarray(
        hist_pallas4(scores, hist_size, interpret=True, tile=2048)
    )
    want = hist_pallas_reference(scores, hist_size)
    assert got.shape == (hist_size, 3)
    np.testing.assert_array_equal(got, want)
    assert got.sum() == (scores >= 0).sum()


def test_hist_pallas_exact_multitile():
    """Counts accumulate exactly across >1 grid tiles and padding rows."""
    rng = np.random.default_rng(7)
    hist_size = 501
    n = _tile_n(1) * 2 + 77  # forces padding and 3 tiles
    scores = rng.integers(-1, hist_size, (1, n, 1)).astype(np.int32)
    got = np.asarray(hist_pallas(scores, hist_size, interpret=True))
    want = hist_pallas_reference(scores, hist_size)
    np.testing.assert_array_equal(got, want)
    assert got.sum() == (scores >= 0).sum()
