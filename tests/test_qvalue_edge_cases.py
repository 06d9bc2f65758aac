"""BH q-value edge cases: ties, zero-mass gaps, singletons."""

import numpy as np

from grafimo_tpu.ops.qvalue import fdr_bh, qvalues_from_histogram


def test_fdr_bh_basic():
    p = np.array([0.01, 0.04, 0.03, 0.5])
    q = fdr_bh(p)
    # classic BH: sorted p (0.01,0.03,0.04,0.5) -> raw (0.04,0.06,0.053,0.5)
    # backward min -> (0.04,0.053,0.053,0.5)
    np.testing.assert_allclose(q, [0.04, 0.053333333333333337, 0.053333333333333337, 0.5])


def test_fdr_bh_ties_share_value():
    p = np.array([0.02, 0.02, 0.02, 0.9])
    q = fdr_bh(p)
    assert q[0] == q[1] == q[2]


def test_fdr_bh_clip_at_one():
    p = np.array([0.9, 0.95, 1.0])
    q = fdr_bh(p)
    assert (q <= 1.0).all()


def test_fdr_bh_empty_and_single():
    assert fdr_bh(np.array([])).size == 0
    np.testing.assert_array_equal(fdr_bh(np.array([0.3])), [0.3])


def _hist_equivalence(scores, pvalue_of_score, hist_size):
    hist = np.bincount(scores, minlength=hist_size)
    pvals = pvalue_of_score(scores.astype(np.int64))
    q_direct = fdr_bh(pvals)
    qmap = qvalues_from_histogram(hist, pvalue_of_score)
    q_hist = np.array([qmap[int(s)] for s in scores])
    np.testing.assert_array_equal(q_direct, q_hist)


def test_histogram_bh_with_equal_p_across_scores():
    """Distinct scores sharing a float p-value (zero-mass gap) must be
    treated as one BH tie block, as statsmodels' sort does."""
    table = {0: 1.0, 1: 0.5, 2: 0.5, 3: 0.125, 4: 0.01}

    def pvs(s):
        return np.array([table[int(x)] for x in np.asarray(s)], np.float64)

    rng = np.random.default_rng(0)
    scores = rng.integers(0, 5, 200)
    _hist_equivalence(scores, pvs, 5)


def test_histogram_bh_random_tables():
    rng = np.random.default_rng(1)
    for _ in range(5):
        n_bins = 50
        tail = np.sort(rng.random(n_bins))[::-1]  # non-increasing p
        table = {i: float(tail[i]) for i in range(n_bins)}

        def pvs(s, table=table):
            return np.array(
                [table[int(x)] for x in np.asarray(s)], np.float64
            )

        scores = rng.integers(0, n_bins, 500)
        _hist_equivalence(scores, pvs, n_bins)
