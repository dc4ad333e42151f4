"""Hypothesis property tests for the merge laws (SURVEY.md §5.2):
associativity / commutativity / identity under arbitrary splits — the
correctness keystone of the tree reduce."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from webval.sketches import CategoricalFreq, HyperLogLog, Moments, NumericHistogram, TDigest, hash64

finite = st.floats(min_value=-1e12, max_value=1e12,
                   allow_nan=False, allow_infinity=False)


@st.composite
def values_and_split(draw):
    vals = draw(st.lists(finite, min_size=1, max_size=300))
    k = draw(st.integers(min_value=0, max_value=len(vals)))
    return np.array(vals), k


@settings(max_examples=40, deadline=None)
@given(values_and_split())
def test_moments_split_invariance(vs):
    v, k = vs
    whole = Moments().add(v)
    merged = Moments().add(v[:k]).merge(Moments().add(v[k:]))
    assert merged.count == whole.count
    assert merged.min == whole.min and merged.max == whole.max
    # summation error scales with the CONDITION of the sum (n·eps·Σ|v|),
    # not the result: [1e12, -1e12, 6e-5] cancels to ~6e-5 while either
    # split order carries ~1e-4 of representation error (hypothesis find)
    assert abs(merged.sum - whole.sum) <= (
        1e-12 * len(v) * max(1.0, float(np.abs(v).sum())))


@settings(max_examples=40, deadline=None)
@given(values_and_split())
def test_hll_split_invariance_exact_registers(vs):
    v, k = vs
    whole = HyperLogLog().add_hashes(hash64(v))
    merged = (HyperLogLog().add_hashes(hash64(v[:k]))
              .merge(HyperLogLog().add_hashes(hash64(v[k:]))))
    assert np.array_equal(whole.regs, merged.regs)


@settings(max_examples=40, deadline=None)
@given(values_and_split())
def test_tdigest_split_weight_and_extremes(vs):
    v, k = vs
    whole = TDigest().add(v)
    merged = TDigest().add(v[:k]).merge(TDigest().add(v[k:]))
    assert merged.total_weight == whole.total_weight == len(v)
    assert merged.min == whole.min and merged.max == whole.max
    # median estimates must agree within rank tolerance on the sorted data
    vs_sorted = np.sort(v)
    for t in (whole, merged):
        est = t.quantile(0.5)
        lo = vs_sorted[max(0, int(0.4 * len(v)) - 1)]
        hi = vs_sorted[min(len(v) - 1, int(np.ceil(0.6 * len(v))))]
        assert lo <= est <= hi or np.isclose(est, lo) or np.isclose(est, hi)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.sampled_from(["a", "b", "c", "d", "e", None]),
                min_size=1, max_size=200),
       st.integers(min_value=0, max_value=200))
def test_catfreq_split_invariance(vals, k):
    k = min(k, len(vals))
    arr = np.array(vals, dtype=object)
    whole = CategoricalFreq().add(arr)
    merged = CategoricalFreq().add(arr[:k]).merge(CategoricalFreq().add(arr[k:]))
    assert whole.counts == merged.counts
    assert whole.null_count == merged.null_count
    assert whole.total == merged.total == len(vals)


@settings(max_examples=40, deadline=None)
@given(values_and_split())
def test_histogram_split_invariance(vs):
    v, k = vs
    edges = np.linspace(-100, 100, 11)
    whole = NumericHistogram(edges).add(v)
    merged = (NumericHistogram(edges).add(v[:k])
              .merge(NumericHistogram(edges).add(v[k:])))
    assert np.array_equal(whole.counts, merged.counts)
    assert whole.underflow == merged.underflow
    assert whole.overflow == merged.overflow
    assert whole.counts.sum() + whole.underflow + whole.overflow == len(v)
