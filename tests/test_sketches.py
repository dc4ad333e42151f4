"""Merge-law + accuracy property tests for every sketch (SURVEY.md §5.2).

Associativity / commutativity / identity under random splits is what makes
the tree-reduce in aggregates.py correct; accuracy vs exact oracles is what
makes parity with rdv's exact stats meaningful.
"""

import numpy as np
import pytest

from webval.sketches import (
    CategoricalFreq,
    HyperLogLog,
    Moments,
    NumericHistogram,
    TDigest,
    hash64,
)

RNG = np.random.default_rng(42)


def random_splits(values, n_splits, rng):
    idx = rng.permutation(len(values))
    shuffled = values[idx]
    cuts = sorted(rng.integers(0, len(values), size=n_splits - 1))
    return np.split(shuffled, cuts)


# ---------------------------------------------------------------------------
# Moments
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 1, 2])
def test_moments_merge_equals_single_pass(seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(100, 25, size=10_000)
    v[rng.integers(0, len(v), 100)] = np.nan
    whole = Moments().add(v)
    merged = Moments()
    for part in random_splits(v, 7, rng):
        merged.merge(Moments().add(part))
    assert merged.count == whole.count
    assert merged.total == whole.total
    assert merged.min == whole.min and merged.max == whole.max
    assert merged.mean == pytest.approx(whole.mean, rel=1e-12)
    assert merged.std == pytest.approx(whole.std, rel=1e-9)
    assert merged.null_count == whole.null_count


def test_moments_matches_numpy():
    v = RNG.exponential(10, size=5_000)
    m = Moments().add(v)
    assert m.mean == pytest.approx(v.mean(), rel=1e-12)
    assert m.std == pytest.approx(v.std(), rel=1e-9)
    assert m.min == v.min() and m.max == v.max()
    assert m.null_rate == 0.0


def test_moments_roundtrip():
    m = Moments().add(np.array([1.0, 2.0, np.nan]))
    m2 = Moments.from_dict(m.to_dict())
    assert m2.to_dict() == m.to_dict()


# ---------------------------------------------------------------------------
# TDigest
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dist", ["normal", "lognormal", "uniform", "bimodal"])
def test_tdigest_rank_accuracy(dist):
    rng = np.random.default_rng(7)
    n = 50_000
    if dist == "normal":
        v = rng.normal(0, 1, n)
    elif dist == "lognormal":
        v = rng.lognormal(0, 2, n)
    elif dist == "uniform":
        v = rng.uniform(-5, 5, n)
    else:
        v = np.concatenate([rng.normal(-10, 1, n // 2), rng.normal(10, 1, n // 2)])
    t = TDigest(delta=300).add(v)
    vs = np.sort(v)
    for q in [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]:
        est = t.quantile(q)
        # rank error: the estimate's true rank must be within 1% of q
        rank = np.searchsorted(vs, est) / n
        assert abs(rank - q) < 0.01, (dist, q, est, rank)


def test_tdigest_merge_invariance():
    rng = np.random.default_rng(3)
    v = rng.normal(50, 10, 30_000)
    whole = TDigest().add(v)
    merged = TDigest()
    for part in random_splits(v, 11, rng):
        merged.merge(TDigest().add(part))
    vs = np.sort(v)
    for q in [0.05, 0.5, 0.95]:
        r1 = np.searchsorted(vs, whole.quantile(q)) / len(v)
        r2 = np.searchsorted(vs, merged.quantile(q)) / len(v)
        assert abs(r1 - q) < 0.01
        assert abs(r2 - q) < 0.01
    assert merged.min == whole.min and merged.max == whole.max
    assert merged.total_weight == pytest.approx(whole.total_weight)


def test_tdigest_extremes_and_small():
    v = np.array([3.0])
    t = TDigest().add(v)
    assert t.quantile(0.0) == 3.0 and t.quantile(1.0) == 3.0 and t.quantile(0.5) == 3.0
    t2 = TDigest()
    assert t2.quantile(0.5) is None
    v = np.arange(100.0)
    t3 = TDigest().add(v)
    assert t3.quantile(0.0) == 0.0
    assert t3.quantile(1.0) == 99.0


def test_tdigest_roundtrip():
    t = TDigest().add(np.arange(1000.0))
    t2 = TDigest.from_dict(t.to_dict())
    assert t2.quantile(0.5) == t.quantile(0.5)
    assert t2.min == t.min and t2.max == t.max


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("true_n", [100, 10_000, 200_000])
def test_hll_accuracy(true_n):
    vals = np.arange(true_n).astype(np.int64)
    h = HyperLogLog(p=14).add_hashes(hash64(vals))
    est = h.estimate()
    assert abs(est - true_n) / true_n < 0.03, (true_n, est)


def test_hll_merge_equals_single_pass():
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 1 << 40, size=50_000)
    whole = HyperLogLog().add_hashes(hash64(vals))
    merged = HyperLogLog()
    for part in random_splits(vals, 9, rng):
        merged.merge(HyperLogLog().add_hashes(hash64(part)))
    # register-max merge is exact: identical registers, identical estimate
    assert np.array_equal(whole.regs, merged.regs)


def test_hll_strings_and_roundtrip():
    vals = np.array([f"https://d{i % 500}.com/p{i}" for i in range(5000)], dtype=object)
    h = HyperLogLog().add(vals)
    assert abs(h.estimate() - 5000) / 5000 < 0.03
    h2 = HyperLogLog.from_dict(h.to_dict())
    assert np.array_equal(h.regs, h2.regs)


def test_hash64_deterministic():
    a = hash64(np.array(["a", "b", "c"], dtype=object))
    b = hash64(np.array(["a", "b", "c"], dtype=object))
    assert np.array_equal(a, b)
    assert len(set(a.tolist())) == 3


# ---------------------------------------------------------------------------
# CategoricalFreq
# ---------------------------------------------------------------------------

def test_catfreq_exact_and_merge():
    import pandas as pd
    rng = np.random.default_rng(11)
    vals = rng.choice(["en", "de", "fr", "es", None], p=[0.5, 0.2, 0.15, 0.1, 0.05], size=10_000)
    whole = CategoricalFreq().add(vals)
    truth = pd.Series(vals).value_counts().to_dict()
    assert whole.counts == truth
    assert whole.null_count == pd.Series(vals).isna().sum()
    merged = CategoricalFreq()
    for part in random_splits(vals, 5, rng):
        merged.merge(CategoricalFreq().add(part))
    assert merged.counts == whole.counts
    assert merged.total == whole.total == 10_000


def test_catfreq_topk_guard():
    f = CategoricalFreq(max_keys=10)
    f.add_counts([f"k{i}" for i in range(100)], [100 - i for i in range(100)])
    assert len(f.counts) == 10
    assert f.other_count == sum(100 - i for i in range(10, 100))
    assert f.total == sum(100 - i for i in range(100))
    f2 = CategoricalFreq.from_dict(f.to_dict())
    assert f2.counts == f.counts and f2.other_count == f.other_count


# ---------------------------------------------------------------------------
# NumericHistogram
# ---------------------------------------------------------------------------

def test_histogram_merge_and_overflow():
    rng = np.random.default_rng(13)
    v = rng.normal(0, 1, 20_000)
    edges = np.linspace(-2, 2, 33)
    whole = NumericHistogram(edges).add(v)
    merged = NumericHistogram(edges)
    for part in random_splits(v, 6, rng):
        merged.merge(NumericHistogram(edges).add(part))
    assert np.array_equal(whole.counts, merged.counts)
    assert whole.underflow == merged.underflow and whole.overflow == merged.overflow
    assert whole.counts.sum() + whole.underflow + whole.overflow == len(v)
    p = whole.probs()
    assert p.sum() == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# BloomFilter
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_low_fp():
    from webval.sketches import BloomFilter
    rng = np.random.default_rng(19)
    members = np.array([f"https://m{i}.com/{i}" for i in range(20_000)], dtype=object)
    others = np.array([f"https://x{i}.net/{i}" for i in range(20_000)], dtype=object)
    bf = BloomFilter(20_000, fp_rate=0.01).add(members)
    assert bf.contains(members).all()  # zero false negatives, guaranteed
    fp = bf.contains(others).mean()
    assert fp < 0.03, fp
    # merge = OR
    bf2 = BloomFilter(20_000, fp_rate=0.01).add(others[:100])
    bf.merge(bf2)
    assert bf.contains(others[:100]).all()


def test_misra_gries_exact_when_k_covers_distinct():
    import numpy as np

    from webval.sketches import MisraGries

    rng = np.random.default_rng(5)
    vals = rng.choice([f"v{i}" for i in range(10)], size=5000,
                      p=np.array([20, 10, 8, 8, 8, 8, 8, 8, 8, 14]) / 100)
    mg = MisraGries(k=16).add(vals)
    import collections
    exact = collections.Counter(vals.tolist())
    got = {v: (lo, hi) for v, lo, hi in mg.heavy_hitters()}
    assert mg.err == 0
    assert {v: lo for v, (lo, hi) in got.items()} == dict(exact)


def test_misra_gries_bounds_and_merge_law():
    """Certified bounds must hold for ANY random merge tree, and err must
    respect the published n/(k+1) bound."""
    import collections

    import numpy as np

    from webval.sketches import MisraGries

    rng = np.random.default_rng(11)
    # zipf-ish stream with far more distinct values than k
    vals = [f"v{int(i)}" for i in rng.zipf(1.3, size=20000) if i < 5000]
    exact = collections.Counter(vals)
    n = len(vals)
    for trial in range(5):
        r2 = np.random.default_rng(trial)
        parts = np.array_split(np.array(vals), r2.integers(2, 12))
        sketches = [MisraGries(k=24).add(p) for p in parts]
        r2.shuffle(sketches)
        mg = sketches[0]
        for s in sketches[1:]:
            mg.merge(s)
        assert mg.total == n
        assert mg.err <= n / (24 + 1) * 2  # merge-tree bound (sum of locals)
        for v, lo, hi in mg.heavy_hitters():
            assert lo <= exact[v] <= hi, (trial, v, lo, exact[v], hi)
        # no false negatives above the certified error
        stored = {v for v, _, _ in mg.heavy_hitters()}
        for v, c in exact.items():
            if c > mg.err:
                assert v in stored, (trial, v, c, mg.err)


def test_cms_guarantee_and_merge_law():
    import json

    from webval.sketches import CountMinSketch

    rng = np.random.default_rng(17)
    vals = rng.zipf(1.4, 40000).astype(str)
    whole = CountMinSketch(eps=1e-3, delta=0.01).add(vals)
    # merge law: any split + serialization round-trip == single pass
    cut = rng.integers(1, len(vals) - 1)
    a = CountMinSketch(eps=1e-3, delta=0.01).add(vals[:cut])
    b = CountMinSketch(eps=1e-3, delta=0.01).add(vals[cut:])
    merged = a.merge(CountMinSketch.from_dict(json.loads(
        json.dumps(b.to_dict()))))
    assert np.array_equal(merged.table, whole.table)
    assert merged.n == whole.n == len(vals)

    import collections
    exact = collections.Counter(vals)
    keys = np.array(list(exact))
    est = whole.estimate(keys)
    want = np.array([exact[k] for k in keys])
    assert (est >= want).all()                    # never underestimates
    assert (est <= want + 1e-3 * whole.n).all()   # eps*N bound


def test_cms_of_distributed_equals_single_pass(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from webval.sketches import CountMinSketch, cms_of

    rng = np.random.default_rng(23)
    vals = np.array([f"h{v}" for v in rng.zipf(1.6, 30000)])
    mask = rng.random(len(vals)) < 0.02
    arr = pa.array(np.where(mask, None, vals).tolist())
    ds = rd.from_arrow(pa.table({"v": arr})).repartition(9)
    got = cms_of(ds, "v", eps=1e-3, delta=0.01, batch_size=1024, fan=3)
    want = CountMinSketch(eps=1e-3, delta=0.01).add(vals[~mask])
    assert np.array_equal(got.table, want.table) and got.n == want.n
