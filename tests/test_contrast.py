"""P3 contrast + per-partition drift report (SURVEY.md §3.2, FIXTURES.md:
one partition generated with a shifted text-length distribution must be
flagged; undrifted partitions must pass)."""

import numpy as np
import pytest

from webval.drift import chi2_test, js_divergence
from webval.pipelines import build_schema, contrast, partition_report
from webval.synth import gen_webpages_table

N = 6000
RPP = 2000  # rows per part → parts 0, 1, 2


def test_js_and_chi2_basics():
    p = [10, 20, 30, 40]
    assert js_divergence(p, p) == 0.0
    assert js_divergence([1, 0], [0, 1]) == pytest.approx(1.0)
    stat, pv = chi2_test([100, 100], [0.5, 0.5])
    assert stat == 0.0 and pv == 1.0
    stat, pv = chi2_test([200, 0], [0.5, 0.5])
    assert stat > 100 and pv < 1e-6
    # p-value sanity vs known chi2: stat=3.84, dof=1 → p ≈ 0.05
    from webval.drift import _gammq
    assert _gammq(0.5, 3.84 / 2) == pytest.approx(0.05, abs=0.002)


def test_psi_basics():
    from webval.drift import psi
    assert psi([10, 20, 30], [10, 20, 30]) == 0.0
    assert psi([100, 100], [1000, 1000]) == 0.0  # scale invariant
    # textbook reading: same shape slightly perturbed stays < 0.1
    assert psi([250, 250, 250, 250], [260, 240, 255, 245]) < 0.1
    # a hard shift blows past 0.25
    assert psi([900, 50, 50], [50, 900, 50]) > 0.25
    # empty bins are floored, not inf/nan
    v = psi([100, 0, 100], [100, 100, 0])
    assert np.isfinite(v) and v > 0.25
    with pytest.raises(ValueError, match="shape"):
        psi([1, 2], [1, 2, 3])


@pytest.fixture(scope="module")
def specs(ray_session):
    import ray.data as rd
    kinds = {"url": "text", "text": "text", "lang": "categorical",
             "warc_ts": "timestamp", "html": "skip", "part_id": "skip"}
    base = rd.from_arrow(gen_webpages_table(np.arange(N), rows_per_part=RPP))
    spec_base = build_schema(base, kinds, name="baseline")
    drifted = rd.from_arrow(
        gen_webpages_table(np.arange(N), drift_part=2, rows_per_part=RPP))
    spec_drift = build_schema(drifted, kinds, name="drifted")
    return spec_base, spec_drift


def test_contrast_self_is_clean(specs):
    spec_base, _ = specs
    rep = contrast(spec_base, spec_base)
    assert rep["drifted"] is False
    assert all(not c["drifted"] for c in rep["columns"].values())


def test_contrast_detects_global_drift(specs):
    spec_base, spec_drift = specs
    rep = contrast(spec_base, spec_drift)
    # a third of rows got ~4× longer text → text length distribution shifts
    assert rep["columns"]["text"]["drifted"] is True
    assert rep["columns"]["lang"]["drifted"] is False
    assert rep["drifted"] is True
    # the PSI score agrees with JS on both columns
    assert rep["columns"]["text"]["psi"] > 0.25
    assert rep["columns"]["lang"]["psi"] < 0.1


@pytest.mark.usefixtures("ray_session")
def test_partition_report_flags_only_drifted_part(specs):
    import ray.data as rd
    spec_base, _ = specs
    ds = rd.from_arrow(
        gen_webpages_table(np.arange(N), drift_part=2, rows_per_part=RPP)
    ).repartition(6)
    # warc_ts / url-length correlate with part_id by construction → exclude
    rep = partition_report(ds, spec_base, part_col="part_id", max_js=0.1,
                           drift_cols=["text", "lang"])
    rep = rep.set_index("part_id")
    assert list(rep.index) == [0, 1, 2]
    assert bool(rep.loc[2, "drifted"]) is True
    assert bool(rep.loc[0, "drifted"]) is False
    assert bool(rep.loc[1, "drifted"]) is False
    assert int(rep.loc[2, "rows"]) == RPP


def test_ks_statistic():
    from webval.drift import ks_statistic

    # identical -> 0
    assert ks_statistic([1, 2, 3], [2, 4, 6]) == 0.0
    # disjoint mass -> 1
    assert ks_statistic([1, 0, 0], [0, 0, 1]) == 1.0
    # known gap: CDFs (0.5, 1.0) vs (0.25, 1.0) -> 0.25
    assert abs(ks_statistic([1, 1], [1, 3]) - 0.25) < 1e-12
    # shape mismatch raises
    import pytest as _pt
    with _pt.raises(ValueError):
        ks_statistic([1], [1, 2])


def test_contrast_reports_ks_and_thresholds():
    import numpy as np

    from webval.pipelines import contrast
    from webval.sketches import NumericHistogram

    def spec_with_hist(name, counts):
        from webval.schema import ColumnProfile, SchemaSpec
        h = NumericHistogram(list(np.linspace(0, 1, len(counts) + 1)))
        h.counts = np.asarray(counts, dtype=np.int64)
        p = ColumnProfile(name="x", kind="numeric", count=int(sum(counts)),
                          histogram=h.to_dict())
        return SchemaSpec(name=name, built=True, columns=[p])

    a = spec_with_hist("a", [100, 100, 100, 100])
    b = spec_with_hist("b", [400, 10, 10, 10])   # heavy shift
    rep = contrast(a, b)
    assert "ks" in rep["columns"]["x"]
    assert rep["columns"]["x"]["ks"] > 0.2
    assert rep["drifted"]
    same = contrast(a, a)
    assert same["columns"]["x"]["ks"] == 0.0


def test_contingency_stats_hand_computed():
    from webval.drift import contingency_stats

    # classic 2×2: perfect association → V = 1; independent → V ≈ 0
    stat, dof, v = contingency_stats([[50, 0], [0, 50]])
    assert dof == 1
    assert stat == pytest.approx(100.0)
    assert v == pytest.approx(1.0)

    stat, dof, v = contingency_stats([[25, 25], [25, 25]])
    assert stat == pytest.approx(0.0)
    assert v == pytest.approx(0.0)

    # hand-computed 2×3 (o−e)²/e sum; all-zero row/col dropped first
    m = [[10, 20, 30], [30, 20, 10], [0, 0, 0]]
    o = np.array(m[:2], dtype=float)
    e = o.sum(1, keepdims=True) * o.sum(0, keepdims=True) / o.sum()
    want = float(((o - e) ** 2 / e).sum())
    stat, dof, v = contingency_stats(m)
    assert dof == 2
    assert stat == pytest.approx(want)
    assert v == pytest.approx(np.sqrt(want / (o.sum() * 1)))

    # degenerate: a single effective row → no association measurable
    assert contingency_stats([[5, 5], [0, 0]]) == (0.0, 0, 0.0)


def test_drift_measure_properties_hypothesis():
    """Property-based invariants of the drift measures (no Ray needed):
    identity → zero, scale invariance, and range bounds."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from webval.drift import contingency_stats, js_divergence, ks_statistic, psi

    counts = st.lists(st.integers(min_value=0, max_value=10_000),
                      min_size=2, max_size=30)

    @settings(max_examples=150, deadline=None)
    @given(counts, counts, st.integers(min_value=1, max_value=7))
    def check(a, b, scale):
        a = np.asarray(a, dtype=float)
        b = np.asarray(b, dtype=float)[: len(a)]
        b = np.pad(b, (0, len(a) - len(b)))
        if a.sum() > 0:
            # identity → 0; scaling counts changes nothing (distributions)
            assert psi(a, a) == pytest.approx(0.0, abs=1e-12)
            assert js_divergence(a, a) == pytest.approx(0.0, abs=1e-12)
            assert ks_statistic(a, a) == pytest.approx(0.0, abs=1e-12)
            assert psi(a, a * scale) == pytest.approx(0.0, abs=1e-9)
        if a.sum() > 0 and b.sum() > 0:
            assert 0.0 <= js_divergence(a, b) <= 1.0 + 1e-12
            assert 0.0 <= ks_statistic(a, b) <= 1.0 + 1e-12
            assert psi(a, b) >= -1e-12
            assert psi(a, b) == pytest.approx(psi(a * scale, b), abs=1e-9)

    check()


def test_contingency_stats_properties_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from webval.drift import contingency_stats

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.lists(st.integers(min_value=0, max_value=500),
                             min_size=2, max_size=6),
                    min_size=2, max_size=6))
    def check(rows):
        w = len(rows[0])
        m = np.array([r[:w] + [0] * (w - len(r)) for r in rows], dtype=float)
        stat, dof, v = contingency_stats(m)
        assert stat >= 0 and dof >= 0
        assert 0.0 <= v <= 1.0 + 1e-9
        # row/col permutation invariance
        stat2, dof2, v2 = contingency_stats(m[::-1, ::-1])
        assert stat2 == pytest.approx(stat, rel=1e-9, abs=1e-9)
        assert (dof2, round(v2, 9)) == (dof, round(v, 9))

    check()


def test_mutual_information_properties():
    import numpy as np

    from webval.drift import mutual_information

    # independent joint -> 0 exactly
    mi, n = mutual_information(np.outer([10, 30], [5, 15]))
    assert abs(mi) < 1e-12 and n == 800
    # perfectly dependent 2x2 with equal mass -> ln 2
    mi2, _ = mutual_information(np.array([[7, 0], [0, 7]]))
    assert abs(mi2 - np.log(2)) < 1e-12
    # bounded by min(H(row), H(col)); empty -> (0, 0)
    assert mutual_information(np.zeros((2, 2))) == (0.0, 0)


def test_wasserstein_binned_properties():
    import numpy as np

    from webval.drift import wasserstein_binned

    assert wasserstein_binned([1, 0, 0], [0, 0, 1]) == 2.0
    assert wasserstein_binned([3, 3], [3, 3]) == 0.0
    assert wasserstein_binned([1, 0], [0, 1], width=5.0) == 5.0
    # symmetry + triangle-ish sanity on random histograms
    rng = np.random.default_rng(4)
    p, q = rng.integers(0, 50, 10), rng.integers(0, 50, 10)
    assert abs(wasserstein_binned(p, q) - wasserstein_binned(q, p)) < 1e-12
    assert wasserstein_binned(p, p) == 0.0
    # empty-side conventions mirror js_divergence
    assert wasserstein_binned([0, 0], [1, 2]) == 1.0
    assert wasserstein_binned([0], [0]) == 0.0
