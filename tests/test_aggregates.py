"""AggregateFnV2 sketch wrappers inside ds.groupby().aggregate() (E4/E5/E8)."""

import numpy as np
import pyarrow as pa
import pytest

from webval.aggregates import ApproxDistinct, TDigestQuantile


@pytest.mark.usefixtures("ray_session")
def test_grouped_sketch_aggregates_accuracy():
    import ray.data as rd

    rng = np.random.default_rng(9)
    n = 30_000
    keys = rng.choice(["a", "b", "c"], p=[0.6, 0.3, 0.1], size=n)
    vals = np.where(keys == "a", rng.normal(100, 10, n),
                    np.where(keys == "b", rng.normal(500, 50, n),
                             rng.normal(1000, 5, n)))
    ids = rng.integers(0, 5000, size=n)
    t = pa.table({"k": keys, "v": vals, "id": ids})
    ds = rd.from_arrow(t).repartition(6)
    out = ds.groupby("k").aggregate(
        TDigestQuantile("v", q=0.5, alias_name="p50"),
        ApproxDistinct("id", alias_name="nd")).to_pandas().set_index("k")

    import pandas as pd
    df = t.to_pandas()
    for k, grp in df.groupby("k"):
        true_med = grp["v"].median()
        true_nd = grp["id"].nunique()
        assert abs(out.loc[k, "p50"] - true_med) / abs(true_med) < 0.02, k
        assert abs(out.loc[k, "nd"] - true_nd) / true_nd < 0.03, k


@pytest.mark.usefixtures("ray_session")
def test_approx_distinct_timestamp_nulls():
    """Review r3: NaT (timestamp nulls) must not count as a distinct
    value — COUNT(DISTINCT) semantics across dtypes."""
    import pyarrow as pa
    import ray.data as rd

    from webval.aggregates import ApproxDistinct

    t = pa.table({"g": ["a"] * 6,
                  "ts": pa.array([1_000_000, 2_000_000, None, None,
                                  1_000_000, 2_000_000],
                                 pa.timestamp("us"))})
    out = rd.from_arrow(t).groupby("g").aggregate(
        ApproxDistinct("ts", alias_name="d")).take_all()
    assert round(out[0]["d"]) == 2


def test_grouped_corr_matches_numpy(ray_session):
    import ray.data as rd

    from webval.aggregates import corr_of, grouped_corr

    rng = np.random.default_rng(31)
    n = 20000
    k = rng.integers(0, 30, n)
    x = rng.normal(50, 10, n)
    y = 3.0 * x + rng.normal(0, 25, n)  # correlated with noise
    x[rng.random(n) < 0.03] = np.nan
    y[rng.random(n) < 0.03] = np.nan
    t = pa.table({"k": pa.array(k, pa.int64()), "x": x, "y": y})
    ds = rd.from_arrow(t).repartition(7)
    got = grouped_corr(ds, "k", "x", "y", num_buckets=8).to_pandas() \
        .set_index("k").sort_index()
    import pandas as pd
    df = pd.DataFrame({"k": k, "x": x, "y": y}).dropna()
    for kk, grp in df.groupby("k"):
        want = np.corrcoef(grp["x"], grp["y"])[0, 1]
        assert abs(got.loc[kk, "corr"] - want) < 1e-9
        assert got.loc[kk, "n"] == len(grp)
    g = corr_of(ds, "x", "y")
    assert abs(g - np.corrcoef(df["x"], df["y"])[0, 1]) < 1e-9


def test_grouped_corr_degenerate_groups(ray_session):
    import ray.data as rd

    from webval.aggregates import grouped_corr

    t = pa.table({"k": ["one", "const", "const", "pair", "pair"],
                  "x": [1.0, 2.0, 2.0, 1.0, 2.0],
                  "y": [5.0, 1.0, 9.0, 2.0, 4.0]})
    got = grouped_corr(rd.from_arrow(t), "k", "x", "y",
                       num_buckets=4).to_pandas().set_index("k")
    assert np.isnan(got.loc["one", "corr"])    # n < 2 -> null
    assert np.isnan(got.loc["const", "corr"])  # zero x variance -> null
    assert abs(got.loc["pair", "corr"] - 1.0) < 1e-12


def test_merge_specs_equals_build_on_union(ray_session):
    import ray.data as rd

    from webval.aggregates import merge_specs
    from webval.pipelines import build_schema

    rng = np.random.default_rng(43)
    n = 12000
    import pandas as pd
    df = pd.DataFrame({
        "v": rng.normal(100, 15, n),
        "lang": np.array(["en", "de", "fr"])[rng.integers(0, 3, n)],
    })
    df.loc[rng.random(n) < 0.04, "v"] = np.nan
    kinds = {"v": "numeric", "lang": "categorical"}
    t = pa.Table.from_pandas(df)
    full = build_schema(rd.from_arrow(t), kinds, name="full")
    sa = build_schema(rd.from_arrow(t.slice(0, n // 3)), kinds, name="a")
    sb = build_schema(rd.from_arrow(t.slice(n // 3)), kinds, name="b")
    merged = merge_specs(sa, sb)

    fv, mv = full.column("v"), merged.column("v")
    assert mv.count == fv.count and mv.null_count == fv.null_count
    for f in ("sum", "sumsq", "min", "max", "count"):
        assert mv.moments[f] == pytest.approx(fv.moments[f], rel=1e-12)
    # sketches merge within tolerance
    assert mv.distinct_est == pytest.approx(fv.distinct_est, rel=0.05)
    from webval.sketches import TDigest
    q_m = TDigest.from_dict(mv.tdigest).quantile(0.5)
    q_f = TDigest.from_dict(fv.tdigest).quantile(0.5)
    assert q_m == pytest.approx(q_f, rel=0.02)
    # categorical frequencies merge exactly
    fl, ml = full.column("lang"), merged.column("lang")
    assert ml.frequencies["counts"] == fl.frequencies["counts"]
    # checks re-inferred on the merged stats
    assert {c.name for c in merged.checks} == {c.name for c in full.checks}
    rng_check = next(c for c in merged.checks if c.name == "v-range")
    assert rng_check.params["min"] == mv.moments["min"]


def test_merge_specs_column_union_and_kind_conflict(ray_session):
    import ray.data as rd

    from webval.aggregates import merge_specs
    from webval.pipelines import build_schema

    a = build_schema(rd.from_arrow(pa.table({"x": [1.0, 2.0]})),
                     {"x": "numeric"}, name="a")
    b = build_schema(rd.from_arrow(pa.table({"y": ["u", "v"]})),
                     {"y": "categorical"}, name="b")
    m = merge_specs(a, b)
    assert {p.name for p in m.columns} == {"x", "y"}
    c = build_schema(rd.from_arrow(pa.table({"x": ["s"]})),
                     {"x": "categorical"}, name="c")
    with pytest.raises(ValueError, match="kind differs"):
        merge_specs(a, c)


def test_grouped_mode_brute_force(ray_session):
    import ray.data as rd

    from webval.aggregates import grouped_mode

    rng = np.random.default_rng(5)
    n = 4000
    key = rng.integers(0, 300, n)                 # high cardinality
    val = rng.choice(list("abcde"), n).astype(object)
    val[rng.random(n) < 0.03] = None
    t = pa.table({"k": pa.array(key), "v": pa.array(val)})
    out = (grouped_mode(rd.from_arrow(t).repartition(6), "k", "v",
                        num_buckets=8)
           .to_pandas().set_index("k").sort_index())

    df = t.to_pandas().dropna()
    for k, g in df.groupby("k"):
        cnts = g["v"].value_counts()
        top = cnts.max()
        want = sorted(cnts[cnts == top].index)[0]   # tie → smallest value
        assert out.loc[k, "mode_v"] == want
        assert out.loc[k, "n"] == top
    assert set(out.index) == set(df["k"].unique())


def test_pairwise_corr_matches_numpy(ray_session):
    import ray.data as rd

    from webval.aggregates import pairwise_corr

    rng = np.random.default_rng(9)
    n = 5000
    x = rng.normal(0, 2, n)
    y = 0.7 * x + rng.normal(0, 1, n)
    z = rng.normal(5, 3, n)
    y[rng.random(n) < 0.02] = np.nan              # pairwise-null rows
    t = pa.table({"x": pa.array(x), "y": pa.array(y, from_pandas=True),
                  "z": pa.array(z)})
    out = pairwise_corr(rd.from_arrow(t).repartition(5),
                        [("x", "y"), ("x", "z")]).to_pandas()
    m = ~np.isnan(y)
    want_xy = np.corrcoef(x[m], y[m])[0, 1]
    want_xz = np.corrcoef(x, z)[0, 1]
    got = out.set_index(["col_x", "col_y"])
    assert got.loc[("x", "y"), "n"] == int(m.sum())
    assert got.loc[("x", "y"), "corr"] == pytest.approx(want_xy, abs=1e-9)
    assert got.loc[("x", "z"), "corr"] == pytest.approx(want_xz, abs=1e-9)


def test_median_from_counts_matches_numpy():
    from webval.queries import _median_from_counts

    rng = np.random.default_rng(3)
    for n in (1, 2, 7, 100, 101):
        data = rng.integers(0, 12, n)
        vals, counts = np.unique(data, return_counts=True)
        # shuffle to prove order independence
        p = rng.permutation(len(vals))
        got = _median_from_counts(vals[p].astype(float), counts[p])
        assert got == pytest.approx(float(np.median(data)))


def test_grouped_higher_moments_matches_pandas(ray_session):
    import pandas as pd
    import ray.data as rd

    from webval.aggregates import grouped_higher_moments

    rng = np.random.default_rng(47)
    n = 20000
    k = rng.integers(0, 25, n)
    x = rng.gamma(2.0, 10.0, n)  # skewed so G1/G2 are far from 0
    x[rng.random(n) < 0.02] = np.nan
    t = pa.table({"k": pa.array(k, pa.int64()), "x": x})
    got = grouped_higher_moments(rd.from_arrow(t).repartition(7), "k", "x",
                                 num_buckets=8).to_pandas() \
        .set_index("k").sort_index()
    df = pd.DataFrame({"k": k, "x": x}).dropna()
    for kk, grp in df.groupby("k"):
        # pandas .skew()/.kurt() ARE the bias-corrected G1/G2 that SQL
        # skewness()/kurtosis() compute (verified vs DuckDB in-query)
        assert abs(got.loc[kk, "skewness"] - grp["x"].skew()) < 1e-7
        assert abs(got.loc[kk, "kurtosis"] - grp["x"].kurt()) < 1e-6
        assert got.loc[kk, "n"] == len(grp)


def test_grouped_higher_moments_null_semantics(ray_session):
    import ray.data as rd

    from webval.aggregates import grouped_higher_moments

    t = pa.table({"k": ["n2", "n2", "n3", "n3", "n3",
                        "const", "const", "const", "const"],
                  "x": [1.0, 2.0, 1.0, 2.0, 4.0,
                        7.0, 7.0, 7.0, 7.0]})
    got = grouped_higher_moments(rd.from_arrow(t), "k", "x",
                                 num_buckets=4).to_pandas().set_index("k")
    assert np.isnan(got.loc["n2", "skewness"])     # n < 3
    assert np.isnan(got.loc["n2", "kurtosis"])     # n < 4
    assert not np.isnan(got.loc["n3", "skewness"])
    assert np.isnan(got.loc["n3", "kurtosis"])     # n < 4
    assert np.isnan(got.loc["const", "skewness"])  # zero variance
    assert np.isnan(got.loc["const", "kurtosis"])
