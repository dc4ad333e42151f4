"""Order statistics (exact grouped quantiles, top-k per group), map-side
broadcast join, and the deterministic hash sample — each against a
brute-force pandas/numpy oracle, at multiple bucket counts."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from webval.broadcast import broadcast_join
from webval.pipelines import deterministic_sample
from webval.rank import grouped_exact_quantiles, top_k_per_group


@pytest.fixture(scope="module")
def grouped_data(ray_session):
    rng = np.random.default_rng(7)
    n = 20000
    keys = np.array([f"g{i}" for i in rng.integers(0, 40, n)])
    vals = rng.integers(0, 10_000, n).astype("float64")
    vals[rng.random(n) < 0.05] = np.nan  # null values must be ignored
    ids = np.arange(n)
    df = pd.DataFrame({"k": keys, "v": vals, "id": ids})
    import ray.data as rd
    return df, rd.from_arrow(pa.Table.from_pandas(df)).repartition(8)


def _disc_quantile(sorted_vals, q):
    """DuckDB quantile_disc: index ceil(q*n) - 1 on non-null sorted values."""
    n = len(sorted_vals)
    return sorted_vals[max(math.ceil(q * n), 1) - 1]


def test_grouped_exact_quantiles_matches_oracle(grouped_data):
    df, ds = grouped_data
    for buckets in (4, 64):
        got = grouped_exact_quantiles(
            ds, "k", "v", {"p25": 0.25, "p50": 0.5, "p99": 0.99},
            num_buckets=buckets).to_pandas().set_index("k").sort_index()
        for k, grp in df.dropna(subset=["v"]).groupby("k"):
            sv = np.sort(grp["v"].to_numpy())
            for name, q in [("p25", 0.25), ("p50", 0.5), ("p99", 0.99)]:
                assert got.loc[k, name] == _disc_quantile(sv, q), (k, name)
        assert set(got.index) == set(df.dropna(subset=["v"])["k"].unique())


def test_grouped_exact_quantiles_oversized_group_diagnostic(ray_session):
    import ray.data as rd
    t = pa.table({"k": ["a"] * 100, "v": list(range(100))})
    ds = rd.from_arrow(t)
    with pytest.raises(Exception, match="max_group_rows"):
        grouped_exact_quantiles(ds, "k", "v", {"p50": 0.5},
                                max_group_rows=10).to_pandas()


def test_top_k_per_group_matches_row_number(grouped_data):
    df, ds = grouped_data
    want = (df.dropna(subset=["v"])
              .sort_values(["k", "v", "id"], ascending=[True, False, True])
              .groupby("k").head(3))
    for buckets in (4, 64):
        got = top_k_per_group(ds, "k", "v", 3, tie_cols=["id"],
                              num_buckets=buckets).to_pandas()
        got = got.sort_values(["k", "v", "id"],
                              ascending=[True, False, True])
        assert list(got["id"]) == list(want["id"])
        assert list(got.columns) == ["k", "v", "id"]  # whole rows survive


def test_top_k_per_group_ascending_and_ties(ray_session):
    import ray.data as rd
    t = pa.table({"k": ["a"] * 4 + ["b"] * 2,
                  "v": [5, 5, 5, 1, 2, 2],
                  "id": [3, 1, 2, 9, 8, 7]})
    ds = rd.from_arrow(t).repartition(3)
    got = (top_k_per_group(ds, "k", "v", 2, descending=False,
                           tie_cols=["id"]).to_pandas()
           .sort_values(["k", "v", "id"]))
    # a: v=1(id9), then v=5 tie broken by id -> id1 ; b: both rows
    assert list(zip(got["k"], got["id"])) == [("a", 9), ("a", 1),
                                              ("b", 7), ("b", 8)]


def test_window_ops_matches_pandas_oracle(grouped_data):
    from webval.rank import window_ops
    df, ds = grouped_data
    got = (window_ops(ds, "k", ["v", "id"], cumsum_cols=["v"],
                      lag_cols=["v"], num_buckets=8)
           .to_pandas().sort_values("id").reset_index(drop=True))
    want = df.sort_values(["k", "v", "id"],
                          na_position="last").copy()
    # pandas sorts NaN last; arrow sort_by also puts nulls last
    want["row_number"] = want.groupby("k", sort=False).cumcount() + 1
    want["cum_v"] = want.groupby("k", sort=False)["v"].cumsum()
    # pandas cumsum leaves NaN at NaN rows; SQL keeps the running sum there
    want["cum_v"] = want.groupby("k", sort=False)["cum_v"].ffill()
    want["lag_v"] = want.groupby("k", sort=False)["v"].shift(1)
    want = want.sort_values("id").reset_index(drop=True)
    assert list(got["row_number"]) == list(want["row_number"])
    assert np.allclose(got["cum_v"].to_numpy(), want["cum_v"].to_numpy(),
                       equal_nan=True, atol=1e-9)
    assert np.allclose(got["lag_v"].to_numpy(), want["lag_v"].to_numpy(),
                       equal_nan=True)


def test_window_ops_small_exact(ray_session):
    import ray.data as rd
    t = pa.table({"k": ["a", "a", "a", "b"],
                  "o": [2, 1, 3, 1],
                  "v": pa.array([None, 5.0, 2.0, 7.0], pa.float64())})
    ds = rd.from_arrow(t).repartition(2)
    got = (window_ops_import()(ds, "k", ["o"], cumsum_cols=["v"],
                               lag_cols=["v"]).to_pandas()
           .sort_values(["k", "o"]).reset_index(drop=True))
    assert list(got["row_number"]) == [1, 2, 3, 1]
    # k=a ordered by o: v = 5.0, None, 2.0 -> running sums 5, 5, 7
    assert list(got["cum_v"]) == [5.0, 5.0, 7.0, 7.0]
    lag = got["lag_v"].tolist()
    assert lag[0] is None or np.isnan(lag[0])
    assert lag[1] == 5.0
    assert lag[2] is None or np.isnan(lag[2])  # lag crosses the null row


def window_ops_import():
    from webval.rank import window_ops
    return window_ops


def test_broadcast_join_inner_and_left(ray_session):
    import ray.data as rd
    big = pa.table({"fk": [1, 2, 3, 2, None, 7],
                    "x": [10, 20, 30, 40, 50, 60]})
    dim = pa.table({"fk": [1, 2, 3, 4],
                    "name": ["one", "two", "three", "four"]})
    ds = rd.from_arrow(big).repartition(3)
    inner = broadcast_join(ds, dim, "fk").to_pandas().sort_values("x")
    assert list(inner["name"]) == ["one", "two", "three", "two"]
    left = broadcast_join(ds, dim, "fk", how="left").to_pandas().sort_values("x")
    assert len(left) == 6
    assert list(left["name"]) == ["one", "two", "three", "two", None, None]


def test_broadcast_join_rejects_duplicate_dim_keys(ray_session):
    import ray.data as rd
    dim = pa.table({"fk": [1, 1], "name": ["a", "b"]})
    with pytest.raises(ValueError, match="not unique"):
        broadcast_join(rd.range(3), dim, "fk")


def test_stratified_sample_membership_and_nulls(ray_session):
    import ray.data as rd

    from webval.pipelines import stratified_sample

    n = 30000
    ids = np.arange(n)
    langs = np.array(["en", "de", "nl"])[ids % 3].astype(object)
    langs[ids % 17 == 0] = None  # null strata fall to the default
    t = pa.table({"id": pa.array(ids, pa.int64()),
                  "lang": pa.array(list(langs))})
    fr = {"en": 0.2, "nl": 1.0}
    for parallelism in (2, 6):
        ds = rd.from_arrow(t).repartition(parallelism)
        got = stratified_sample(ds, "id", "lang", fr, default=0.05) \
            .to_pandas().sort_values("id")
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
        thr = np.full(n, int(0.05 * 2**32), np.uint64)
        for g, f in fr.items():
            thr[langs == g] = np.uint64(int(f * 2**32))
        want = ids[h < thr]
        assert np.array_equal(got["id"].to_numpy(), want)
    # every nl row survives, en is ~20%
    nl_total = int((langs == "nl").sum())
    assert (got["lang"] == "nl").sum() == nl_total
    en_frac = (got["lang"] == "en").sum() / (langs == "en").sum()
    assert abs(en_frac - 0.2) < 0.02


def test_deterministic_sample_is_exact_hash_membership(ray_session):
    import ray.data as rd
    n = 50000
    t = pa.table({"id": pa.array(np.arange(n), pa.int64()),
                  "v": np.ones(n)})
    frac = 0.1
    for parallelism in (2, 8):
        ds = rd.from_arrow(t).repartition(parallelism)
        got = np.sort(deterministic_sample(ds, "id", frac)
                      .to_pandas()["id"].to_numpy())
        h = (np.arange(n, dtype=np.uint64) * np.uint64(2654435761)) \
            % np.uint64(2**32)
        want = np.flatnonzero(h < np.uint64(int(frac * 2**32)))
        assert np.array_equal(got, want)  # same membership at any parallelism
    # the multiplicative hash is uniform enough for +-2% at n=50k
    assert abs(len(want) / n - frac) < 0.02


def test_grouped_cont_quantiles_match_numpy(grouped_data):
    df, ds = grouped_data
    got = grouped_exact_quantiles(
        ds, "k", "v", {"p25": 0.25, "p50": 0.5, "p99": 0.99},
        interpolate=True, num_buckets=8).to_pandas() \
        .set_index("k").sort_index()
    for k, grp in df.dropna(subset=["v"]).groupby("k"):
        sv = np.sort(grp["v"].to_numpy())
        for name, q in [("p25", 0.25), ("p50", 0.5), ("p99", 0.99)]:
            want = np.quantile(sv, q)  # numpy 'linear' == percentile_cont
            assert abs(got.loc[k, name] - want) < 1e-9, (k, name)


def test_fixed_size_sample_exact_membership(ray_session):
    import ray.data as rd

    from webval.pipelines import fixed_size_sample

    n, k = 50000, 700
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"id": pa.array(ids), "v": np.arange(n) * 2})
    h = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
    want = ids[np.lexsort((ids, h))[:k]]
    for parallelism in (3, 16):
        ds = rd.from_arrow(t).repartition(parallelism)
        got = fixed_size_sample(ds, "id", k).to_pandas()
        assert len(got) == k
        assert set(got.columns) == {"id", "v"}
        assert np.array_equal(np.sort(got["id"].to_numpy()), np.sort(want))
    # n smaller than the dataset of one block
    tiny = fixed_size_sample(rd.from_arrow(t.slice(0, 10)), "id", 50) \
        .to_pandas()
    assert len(tiny) == 10


def test_window_ops_rolling_mean(grouped_data):
    from webval.rank import window_ops
    df, ds = grouped_data
    W = 4
    got = (window_ops(ds, "k", ["v", "id"], rolling_mean_cols=["v"],
                      rolling_window=W, row_number=False, num_buckets=8)
           .to_pandas().sort_values("id").reset_index(drop=True))
    want = df.sort_values(["k", "v", "id"], na_position="last").copy()
    # pandas rolling with min_periods=1 skips NaN like SQL avg
    want["rmean_v"] = (want.groupby("k", sort=False)["v"]
                       .transform(lambda s: s.rolling(W, min_periods=1)
                                  .mean()))
    want = want.sort_values("id").reset_index(drop=True)
    assert np.allclose(got["rmean_v"].to_numpy(),
                       want["rmean_v"].to_numpy(),
                       equal_nan=True, atol=1e-9)


def test_window_ops_ntile_matches_sql_rule(ray_session):
    import ray.data as rd

    from webval.rank import window_ops

    # group sizes exercising c < n, c % n == 0, and remainder cases
    rows = []
    for k, c in [("a", 2), ("b", 8), ("c", 10), ("d", 1)]:
        rows += [(k, i) for i in range(c)]
    t = pa.table({"k": pa.array([r[0] for r in rows]),
                  "o": pa.array([r[1] for r in rows], pa.int64())})
    got = (window_ops(rd.from_arrow(t).repartition(3), "k", ["o"],
                      ntile=4, row_number=False).to_pandas()
           .sort_values(["k", "o"]))

    def sql_ntile(c, n=4):
        q, r = divmod(c, n)
        out, b = [], 1
        for i in range(n):
            size = q + (1 if i < r else 0)
            out += [b] * size
            b += 1
        return out[:c] if q else list(range(1, c + 1))

    for k, c in [("a", 2), ("b", 8), ("c", 10), ("d", 1)]:
        assert list(got[got["k"] == k]["ntile"]) == sql_ntile(c), k


def test_iqr_outliers_brute_force(ray_session):
    import ray.data as rd

    from webval.pipelines import iqr_outliers

    rng = np.random.default_rng(7)
    keys = rng.choice(["a", "b", "c"], size=400).tolist() + ["nullgrp"] * 3
    vals = rng.integers(0, 100, size=400).tolist() + [None, None, None]
    # plant extreme outliers
    vals[0], vals[1] = 100_000, -100_000
    t = pa.table({"k": pa.array(keys, pa.string()),
                  "v": pa.array(vals, pa.int64()),
                  "i": pa.array(range(len(keys)), pa.int64())})
    got = iqr_outliers(rd.from_arrow(t), "k", "v").to_pandas()

    import pandas as pd
    df = t.to_pandas()
    want_ids = []
    for k, g in df[df["v"].notna()].groupby("k"):
        v = g["v"].sort_values().to_numpy()
        nn = len(v)
        q1 = v[max(int(np.ceil(0.25 * nn)), 1) - 1]
        q3 = v[max(int(np.ceil(0.75 * nn)), 1) - 1]
        lo, hi = 2 * q1 - 3 * (q3 - q1), 2 * q3 + 3 * (q3 - q1)
        want_ids.extend(g[(2 * g["v"] < lo) | (2 * g["v"] > hi)]["i"])
    assert sorted(got["i"]) == sorted(want_ids)
    assert 0 in set(got["i"]) and 1 in set(got["i"])
    # all-null group contributes no outliers and no crash
    assert not (got["k"] == "nullgrp").any()


def test_percent_rank_matches_sql_rule(ray_session):
    import ray.data as rd

    from webval.rank import window_ops

    t = pa.table({"k": ["a"] * 4 + ["b"] * 1 + ["c"] * 3,
                  "o": [3, 1, 4, 2, 9, 7, 8, 6],
                  "i": list(range(8))})
    got = window_ops(rd.from_arrow(t), "k", ["o"], row_number=True,
                     percent_rank=True).to_pandas() \
        .sort_values(["k", "o"]).reset_index(drop=True)
    # a: 4 rows -> 0, 1/3, 2/3, 1; b singleton -> 0; c: 0, 0.5, 1
    want = [0.0, 1 / 3, 2 / 3, 1.0, 0.0, 0.0, 0.5, 1.0]
    assert np.allclose(got["percent_rank"], want, atol=1e-15)


def test_percent_rank_ties_share_rank(ray_session):
    import duckdb
    import ray.data as rd

    from webval.rank import window_ops

    t = pa.table({"k": ["a"] * 5 + ["b"] * 3,
                  "o": [1, 1, 2, 2, 3, 7, 7, 7],
                  "i": list(range(8))})
    got = window_ops(rd.from_arrow(t), "k", ["o"], row_number=False,
                     percent_rank=True).to_pandas() \
        .sort_values(["k", "o", "i"]).reset_index(drop=True)
    want = duckdb.sql(
        "SELECT k, o, i, percent_rank() OVER (PARTITION BY k ORDER BY o) "
        "AS pr FROM t ORDER BY k, o, i").df()
    assert np.allclose(got["percent_rank"], want["pr"], atol=1e-15)


def test_assign_split_disjoint_exhaustive_deterministic(ray_session):
    import ray.data as rd

    from webval.pipelines import assign_split

    n = 20_000
    t = pa.table({"id": pa.array(np.arange(n), pa.int64())})
    ds = rd.from_arrow(t).repartition(5)
    out = assign_split(ds, "id").to_pandas()
    # exhaustive + disjoint: every row got exactly one label
    assert len(out) == n
    assert set(out["split"].unique()) == {"train", "val", "test"}
    frac = out["split"].value_counts(normalize=True)
    assert frac["train"] == pytest.approx(0.9, abs=0.02)
    assert frac["val"] == pytest.approx(0.05, abs=0.01)
    # deterministic across runs/parallelism
    out2 = assign_split(rd.from_arrow(t).repartition(11), "id").to_pandas()
    m = out.sort_values("id")["split"].to_numpy()
    m2 = out2.sort_values("id")["split"].to_numpy()
    assert (m == m2).all()
    # matches the SQL CASE predicate boundaries exactly
    h = (np.arange(n).astype(np.uint64) * np.uint64(2654435761)) \
        % np.uint64(2**32)
    want = np.select([h < 3865470566, h < 4080218931],
                     ["train", "val"], "test")
    assert (m == want).all()

    with pytest.raises(ValueError, match="fractions"):
        assign_split(ds, "id", fractions=(0.5, 0.4), names=("a", "b", "c"))


# --- round-4 order-statistic / sampler additions -------------------------


def test_quantiles_from_histogram_matches_duckdb_semantics():
    import duckdb

    from webval.rank import quantiles_from_histogram

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 50, 5000).astype(np.float64)
    uv, cnt = np.unique(vals, return_counts=True)
    qs = [0.0, 0.05, 0.25, 0.5, 0.75, 0.95, 1.0]
    con = duckdb.connect()
    con.register("t", pa.table({"v": vals}))
    for interp, fn in [(False, "quantile_disc"), (True, "quantile_cont")]:
        got = quantiles_from_histogram(uv, cnt, qs, interpolate=interp)
        want = [con.sql(f"SELECT {fn}(v, {q}) FROM t").fetchone()[0]
                for q in qs]
        assert np.allclose(got, want), (fn, got, want)


def test_equidepth_histogram_counts(ray_session):
    import ray.data as rd

    from webval.rank import equidepth_histogram

    rng = np.random.default_rng(3)
    vals = rng.integers(1, 51, 9001).astype(np.float64)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(6)
    k = 4
    t = equidepth_histogram(ds, "v", k)
    assert t.column("bin").to_pylist() == [1, 2, 3, 4]
    edges = t.column("hi_edge").to_pylist()
    cnts = t.column("cnt").to_pylist()
    sv = np.sort(vals)
    want_edges = [sv[max(math.ceil((i + 1) / k * len(sv)), 1) - 1]
                  for i in range(k)]
    assert edges == want_edges
    prev = -np.inf
    for e, c in zip(edges, cnts):
        assert c == int(((vals > prev) & (vals <= e)).sum())
        prev = e
    assert sum(cnts) == len(vals)


def test_global_exact_quantiles_and_empty(ray_session):
    import ray.data as rd

    from webval.rank import global_exact_quantiles

    vals = np.array([5.0, 1.0, 3.0, 2.0, 4.0])
    ds = rd.from_arrow(pa.table({"v": vals}))
    assert global_exact_quantiles(ds, "v", [0.5]) == [3.0]
    # continuous median of 1..4 = 2.5
    ds4 = rd.from_arrow(pa.table({"v": vals[vals < 5]}))
    assert global_exact_quantiles(ds4, "v", [0.5],
                                  interpolate=True) == [2.5]
    empty = rd.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
    got = global_exact_quantiles(empty, "v", [0.5])
    assert len(got) == 1 and np.isnan(got[0])


def test_grouped_fixed_size_sample_membership(grouped_data):
    from webval.pipelines import grouped_fixed_size_sample

    df, ds = grouped_data
    n = 3
    got = grouped_fixed_size_sample(ds, "id", "k", n).to_pandas()
    h = (df["id"].to_numpy().astype(np.uint64) * np.uint64(2654435761)) \
        % np.uint64(2**32)
    want = (df.assign(h=h).sort_values(["h", "id"]).groupby("k").head(n))
    assert set(map(tuple, got[["k", "id"]].to_numpy())) \
        == set(map(tuple, want[["k", "id"]].to_numpy()))
    assert (got.groupby("k").size() == n).all()
    assert "__h" not in got.columns


def test_grouped_fixed_size_sample_guards(ray_session):
    import ray.data as rd

    from webval.pipelines import grouped_fixed_size_sample

    bad = rd.from_arrow(pa.table({"id": [1, None], "g": ["a", "a"]}))
    with pytest.raises(Exception, match="null"):
        grouped_fixed_size_sample(bad, "id", "g", 1).to_pandas()
    neg = rd.from_arrow(pa.table({"id": [-1, 2], "g": ["a", "a"]}))
    with pytest.raises(Exception, match="negative"):
        grouped_fixed_size_sample(neg, "id", "g", 1).to_pandas()


def test_impute_mode_fills_with_modal_value(ray_session):
    import ray.data as rd

    from webval.pipelines import impute_mode

    t = pa.table({"lang": ["en", "en", "de", None, None, "fr"]})
    filled, mode = impute_mode(rd.from_arrow(t).repartition(3), "lang")
    assert mode == "en"
    vals = sorted(filled.to_pandas()["lang"])
    assert vals == ["de", "en", "en", "en", "en", "fr"]
    # tie -> smallest value wins (matches the SQL row_number twin)
    t2 = pa.table({"lang": ["b", "a", None]})
    _, mode2 = impute_mode(rd.from_arrow(t2), "lang")
    assert mode2 == "a"
    # all-null column: no mode, dataset unchanged
    t3 = pa.table({"lang": pa.array([None, None], pa.string())})
    out3, mode3 = impute_mode(rd.from_arrow(t3), "lang")
    assert mode3 is None
    assert out3.to_pandas()["lang"].isna().all()


def test_k_anonymity_audit_brute_force(ray_session):
    import pandas as pd
    import ray.data as rd

    from webval.pipelines import k_anonymity_audit

    rng = np.random.default_rng(71)
    n = 8000
    t = pa.table({
        "a": pa.array(rng.integers(0, 12, n), pa.int64()),
        "b": pa.array([f"g{v}" for v in rng.integers(0, 6, n)]),
        "s": pa.array(np.where(rng.random(n) < 0.1, None,
                               rng.integers(0, 4, n).astype(object))),
    })
    # one all-null-sensitive class (l-diversity 0) and one null-QI row
    extra = pa.table({"a": pa.array([99, 99, 99, 7], pa.int64()),
                      "b": pa.array(["z", "z", "z", None]),
                      "s": pa.array([None, None, None, 1],
                                    pa.int64())})
    t = pa.concat_tables([t.cast(extra.schema), extra])
    got = k_anonymity_audit(rd.from_arrow(t).repartition(5), ["a", "b"],
                            k=40, sensitive="s", l_div=3,
                            num_buckets=8).to_pandas() \
        .set_index(["a", "b"]).sort_index()
    df = t.to_pandas().dropna(subset=["a", "b"])
    want = df.groupby(["a", "b"]).agg(
        class_size=("a", "size"), n_sensitive=("s", "nunique"))
    want = want[(want.class_size < 40) | (want.n_sensitive < 3)]
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.sort_index().astype("int64"))
    assert got.loc[(99, "z"), "n_sensitive"] == 0

    # k-only mode
    got_k = k_anonymity_audit(rd.from_arrow(t), ["a", "b"], k=40,
                              num_buckets=4).to_pandas() \
        .set_index(["a", "b"]).sort_index()
    want_k = df.groupby(["a", "b"]).agg(class_size=("a", "size"))
    want_k = want_k[want_k.class_size < 40]
    pd.testing.assert_frame_equal(
        got_k.astype("int64"), want_k.sort_index().astype("int64"))
