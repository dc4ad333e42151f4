"""Rollup / pivot operators vs DuckDB on random data (nulls included)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest


def _collect(ds):
    import ray

    return pa.concat_tables([ray.get(x) for x in ds.to_arrow_refs()])


@pytest.mark.usefixtures("ray_session")
def test_rollup_matches_duckdb():
    import duckdb
    import ray.data as rd

    from webval.relational import rollup_agg

    rng = np.random.default_rng(11)
    n = 4000
    a = rng.choice(["p", "q", "r"], n)
    b = rng.choice(["x", "y"], n)
    v = rng.integers(0, 100, n).astype(object)
    v[rng.random(n) < 0.05] = None  # count(col) skips nulls
    t = pa.table({"a": pa.array(list(a)), "b": pa.array(list(b)),
                  "v": pa.array(list(v), pa.int64())})
    out = _collect(rollup_agg(rd.from_arrow(t).repartition(6), ["a", "b"],
                              [("v", "sum"), ("v", "count"), ("v", "max")],
                              num_buckets=8))
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql(
        "SELECT a, b, sum(v) AS v_sum, count(v) AS v_count, max(v) AS v_max "
        "FROM t GROUP BY ROLLUP(a, b)").arrow()
    order = [(c, "ascending") for c in out.column_names]
    g = out.sort_by(order).combine_chunks()
    w = want.cast(g.schema).sort_by(order).combine_chunks()
    assert g.equals(w)
    # level count: 3*2 + 3 + 1
    assert g.num_rows == 10


@pytest.mark.usefixtures("ray_session")
def test_rollup_rejects_non_mergeable():
    import ray.data as rd

    from webval.relational import rollup_agg

    t = rd.from_arrow(pa.table({"a": ["x"], "v": [1]}))
    with pytest.raises(ValueError, match="non-mergeable"):
        rollup_agg(t, ["a"], [("v", "mean")])


@pytest.mark.usefixtures("ray_session")
def test_cube_matches_duckdb():
    import duckdb
    import ray.data as rd

    from webval.relational import cube_agg

    rng = np.random.default_rng(17)
    n = 4000
    a = rng.choice(["p", "q", "r"], n)
    b = rng.choice(["x", "y"], n)
    v = rng.integers(0, 100, n).astype(object)
    v[rng.random(n) < 0.05] = None
    t = pa.table({"a": pa.array(list(a)), "b": pa.array(list(b)),
                  "v": pa.array(list(v), pa.int64())})
    out = _collect(cube_agg(rd.from_arrow(t).repartition(6), ["a", "b"],
                            [("v", "sum"), ("v", "count"), ("v", "min")],
                            num_buckets=8))
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql(
        "SELECT a, b, sum(v) AS v_sum, count(v) AS v_count, min(v) AS v_min "
        "FROM t GROUP BY CUBE(a, b)").arrow()
    order = [(c, "ascending") for c in out.column_names]
    g = out.sort_by(order).combine_chunks()
    w = want.cast(g.schema).sort_by(order).combine_chunks()
    assert g.equals(w)
    # grouping sets: (a,b)=6, (a)=3, (b)=2, ()=1
    assert g.num_rows == 12


@pytest.mark.usefixtures("ray_session")
def test_cube_rejects_non_mergeable_and_wide_keys():
    import ray.data as rd

    from webval.relational import cube_agg

    t = rd.from_arrow(pa.table({"a": ["x"], "v": [1]}))
    with pytest.raises(ValueError, match="non-mergeable"):
        cube_agg(t, ["a"], [("v", "mean")])
    with pytest.raises(ValueError, match="keys <= 6"):
        cube_agg(t, [f"k{i}" for i in range(7)], [("v", "sum")])


@pytest.mark.usefixtures("ray_session")
def test_set_ops_match_duckdb_with_nulls():
    import duckdb
    import ray.data as rd

    from webval.relational import except_distinct, intersect_distinct

    rng = np.random.default_rng(23)
    av = rng.integers(0, 200, 3000).astype(object)
    bv = rng.integers(100, 300, 3000).astype(object)
    av[rng.random(3000) < 0.01] = None  # NULL keys compare equal in set ops
    bv[rng.random(3000) < 0.01] = None
    ta = pa.table({"k": pa.array(list(av), pa.int64())})
    tb = pa.table({"k": pa.array(list(bv), pa.int64())})
    a = rd.from_arrow(ta).repartition(5)
    b = rd.from_arrow(tb).repartition(3)
    con = duckdb.connect()
    con.register("ta", ta)
    con.register("tb", tb)
    for buckets in (4, 64):
        got_i = sorted(_collect(intersect_distinct(a, b, ["k"],
                                                   num_buckets=buckets))
                       .column("k").to_pylist(),
                       key=lambda x: (x is None, x))
        want_i = sorted(
            con.sql("SELECT k FROM ta INTERSECT SELECT k FROM tb")
               .df()["k"].astype(object).where(lambda s: s.notna(), None)
               .tolist(), key=lambda x: (x is None, x))
        assert got_i == want_i
        got_e = sorted(_collect(except_distinct(a, b, ["k"],
                                                num_buckets=buckets))
                       .column("k").to_pylist(),
                       key=lambda x: (x is None, x))
        want_e = sorted(
            con.sql("SELECT k FROM ta EXCEPT SELECT k FROM tb")
               .df()["k"].astype(object).where(lambda s: s.notna(), None)
               .tolist(), key=lambda x: (x is None, x))
        assert got_e == want_e


@pytest.mark.usefixtures("ray_session")
def test_set_ops_multi_column():
    import ray.data as rd

    from webval.relational import except_distinct, intersect_distinct

    ta = pa.table({"x": ["a", "a", "b", "b"], "y": [1, 2, 1, 1]})
    tb = pa.table({"x": ["a", "b", "c"], "y": [2, 9, 1]})
    a, b = rd.from_arrow(ta).repartition(2), rd.from_arrow(tb)
    got = _collect(intersect_distinct(a, b, ["x", "y"])).to_pylist()
    assert got == [{"x": "a", "y": 2}]
    got = sorted(_collect(except_distinct(a, b, ["x", "y"])).to_pylist(),
                 key=lambda r: (r["x"], r["y"]))
    assert got == [{"x": "a", "y": 1}, {"x": "b", "y": 1}]


@pytest.mark.usefixtures("ray_session")
def test_pivot_matches_duckdb():
    import duckdb
    import ray.data as rd

    from webval.relational import pivot_wider

    rng = np.random.default_rng(13)
    n = 3000
    row = rng.integers(0, 40, n)
    col = rng.choice(["red", "green", "blue", "other"], n)
    v = rng.integers(1, 50, n)
    t = pa.table({"rk": pa.array(row, pa.int64()),
                  "ck": pa.array(list(col)),
                  "v": pa.array(v, pa.int64())})
    values = ["red", "green", "blue"]  # "other" must be dropped
    out = _collect(pivot_wider(rd.from_arrow(t).repartition(5), "rk", "ck",
                               "v", values=values, agg="sum", fill=0,
                               num_buckets=8))
    con = duckdb.connect()
    con.register("t", t)
    sel = ", ".join(
        f"coalesce(sum(v) FILTER (ck = '{c}'), 0) AS \"{c}\""
        for c in values)
    want = con.sql(
        f"SELECT rk, {sel} FROM t WHERE ck IN ('red','green','blue') "
        f"GROUP BY rk").arrow()
    g = out.sort_by([("rk", "ascending")]).combine_chunks()
    w = want.cast(g.schema).sort_by([("rk", "ascending")]).combine_chunks()
    assert g.equals(w)


@pytest.mark.usefixtures("ray_session")
def test_pivot_null_fill_and_missing_cell():
    import ray.data as rd

    from webval.relational import pivot_wider

    t = pa.table({"rk": ["a", "a", "b"], "ck": ["x", "y", "x"],
                  "v": [1, 2, 3]})
    out = _collect(pivot_wider(rd.from_arrow(t), "rk", "ck", "v",
                               values=["x", "y"], num_buckets=4))
    d = {r["rk"]: (r["x"], r["y"])
         for r in out.sort_by([("rk", "ascending")]).to_pylist()}
    assert d == {"a": (1, 2), "b": (3, None)}


@pytest.mark.usefixtures("ray_session")
def test_grouping_sets_matches_duckdb():
    import duckdb
    import ray.data as rd

    from webval.relational import grouping_sets_agg

    rng = np.random.default_rng(71)
    n = 3000
    a = rng.choice(["p", "q", "r"], n)
    b = rng.choice(["x", "y"], n)
    v = rng.integers(0, 100, n)
    t = pa.table({"a": pa.array(list(a)), "b": pa.array(list(b)),
                  "v": pa.array(v, pa.int64())})
    out = _collect(grouping_sets_agg(
        rd.from_arrow(t).repartition(4),
        [["a", "b"], ["b"], []], [("v", "sum")], num_buckets=8))
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql(
        "SELECT a, b, sum(v) AS v_sum FROM t "
        "GROUP BY GROUPING SETS ((a, b), (b), ())").arrow()
    order = [(c, "ascending") for c in out.column_names]
    g = out.sort_by(order).combine_chunks()
    w = want.cast(g.schema).sort_by(order).combine_chunks()
    assert g.equals(w)
    assert g.num_rows == 6 + 2 + 1


@pytest.mark.usefixtures("ray_session")
def test_grouping_sets_rejects_bad_args():
    import ray.data as rd

    from webval.relational import grouping_sets_agg

    t = rd.from_arrow(pa.table({"a": ["x"], "v": [1]}))
    with pytest.raises(ValueError, match="duplicate"):
        grouping_sets_agg(t, [["a"], ["a"]], [("v", "sum")])
    with pytest.raises(ValueError, match="at least one set must"):
        grouping_sets_agg(t, [[]], [("v", "sum")])


def test_table_diff_statuses_and_null_safety(ray_session):
    import ray.data as rd

    from webval.relational import table_diff

    old = pa.table({"k": [1, 2, 3, 4, 5, None],
                    "v": ["a", "b", None, "d", "e", "x"]})
    new = pa.table({"k": [2, 3, 4, 5, 6],
                    "v": ["B", None, "d", None, "f"]})
    got = table_diff(rd.from_arrow(old), rd.from_arrow(new),
                     "k", ["v"]).to_pandas()
    st = dict(zip(got["k"], got["status"]))
    # 1 removed; 2 changed; 3 unchanged (null==null, null-safe); 4
    # unchanged; 5 changed (e -> null); 6 added; null key excluded
    assert st == {1: "removed", 2: "changed", 5: "changed", 6: "added"}


def test_table_diff_duplicate_key_raises(ray_session):
    import pytest
    import ray.data as rd

    from webval.relational import table_diff

    old = pa.table({"k": [1, 1], "v": ["a", "b"]})
    new = pa.table({"k": [1], "v": ["a"]})
    with pytest.raises(Exception, match="duplicate key"):
        table_diff(rd.from_arrow(old), rd.from_arrow(new),
                   "k", ["v"]).to_pandas()


def test_unpivot_shape_and_nulls(ray_session):
    import ray.data as rd

    from webval.relational import unpivot

    t = pa.table({"id": [1, 2], "a": [1.0, None], "b": [3.0, 4.0]})
    got = unpivot(rd.from_arrow(t), ["id"], ["a", "b"]).to_pandas() \
        .sort_values(["variable", "id"]).reset_index(drop=True)
    assert len(got) == 4
    assert list(got["variable"]) == ["a", "a", "b", "b"]
    assert got["value"][1] != got["value"][1] or got["value"].isna()[1]
    assert list(got[got["variable"] == "b"]["value"]) == [3.0, 4.0]


def test_grouped_entropy(ray_session):
    import math

    import ray.data as rd

    from webval.aggregates import grouped_entropy

    t = pa.table({
        "k": ["u"] * 4 + ["s"] * 3 + ["n"] * 2 + [None],
        "v": ["a", "b", "c", "d",     # uniform over 4 -> ln 4
              "x", "x", "x",          # single value -> 0
              "y", None,              # null val dropped -> single -> 0
              "z"],                   # null key dropped entirely
    })
    got = grouped_entropy(rd.from_arrow(t), "k", "v").to_pandas() \
        .set_index("k")["entropy"].to_dict()
    assert set(got) == {"u", "s", "n"}
    assert abs(got["u"] - math.log(4)) < 1e-12
    assert got["s"] == 0.0 and got["n"] == 0.0
