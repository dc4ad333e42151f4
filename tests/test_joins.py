"""As-of join operator: brute-force oracle over random groups."""

import numpy as np
import pyarrow as pa
import pytest

from webval.joins import asof_join


@pytest.mark.usefixtures("ray_session")
def test_asof_join_matches_bruteforce():
    import ray.data as rd

    rng = np.random.default_rng(17)
    nL, nR = 600, 300
    lt = pa.table({
        "uid": pa.array(rng.integers(0, 20, nL), pa.int64()),
        "ts": pa.array(rng.integers(0, 1000, nL), pa.int64()),
        "event_id": pa.array(np.arange(nL), pa.int64()),
    })
    # unique (uid, ts) right side (ties with multiple right rows are
    # tie-broken arbitrarily by engines; dedupe keeps the oracle exact)
    seen = set()
    r_uid, r_ts, r_val = [], [], []
    for u, t in zip(rng.integers(0, 20, nR), rng.integers(0, 1000, nR)):
        if (u, t) in seen:
            continue
        seen.add((u, t))
        r_uid.append(int(u))
        r_ts.append(int(t))
        r_val.append(int(u) * 10000 + int(t))
    rt = pa.table({"uid": pa.array(r_uid, pa.int64()),
                   "ts": pa.array(r_ts, pa.int64()),
                   "val": pa.array(r_val, pa.int64())})
    out = asof_join(rd.from_arrow(lt).repartition(4),
                    rd.from_arrow(rt).repartition(3),
                    on="ts", by="uid", right_cols=["ts", "val"]).take_all()
    got = {r["event_id"]: (r["ts_r"], r["val_r"]) for r in out}
    assert len(got) == nL
    rows = list(zip(r_uid, r_ts, r_val))
    for u, t, eid in zip(lt.column("uid").to_pylist(),
                         lt.column("ts").to_pylist(),
                         lt.column("event_id").to_pylist()):
        cands = [(rt_, rv) for ru, rt_, rv in rows if ru == u and rt_ <= t]
        want = max(cands) if cands else (None, None)
        assert got[eid] == want, (eid, u, t, got[eid], want)


@pytest.mark.usefixtures("ray_session")
def test_asof_join_null_keys():
    import ray.data as rd

    lt = pa.table({"uid": pa.array([1, None, 2], pa.int64()),
                   "ts": pa.array([10, 10, None], pa.int64()),
                   "event_id": pa.array([0, 1, 2], pa.int64())})
    rt = pa.table({"uid": pa.array([1, 2], pa.int64()),
                   "ts": pa.array([5, 1], pa.int64())})
    out = {r["event_id"]: r["ts_r"]
           for r in asof_join(rd.from_arrow(lt), rd.from_arrow(rt),
                              on="ts", by="uid").take_all()}
    assert out == {0: 5, 1: None, 2: None}


@pytest.mark.usefixtures("ray_session")
def test_interval_join_matches_bruteforce():
    import ray.data as rd

    from webval.joins import interval_join

    rng = np.random.default_rng(23)
    nP, nR = 500, 200
    pts = pa.table({
        "uid": pa.array(rng.integers(0, 10, nP), pa.int64()),
        "ts": pa.array(rng.integers(0, 5000, nP), pa.int64()),
        "pid": pa.array(np.arange(nP), pa.int64()),
    })
    lo = rng.integers(0, 5000, nR)
    span = rng.integers(0, 300, nR)
    iv = pa.table({
        "uid": pa.array(rng.integers(0, 10, nR), pa.int64()),
        "lo": pa.array(lo, pa.int64()),
        "hi": pa.array(lo + span, pa.int64()),
        "iid": pa.array(np.arange(nR), pa.int64()),
    })
    out = interval_join(rd.from_arrow(pts).repartition(4),
                        rd.from_arrow(iv).repartition(3),
                        on="ts", lo="lo", hi="hi", by="uid",
                        right_cols=["iid"], max_span_us=300).take_all()
    got = {(r["pid"], r["iid_r"]) for r in out}
    want = set()
    for pu, pt_, pid in zip(pts.column("uid").to_pylist(),
                            pts.column("ts").to_pylist(),
                            pts.column("pid").to_pylist()):
        for iu, il, ih, iid in zip(iv.column("uid").to_pylist(),
                                   iv.column("lo").to_pylist(),
                                   iv.column("hi").to_pylist(),
                                   iv.column("iid").to_pylist()):
            if pu == iu and il <= pt_ <= ih:
                want.add((pid, iid))
    assert got == want
    assert len(got) > 100  # non-trivial match density


@pytest.mark.usefixtures("ray_session")
def test_interval_join_rejects_overlong_interval():
    import ray.data as rd

    from webval.joins import interval_join

    pts = pa.table({"uid": pa.array([1], pa.int64()),
                    "ts": pa.array([10], pa.int64())})
    iv = pa.table({"uid": pa.array([1], pa.int64()),
                   "lo": pa.array([0], pa.int64()),
                   "hi": pa.array([1000], pa.int64())})
    with pytest.raises(Exception):
        interval_join(rd.from_arrow(pts), rd.from_arrow(iv), on="ts",
                      lo="lo", hi="hi", by="uid", max_span_us=100).take_all()


@pytest.mark.usefixtures("ray_session")
def test_equi_join_matches_duckdb():
    """inner/left/semi/anti over duplicate keys + nulls on both sides,
    including a colliding non-key column name."""
    import duckdb
    import ray
    import ray.data as rd

    from webval.joins import equi_join

    rng = np.random.default_rng(7)
    nL, nR = 900, 700

    def keys(n, hi, rate):
        k = rng.integers(0, hi, n).astype(object)
        k[rng.random(n) < rate] = None
        return pa.array(list(k), pa.int64())

    lt = pa.table({"k": keys(nL, 150, 0.04),
                   "lv": pa.array(rng.integers(0, 10**6, nL), pa.int64()),
                   "v": pa.array(rng.random(nL))})
    rt = pa.table({"k": keys(nR, 200, 0.04),
                   "rv": pa.array(rng.integers(0, 10**6, nR), pa.int64()),
                   "v": pa.array(rng.random(nR))})
    lds, rds = rd.from_arrow(lt).repartition(5), rd.from_arrow(rt).repartition(3)
    con = duckdb.connect()
    con.register("l", lt)
    con.register("r", rt)
    cases = {
        "inner": "SELECT l.k, l.lv, l.v, r.rv, r.v AS v_r FROM l JOIN r ON l.k = r.k",
        "left": "SELECT l.k, l.lv, l.v, r.rv, r.v AS v_r FROM l LEFT JOIN r ON l.k = r.k",
        "semi": "SELECT l.k, l.lv, l.v FROM l SEMI JOIN r ON l.k = r.k",
        "anti": "SELECT l.k, l.lv, l.v FROM l ANTI JOIN r ON l.k = r.k",
        "right": "SELECT r.k, l.lv, l.v, r.rv, r.v AS v_r "
                 "FROM l RIGHT JOIN r ON l.k = r.k",
        "full": "SELECT coalesce(l.k, r.k) AS k, l.lv, l.v, r.rv, "
                "r.v AS v_r FROM l FULL OUTER JOIN r ON l.k = r.k",
    }
    for how, sql in cases.items():
        got = pa.concat_tables(
            [ray.get(x) for x in
             equi_join(lds, rds, on="k", how=how,
                       num_buckets=8).to_arrow_refs()])
        want = con.sql(sql).arrow()
        order = [(c, "ascending") for c in got.column_names]
        g = got.sort_by(order).combine_chunks()
        w = want.cast(g.schema).sort_by(order).combine_chunks()
        assert g.equals(w), (how, g.num_rows, w.num_rows)


@pytest.mark.usefixtures("ray_session")
def test_equi_join_right_on_multikey():
    import duckdb
    import ray
    import ray.data as rd

    from webval.joins import equi_join

    lt = pa.table({"a": [1, 1, 2, None], "b": ["x", "y", "x", None],
                   "p": [1, 2, 3, 4]})
    rt = pa.table({"aa": [1, 2, 1, None], "bb": ["x", "x", "x", None],
                   "q": [10, 20, 30, 40]})
    got = pa.concat_tables(
        [ray.get(x) for x in
         equi_join(rd.from_arrow(lt), rd.from_arrow(rt),
                   on=["a", "b"], right_on=["aa", "bb"],
                   num_buckets=4).to_arrow_refs()])
    con = duckdb.connect()
    con.register("l2", lt)
    con.register("r2", rt)
    want = con.sql(
        "SELECT a, b, p, q FROM l2 JOIN r2 ON a = aa AND b = bb").arrow()
    order = [("p", "ascending"), ("q", "ascending")]
    g = got.sort_by(order).combine_chunks()
    assert g.equals(want.cast(g.schema).sort_by(order).combine_chunks())


@pytest.mark.usefixtures("ray_session")
def test_equi_join_rejects_bad_how():
    import ray.data as rd

    from webval.joins import equi_join

    t = rd.from_arrow(pa.table({"k": [1]}))
    with pytest.raises(ValueError, match="how="):
        equi_join(t, t, on="k", how="cross")
    # replicated right rows would duplicate unmatched-right output
    with pytest.raises(ValueError, match="hot_keys is incompatible"):
        equi_join(t, t, on="k", how="full", hot_keys=[1])
    with pytest.raises(ValueError, match="hot_keys is incompatible"):
        equi_join(t, t, on="k", how="right", hot_keys=[1])


@pytest.mark.usefixtures("ray_session")
def test_equi_join_salted_hot_key_same_result():
    import ray.data as rd

    from webval.joins import equi_join

    rng = np.random.default_rng(53)
    n = 30000
    # 60% of left rows share one hot key
    lk = np.where(rng.random(n) < 0.6, 7, rng.integers(0, 500, n))
    lt = pa.table({"k": pa.array(lk, pa.int64()),
                   "lx": pa.array(np.arange(n), pa.int64())})
    rk = np.concatenate([np.arange(0, 400), [7, 7, 7]])  # key 7: 4 rows
    rt = pa.table({"k": pa.array(rk, pa.int64()),
                   "ry": pa.array(np.arange(len(rk)), pa.int64())})
    left = rd.from_arrow(lt).repartition(6)
    right = rd.from_arrow(rt).repartition(2)

    for how in ("inner", "left", "semi", "anti"):
        plain = equi_join(left, right, on="k", how=how,
                          num_buckets=8).to_pandas()
        salted = equi_join(left, right, on="k", how=how, num_buckets=8,
                           hot_keys=[7], salt=8).to_pandas()
        cols = sorted(plain.columns)
        assert sorted(salted.columns) == cols
        a = plain[cols].sort_values(cols).reset_index(drop=True)
        b = salted[cols].sort_values(cols).reset_index(drop=True)
        assert a.equals(b), how

    # the guard: the hot key exceeds an 8k-row bucket cap unsalted, but
    # salting spreads it under the cap
    with pytest.raises(Exception, match="max_group_rows"):
        equi_join(left, right, on="k", num_buckets=8,
                  max_group_rows=8000).to_pandas()
    ok = equi_join(left, right, on="k", num_buckets=8, max_group_rows=8000,
                   hot_keys=[7], salt=8).to_pandas()
    assert len(ok) == len(equi_join(left, right, on="k",
                                    num_buckets=8).to_pandas())


@pytest.mark.usefixtures("ray_session")
def test_equi_join_salted_rejects_multikey_and_bad_salt():
    import ray.data as rd

    from webval.joins import equi_join

    t = rd.from_arrow(pa.table({"a": [1], "b": [2], "x": [3]}))
    with pytest.raises(ValueError, match="single-key"):
        equi_join(t, t, on=["a", "b"], hot_keys=[1])
    with pytest.raises(ValueError, match="salt"):
        equi_join(t, t, on="a", hot_keys=[1], salt=1)


@pytest.mark.usefixtures("ray_session")
def test_equi_join_auto_hot_keys():
    import ray.data as rd

    from webval.joins import equi_join

    rng = np.random.default_rng(79)
    n = 30000
    lk = np.where(rng.random(n) < 0.5, 42, rng.integers(0, 300, n))
    lt = pa.table({"k": pa.array(lk, pa.int64()),
                   "lx": pa.array(np.arange(n), pa.int64())})
    rt = pa.table({"k": pa.array(np.arange(0, 300), pa.int64()),
                   "ry": pa.array(np.arange(300), pa.int64())})
    left = rd.from_arrow(lt).repartition(6)
    right = rd.from_arrow(rt)
    # unsalted, the 15k-row key 42 trips an 8k cap; auto detection finds
    # and salts it without the caller naming it
    with pytest.raises(Exception, match="max_group_rows"):
        equi_join(left, right, on="k", num_buckets=8,
                  max_group_rows=8000).to_pandas()
    got = equi_join(left, right, on="k", num_buckets=8,
                    max_group_rows=8000, hot_keys="auto",
                    salt=8).to_pandas()
    want = equi_join(left, right, on="k", num_buckets=8).to_pandas()
    cols = sorted(want.columns)
    assert got[cols].sort_values(cols).reset_index(drop=True).equals(
        want[cols].sort_values(cols).reset_index(drop=True))
    with pytest.raises(ValueError, match="hot_keys"):
        equi_join(left, right, on="k", hot_keys="bogus")


@pytest.mark.usefixtures("ray_session")
def test_join_size_estimate_matches_real_join():
    import numpy as np
    import ray.data as rd

    from webval.joins import equi_join, join_size_estimate

    rng = np.random.default_rng(113)
    lk = rng.integers(0, 40, 300)
    rk = rng.integers(20, 60, 500)          # partial key overlap
    left = rd.from_arrow(pa.table({"k": pa.array(lk, pa.int64()),
                                   "a": pa.array(range(300))}))
    right = rd.from_arrow(pa.table({"j": pa.array(rk, pa.int64()),
                                    "b": pa.array(range(500))}))
    m = join_size_estimate(left, right, on=["k"], right_on=["j"])

    real = equi_join(left, right, on=["k"], right_on=["j"]).count()
    assert m["inner_rows"] == real
    assert m["left_rows"] == 300 and m["right_rows"] == 500
    assert m["left_keys"] == len(set(lk))
    assert m["right_keys"] == len(set(rk))
    assert m["matching_keys"] == len(set(lk) & set(rk))
    import collections
    ca, cb = collections.Counter(lk), collections.Counter(rk)
    assert m["max_key_multiplicity"] == max(
        ca[k] * cb[k] for k in set(lk) & set(rk))

    # null keys never match
    ln = rd.from_arrow(pa.table({"k": pa.array([1, None], pa.int64())}))
    rn = rd.from_arrow(pa.table({"k": pa.array([None, 1], pa.int64())}))
    mn = join_size_estimate(ln, rn, on=["k"])
    assert mn["inner_rows"] == 1 and mn["left_rows"] == 1
