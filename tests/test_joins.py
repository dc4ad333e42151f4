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
