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
