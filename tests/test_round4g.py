"""Round-4 session-7 operators vs brute-force oracles: Simpson's-paradox
slope audit, Chao1 richness, pointer-doubling chain resolution, grouped
MAD."""

import collections

import numpy as np
import pyarrow as pa
import pytest


def _ols_slope(x, y):
    n = len(x)
    if n < 2 or np.var(x) == 0:
        return None
    return float(np.cov(x, y, bias=True)[0, 1] / np.var(x))


def test_simpson_slopes_matches_numpy(ray_session):
    import ray.data as rd

    from webval.aggregates import simpson_slopes

    rng = np.random.default_rng(7)
    # classic construction: within each stratum y DECREASES with x, but
    # strata with larger x also have much larger y -> pooled slope > 0
    xs, ys, gs = [], [], []
    for i, g in enumerate("abc"):
        x = rng.uniform(0, 1, 200) + 2 * i
        y = -1.0 * x + 10 * i + rng.normal(0, 0.05, 200)
        xs.append(x)
        ys.append(y)
        gs += [g] * 200
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    ds = rd.from_arrow(pa.table({"g": pa.array(gs), "x": pa.array(x),
                                 "y": pa.array(y)}))
    out = simpson_slopes(ds, "g", "x", "y").to_pandas()
    assert list(out["stratum"]) == ["a", "b", "c", "__all__"]
    pooled = _ols_slope(x, y)
    assert out["slope"].iloc[3] == pytest.approx(pooled, rel=1e-9)
    for i, g in enumerate("abc"):
        m = np.array(gs) == g
        s = _ols_slope(x[m], y[m])
        assert out["slope"].iloc[i] == pytest.approx(s, rel=1e-9)
        assert bool(out["sign_reversed"].iloc[i]) == ((s > 0) != (pooled > 0))
    assert not out["sign_reversed"].iloc[3]
    assert out["sign_reversed"].iloc[:3].all()    # the paradox fires


def test_simpson_slopes_degenerate_stratum(ray_session):
    import ray.data as rd

    from webval.aggregates import simpson_slopes

    ds = rd.from_arrow(pa.table({
        "g": pa.array(["a", "a", "b"]),
        "x": pa.array([1.0, 2.0, 5.0]),
        "y": pa.array([1.0, 3.0, 2.0])}))
    out = simpson_slopes(ds, "g", "x", "y").to_pandas()
    # stratum b has n=1 -> null slope, never flagged
    row_b = out[out["stratum"] == "b"].iloc[0]
    assert np.isnan(row_b["slope"]) and not row_b["sign_reversed"]
    assert out[out["stratum"] == "a"]["slope"].iloc[0] == pytest.approx(2.0)


def test_chao1_matches_counter_oracle(ray_session):
    import ray.data as rd

    from webval.textstats import chao1_richness

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(60)]
    docs, grps = [], []
    for g in ("a", "b"):
        for _ in range(30):
            n = int(rng.integers(2, 12))
            docs.append(" ".join(rng.choice(vocab, size=n)))
            grps.append(g)
    ds = rd.from_arrow(pa.table({"g": pa.array(grps),
                                 "text": pa.array(docs)}))
    out = chao1_richness(ds, "g", "text").to_pandas() \
        .set_index("g").sort_index()
    for g in ("a", "b"):
        cnt = collections.Counter(
            w for gg, d in zip(grps, docs) if gg == g for w in d.split())
        V = len(cnt)
        N = sum(cnt.values())
        f1 = sum(1 for c in cnt.values() if c == 1)
        f2 = sum(1 for c in cnt.values() if c == 2)
        row = out.loc[g]
        assert row["n_tokens"] == N and row["n_types"] == V
        assert row["f1"] == f1 and row["f2"] == f2
        assert row["chao1"] == pytest.approx(
            V + f1 * (f1 - 1) / (2 * (f2 + 1)), rel=1e-12)
        assert row["coverage"] == pytest.approx(1 - f1 / N, rel=1e-12)
        assert row["chao1"] >= V


def test_resolve_pointers_chains_and_cycle(ray_session):
    import ray.data as rd

    from webval.graph import resolve_pointers

    src = list(range(24)) + [100, 101, 102]
    dst = [s - 1 if s % 8 else s for s in range(24)] + [101, 102, 100]
    m = rd.from_arrow(pa.table({"s": pa.array(src, pa.int64()),
                                "d": pa.array(dst, pa.int64())}))
    out = resolve_pointers(m, "s", "d", max_rounds=6).to_pandas() \
        .set_index("src").sort_index()
    for s in range(24):
        row = out.loc[s]
        assert row["resolved"]
        assert row["terminal"] == (s // 8) * 8
        assert row["hops"] == s % 8
    for s in (100, 101, 102):           # 3-cycle never resolves
        assert not out.loc[s]["resolved"]


def test_resolve_pointers_dangling_terminal(ray_session):
    import ray.data as rd

    from webval.graph import resolve_pointers

    # 5 -> 4 -> 9, and 9 has no outgoing edge: terminal by absence
    m = rd.from_arrow(pa.table({"s": pa.array([5, 4], pa.int64()),
                                "d": pa.array([4, 9], pa.int64())}))
    out = resolve_pointers(m, "s", "d").to_pandas().set_index("src")
    assert out.loc[5]["terminal"] == 9 and out.loc[5]["hops"] == 2
    assert out.loc[4]["terminal"] == 9 and out.loc[4]["hops"] == 1
    assert out["resolved"].all()


def test_grouped_mad_matches_numpy(ray_session):
    import ray.data as rd

    from webval.rank import grouped_mad

    rng = np.random.default_rng(13)
    gs, vs = [], []
    for g, n in (("a", 101), ("b", 100), ("c", 7)):
        gs += [g] * n
        vs += list(rng.normal(10 * len(gs), 5, n))
    ds = rd.from_arrow(pa.table({"g": pa.array(gs),
                                 "v": pa.array(vs, pa.float64())}))
    out = grouped_mad(ds, "g", "v").to_pandas().set_index("g").sort_index()
    arr = np.array(vs)
    garr = np.array(gs)
    for g in "abc":
        x = arr[garr == g]
        med = float(np.median(x))     # numpy interpolates like SQL
        mad = float(np.median(np.abs(x - med)))
        assert out.loc[g]["median"] == pytest.approx(med, rel=1e-12)
        assert out.loc[g]["mad"] == pytest.approx(mad, rel=1e-12)


def test_longest_streak_matches_brute_force(ray_session):
    import datetime

    import ray.data as rd

    from webval.windows import longest_streak

    rng = np.random.default_rng(21)
    base = datetime.datetime(2024, 3, 1)
    ks, ts = [], []
    truth = {}
    for u in range(12):
        days = sorted(set(rng.integers(0, 40, rng.integers(1, 30))))
        # repeat some days with multiple events at random times
        for d in days:
            for _ in range(int(rng.integers(1, 4))):
                ks.append(u)
                ts.append(base + datetime.timedelta(
                    days=int(d), seconds=int(rng.integers(0, 86400))))
        best = cur = 1
        for a, b in zip(days, days[1:]):
            cur = cur + 1 if b == a + 1 else 1
            best = max(best, cur)
        truth[u] = (best, len(days))
    ds = rd.from_arrow(pa.table({
        "u": pa.array(ks, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us"))}))
    out = longest_streak(ds, "u", "ts").to_pandas().set_index("u")
    assert len(out) == 12
    for u, (best, nd) in truth.items():
        assert out.loc[u]["longest_streak"] == best, u
        assert out.loc[u]["n_active_days"] == nd, u


def test_grouped_hindex_matches_brute_force(ray_session):
    import ray.data as rd

    from webval.rank import grouped_hindex

    rng = np.random.default_rng(2)
    ks, vs = [], []
    truth = {}
    for g in range(10):
        vals = list(rng.integers(0, 20, rng.integers(1, 40)))
        ks += [g] * len(vals)
        vs += [float(v) for v in vals]
        sv = sorted((v for v in vals), reverse=True)
        truth[g] = max((min(v, i + 1) for i, v in enumerate(sv)),
                       default=0)
    ds = rd.from_arrow(pa.table({"g": pa.array(ks, pa.int64()),
                                 "v": pa.array(vs, pa.float64())}))
    out = grouped_hindex(ds, "g", "v").to_pandas().set_index("g")
    for g, h in truth.items():
        if h == 0:
            # groups whose values are all < 1 are absent (no value >= 1)
            assert g not in out.index or out.loc[g]["hindex"] == 0
        else:
            assert out.loc[g]["hindex"] == h, g


def test_grouped_hindex_floors_floats(ray_session):
    import ray.data as rd

    from webval.rank import grouped_hindex

    ds = rd.from_arrow(pa.table({
        "g": pa.array(["a"] * 4),
        "v": pa.array([3.9, 3.2, 2.7, 0.4])}))
    # floors to [3, 3, 2, 0] -> h = 2 (two values >= 2); 0 ignored
    out = grouped_hindex(ds, "g", "v").to_pandas()
    assert out["hindex"].iloc[0] == 2


def test_max_concurrency_matches_sweep_oracle(ray_session):
    import ray.data as rd

    from webval.windows import max_concurrency

    rng = np.random.default_rng(31)
    ks, ss, es = [], [], []
    truth = {}
    for g in range(8):
        n = int(rng.integers(1, 60))
        s = rng.integers(0, 1000, n)
        dur = rng.integers(0, 50, n)      # some zero-length intervals
        e = s + dur
        ks += [g] * n
        ss += list(s)
        es += list(e)
        events = sorted([(t, 1) for t, d in zip(s, dur) if d > 0]
                        + [(t + d, -1) for t, d in zip(s, dur) if d > 0])
        # evaluate after all deltas at each distinct time
        best = cur = 0
        i = 0
        while i < len(events):
            j = i
            while j < len(events) and events[j][0] == events[i][0]:
                cur += events[j][1]
                j += 1
            best = max(best, cur)
            i = j
        truth[g] = (best, int((dur > 0).sum()))
    ds = rd.from_arrow(pa.table({
        "g": pa.array(ks, pa.int64()),
        "s": pa.array(ss, pa.int64()),
        "e": pa.array(es, pa.int64())}))
    out = max_concurrency(ds, "g", "s", "e").to_pandas().set_index("g")
    for g, (best, n_iv) in truth.items():
        if n_iv == 0:
            assert g not in out.index
        else:
            assert out.loc[g]["max_concurrent"] == best, g
            assert out.loc[g]["n_intervals"] == n_iv, g


def test_byte_bigram_codes_oracle():
    from webval.textstats import _byte_bigram_codes

    col = pa.array(["abc", "", "x", "de"], pa.large_string())
    codes, parent = _byte_bigram_codes(col)
    want = [(ord("a") * 256 + ord("b"), 0),
            (ord("b") * 256 + ord("c"), 0),
            (ord("d") * 256 + ord("e"), 3)]
    assert list(zip(codes.tolist(), parent.tolist())) == want
    # sliced array must honor offsets
    codes2, parent2 = _byte_bigram_codes(col.slice(2, 2))
    assert list(zip(codes2.tolist(), parent2.tolist())) == [
        (ord("d") * 256 + ord("e"), 1)]


def test_char_bigram_entropy_matches_counter(ray_session):
    import collections
    import math

    import ray.data as rd

    from webval.textstats import char_bigram_entropy

    docs = {"a": ["hello world", "held"], "b": ["zzzz", "zz"]}
    rows_g, rows_t = [], []
    for g, ts in docs.items():
        for t in ts:
            rows_g.append(g)
            rows_t.append(t)
    ds = rd.from_arrow(pa.table({"g": pa.array(rows_g),
                                 "text": pa.array(rows_t)}))
    out = char_bigram_entropy(ds, "g", "text").to_pandas().set_index("g")
    for g, ts in docs.items():
        cnt = collections.Counter()
        for t in ts:
            bs = t.encode()
            for i in range(len(bs) - 1):
                cnt[bs[i:i + 2]] += 1
        n = sum(cnt.values())
        h = math.log2(n) - sum(c * math.log2(c)
                               for c in cnt.values()) / n
        row = out.loc[g]
        assert row["n_bigrams"] == n
        assert row["n_distinct"] == len(cnt)
        assert row["entropy"] == pytest.approx(h, abs=1e-12)
    assert out.loc["b"]["entropy"] == pytest.approx(0.0, abs=1e-12)


def test_period_movers_matches_pandas_oracle(ray_session):
    import datetime

    import ray.data as rd

    from webval.windows import period_movers

    rng = np.random.default_rng(47)
    n = 4000
    users = rng.integers(0, 120, n)
    # second half deliberately skewed so deltas are non-trivial
    day = np.where(rng.random(n) < 0.4, rng.integers(1, 16, n),
                   rng.integers(16, 31, n))
    ts = [datetime.datetime(2024, 1, int(d), int(h))
          for d, h in zip(day, rng.integers(0, 24, n))]
    split = datetime.datetime(2024, 1, 16)
    t = pa.table({"u": pa.array(users, pa.int64()),
                  "ts": pa.array(ts, pa.timestamp("us"))})
    out = period_movers(rd.from_arrow(t), "u", "ts",
                        pa.scalar(split, pa.timestamp("us")),
                        k=15).to_pandas()

    before = collections.Counter(
        int(u) for u, t_ in zip(users, ts) if t_ < split)
    after = collections.Counter(
        int(u) for u, t_ in zip(users, ts) if t_ >= split)
    rows = [(u, before.get(u, 0), after.get(u, 0),
             after.get(u, 0) - before.get(u, 0))
            for u in set(before) | set(after)]
    rows.sort(key=lambda r: (-abs(r[3]), r[0]))
    exp = rows[:15]

    assert len(out) == 15
    got = list(out[["u", "before_n", "after_n", "delta"]]
               .itertuples(index=False, name=None))
    assert got == exp


def test_period_movers_null_keys_dropped(ray_session):
    import ray.data as rd

    from webval.windows import period_movers

    t = pa.table({"u": pa.array([1, None, 2, 1], pa.int64()),
                  "ts": pa.array([1, 5, 9, None], pa.int64())})
    out = period_movers(rd.from_arrow(t), "u", "ts",
                        pa.scalar(4, pa.int64()), k=10).to_pandas()
    # null key and null ts rows drop; u=1 before only, u=2 after only
    assert set(zip(out["u"], out["before_n"], out["after_n"])) == {
        (1, 1, 0), (2, 0, 1)}
