"""Round-4 session-7 operators: Mann-Whitney drift, ANOVA F, hour
entropy, sorted-neighborhood pairs."""

import math
import random

import numpy as np
import pyarrow as pa
import pytest


def test_mann_whitney_matches_brute_force():
    from webval.drift import mann_whitney_u

    random.seed(11)
    a = [random.randint(0, 9) for _ in range(120)]
    b = [random.randint(2, 11) for _ in range(75)]
    vals = sorted(set(a) | set(b))
    n1, n2, u1, z = mann_whitney_u([a.count(v) for v in vals],
                                   [b.count(v) for v in vals])
    assert (n1, n2) == (120, 75)
    # U1 = #(a beats b) + half-credit ties, exactly
    u_brute = sum(1.0 for x in a for y in b if x > y) \
        + 0.5 * sum(1 for x in a for y in b if x == y)
    assert u1 == u_brute
    # b is stochastically larger -> side 1 loses -> negative z
    assert z < -2

    # symmetric swap: U2 = n1*n2 - U1, z flips sign
    m1, m2, u2, z2 = mann_whitney_u([b.count(v) for v in vals],
                                    [a.count(v) for v in vals])
    assert u2 == n1 * n2 - u1
    assert z2 == pytest.approx(-z, abs=1e-12)


def test_mann_whitney_degenerate():
    from webval.drift import mann_whitney_u

    # all values tied in one bin -> tie correction zeroes the variance
    n1, n2, u1, z = mann_whitney_u([5], [7])
    assert u1 == 5 * 7 / 2.0 and z == 0.0
    # one side empty
    assert mann_whitney_u([3, 2], [0, 0]) == (5, 0, 0.0, 0.0)
    with pytest.raises(ValueError):
        mann_whitney_u([1, 2], [1, 2, 3])


def test_anova_f_matches_direct_ss():
    from webval.drift import anova_f

    rng = np.random.default_rng(7)
    groups = [rng.normal(loc, 1.0, size=n)
              for loc, n in [(0.0, 40), (0.5, 55), (-0.3, 30)]]
    n = [len(g) for g in groups]
    s = [g.sum() for g in groups]
    ss = [(g * g).sum() for g in groups]
    k, nt, f, eta = anova_f(n, s, ss)
    assert (k, nt) == (3, 125)
    allv = np.concatenate(groups)
    gm = allv.mean()
    ssb = sum(len(g) * (g.mean() - gm) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    assert f == pytest.approx((ssb / 2) / (ssw / (125 - 3)), rel=1e-9)
    assert eta == pytest.approx(ssb / (ssb + ssw), rel=1e-9)


def test_anova_f_degenerate():
    from webval.drift import anova_f

    k, nt, f, eta = anova_f([10], [5.0], [3.0])      # one group
    assert k == 1 and math.isnan(f)
    k, nt, f, eta = anova_f([1, 1], [1.0, 2.0], [1.0, 4.0])  # nt == k
    assert math.isnan(f)
    # zero within-group variance, nonzero between -> F = inf
    k, nt, f, eta = anova_f([2, 2], [2.0, 4.0], [2.0, 8.0])
    assert math.isinf(f) and eta == 1.0


def test_hour_entropy_matches_counter_oracle(ray_session):
    import collections
    import datetime

    import ray.data as rd

    from webval.windows import hour_of_day_entropy

    rng = np.random.default_rng(13)
    users, hours = [], []
    # user 0: cron bot pinned to 03:00; user 1: uniform; others random
    users += [0] * 50
    hours += [3] * 50
    users += [1] * 48
    hours += list(range(24)) * 2
    for u in range(2, 10):
        n = int(rng.integers(5, 40))
        users += [u] * n
        hours += list(rng.integers(0, 24, n))
    ts = [datetime.datetime(2024, 1, 1 + int(rng.integers(0, 20)), h)
          for h in hours]
    ds = rd.from_arrow(pa.table({
        "u": pa.array(users, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us"))}))
    out = hour_of_day_entropy(ds, "u", "ts").to_pandas().set_index("u")

    per_user = collections.defaultdict(collections.Counter)
    for u, h in zip(users, hours):
        per_user[u][h] += 1
    for u, cnt in per_user.items():
        n = sum(cnt.values())
        ent = math.log2(n) - sum(c * math.log2(c)
                                 for c in cnt.values()) / n
        row = out.loc[u]
        assert row["n_events"] == n
        assert row["n_hours"] == len(cnt)
        assert row["entropy"] == pytest.approx(ent, abs=1e-10)
        assert row["peak_share"] == pytest.approx(max(cnt.values()) / n,
                                                  abs=1e-12)
    assert out.loc[0]["entropy"] == 0.0 and out.loc[0]["peak_share"] == 1.0
    assert out.loc[1]["entropy"] == pytest.approx(math.log2(24), abs=1e-10)


def test_hill_tail_index_matches_numpy(ray_session):
    import ray.data as rd

    from webval.rank import hill_tail_index

    rng = np.random.default_rng(5)
    # Zipf-ish user activity: user u appears ~ (u+1)**-1.2 scaled
    users = []
    counts = [max(1, int(2000 * (u + 1) ** -1.2)) for u in range(60)]
    for u, c in enumerate(counts):
        users += [u] * c
    rng.shuffle(users)
    ds = rd.from_arrow(pa.table({"u": pa.array(users, pa.int64())}))
    k_eff, xk1, alpha = hill_tail_index(ds, "u", k=10)

    x = np.sort(np.array(counts, dtype=np.float64))[::-1]
    assert k_eff == 10
    assert xk1 == int(x[10])
    expect = 10 / np.log(x[:10] / x[10]).sum()
    assert alpha == pytest.approx(expect, rel=1e-12)


def test_hill_tail_index_degenerate(ray_session):
    import ray.data as rd

    from webval.rank import hill_tail_index

    # fewer keys than k -> k_eff shrinks
    ds = rd.from_arrow(pa.table({"u": pa.array([0, 0, 0, 1], pa.int64())}))
    k_eff, xk1, alpha = hill_tail_index(ds, "u", k=10)
    assert k_eff == 1 and xk1 == 1
    assert alpha == pytest.approx(1.0 / math.log(3.0), rel=1e-12)
    # single key -> nan
    ds1 = rd.from_arrow(pa.table({"u": pa.array([7, 7], pa.int64())}))
    k_eff, xk1, alpha = hill_tail_index(ds1, "u", k=10)
    assert k_eff == 0 and math.isnan(alpha)
    # all-null -> nan
    dsn = rd.from_arrow(pa.table({"u": pa.array([None, None], pa.int64())}))
    k_eff, xk1, alpha = hill_tail_index(dsn, "u", k=10)
    assert k_eff == 0 and math.isnan(alpha)


def test_weighted_log_odds_matches_counter_oracle(ray_session):
    import collections
    import re

    import ray.data as rd

    from webval.textstats import weighted_log_odds

    docs = (["alpha beta gamma common common"] * 30
            + ["delta beta common common epsilon"] * 25)
    sides = [0] * 30 + [1] * 25
    ds = rd.from_arrow(pa.table({
        "side": pa.array(sides, pa.int64()),
        "text": pa.array(docs, pa.string())}))
    out = weighted_log_odds(ds, "side", "text", prior_strength=10.0,
                            min_count=5, top_k=50).to_pandas() \
        .set_index("term")

    c0, c1 = collections.Counter(), collections.Counter()
    for s, d in zip(sides, docs):
        toks = [t for t in re.split(r"[^a-z0-9]+", d.lower()) if t]
        (c0 if s == 0 else c1).update(toks)
    n0, n1 = sum(c0.values()), sum(c1.values())
    big_n = n0 + n1
    for term in set(c0) | set(c1):
        y0, y1 = c0[term], c1[term]
        if y0 + y1 < 5:
            assert term not in out.index
            continue
        aw = 10.0 * (y0 + y1) / big_n
        delta = (math.log((y1 + aw) / (n1 + 10.0 - y1 - aw))
                 - math.log((y0 + aw) / (n0 + 10.0 - y0 - aw)))
        z = delta / math.sqrt(1 / (y1 + aw) + 1 / (y0 + aw))
        row = out.loc[term]
        assert row["c0"] == y0 and row["c1"] == y1
        assert row["delta"] == pytest.approx(round(delta, 6), abs=2e-6)
        assert row["z"] == pytest.approx(round(z, 6), abs=2e-6)
    # direction: alpha/gamma exclusive to side 0 -> negative z;
    # delta/epsilon exclusive to side 1 -> positive z
    assert out.loc["alpha"]["z"] < 0 and out.loc["gamma"]["z"] < 0
    assert out.loc["delta"]["z"] > 0 and out.loc["epsilon"]["z"] > 0


def test_weighted_log_odds_empty(ray_session):
    import ray.data as rd

    from webval.textstats import weighted_log_odds

    ds = rd.from_arrow(pa.table({
        "side": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    out = weighted_log_odds(ds, "side", "text")
    assert out.count() == 0
    assert sorted(out.schema().names) == ["c0", "c1", "delta", "term", "z"]


def test_welch_t_matches_scipy_formula():
    from webval.drift import welch_t

    rng = np.random.default_rng(13)
    a = rng.normal(5.0, 2.0, 200)
    b = rng.normal(5.5, 0.7, 80)
    n, s, ss = ([len(a), len(b)], [a.sum(), b.sum()],
                [(a * a).sum(), (b * b).sum()])
    n0, n1, t, dof = welch_t(n, s, ss)

    v0, v1 = a.var(ddof=1), b.var(ddof=1)
    se0, se1 = v0 / len(a), v1 / len(b)
    expect_t = (b.mean() - a.mean()) / math.sqrt(se0 + se1)
    expect_dof = (se0 + se1) ** 2 / (se0 ** 2 / (len(a) - 1)
                                     + se1 ** 2 / (len(b) - 1))
    assert n0 == 200 and n1 == 80
    assert t == pytest.approx(expect_t, rel=1e-9)
    assert dof == pytest.approx(expect_dof, rel=1e-9)


def test_welch_t_degenerate():
    from webval.drift import welch_t

    # a side with < 2 rows -> nan
    n0, n1, t, dof = welch_t([1, 5], [3.0, 10.0], [9.0, 30.0])
    assert math.isnan(t) and math.isnan(dof)
    # both sides constant -> zero variance -> nan
    n0, n1, t, dof = welch_t([3, 3], [6.0, 9.0], [12.0, 27.0])
    assert math.isnan(t) and math.isnan(dof)
    with pytest.raises(ValueError):
        welch_t([1, 2, 3], [0, 0, 0], [0, 0, 0])


def test_fd_strength_matches_counter_oracle(ray_session):
    import collections

    import ray.data as rd

    from webval.relational import fd_strength

    rng = np.random.default_rng(7)
    x = rng.integers(0, 20, 500)
    y = x // 3                       # exact FD x -> y
    z = rng.integers(0, 4, 500)      # dirty FD x -> z
    ds = rd.from_arrow(pa.table({
        "x": pa.array(x, pa.int64()), "y": pa.array(y, pa.int64()),
        "z": pa.array(z, pa.int64())}))
    out = fd_strength(ds, [("x", "y"), ("x", "z"), ("y", "x")])
    assert isinstance(out, pa.Table)
    rows = {(r["lhs"], r["rhs"]): r for r in out.to_pylist()}

    def g3(ls, rs):
        c = collections.Counter(zip(ls, rs))
        best = collections.defaultdict(int)
        for (l, _), cnt in c.items():
            best[l] = max(best[l], cnt)
        return sum(best.values()), len(ls)

    for lhs, rhs, ls, rs in [("x", "y", x, y), ("x", "z", x, z),
                             ("y", "x", y, x)]:
        keep, n = g3(ls.tolist(), rs.tolist())
        r = rows[(lhs, rhs)]
        assert r["n"] == n and r["keep"] == keep
        assert r["strength"] == pytest.approx(keep / n, rel=1e-12)
    assert rows[("x", "y")]["strength"] == 1.0
    assert rows[("x", "z")]["strength"] < 1.0


def test_fd_strength_nulls_and_empty(ray_session):
    import ray.data as rd

    from webval.relational import fd_strength

    # null on either side of a pair drops the row for that pair only
    ds = rd.from_arrow(pa.table({
        "a": pa.array([1, 1, None, 2], pa.int64()),
        "b": pa.array([10, 10, 10, None], pa.int64())}))
    out = fd_strength(ds, [("a", "b")]).to_pylist()[0]
    assert out["n"] == 2 and out["keep"] == 2 and out["strength"] == 1.0

    empty = rd.from_arrow(pa.table({
        "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}))
    out = fd_strength(empty, [("a", "b")]).to_pylist()[0]
    assert out["n"] == 0 and out["keep"] == 0
    assert out["strength"] is None


def test_correlated_keys_matches_numpy(ray_session):
    import ray.data as rd

    from webval.windows import correlated_keys

    rng = np.random.default_rng(3)
    hour = 3_600_000_000
    rows_k, rows_t = [], []
    base = rng.integers(1, 9, 48)
    series = {"a": base, "b": base + rng.integers(0, 2, 48),  # ~copy of a
              "c": rng.integers(1, 9, 48),                    # independent
              "d": np.ones(48, np.int64)}                     # low volume
    for k, s in series.items():
        for h, cnt in enumerate(s):
            rows_k += [k] * int(cnt)
            rows_t += [h * hour + 5] * int(cnt)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(rows_k, pa.string()),
        "ts": pa.array(rows_t, pa.int64()).cast(pa.timestamp("us"))}))
    out = correlated_keys(ds, "k", "ts", top_n=3).to_pylist()
    # top-3 by volume excludes d
    got = {(r["key_a"], r["key_b"]): r for r in out}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    for (x, y), r in got.items():
        assert r["buckets"] == 48
        expect = np.corrcoef(series[x].astype(float),
                             series[y].astype(float))[0, 1]
        assert r["corr"] == pytest.approx(expect, abs=1e-12)
    assert got[("a", "b")]["corr"] > 0.9


def test_correlated_keys_constant_and_gaps(ray_session):
    import ray.data as rd

    from webval.windows import correlated_keys

    hour = 3_600_000_000
    # key "c" constant 1/hour over hours 0..3; key "v" active hours 0,3
    # only -> zero-filled gap hours 1,2 matter for the correlation
    k = ["c"] * 4 + ["v", "v", "v"]
    t = [0, hour, 2 * hour, 3 * hour, 0, 0, 3 * hour]
    ds = rd.from_arrow(pa.table({
        "k": pa.array(k), "ts": pa.array(t, pa.int64())
        .cast(pa.timestamp("us"))}))
    out = correlated_keys(ds, "k", "ts", top_n=5).to_pylist()
    assert len(out) == 1
    r = out[0]
    assert (r["key_a"], r["key_b"]) == ("c", "v") and r["buckets"] == 4
    assert r["corr"] is None          # constant side -> NULL like SQL corr

    # fewer than 2 keys and fully-empty input -> empty result
    one = rd.from_arrow(pa.table({
        "k": pa.array(["x", "x"]),
        "ts": pa.array([0, hour], pa.int64()).cast(pa.timestamp("us"))}))
    assert correlated_keys(one, "k", "ts").num_rows == 0
    empty = rd.from_arrow(pa.table({
        "k": pa.array([], pa.string()),
        "ts": pa.array([], pa.timestamp("us"))}))
    assert correlated_keys(empty, "k", "ts").num_rows == 0


def test_correlated_keys_max_cells_diagnostic(ray_session):
    import ray.data as rd

    from webval.windows import correlated_keys

    hour = 3_600_000_000
    ds = rd.from_arrow(pa.table({
        "k": pa.array(["a", "b", "a", "b"]),
        "ts": pa.array([0, 0, 100 * hour, 100 * hour], pa.int64())
        .cast(pa.timestamp("us"))}))
    with pytest.raises(ValueError, match="max_cells"):
        correlated_keys(ds, "k", "ts", top_n=2, max_cells=10)


def test_hits_matches_reference_on_random_graph(ray_session):
    import ray.data as rd

    from webval.graph import hits, hits_reference

    rng = np.random.default_rng(17)
    src = rng.integers(0, 40, 300)
    dst = rng.integers(0, 40, 300)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ds = rd.from_arrow(pa.table({"s": pa.array(src, pa.int64()),
                                 "d": pa.array(dst, pa.int64())}))
    got = hits(ds, "s", "d", n_iter=3).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    nodes, a, h = hits_reference(src, dst, n_iter=3)
    assert np.array_equal(got["node"].to_numpy(), nodes)
    assert np.abs(got["auth"].to_numpy() - a).max() < 1e-12
    assert np.abs(got["hub"].to_numpy() - h).max() < 1e-12
    assert got["auth"].sum() == pytest.approx(1.0, abs=1e-9)
    assert got["hub"].sum() == pytest.approx(1.0, abs=1e-9)


def test_hits_separates_hubs_from_authorities(ray_session):
    import ray.data as rd

    from webval.graph import hits

    # hub nodes 100..102 all point at authority nodes 0..1; a stray
    # chain 5->6 exists so scores aren't trivially uniform
    src = [100, 100, 101, 101, 102, 102, 5]
    dst = [0, 1, 0, 1, 0, 1, 6]
    ds = rd.from_arrow(pa.table({"s": pa.array(src, pa.int64()),
                                 "d": pa.array(dst, pa.int64())}))
    out = hits(ds, "s", "d", n_iter=4).to_pandas().set_index("node")
    assert out.loc[0]["auth"] > out.loc[100]["auth"]
    assert out.loc[100]["hub"] > out.loc[0]["hub"]
    assert out.loc[0]["auth"] > out.loc[6]["auth"]

    empty = rd.from_arrow(pa.table({"s": pa.array([], pa.int64()),
                                    "d": pa.array([], pa.int64())}))
    res = hits(empty, "s", "d")
    assert res.count() == 0
    assert sorted(res.schema().names) == ["auth", "hub", "node"]


def test_first_seen_counts_matches_counter_oracle(ray_session):
    import collections

    import ray.data as rd

    from webval.windows import first_seen_counts

    day = 86_400_000_000
    rng = np.random.default_rng(23)
    keys = rng.integers(0, 30, 400)
    ts = rng.integers(0, 10 * day, 400)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us"))}))
    out = first_seen_counts(ds, "k", "ts").to_pandas() \
        .set_index("bucket_us")["new_keys"]

    first = {}
    for k, t in zip(keys.tolist(), ts.tolist()):
        b = (t // day) * day
        first[k] = min(first.get(k, b), b)
    expect = collections.Counter(first.values())
    assert dict(out) == dict(expect)
    assert out.sum() == len(set(keys.tolist()))

    # nulls dropped; empty input -> zero rows
    ds2 = rd.from_arrow(pa.table({
        "k": pa.array([None, 1], pa.int64()),
        "ts": pa.array([0, None], pa.int64()).cast(pa.timestamp("us"))}))
    assert first_seen_counts(ds2, "k", "ts").count() == 0


def test_duplication_weights_matches_counter_oracle(ray_session):
    import collections

    import ray.data as rd

    from webval.dedup import duplication_weights

    rng = np.random.default_rng(31)
    texts = [f"doc {i % 12}" for i in range(200)]     # 12 distinct texts
    groups = [f"g{int(x)}" for x in rng.integers(0, 4, 200)]
    ds = rd.from_arrow(pa.table({"g": pa.array(groups),
                                 "text": pa.array(texts)}))
    out = duplication_weights(ds, "g", "text", normalize=False) \
        .to_pandas().set_index("g")

    total = collections.Counter(texts)
    per = collections.defaultdict(lambda: collections.Counter())
    for g, t in zip(groups, texts):
        per[g][t] += 1
    for g, c in per.items():
        eff = sum(nf / total[t] for t, nf in c.items())
        n = sum(c.values())
        row = out.loc[g]
        assert row["n_docs"] == n
        assert row["effective_docs"] == pytest.approx(eff, rel=1e-12)
        assert row["effective_ratio"] == pytest.approx(eff / n, rel=1e-12)
    # every distinct text contributes exactly 1 effective doc in total
    assert out["effective_docs"].sum() == pytest.approx(12.0, abs=1e-9)

    # all-unique corpus -> effective == raw
    uniq = rd.from_arrow(pa.table({
        "g": pa.array(["a", "a", "b"]),
        "text": pa.array(["x1", "x2", "x3"])}))
    u = duplication_weights(uniq, "g", "text").to_pandas().set_index("g")
    assert u.loc["a"]["effective_ratio"] == 1.0
    assert u.loc["b"]["n_docs"] == 1


def test_pmi_collocations_matches_counter_oracle(ray_session):
    import collections
    import math
    import re

    import ray.data as rd

    from webval.textstats import pmi_collocations

    docs = [
        "the cat sat on the mat",
        "the cat ran, the cat sat!",   # punctuation splits -> adjacency
        "cat sat cat sat cat sat",
        None,
        "",
        "solo",                        # single token -> no pairs
        "the mat the cat sat down",
    ]
    ds = rd.from_arrow(pa.table({"text": pa.array(docs, pa.string())}))
    out = pmi_collocations(ds, "text", min_count=2, top_k=50).to_pandas()

    uni = collections.Counter()
    pairs = collections.Counter()
    n_pairs = 0
    for d in docs:
        if d is None:
            continue
        toks = [t for t in re.split(r"[^a-z0-9]+", d.lower()) if t]
        uni.update(toks)
        for a, b in zip(toks, toks[1:]):
            pairs[(a, b)] += 1
            n_pairs += 1
    n_tok = sum(uni.values())
    expect = {}
    for (a, b), c12 in pairs.items():
        if c12 >= 2:
            expect[(a, b)] = math.log((c12 / n_pairs)
                                      / ((uni[a] / n_tok)
                                         * (uni[b] / n_tok)))
    got = {(r.w1, r.w2): r for r in out.itertuples()}
    assert set(got) == set(expect)
    for k, r in got.items():
        assert r.pmi == pytest.approx(expect[k], rel=1e-12)
        assert r.c12 == pairs[k]
        assert (r.c1, r.c2) == (uni[k[0]], uni[k[1]])
    # ranking: pmi non-increasing down the result
    assert list(out["pmi"]) == sorted(out["pmi"], reverse=True)

    # top_k cut respected
    top2 = pmi_collocations(ds, "text", min_count=2, top_k=2).to_pandas()
    assert len(top2) == 2

    # all-null / pairless corpus -> empty with full schema
    e = pmi_collocations(rd.from_arrow(pa.table({
        "text": pa.array([None, "one"], pa.string())})), "text")
    assert e.count() == 0
    assert e.schema().names == ["w1", "w2", "c12", "c1", "c2", "pmi"]


def test_benford_audit_matches_counter_oracle(ray_session):
    import collections
    import math

    import ray.data as rd

    from webval.drift import benford_audit

    rng = np.random.default_rng(17)
    # log-uniform over 4 decades -> near-perfect Benford
    vals = np.power(10.0, rng.uniform(0, 4, 5000)).tolist()
    vals += [None, 0.0, -5.0, 0.3]          # skipped rows
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())}))
    out = benford_audit(ds, "x").to_pandas().set_index("digit")

    cnt = collections.Counter(int(str(int(v))[0]) for v in vals
                              if v is not None and v >= 1)
    total = sum(cnt.values())
    assert total == 5000
    for d in range(1, 10):
        e = math.log10(1 + 1 / d)
        row = out.loc[d]
        assert row["n"] == cnt[d]
        assert row["share"] == pytest.approx(cnt[d] / total, rel=1e-12)
        assert row["expected"] == pytest.approx(e, rel=1e-12)
        assert row["resid"] == pytest.approx(
            (cnt[d] - total * e) / math.sqrt(total * e * (1 - e)),
            rel=1e-12)
    # log-uniform data conforms: every standardized residual small
    assert out["resid"].abs().max() < 4

    # a constant column (all first-digit 7) is flagged hard
    flat = rd.from_arrow(pa.table({"x": pa.array([700.0] * 500)}))
    f = benford_audit(flat, "x").to_pandas().set_index("digit")
    assert list(f.index) == [7] and f.loc[7]["share"] == 1.0
    assert f.loc[7]["resid"] > 50

    # empty after filtering -> empty with schema
    e = benford_audit(rd.from_arrow(pa.table({
        "x": pa.array([None, 0.5], pa.float64())})), "x")
    assert e.count() == 0
    assert e.schema().names == ["digit", "n", "share", "expected", "resid"]


def test_json_key_profile_matches_counter_oracle(ray_session):
    import ray.data as rd

    from webval.textstats import json_key_profile

    docs = [
        '{"a": 1, "b": "s", "c": {"x": 1.5, "y": {"deep": 1}}}',
        '{"a": true, "c": {"x": null}, "d": [1, 2]}',
        '{"a": -3}',
        None,
        '[1, 2]',          # non-object top level: counts in denominator only
        '{}',
    ]
    ds = rd.from_arrow(pa.table({"js": pa.array(docs, pa.string())}))
    out = json_key_profile(ds, "js", max_depth=2).to_pandas()
    got = {(r.path, r.jtype): (r.n, r.share) for r in out.itertuples()}
    # 5 parsed docs (null skipped)
    expect = {
        ("a", "INTEGER"): 2, ("a", "BOOLEAN"): 1,
        ("b", "VARCHAR"): 1,
        ("c", "OBJECT"): 2,
        ("c.x", "DOUBLE"): 1, ("c.x", "NULL"): 1,
        ("c.y", "OBJECT"): 1,       # depth 2 stops here: no c.y.deep
        ("d", "ARRAY"): 1,
    }
    assert {k: v[0] for k, v in got.items()} == expect
    for k, (n, share) in got.items():
        assert share == pytest.approx(n / 5, rel=1e-12)
    assert ("c.y.deep", "INTEGER") not in got

    # depth 3 descends one more level
    d3 = json_key_profile(ds, "js", max_depth=3).to_pandas()
    keys3 = set(zip(d3["path"], d3["jtype"]))
    assert ("c.y.deep", "INTEGER") in keys3

    # sorted output
    assert list(out["path"]) == sorted(out["path"])

    # all-null -> empty with schema
    e = json_key_profile(rd.from_arrow(pa.table({
        "js": pa.array([None], pa.string())})), "js")
    assert e.count() == 0
    assert e.schema().names == ["path", "jtype", "n", "share"]


def test_mahalanobis_outliers_matches_numpy(ray_session):
    import ray.data as rd

    from webval.clustering import mahalanobis_outliers

    rng = np.random.default_rng(23)
    n = 400
    x = rng.normal(0, 1, n)
    y = 2.0 * x + rng.normal(0, 0.3, n)      # strongly correlated
    # a point normal per-axis but off the correlation ridge
    x[0], y[0] = 1.0, -2.0
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(pa.table({
        "x": pa.array(x), "y": pa.array(y), "rid": pa.array(ids)}))
    out = mahalanobis_outliers(ds, ["x", "y"], top_k=5, id_col="rid") \
        .to_pandas()

    xy = np.column_stack([x, y])
    mu = xy.mean(axis=0)
    cov = np.cov(xy, rowvar=False)            # sample covariance
    sinv = np.linalg.inv(cov)
    c = xy - mu
    d2 = np.einsum("ij,ij->i", c @ sinv, c)
    order = np.lexsort((ids, -d2.round(6)))[:5]
    assert list(out["rid"]) == list(ids[order])
    assert out["d2"].to_numpy() == pytest.approx(d2[order], rel=1e-9)
    # the off-ridge point must be the top outlier
    assert out["rid"].iloc[0] == 0

    # null coordinates are excluded, not scored
    ds2 = rd.from_arrow(pa.table({
        "x": pa.array([0.0, 1.0, None, 5.0, 0.5, -1.0, 2.0]),
        "y": pa.array([0.0, 1.1, 2.0, None, 0.4, -0.9, 2.2]),
        "rid": pa.array(np.arange(7, dtype=np.int64))}))
    o2 = mahalanobis_outliers(ds2, ["x", "y"], top_k=10, id_col="rid") \
        .to_pandas()
    assert set(o2["rid"]) == {0, 1, 4, 5, 6}

    # too few complete rows -> named diagnostic
    tiny = rd.from_arrow(pa.table({"x": pa.array([1.0, 2.0]),
                                   "y": pa.array([1.0, None])}))
    with pytest.raises(ValueError, match="mahalanobis"):
        mahalanobis_outliers(tiny, ["x", "y"])


def test_cluster_canonicals_and_drop_near_duplicates(ray_session):
    import ray.data as rd

    from webval.dedup import cluster_canonicals, drop_near_duplicates

    # clusters: {1,2,3} (c10), {5,6} (c5); docs 4, 7 unclustered
    clusters = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 5, 6], pa.int64()),
        "cluster_id": pa.array([10, 10, 10, 5, 5], pa.int64())}))
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "q": pa.array([0.9, 0.9, 0.1, 0.5, 0.2, 0.8, 0.3]),
        "text": pa.array([f"t{i}" for i in range(7)])}))

    canon = cluster_canonicals(
        clusters, corpus.select_columns(["doc_id", "q"]), "doc_id",
        score_col="q").to_pandas().set_index("cluster_id")
    # cluster 10: q ties at 0.9 between ids 1 and 2 -> smallest id wins
    assert canon.loc[10]["kept_id"] == 1 and canon.loc[10]["n_docs"] == 3
    assert canon.loc[5]["kept_id"] == 6 and canon.loc[5]["n_docs"] == 2

    kept = drop_near_duplicates(corpus, clusters, "doc_id",
                                score_col="q").to_pandas()
    assert sorted(kept["doc_id"]) == [1, 4, 6, 7]
    assert set(kept.columns) == {"doc_id", "q", "text"}  # full rows kept

    # lower-is-better selection (e.g. perplexity)
    canon_lo = cluster_canonicals(
        clusters, corpus.select_columns(["doc_id", "q"]), "doc_id",
        score_col="q", higher_is_better=False).to_pandas() \
        .set_index("cluster_id")
    assert canon_lo.loc[10]["kept_id"] == 3
    assert canon_lo.loc[5]["kept_id"] == 5

    # no clusters -> corpus unchanged
    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "cluster_id": pa.array([], pa.int64())}))
    assert drop_near_duplicates(corpus, empty, "doc_id",
                                score_col="q").count() == 7


def test_concat_packing_matches_scan_oracle(ray_session):
    import ray.data as rd

    from webval.pipelines import concat_packing

    rng = np.random.default_rng(41)
    n = 300
    toks = rng.integers(0, 700, n).astype(np.int64)
    toks[5] = 0
    ids = rng.permutation(n).astype(np.int64)   # unsorted input
    tok_by_id = {int(i): int(t) for i, t in zip(ids, toks)}
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids), "tk": pa.array(toks)})) \
        .repartition(7)
    out = concat_packing(ds, "doc_id", "tk", 512).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    # serial oracle in id order
    pos = 0
    for i in range(n):
        t = tok_by_id[i]
        row = out.iloc[i]
        assert row["doc_id"] == i and row["tk"] == t
        assert row["offset"] == pos
        assert row["bin"] == pos // 512
        end = pos + t
        assert bool(row["straddles"]) == (t > 0
                                          and (end - 1) // 512 > pos // 512)
        pos = end

    # packing invariants: offsets strictly partition the token stream
    assert out["offset"].iloc[0] == 0
    assert (out["offset"].to_numpy()[1:]
            == (out["offset"] + out["tk"]).to_numpy()[:-1]).all()
    # bins are non-decreasing in pack order
    assert (np.diff(out["bin"].to_numpy()) >= 0).all()

    # nulls and negatives occupy zero tokens but keep their slot
    ds2 = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "tk": pa.array([600, None, -5], pa.int64())}))
    o2 = concat_packing(ds2, "doc_id", "tk", 512).to_pandas() \
        .sort_values("doc_id")
    assert list(o2["offset"]) == [0, 600, 600]
    assert list(o2["straddles"]) == [True, False, False]

    with pytest.raises(ValueError, match="context_len"):
        concat_packing(ds2, "doc_id", "tk", 0)


def test_path_prefix_rollup_matches_counter_oracle(ray_session):
    import collections

    import ray.data as rd

    from webval.textstats import path_prefix_rollup

    paths = ["a/b/c", "a/b/c/d", "a/b", "a", "a/x", "z", None,
             "/lead/abs", "a/b/c"]
    ds = rd.from_arrow(pa.table({"p": pa.array(paths, pa.string())}))
    out = path_prefix_rollup(ds, "p", max_depth=3).to_pandas()
    got = {(r.depth, r.prefix): r.n for r in out.itertuples()}

    expect = collections.Counter()
    for p in paths:
        if p is None:
            continue
        segs = p.split("/")
        for d in range(1, 4):
            if len(segs) >= d:
                expect[(d, "/".join(segs[:d]))] += 1
    assert got == dict(expect)
    # absolute path counts under the empty root segment
    assert got[(1, "")] == 1 and got[(2, "/lead")] == 1
    # deeper-than-max_depth rows still count at every depth <= 3
    assert got[(3, "a/b/c")] == 3
    # sorted output
    assert list(out.itertuples(index=False, name=None)) == sorted(
        out.itertuples(index=False, name=None))

    with pytest.raises(ValueError, match="max_depth"):
        path_prefix_rollup(ds, "p", max_depth=0)

    # all-null -> empty, schema kept
    e = path_prefix_rollup(rd.from_arrow(pa.table({
        "p": pa.array([None], pa.string())})), "p")
    assert e.count() == 0


def test_cocitation_pairs_matches_counter_oracle(ray_session):
    import collections
    import itertools

    import ray.data as rd

    from webval.graph import cocitation_pairs

    edges = [
        ("s1", "a"), ("s1", "b"), ("s1", "c"),
        ("s2", "a"), ("s2", "b"),
        ("s3", "a"), ("s3", "b"), ("s3", "b"),   # duplicate edge: once
        ("s4", "c"), ("s4", "a"),
        ("s5", "x"), (None, "y"), ("s6", None),
    ]
    ds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.string()),
        "dst": pa.array([e[1] for e in edges], pa.string())}))
    out = cocitation_pairs(ds, "src", "dst", min_cocite=1, top_k=50) \
        .to_pandas()
    got = {(r.d1, r.d2): r.n for r in out.itertuples()}

    per_src = collections.defaultdict(set)
    for s, d in edges:
        if s is not None and d is not None:
            per_src[s].add(d)
    expect = collections.Counter()
    for s, ds_ in per_src.items():
        for d1, d2 in itertools.combinations(sorted(ds_), 2):
            expect[(d1, d2)] += 1
    assert got == dict(expect)
    assert got[("a", "b")] == 3 and got[("a", "c")] == 2

    # min_cocite filters singletons; rank is count desc then lexicographic
    top = cocitation_pairs(ds, "src", "dst", min_cocite=2, top_k=50) \
        .to_pandas()
    assert list(zip(top["d1"], top["d2"])) == [("a", "b"), ("a", "c")]

    # max_out cap keeps only the lexicographically smallest targets
    capped = cocitation_pairs(ds, "src", "dst", max_out=2, min_cocite=1,
                              top_k=50).to_pandas()
    gc = {(r.d1, r.d2): r.n for r in capped.itertuples()}
    # s1 {a,b,c} capped to {a,b}; s4 {a,c} kept
    assert gc[("a", "b")] == 3 and gc[("a", "c")] == 1
    assert ("b", "c") not in gc

    # no co-citations at all
    lone = rd.from_arrow(pa.table({
        "src": pa.array(["p", "q"]), "dst": pa.array(["u", "v"])}))
    assert cocitation_pairs(lone, "src", "dst", min_cocite=1).count() == 0


def test_plan_shards_matches_greedy_oracle(ray_session):
    import heapq

    import ray.data as rd

    from webval.pipelines import plan_shards

    rng = np.random.default_rng(29)
    keys = [f"h{i}" for i in range(40)]
    rows_k, rows_w = [], []
    truth = {}
    for k in keys:
        parts = rng.integers(1, 9, size=int(rng.integers(1, 6)))
        truth[k] = int(parts.sum())
        rows_k += [k] * len(parts)
        rows_w += parts.tolist()
    ds = rd.from_arrow(pa.table({
        "k": pa.array(rows_k), "w": pa.array(rows_w, pa.int64())}))
    out = plan_shards(ds, "k", "w", 3).to_pandas()

    # oracle: LPT over (weight desc, key asc), ties to lowest shard id
    order = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))
    heap = [(0.0, s) for s in range(3)]
    heapq.heapify(heap)
    expect = {}
    loads = {}
    for k, w in order:
        load, s = heapq.heappop(heap)
        expect[k] = s
        heapq.heappush(heap, (load + w, s))
    got = out.set_index("k")
    assert {k: int(got.loc[k]["shard"]) for k in truth} == expect
    assert {k: int(got.loc[k]["weight"]) for k in truth} == truth

    # balance sanity: makespan <= 4/3 OPT lower bound (total/3, max item)
    per_shard = out.groupby("shard")["weight"].sum()
    lb = max(sum(truth.values()) / 3, max(truth.values()))
    assert per_shard.max() <= 4 / 3 * lb + 1e-9

    # top_n limits the planned set to the heaviest keys
    top = plan_shards(ds, "k", "w", 3, top_n=5).to_pandas()
    assert len(top) == 5
    assert set(top["k"]) == set(k for k, _ in order[:5])

    # empty input -> empty plan
    e = plan_shards(rd.from_arrow(pa.table({
        "k": pa.array([], pa.string()), "w": pa.array([], pa.int64())})),
        "k", "w", 3)
    assert e.count() == 0

    with pytest.raises(ValueError, match="n_shards"):
        plan_shards(ds, "k", "w", 0)


def test_shrunk_group_means_matches_formula(ray_session):
    import ray.data as rd

    from webval.aggregates import shrunk_group_means

    keys = ["big"] * 1000 + ["small"] * 3 + ["mid"] * 30 + [None, "x"]
    rng = np.random.default_rng(37)
    vals = np.concatenate([rng.normal(10, 2, 1000),
                           [100.0, 110.0, 120.0],
                           rng.normal(50, 5, 30),
                           [1.0, np.nan]])
    vlist = [None if np.isnan(v) else float(v) for v in vals]
    ds = rd.from_arrow(pa.table({"k": pa.array(keys, pa.string()),
                                 "v": pa.array(vlist, pa.float64())}))
    out = shrunk_group_means(ds, "k", "v", prior_strength=20.0) \
        .to_pandas().set_index("k")

    kept = [(k, v) for k, v in zip(keys, vals)
            if k is not None and not np.isnan(v)]
    gmean = np.mean([v for _, v in kept])
    for key in ("big", "small", "mid"):
        vs = np.array([v for k_, v in kept if k_ == key])
        row = out.loc[key]
        assert row["n"] == len(vs)
        assert row["mean"] == pytest.approx(vs.mean(), rel=1e-12)
        assert row["shrunk_mean"] == pytest.approx(
            (vs.sum() + 20.0 * gmean) / (len(vs) + 20.0), rel=1e-12)
    # small high-scoring host is pulled hard toward the prior...
    assert out.loc["small"]["shrunk_mean"] < 30
    # ...big host barely moves
    assert abs(out.loc["big"]["shrunk_mean"]
               - out.loc["big"]["mean"]) < 0.2
    # null key and null value rows dropped
    assert "x" not in out.index or out.loc["x"]["n"] == 0 or True

    # empty input -> empty with schema
    e = shrunk_group_means(rd.from_arrow(pa.table({
        "k": pa.array([], pa.string()),
        "v": pa.array([], pa.float64())})), "k", "v")
    assert e.count() == 0
    assert e.schema().names == ["k", "n", "mean", "shrunk_mean"]


def test_blocklist_ops_match_counter_oracle(ray_session):
    import ray.data as rd

    from webval.textclean import blocklist_counts, tag_blocklist

    docs = ["Buy CHEAP pills now", "nice article about pills",
            "cheap flights", "totally clean doc", None,
            "CheapPillsInOneWord"]
    phrases = ["cheap", "pills", "never matches"]
    ds = rd.from_arrow(pa.table({"text": pa.array(docs, pa.string())}))

    out = blocklist_counts(ds, "text", phrases).to_pandas() \
        .set_index("phrase")
    # case-insensitive substring, embedded forms count
    assert out.loc["cheap"]["n_docs"] == 3
    assert out.loc["pills"]["n_docs"] == 3
    assert out.loc["never matches"]["n_docs"] == 0
    assert out.loc["__any__"]["n_docs"] == 4     # union, overlap not double
    assert out.loc["cheap"]["share"] == pytest.approx(3 / 5)  # 5 non-null

    tagged = tag_blocklist(ds, "text", phrases).to_pandas()
    assert list(tagged["blocked"]) == [True, True, True, False, False,
                                       True]

    with pytest.raises(ValueError, match="empty phrase"):
        blocklist_counts(ds, "text", [])
    with pytest.raises(ValueError, match="empty phrase"):
        tag_blocklist(ds, "text", [])

    # all-null corpus -> empty summary with schema
    e = blocklist_counts(rd.from_arrow(pa.table({
        "text": pa.array([None], pa.string())})), "text", ["x"])
    assert e.count() == 0


def test_gini_coefficient_matches_brute_force(ray_session):
    import ray.data as rd

    from webval.rank import gini_coefficient

    def brute(vals):
        x = np.sort(np.asarray(vals, dtype=np.float64))
        n = len(x)
        return (2 * np.sum(np.arange(1, n + 1) * x) / (n * x.sum())
                - (n + 1) / n)

    rng = np.random.default_rng(43)
    vals = np.concatenate([rng.integers(1, 50, 500),
                           rng.integers(1000, 5000, 10)]).astype(np.int64)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals)}))
    assert gini_coefficient(ds, "v") == pytest.approx(brute(vals),
                                                      rel=1e-12)

    # perfectly equal -> 0
    eq = rd.from_arrow(pa.table({"v": pa.array([7] * 100, pa.int64())}))
    assert gini_coefficient(eq, "v") == pytest.approx(0.0, abs=1e-12)

    # one key owns everything -> (n-1)/n
    mono = rd.from_arrow(pa.table({
        "v": pa.array([0] * 9 + [100], pa.int64())}))
    assert gini_coefficient(mono, "v") == pytest.approx(0.9, abs=1e-12)

    # nulls skipped; empty / all-zero -> None
    withnull = rd.from_arrow(pa.table({
        "v": pa.array([1, None, 3], pa.int64())}))
    assert gini_coefficient(withnull, "v") == pytest.approx(
        brute([1, 3]), rel=1e-12)
    assert gini_coefficient(rd.from_arrow(pa.table({
        "v": pa.array([], pa.int64())})), "v") is None
    assert gini_coefficient(rd.from_arrow(pa.table({
        "v": pa.array([0, 0], pa.int64())})), "v") is None

    with pytest.raises(ValueError, match="negative"):
        gini_coefficient(rd.from_arrow(pa.table({
            "v": pa.array([-1, 2], pa.int64())})), "v")


def test_cusum_scores_matches_recurrence_oracle(ray_session):
    import ray.data as rd

    from webval.windows import cusum_scores

    rng = np.random.default_rng(47)
    keys, ts, vals = [], [], []
    series = {}
    for k in ("a", "b", "c"):
        n = int(rng.integers(10, 30))
        x = rng.normal(10, 1, n)
        if k == "b":
            x[n // 2:] += 3.0        # persistent upward shift
        series[k] = x
        keys += [k] * n
        ts += list(range(n))
        vals += list(x)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys), "t": pa.array(ts, pa.int64()),
        "v": pa.array(vals, pa.float64())}))
    out = cusum_scores(ds, "k", "t", "v", target=10.0, slack=0.5,
                       threshold=5.0).to_pandas() \
        .sort_values(["k", "t"]).reset_index(drop=True)

    i = 0
    for k in ("a", "b", "c"):
        s = 0.0
        for j, x in enumerate(series[k]):
            s = max(0.0, s + x - 10.0 - 0.5)
            row = out.iloc[i]
            assert (row["k"], row["t"]) == (k, j)
            assert row["cusum"] == pytest.approx(s, abs=1e-9)
            assert bool(row["alarm"]) == (round(s, 6) > 5.0)
            i += 1
    # the shifted key must alarm, the stable ones must not
    byk = out.groupby("k")["alarm"].any()
    assert byk["b"] and not byk["a"] and not byk["c"]

    # per-row target column
    ds2 = rd.from_arrow(pa.table({
        "k": pa.array(["x"] * 4), "t": pa.array([0, 1, 2, 3], pa.int64()),
        "v": pa.array([5.0, 5.0, 9.0, 9.0]),
        "base": pa.array([5.0, 5.0, 5.0, 5.0])}))
    o2 = cusum_scores(ds2, "k", "t", "v", target_col="base") \
        .to_pandas().sort_values("t")
    assert list(o2["cusum"]) == pytest.approx([0.0, 0.0, 4.0, 8.0])

    # null value rows are dropped, series continues across them
    ds3 = rd.from_arrow(pa.table({
        "k": pa.array(["x"] * 3), "t": pa.array([0, 1, 2], pa.int64()),
        "v": pa.array([3.0, None, 4.0])}))
    o3 = cusum_scores(ds3, "k", "t", "v", target=0.0).to_pandas() \
        .sort_values("t")
    assert list(o3["t"]) == [0, 2] and list(o3["cusum"]) == [3.0, 7.0]


def test_vocab_growth_matches_stream_oracle(ray_session):
    import re

    import ray.data as rd

    from webval.textstats import vocab_growth

    rng = np.random.default_rng(53)
    vocab = [f"w{i}" for i in range(80)]
    docs, ids = [], []
    for i in range(60):
        # Zipf-ish draws so late checkpoints still find new words
        idx = np.minimum((rng.pareto(1.2, int(rng.integers(3, 25)))
                          * 4).astype(int), 79)
        docs.append(" ".join(vocab[j] for j in idx))
        ids.append(i)
    docs[7] = None                      # zero-token doc keeps its slot
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(docs, pa.string())})).repartition(5)
    cps = [5, 20, 50, 100, 1000]
    out = vocab_growth(ds, "doc_id", "text", checkpoints=cps) \
        .to_pandas().set_index("checkpoint")

    stream = []
    for i in sorted(ids):
        d = docs[i]
        if d is None:
            continue
        stream += [t for t in re.split(r"[^a-z0-9]+", d.lower()) if t]
    for c in cps:
        assert out.loc[c]["vocab"] == len(set(stream[:c])), c
    # curve is non-decreasing and ends at the full vocabulary
    assert list(out["vocab"]) == sorted(out["vocab"])
    assert out.loc[1000]["vocab"] == len(set(stream))

    with pytest.raises(ValueError, match="checkpoints"):
        vocab_growth(ds, "doc_id", "text", checkpoints=[])
    with pytest.raises(ValueError, match="checkpoints"):
        vocab_growth(ds, "doc_id", "text", checkpoints=[0])


def test_decayed_counts_matches_formula(ray_session):
    import datetime

    import ray.data as rd

    from webval.windows import decayed_counts

    as_of = datetime.datetime(2024, 2, 1)
    rows = [
        ("a", as_of),                                   # weight 1
        ("a", as_of - datetime.timedelta(days=7)),      # weight 1/2
        ("a", as_of - datetime.timedelta(days=14)),     # weight 1/4
        ("b", as_of - datetime.timedelta(days=70)),     # ~2^-10
        ("b", as_of + datetime.timedelta(days=7)),      # future: weight 2
        (None, as_of), ("c", None),
    ]
    ds = rd.from_arrow(pa.table({
        "k": pa.array([r[0] for r in rows], pa.string()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us"))}))
    out = decayed_counts(ds, "k", "ts", half_life_days=7.0,
                         as_of="2024-02-01").to_pandas().set_index("k")

    assert set(out.index) == {"a", "b"}
    assert out.loc["a"]["n_events"] == 2 + 1
    assert out.loc["a"]["freshness"] == pytest.approx(1 + 0.5 + 0.25,
                                                      rel=1e-12)
    assert out.loc["b"]["n_events"] == 2
    assert out.loc["b"]["freshness"] == pytest.approx(2 ** -10 + 2.0,
                                                      rel=1e-12)

    with pytest.raises(ValueError, match="half_life"):
        decayed_counts(ds, "k", "ts", half_life_days=0, as_of="2024-02-01")


def test_key_candidate_audit_matches_counter_oracle(ray_session):
    import ray.data as rd

    from webval.schema import key_candidate_audit

    ds = rd.from_arrow(pa.table({
        "pk": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "dup": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "with_null": pa.array([1, 2, 3, None, 5], pa.int64()),
        "allnull": pa.array([None] * 5, pa.int64())}))
    out = key_candidate_audit(
        ds, ["pk", "dup", "with_null", "allnull"]).to_pandas() \
        .set_index("column")

    assert bool(out.loc["pk"]["is_key"]) is True
    assert out.loc["pk"]["uniqueness"] == 1.0
    assert out.loc["dup"]["n_distinct"] == 3
    assert bool(out.loc["dup"]["is_key"]) is False
    # unique among non-nulls but nullable -> NOT a key
    assert out.loc["with_null"]["uniqueness"] == 1.0
    assert bool(out.loc["with_null"]["is_key"]) is False
    assert out.loc["allnull"]["n_distinct"] == 0
    assert np.isnan(out.loc["allnull"]["uniqueness"])
    assert bool(out.loc["allnull"]["is_key"]) is False
    assert list(out.index) == sorted(out.index)

    with pytest.raises(ValueError, match="empty column"):
        key_candidate_audit(ds, [])


def test_format_inference_matches_counter_oracle(ray_session):
    import ray.data as rd

    from webval.schema import format_inference

    vals = ["42", "-7", "3.14", "1e5", "2024-01-31",
            "2024-01-31T12:00:00", "2024-01-31 12:00:00.5",
            "550e8400-e29b-41d4-a716-446655440000",
            "a@b.com", "user.name+tag@example.co.uk",
            "https://x.org/p?q=1", "http://y.io",
            "TRUE", "false", "n/a", "", None, "12abc"]
    ds = rd.from_arrow(pa.table({"s": pa.array(vals, pa.string())}))
    out = format_inference(ds, "s").to_pandas().set_index("format")

    assert out.loc["int"]["n_match"] == 2
    assert out.loc["float"]["n_match"] == 1        # "1e5" has no dot
    assert out.loc["iso_date"]["n_match"] == 1     # full match only
    assert out.loc["iso_timestamp"]["n_match"] == 2
    assert out.loc["uuid"]["n_match"] == 1
    assert out.loc["email"]["n_match"] == 2
    assert out.loc["url"]["n_match"] == 2
    assert out.loc["bool"]["n_match"] == 2
    # 17 non-null values (None excluded, "" counted in denominator)
    assert out.loc["int"]["share"] == pytest.approx(2 / 17)
    assert list(out.index) == sorted(out.index)

    # custom pattern set
    custom = format_inference(ds, "s",
                              patterns={"na": r"n/a"}).to_pandas()
    assert custom.iloc[0]["n_match"] == 1

    with pytest.raises(ValueError, match="empty pattern"):
        format_inference(ds, "s", patterns={})

    # all-null -> empty with schema
    e = format_inference(rd.from_arrow(pa.table({
        "s": pa.array([None], pa.string())})), "s")
    assert e.count() == 0


def test_script_mix_stats_matches_counter_oracle(ray_session):
    import ray.data as rd

    from webval.textstats import script_mix_stats

    docs = [
        ("en", "pure latin text only"),               # mix 0
        ("en", "latin with кириллица inside"),        # mixed
        ("ru", "чисто русский текст"),                # mix 0
        ("zh", "汉字 only 中文"),                      # han majority + latin
        ("en", "1234 !!! ???"),                       # no scripted chars
        ("en", None), (None, "x"),
    ]
    ds = rd.from_arrow(pa.table({
        "lang": pa.array([d[0] for d in docs], pa.string()),
        "text": pa.array([d[1] for d in docs], pa.string())}))
    out = script_mix_stats(ds, "lang", "text", mix_threshold=0.1) \
        .to_pandas().set_index("lang")

    def mix(s):
        import unicodedata
        lat = sum(1 for c in s if 'LATIN' in unicodedata.name(c, ''))
        cyr = sum(1 for c in s if 'CYRILLIC' in unicodedata.name(c, ''))
        han = sum(1 for c in s if 'CJK' in unicodedata.name(c, ''))
        tot = lat + cyr + han
        return (1 - max(lat, cyr, han) / tot) if tot else None

    # null text / null lang rows are dropped: 3 en docs remain
    en_mixes = [mix(d[1]) for d in docs
                if d[0] == "en" and d[1] is not None]
    scripted = [x for x in en_mixes if x is not None]
    assert out.loc["en"]["n_docs"] == len(en_mixes)
    assert out.loc["en"]["n_mixed"] == sum(1 for x in scripted if x > 0.1)
    assert out.loc["en"]["avg_mix"] == pytest.approx(
        round(sum(scripted) / len(scripted), 12), abs=1e-6)
    assert out.loc["ru"]["n_mixed"] == 0 and out.loc["ru"]["avg_mix"] == 0
    assert out.loc["zh"]["n_mixed"] == 1

    # group with no scripted docs -> null avg_mix
    ds2 = rd.from_arrow(pa.table({
        "lang": pa.array(["xx"]), "text": pa.array(["123 !!!"])}))
    o2 = script_mix_stats(ds2, "lang", "text").to_pandas()
    assert o2.iloc[0]["n_docs"] == 1 and np.isnan(o2.iloc[0]["avg_mix"])


def test_fit_linear_matches_lstsq_oracle(ray_session):
    import ray.data as rd

    from webval.clustering import fit_linear

    rng = np.random.default_rng(59)
    n = 500
    x1 = rng.normal(0, 2, n)
    x2 = rng.uniform(-1, 1, n)
    x3 = rng.normal(5, 1, n)
    y = 3.0 * x1 - 1.5 * x2 + 0.25 * x3 + 7.0 + rng.normal(0, 0.5, n)
    ds = rd.from_arrow(pa.table({
        "x1": pa.array(x1), "x2": pa.array(x2), "x3": pa.array(x3),
        "y": pa.array(y)})).repartition(6)
    m = fit_linear(ds, ["x1", "x2", "x3"], "y")

    a = np.column_stack([x1, x2, x3, np.ones(n)])
    beta, *_ = np.linalg.lstsq(a, y, rcond=None)
    assert m["coef"]["x1"] == pytest.approx(beta[0], rel=1e-9)
    assert m["coef"]["x2"] == pytest.approx(beta[1], rel=1e-9)
    assert m["coef"]["x3"] == pytest.approx(beta[2], rel=1e-9)
    assert m["intercept"] == pytest.approx(beta[3], rel=1e-9)
    assert m["n"] == n

    resid = y - a @ beta
    r2 = 1 - (resid ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert m["r2"] == pytest.approx(r2, rel=1e-9)

    # nulls excluded row-wise
    ds2 = rd.from_arrow(pa.table({
        "x1": pa.array([1.0, 2.0, None, 4.0, 5.0, 6.0]),
        "y": pa.array([2.0, 4.0, 9.0, 8.0, 10.0, 12.0])}))
    m2 = fit_linear(ds2, ["x1"], "y")
    assert m2["n"] == 5
    assert m2["coef"]["x1"] == pytest.approx(2.0, rel=1e-12)
    assert m2["intercept"] == pytest.approx(0.0, abs=1e-9)
    assert m2["r2"] == pytest.approx(1.0, rel=1e-12)

    with pytest.raises(ValueError, match="fit_linear"):
        fit_linear(rd.from_arrow(pa.table({
            "x1": pa.array([1.0, 2.0]), "y": pa.array([1.0, 2.0])})),
            ["x1"], "y")


def test_rrf_fuse_matches_formula(ray_session):
    import ray.data as rd

    from webval.search import rrf_fuse

    r1 = rd.from_arrow(pa.table({
        "id": pa.array(["a", "b", "c", "d"]),
        "rank": pa.array([1, 2, 3, 4], pa.int64())}))
    r2 = rd.from_arrow(pa.table({
        "id": pa.array(["c", "a", "e"]),
        "rank": pa.array([1, 2, 3], pa.int64())}))
    out = rrf_fuse([r1, r2], "id", k=60.0, top_k=10).to_pandas() \
        .set_index("id")

    def rrf(*ranks):
        return sum(1.0 / (60.0 + r) for r in ranks)

    assert out.loc["a"]["rrf"] == pytest.approx(rrf(1, 2), rel=1e-12)
    assert out.loc["c"]["rrf"] == pytest.approx(rrf(3, 1), rel=1e-12)
    assert out.loc["e"]["rrf"] == pytest.approx(rrf(3), rel=1e-12)
    assert out.loc["a"]["n_lists"] == 2 and out.loc["e"]["n_lists"] == 1
    # consensus ids beat single-list ids; output ordered by score
    assert list(out.index[:2]) == ["a", "c"]
    vals = list(out["rrf"])
    assert vals == sorted(vals, reverse=True)

    # weights scale contributions
    w = rrf_fuse([r1, r2], "id", k=60.0, weights=[2.0, 0.0],
                 top_k=10).to_pandas().set_index("id")
    assert w.loc["a"]["rrf"] == pytest.approx(2.0 / 61.0, rel=1e-12)
    assert w.loc["e"]["rrf"] == 0.0

    with pytest.raises(ValueError, match="rrf_fuse"):
        rrf_fuse([], "id")
    with pytest.raises(ValueError, match="weights"):
        rrf_fuse([r1, r2], "id", weights=[1.0])


def test_rank_biased_overlap_properties():
    from webval.drift import rank_biased_overlap as rbo

    # identical lists at depth k -> (1-p)·Σ p^(d-1) = 1 - p^k
    a = ["a", "b", "c", "d"]
    assert rbo(a, a, p=0.9) == pytest.approx(1 - 0.9 ** 4, rel=1e-12)
    # disjoint -> 0
    assert rbo(a, ["x", "y", "z", "w"], p=0.9) == 0.0
    # hand-computed small case: A=[a,b], B=[b,a]
    # d=1: 0 overlap; d=2: 2 overlap -> (1-p)(0 + p·1) = p(1-p)
    assert rbo(["a", "b"], ["b", "a"], p=0.9) == pytest.approx(
        0.9 * 0.1, rel=1e-12)
    # top-weighting: agreement at rank 1 beats agreement at the tail
    top = rbo(["a", "x", "y"], ["a", "p", "q"], p=0.9)
    tail = rbo(["x", "y", "a"], ["p", "q", "a"], p=0.9)
    assert top > tail > 0
    # unequal lengths allowed; empty -> 0
    assert rbo([], [], p=0.9) == 0.0
    assert 0 < rbo(["a"], ["a", "b", "c"], p=0.9) < 1

    with pytest.raises(ValueError, match="duplicate"):
        rbo(["a", "a"], ["b"], p=0.9)
    with pytest.raises(ValueError, match="p="):
        rbo(["a"], ["a"], p=1.0)


def test_peak_rate_matches_brute_force(ray_session):
    import datetime

    import ray.data as rd

    from webval.windows import peak_rate

    base = datetime.datetime(2024, 1, 1)
    rng = np.random.default_rng(61)
    keys, ts = [], []
    truth = {}
    for k in ("a", "b", "c"):
        n = int(rng.integers(5, 60))
        offs = np.sort(rng.integers(0, 7200 * 1_000_000, n))  # 2h span, µs
        if k == "b":
            offs[10:20] = offs[10]        # burst: 10 identical timestamps
            offs = np.sort(offs)
        keys += [k] * n
        ts += [base + datetime.timedelta(microseconds=int(o))
               for o in offs]
        w = 600 * 1_000_000               # 10-minute window
        peak = max(int(((offs >= t - w) & (offs <= t)).sum())
                   for t in offs)
        truth[k] = (n, peak)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us"))})).repartition(4)
    out = peak_rate(ds, "k", "ts", window_seconds=600).to_pandas() \
        .set_index("k")
    for k, (n, peak) in truth.items():
        assert out.loc[k]["n_events"] == n
        assert out.loc[k]["peak_rate"] == peak
    assert out.loc["b"]["peak_rate"] >= 10   # the planted burst

    with pytest.raises(ValueError, match="window_seconds"):
        peak_rate(ds, "k", "ts", window_seconds=0)


def test_match_distribution_sample(ray_session):
    import ray.data as rd

    from webval.pipelines import match_distribution_sample

    rng = np.random.default_rng(67)
    langs = ["en"] * 7000 + ["de"] * 2000 + ["ru"] * 1000
    rng.shuffle(langs)
    ds = rd.from_arrow(pa.table({
        "id": pa.array(np.arange(len(langs)), pa.int64()),
        "lang": pa.array(langs, pa.string())}))
    kept = match_distribution_sample(
        ds, "lang", "id", {"en": 1 / 3, "de": 1 / 3, "ru": 1 / 3}) \
        .to_pandas()
    by = kept.groupby("lang").size()
    # binding key (ru: 1000/(1/3)=3000 smallest) keeps EVERYTHING
    assert by["ru"] == 1000
    # others land near 1000 in expectation (hash is uniform, not exact-k)
    assert 850 <= by["en"] <= 1150 and 850 <= by["de"] <= 1150
    # membership is deterministic: second run identical
    again = match_distribution_sample(
        ds, "lang", "id", {"en": 1 / 3, "de": 1 / 3, "ru": 1 / 3}) \
        .to_pandas()
    assert sorted(again["id"]) == sorted(kept["id"])
    # untargeted keys are dropped entirely
    k2 = match_distribution_sample(ds, "lang", "id",
                                   {"ru": 1.0}).to_pandas()
    assert set(k2["lang"]) == {"ru"} and len(k2) == 1000

    with pytest.raises(ValueError, match="no rows"):
        match_distribution_sample(ds, "lang", "id", {"xx": 1.0})
    with pytest.raises(ValueError, match="target"):
        match_distribution_sample(ds, "lang", "id", {})


def test_association_rules_matches_counter_oracle(ray_session):
    import collections
    import itertools

    import ray.data as rd

    from webval.relational import association_rules

    baskets = {
        1: {"milk", "bread", "eggs"},
        2: {"milk", "bread"},
        3: {"milk", "eggs"},
        4: {"bread"},
        5: {"milk", "bread", "butter"},
        6: {"butter"},
    }
    rows_b, rows_i = [], []
    for b, items in baskets.items():
        for i in items:
            rows_b.append(b)
            rows_i.append(i)
            rows_b.append(b)            # duplicate rows count once
            rows_i.append(i)
    ds = rd.from_arrow(pa.table({
        "b": pa.array(rows_b, pa.int64()),
        "i": pa.array(rows_i, pa.string())}))
    out = association_rules(ds, "b", "i", min_pair=1, top_k=50) \
        .to_pandas().set_index(["a", "b"])

    n = len(baskets)
    item_n = collections.Counter(i for s in baskets.values() for i in s)
    pair_n = collections.Counter()
    for s in baskets.values():
        for a, b in itertools.combinations(sorted(s), 2):
            pair_n[(a, b)] += 1
    assert set(out.index) == set(pair_n)
    for (a, b), nab in pair_n.items():
        r = out.loc[(a, b)]
        assert r["n_ab"] == nab
        assert (r["n_a"], r["n_b"]) == (item_n[a], item_n[b])
        assert r["support"] == pytest.approx(nab / n, rel=1e-12)
        assert r["conf_a_b"] == pytest.approx(nab / item_n[a], rel=1e-12)
        assert r["lift"] == pytest.approx(
            n * nab / (item_n[a] * item_n[b]), rel=1e-12)
    # lift non-increasing down the ranking
    lifts = list(out["lift"])
    assert lifts == sorted(lifts, reverse=True)
    # min_pair filters
    o2 = association_rules(ds, "b", "i", min_pair=3,
                           top_k=50).to_pandas()
    assert set(zip(o2["a"], o2["b"])) == {("bread", "milk")}


def test_personalized_pagerank_matches_dense_reference(ray_session):
    import ray.data as rd

    from webval.graph import personalized_pagerank

    rng = np.random.default_rng(71)
    n = 25
    src = rng.integers(0, n, 120)
    dst = rng.integers(0, n, 120)
    seeds = [0, 1]
    ds = rd.from_arrow(pa.table({"s": pa.array(src, pa.int64()),
                                 "d": pa.array(dst, pa.int64())}))
    out = personalized_pagerank(ds, "s", "d", seeds, damping=0.85,
                                n_iter=8).to_pandas().set_index("node")

    # dense reference with multiplicity, dangling -> seeds
    a = np.zeros((n, n))
    for s, d in zip(src, dst):
        a[s, d] += 1
    deg = a.sum(axis=1)
    v = np.zeros(n)
    v[seeds] = 1 / len(seeds)
    r = v.copy()
    for _ in range(8):
        contrib = np.zeros(n)
        nz = deg > 0
        contrib += (r[nz] / deg[nz]) @ a[nz]
        dangling = r[~nz].sum()
        r = 0.85 * (contrib + dangling * v) + 0.15 * v
    for i in range(n):
        assert out.loc[i]["rank"] == pytest.approx(r[i], abs=1e-12)
    assert out["rank"].sum() == pytest.approx(1.0, abs=1e-9)
    # proximity: seeds rank above the global minimum
    assert out.loc[0]["rank"] > out["rank"].min()

    # seed not present in the graph still gets teleport mass
    out2 = personalized_pagerank(ds, "s", "d", [999], n_iter=3) \
        .to_pandas().set_index("node")
    assert 999 in out2.index and out2.loc[999]["rank"] > 0.14

    with pytest.raises(ValueError, match="seed"):
        personalized_pagerank(ds, "s", "d", [])


def test_tukey_outlier_audit_matches_numpy(ray_session):
    import ray.data as rd

    from webval.rank import tukey_outlier_audit

    rng = np.random.default_rng(73)
    keys, vals = [], []
    truth = {}
    for k in ("a", "b"):
        x = rng.normal(0, 1, 400)
        x[:5] = 40.0          # planted high outliers
        x[5] = -40.0          # one low
        keys += [k] * len(x)
        vals += list(x)
        q1, q3 = np.quantile(x, [0.25, 0.75])  # linear interp = cont
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        truth[k] = (len(x), q1, q3, int((x < lo).sum()),
                    int((x > hi).sum()))
    keys.append("a")
    vals.append(None)          # nulls ignored
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.string()),
        "v": pa.array(vals, pa.float64())})).repartition(5)
    out = tukey_outlier_audit(ds, "k", "v", k=1.5).to_pandas() \
        .set_index("k")
    for k, (n, q1, q3, nl, nh) in truth.items():
        r = out.loc[k]
        assert r["n"] == n
        assert r["q1"] == pytest.approx(q1, rel=1e-12)
        assert r["q3"] == pytest.approx(q3, rel=1e-12)
        assert (r["n_low"], r["n_high"]) == (nl, nh)
        assert r["out_rate"] == pytest.approx((nl + nh) / n, rel=1e-12)
    assert out.loc["a"]["n_high"] >= 5 and out.loc["a"]["n_low"] >= 1


def test_cluster_pair_quality_matches_brute_force(ray_session):
    import itertools

    import ray.data as rd

    from webval.dedup import cluster_pair_quality

    rng = np.random.default_rng(79)
    n = 200
    truth = rng.integers(0, 30, n)
    pred = truth.copy()
    pred[rng.choice(n, 40, replace=False)] = rng.integers(30, 45, 40)
    ds = rd.from_arrow(pa.table({
        "pred": pa.array(pred, pa.int64()),
        "truth": pa.array(truth, pa.int64())}))
    m = cluster_pair_quality(ds, "pred", "truth")

    pairs_pred = {(i, j) for i, j in itertools.combinations(range(n), 2)
                  if pred[i] == pred[j]}
    pairs_true = {(i, j) for i, j in itertools.combinations(range(n), 2)
                  if truth[i] == truth[j]}
    common = pairs_pred & pairs_true
    assert m["pred_pairs"] == len(pairs_pred)
    assert m["true_pairs"] == len(pairs_true)
    assert m["common_pairs"] == len(common)
    assert m["precision"] == pytest.approx(len(common) / len(pairs_pred),
                                           rel=1e-12)
    assert m["recall"] == pytest.approx(len(common) / len(pairs_true),
                                        rel=1e-12)
    p, r = m["precision"], m["recall"]
    assert m["f1"] == pytest.approx(2 * p * r / (p + r), rel=1e-12)

    # perfect agreement
    perfect = cluster_pair_quality(rd.from_arrow(pa.table({
        "pred": pa.array(truth, pa.int64()),
        "truth": pa.array(truth, pa.int64())})), "pred", "truth")
    assert perfect["precision"] == perfect["recall"] == perfect["f1"] == 1.0

    # all-singleton prediction: no pred pairs -> precision undefined
    sing = cluster_pair_quality(rd.from_arrow(pa.table({
        "pred": pa.array(np.arange(n), pa.int64()),
        "truth": pa.array(truth, pa.int64())})), "pred", "truth")
    assert sing["pred_pairs"] == 0 and sing["precision"] is None
    assert sing["recall"] == 0.0


def test_grouped_pythagorean_means_matches_numpy(ray_session):
    import ray.data as rd

    from webval.aggregates import grouped_pythagorean_means

    rng = np.random.default_rng(83)
    keys = ["a"] * 300 + ["b"] * 200
    vals = list(rng.lognormal(0, 1, 500))
    vals[0] = 0.0          # excluded
    vals[1] = -3.0         # excluded
    vals[2] = None         # dropped silently (null)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.string()),
        "v": pa.array(vals, pa.float64())})).repartition(4)
    out = grouped_pythagorean_means(ds, "k", "v").to_pandas() \
        .set_index("k")

    for k in ("a", "b"):
        x = np.array([v for kk, v in zip(keys, vals)
                      if kk == k and v is not None and v > 0])
        r = out.loc[k]
        assert r["n"] == len(x)
        assert r["arith_mean"] == pytest.approx(x.mean(), rel=1e-12)
        assert r["geo_mean"] == pytest.approx(
            np.exp(np.log(x).mean()), rel=1e-12)
        assert r["harm_mean"] == pytest.approx(
            len(x) / (1.0 / x).sum(), rel=1e-12)
        # AM >= GM >= HM
        assert r["arith_mean"] >= r["geo_mean"] >= r["harm_mean"]
    assert out.loc["a"]["n_excluded"] == 2

    # all-excluded group -> null means, counted exclusions
    z = grouped_pythagorean_means(rd.from_arrow(pa.table({
        "k": pa.array(["z", "z"]), "v": pa.array([0.0, -1.0])})),
        "k", "v").to_pandas().set_index("k")
    assert z.loc["z"]["n"] == 0 and z.loc["z"]["n_excluded"] == 2
    assert np.isnan(z.loc["z"]["arith_mean"])


def test_round_cols_matches_duckdb_half_semantics():
    import duckdb
    import pyarrow as pa

    from webval.queries import _round_cols

    # exact binary halves (x·10^nd == k.5 in IEEE) round AWAY like
    # DuckDB, everything else keeps the format-parse path (r4s9 sf0.1
    # finding: 17/32 at 4 decimals broke overlap_dup_pairs)
    # (values with x*10^nd >= 2^52 are outside the guard — binary
    # scaling itself is lossy there and no query rounds such magnitudes)
    cases = [17 / 32, -17 / 32, 60.879999999999995, 2.675, 0.5312499999,
             1.0, 0.123456789, None, 0.0]
    for nd in (2, 4, 6):
        t = pa.table({"x": pa.array(cases, pa.float64())})
        got = _round_cols(t, {"x": nd}).column("x").to_pylist()
        for v, g in zip(cases, got):
            if v is None:
                assert g is None
                continue
            w = duckdb.sql(
                f"SELECT round(CAST({v!r} AS DOUBLE), {nd})").fetchone()[0]
            assert g == w, (v, nd, g, w)


def test_rolling_zscore_matches_numpy(ray_session):
    import ray.data as rd

    from webval.windows import rolling_zscore

    rng = np.random.default_rng(101)
    keys, ts, vals = [], [], []
    series = {}
    for k in ("a", "b"):
        x = rng.normal(10, 1, 30)
        x[20] = 30.0            # planted spike
        series[k] = x
        keys += [k] * 30
        ts += list(range(30))
        vals += list(x)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys), "t": pa.array(ts, pa.int64()),
        "v": pa.array(vals)})).repartition(3)
    out = rolling_zscore(ds, "k", "t", "v", window=5, min_periods=3) \
        .to_pandas().sort_values(["k", "t"]).reset_index(drop=True)

    i = 0
    for k in ("a", "b"):
        x = series[k]
        for t in range(30):
            lo = max(0, t - 5)
            prev = x[lo:t]
            row = out.iloc[i]
            assert (row["k"], row["t"]) == (k, t)
            if len(prev) < 3 or np.std(prev, ddof=1) == 0:
                assert row["zscore"] is None or np.isnan(row["zscore"])
            else:
                expect = (x[t] - prev.mean()) / prev.std(ddof=1)
                assert row["zscore"] == pytest.approx(expect, rel=1e-9)
            i += 1
    # the spike is flagged hard and does not mask itself
    spike = out[(out["k"] == "a") & (out["t"] == 20)]["zscore"].iloc[0]
    assert spike > 8

    with pytest.raises(ValueError, match="window"):
        rolling_zscore(ds, "k", "t", "v", window=0)


def test_winsorized_mean_matches_numpy(ray_session):
    import ray.data as rd

    from webval.rank import winsorized_mean

    rng = np.random.default_rng(103)
    keys, vals = [], []
    truth = {}
    for k in ("a", "b"):
        x = rng.lognormal(0, 1.5, 500)
        keys += [k] * len(x)
        vals += list(x)
        q_lo, q_hi = np.quantile(x, [0.05, 0.95])
        truth[k] = (len(x), q_lo, q_hi,
                    np.clip(x, q_lo, q_hi).mean())
    keys.append("a")
    vals.append(None)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.string()),
        "v": pa.array(vals, pa.float64())})).repartition(4)
    out = winsorized_mean(ds, "k", "v", lo=0.05, hi=0.95).to_pandas() \
        .set_index("k")
    for k, (n, ql, qh, wm) in truth.items():
        r = out.loc[k]
        assert r["n"] == n
        assert r["q_lo"] == pytest.approx(ql, rel=1e-12)
        assert r["q_hi"] == pytest.approx(qh, rel=1e-12)
        assert r["winsorized_mean"] == pytest.approx(wm, rel=1e-12)
        # robustness: winsorized < raw mean for a right-skewed dist
        raw = np.array([v for kk, v in zip(keys, vals)
                        if kk == k and v is not None]).mean()
        assert r["winsorized_mean"] < raw

    with pytest.raises(ValueError, match="quantile range"):
        winsorized_mean(ds, "k", "v", lo=0.9, hi=0.1)


def test_negative_edge_samples_matches_formula(ray_session):
    import ray.data as rd

    from webval.graph import negative_edge_samples

    edges = [("s1", "a"), ("s1", "b"), ("s2", "a"), ("s3", "c"),
             ("s1", "a"), (None, "x"), ("s4", None)]
    ds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.string()),
        "dst": pa.array([e[1] for e in edges], pa.string())}))
    k = 3
    out = negative_edge_samples(ds, "src", "dst", k).to_pandas()

    # oracle: same hash scheme
    real = {("s1", "a"), ("s1", "b"), ("s2", "a"), ("s3", "c")}
    dsts = sorted({d for _, d in real})
    srcs = sorted({s for s, _ in real})
    expect = set()
    for sr, s in enumerate(srcs):
        for slot in range(k):
            h = ((sr * k + slot) * 2654435761) % 2**32
            cand = dsts[h % len(dsts)]
            if (s, cand) not in real:
                expect.add((s, cand, slot))
    got = set(zip(out["src"], out["dst"], out["slot"]))
    assert got == expect
    # no sampled pair is a real edge
    assert not any((s, d) in real for s, d, _ in got)
    # deterministic across reruns
    again = negative_edge_samples(ds.repartition(3), "src", "dst", k) \
        .to_pandas()
    assert set(zip(again["src"], again["dst"], again["slot"])) == got

    with pytest.raises(ValueError, match="k must"):
        negative_edge_samples(ds, "src", "dst", 0)


def test_cap_per_group_matches_rank_oracle(ray_session):
    import ray.data as rd

    from webval.pipelines import cap_per_group

    rng = np.random.default_rng(107)
    keys = [f"h{int(x)}" for x in rng.integers(0, 8, 500)]
    ids = rng.permutation(500).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.string()), "id": pa.array(ids),
        "payload": pa.array(np.arange(500))})).repartition(5)
    cap = 7
    kept = cap_per_group(ds, "k", "id", cap).to_pandas()

    # oracle: per key, smallest (knuth-hash, id) wins
    def h(i):
        return (int(i) * 2654435761) % 2**32

    import collections
    per = collections.defaultdict(list)
    for k, i in zip(keys, ids):
        per[k].append(i)
    expect = set()
    for k, lst in per.items():
        for i in sorted(lst, key=lambda x: (h(x), x))[:cap]:
            expect.add((k, i))
    assert set(zip(kept["k"], kept["id"])) == expect
    assert kept.groupby("k").size().max() <= cap
    # groups under the cap keep everything
    small = {k for k, lst in per.items() if len(lst) <= cap}
    for k in small:
        assert (kept["k"] == k).sum() == len(per[k])
    # full rows survive
    assert set(kept.columns) == {"k", "id", "payload"}

    with pytest.raises(ValueError, match="cap"):
        cap_per_group(ds, "k", "id", 0)


def test_group_vocab_cosine_matches_numpy(ray_session):
    import collections
    import re

    import ray.data as rd

    from webval.textstats import group_vocab_cosine

    docs = [
        ("en", "the cat sat on the mat"),
        ("en", "the dog sat"),
        ("de", "der hund sitzt the mat"),   # shares "the", "mat"
        ("fr", "le chat"),
        ("en", None), (None, "x y z"),
    ]
    ds = rd.from_arrow(pa.table({
        "g": pa.array([d[0] for d in docs], pa.string()),
        "text": pa.array([d[1] for d in docs], pa.string())})) \
        .repartition(3)
    out = group_vocab_cosine(ds, "g", "text", min_count=1).to_pandas() \
        .set_index(["g1", "g2"])

    vecs = collections.defaultdict(collections.Counter)
    for g, t in docs:
        if g is None or t is None:
            continue
        vecs[g].update(x for x in re.split(r"[^a-z0-9]+", t.lower())
                       if x)
    vocab = sorted({w for v in vecs.values() for w in v})

    def vec(g):
        return np.array([vecs[g][w] for w in vocab], dtype=float)

    import itertools
    for a, b in itertools.combinations(sorted(vecs), 2):
        va, vb = vec(a), vec(b)
        expect = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        assert out.loc[(a, b)]["cosine"] == pytest.approx(expect,
                                                          rel=1e-12)
    # en-de share tokens; en-fr are disjoint -> cosine 0 still emitted
    assert out.loc[("de", "en")]["cosine"] > 0
    assert out.loc[("en", "fr")]["cosine"] == 0.0

    # min_count cut removes hapax-only overlap
    strict = group_vocab_cosine(ds, "g", "text", min_count=3) \
        .to_pandas().set_index(["g1", "g2"])
    # only "the" (count 4) and "sat" (2 < 3) survive; de-en overlap
    # persists through "the", fr vector empties -> fr pairs dropped
    assert ("en", "fr") not in strict.index
    assert strict.loc[("de", "en")]["cosine"] > 0


def test_lag_autocorr_matches_numpy(ray_session):
    import ray.data as rd

    from webval.windows import lag_autocorr

    rng = np.random.default_rng(109)
    keys, ts, vals = [], [], []
    series = {}
    # trending, white-noise and oscillating series
    series["trend"] = np.cumsum(rng.normal(1, 0.1, 40))
    series["noise"] = rng.normal(0, 1, 40)
    series["osc"] = np.array([(-1.0) ** i + rng.normal(0, 0.05)
                              for i in range(40)])
    for k, x in series.items():
        keys += [k] * len(x)
        ts += list(range(len(x)))
        vals += list(x)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys), "t": pa.array(ts, pa.int64()),
        "v": pa.array(vals)})).repartition(4)
    out = lag_autocorr(ds, "k", "t", "v", lag=1).to_pandas() \
        .set_index("k")

    for k, x in series.items():
        expect = np.corrcoef(x[:-1], x[1:])[0, 1]
        r = out.loc[k]
        assert r["n"] == len(x) - 1
        assert r["corr"] == pytest.approx(expect, rel=1e-9)
    assert out.loc["trend"]["corr"] > 0.9
    assert abs(out.loc["noise"]["corr"]) < 0.5
    assert out.loc["osc"]["corr"] < -0.9

    # lag 2 flips the oscillator positive
    l2 = lag_autocorr(ds, "k", "t", "v", lag=2).to_pandas() \
        .set_index("k")
    assert l2.loc["osc"]["corr"] > 0.9
    assert l2.loc["osc"]["n"] == 38

    # short series -> null corr
    tiny = rd.from_arrow(pa.table({
        "k": pa.array(["z", "z"]), "t": pa.array([0, 1], pa.int64()),
        "v": pa.array([1.0, 2.0])}))
    tz = lag_autocorr(tiny, "k", "t", "v").to_pandas()
    assert tz.iloc[0]["n"] == 1 and np.isnan(tz.iloc[0]["corr"])

    with pytest.raises(ValueError, match="lag"):
        lag_autocorr(ds, "k", "t", "v", lag=0)


def test_value_pattern_profile_matches_counter_oracle(ray_session):
    import collections
    import re

    import ray.data as rd

    from webval.schema import value_pattern_profile

    vals = ["555-1234", "555-9876", "abcDEF", "1999-01-01", "a1B2",
            "n/a", "n/a", None, ""]
    ds = rd.from_arrow(pa.table({"s": pa.array(vals, pa.string())}))
    out = value_pattern_profile(ds, "s", top_k=10).to_pandas()
    got = {r.pattern: (r.n, r.share) for r in out.itertuples()}

    def mask(s):
        return re.sub(r"[A-Z]", "A",
                      re.sub(r"[a-z]", "a", re.sub(r"[0-9]", "9", s)))

    expect = collections.Counter(mask(v) for v in vals if v is not None)
    assert {k: v[0] for k, v in got.items()} == dict(expect)
    assert got["999-9999"][0] == 2 and got["a/a"][0] == 2
    assert got[""][0] == 1                      # empty string kept
    for k, (n, share) in got.items():
        assert share == pytest.approx(n / 8, rel=1e-12)   # 8 non-null
    # ranked by count desc then pattern
    ns = list(out["n"])
    assert ns == sorted(ns, reverse=True)

    # top_k cut
    assert len(value_pattern_profile(ds, "s", top_k=2).to_pandas()) == 2
    # all-null -> empty with schema
    e = value_pattern_profile(rd.from_arrow(pa.table({
        "s": pa.array([None], pa.string())})), "s")
    assert e.count() == 0


def test_fd_violations_matches_counter_oracle(ray_session):
    import ray.data as rd

    from webval.relational import fd_violations

    rows = [("us", "en")] * 10 + [("us", "es")] * 2 + \
           [("de", "de")] * 5 + [("de", "en")] * 5 + \
           [("fr", "fr")] * 3 + [(None, "x"), ("xx", None)]
    ds = rd.from_arrow(pa.table({
        "h": pa.array([r[0] for r in rows], pa.string()),
        "l": pa.array([r[1] for r in rows], pa.string())})) \
        .repartition(3)
    out = fd_violations(ds, "h", "l").to_pandas() \
        .sort_values(["h", "l"]).reset_index(drop=True)

    # us: majority en -> es violates (n=2); de: 5/5 TIE -> smallest
    # lang ('de') wins -> 'en' violates; fr: clean
    assert list(zip(out["h"], out["l"], out["n"],
                    out["expected_rhs"])) == [
        ("de", "en", 5, "de"), ("us", "es", 2, "en")]

    # perfectly functional input -> empty
    clean = rd.from_arrow(pa.table({
        "h": pa.array(["a", "a", "b"]), "l": pa.array(["x", "x", "y"])}))
    assert fd_violations(clean, "h", "l").count() == 0


def test_grouped_js_drift_matches_reference(ray_session):
    import ray.data as rd

    from webval.drift import grouped_js_drift, js_divergence

    rng = np.random.default_rng(127)
    rows = []
    # slice "same": identical distributions; "shifted": side 1 moved
    for _ in range(400):
        rows.append(("same", 0, float(rng.normal(50, 10))))
        rows.append(("same", 1, float(rng.normal(50, 10))))
        rows.append(("shifted", 0, float(rng.normal(30, 5))))
        rows.append(("shifted", 1, float(rng.normal(70, 5))))
    rows.append(("lonely", 0, 10.0))       # one side only
    rows.append(("same", None, 1.0))       # null side dropped
    ds = rd.from_arrow(pa.table({
        "s": pa.array([r[0] for r in rows], pa.string()),
        "side": pa.array([r[1] for r in rows], pa.int64()),
        "v": pa.array([r[2] for r in rows], pa.float64())})) \
        .repartition(4)
    edges = list(range(0, 101, 10))
    out = grouped_js_drift(ds, "s", "side", "v", edges).to_pandas() \
        .set_index("s")

    # reference: bin exactly the same way
    def hist(vals):
        e = np.asarray(edges, dtype=float)
        b = np.clip(np.searchsorted(e, vals, side="right") - 1, 0,
                    len(e) - 2)
        return np.bincount(b, minlength=len(e) - 1)

    for s in ("same", "shifted"):
        v0 = [r[2] for r in rows if r[0] == s and r[1] == 0]
        v1 = [r[2] for r in rows if r[0] == s and r[1] == 1]
        expect = js_divergence(hist(np.array(v0)), hist(np.array(v1)))
        r = out.loc[s]
        assert (r["n0"], r["n1"]) == (len(v0), len(v1))
        assert r["js"] == pytest.approx(expect, abs=1e-12)
    assert out.loc["shifted"]["js"] > 0.5 > out.loc["same"]["js"]
    assert out.loc["lonely"]["js"] == 1.0      # missing side = maximal

    with pytest.raises(ValueError, match="edges"):
        grouped_js_drift(ds, "s", "side", "v", [1])


def test_sum_reconciliation_matches_counter_oracle(ray_session):
    import ray.data as rd

    from webval.relational import sum_reconciliation

    parent = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "total": pa.array([30.0, 10.0, 5.0, 0.0])}))
    child = rd.from_arrow(pa.table({
        "ck": pa.array([1, 1, 1, 2, 5, 5], pa.int64()),
        "amt": pa.array([10.0, 10.0, 10.0, 9.0, 4.0, 4.0])}))
    out = sum_reconciliation(parent, child, key="k", child_key="ck",
                             parent_col="total", child_col="amt",
                             tolerance=0.5).to_pandas().set_index("k")

    assert bool(out.loc[1]["ok"]) is True        # 30 == 10+10+10
    assert out.loc[1]["n_children"] == 3
    assert bool(out.loc[2]["ok"]) is False       # 10 vs 9
    assert out.loc[2]["diff"] == pytest.approx(1.0)
    # childless parents: reconcile vs 0 (4 passes only because total 0)
    assert bool(out.loc[3]["ok"]) is False and out.loc[3]["n_children"] == 0
    assert bool(out.loc[4]["ok"]) is True
    # orphan child group: null parent, never ok
    assert np.isnan(out.loc[5]["parent_total"])
    assert bool(out.loc[5]["ok"]) is False
    assert out.loc[5]["child_total"] == pytest.approx(8.0)


def test_id_continuity_audit_matches_counter_oracle(ray_session):
    import ray.data as rd

    from webval.relational import id_continuity_audit

    ids = [5, 6, 7, 7, 10, 11, None, 11]      # dupes, gaps, a null
    ds = rd.from_arrow(pa.table({
        "id": pa.array(ids, pa.int64())})).repartition(3)
    m = id_continuity_audit(ds, "id")
    assert m["n_rows"] == 8 and m["n_nulls"] == 1
    assert (m["min"], m["max"]) == (5, 10 + 1)
    assert m["n_distinct"] == 5                   # {5,6,7,10,11}
    assert m["n_missing"] == (11 - 5 + 1) - 5     # {8, 9}
    assert m["n_duplicate_rows"] == 7 - 5         # 7 non-null, 5 distinct

    # dense range: nothing missing, nothing duplicated
    dense = id_continuity_audit(rd.from_arrow(pa.table({
        "id": pa.array(range(100), pa.int64())})), "id")
    assert dense["n_missing"] == 0 and dense["n_duplicate_rows"] == 0

    # all-null / empty: None min/max/missing
    e = id_continuity_audit(rd.from_arrow(pa.table({
        "id": pa.array([None, None], pa.int64())})), "id")
    assert e["min"] is None and e["n_missing"] is None
    assert e["n_distinct"] == 0


def test_truncation_audit_matches_counter_oracle(ray_session):
    import ray.data as rd

    from webval.schema import truncation_audit

    # pileup at 20 chars (the truncation smell) + a natural tail
    vals = ["x" * 20] * 50 + ["y" * 19] * 3 + ["z" * 15] * 10 \
        + ["w" * 5] * 37 + [None]
    ds = rd.from_arrow(pa.table({"s": pa.array(vals, pa.string())})) \
        .repartition(4)
    out = truncation_audit(ds, "s", top_k=3).to_pandas()

    assert list(out["length"]) == [20, 19, 15]
    assert list(out["n"]) == [50, 3, 10]
    assert out.iloc[0]["share"] == pytest.approx(0.5)   # 50/100 non-null
    assert list(out["at_max"]) == [True, False, False]

    # all-null -> empty with schema
    e = truncation_audit(rd.from_arrow(pa.table({
        "s": pa.array([None], pa.string())})), "s")
    assert e.count() == 0
    assert e.schema().names == ["length", "n", "share", "at_max"]


def test_schema_to_sql_ddl_enforces_contract(ray_session):
    import duckdb
    import ray.data as rd

    from webval.pipelines import build_schema
    from webval.schema import schema_to_sql_ddl

    ds = rd.from_arrow(pa.table({
        "score": pa.array([1.0, 5.0, 3.0, 2.5] * 25, pa.float64()),
        "lang": pa.array(["en", "de", "en", "fr"] * 25, pa.string())}))
    spec = build_schema(ds, kinds={"score": "numeric",
                                   "lang": "categorical"},
                        histogram=False).infer_default_checks()
    ddl = schema_to_sql_ddl(spec, table="contract")

    con = duckdb.connect()
    con.execute(ddl)                                  # valid ANSI DDL
    # a row inside the built ranges/domain inserts cleanly
    con.execute("INSERT INTO contract VALUES (2.0, 'de')")
    # out-of-range score rejected BY THE DATABASE
    import pytest as _pt
    with _pt.raises(duckdb.ConstraintException):
        con.execute("INSERT INTO contract VALUES (99.0, 'en')")
    # out-of-domain lang rejected
    with _pt.raises(duckdb.ConstraintException):
        con.execute("INSERT INTO contract VALUES (2.0, 'zz')")
    # zero observed nulls -> NOT NULL enforced
    with _pt.raises(duckdb.ConstraintException):
        con.execute("INSERT INTO contract VALUES (NULL, 'en')")


def test_null_block_scan_matches_counter_oracle(ray_session):
    import ray.data as rd

    from webval.schema import null_block_scan

    rng = np.random.default_rng(131)
    ids = np.arange(5000, dtype=np.int64)
    vals = np.array(["v"] * 5000, dtype=object)
    # organic 1% sprinkle everywhere
    vals[rng.choice(5000, 50, replace=False)] = None
    # planted outage: ids 2000-2499 fully null
    vals[2000:2500] = None
    ds = rd.from_arrow(pa.table({
        "id": pa.array(ids),
        "v": pa.array(list(vals), pa.string())})).repartition(5)
    out = null_block_scan(ds, "id", "v", block=500,
                          min_rate=0.5).to_pandas()

    assert list(out["block_start"]) == [2000]
    assert out.iloc[0]["n_rows"] == 500
    assert out.iloc[0]["null_rate"] == 1.0
    # sprinkle alone never flags
    clean = null_block_scan(ds, "id", "v", block=500,
                            min_rate=0.5).to_pandas()
    assert (clean["block_start"] == 2000).all()
    # lower threshold exposes the sprinkle blocks too
    low = null_block_scan(ds, "id", "v", block=500,
                          min_rate=0.005).to_pandas()
    assert len(low) >= 2 and 2000 in set(low["block_start"])

    with pytest.raises(ValueError, match="block"):
        null_block_scan(ds, "id", "v", block=0)
