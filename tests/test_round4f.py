"""Round-4 session-6 operators vs brute-force oracles: rank correlations
(Spearman/Kendall), Theil's U, weighted median, k-core peel, JL sign
projection."""

import collections
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _expand(mat):
    xs, ys = [], []
    for i in range(mat.shape[0]):
        for j in range(mat.shape[1]):
            xs += [i] * int(mat[i, j])
            ys += [j] * int(mat[i, j])
    return np.array(xs, float), np.array(ys, float)


def _midrank(a):
    order = np.argsort(a, kind="stable")
    sa = a[order]
    pos = np.empty(len(a))
    i = 0
    while i < len(a):
        j = i
        while j < len(a) and sa[j] == sa[i]:
            j += 1
        pos[i:j] = (i + 1 + j) / 2.0
        i = j
    ranks = np.empty(len(a))
    ranks[order] = pos
    return ranks


def test_rank_correlations_match_brute_force():
    from webval.drift import rank_correlations

    rng = np.random.default_rng(5)
    for trial in range(120):
        nx, ny = int(rng.integers(1, 6)), int(rng.integers(1, 6))
        mat = rng.integers(0, 5, (nx, ny)).astype(float)
        if mat.sum() == 0:
            continue
        rho, tau, n = rank_correlations(mat)
        xs, ys = _expand(mat)
        assert n == len(xs)
        rx, ry = _midrank(xs), _midrank(ys)
        if rx.std() > 0 and ry.std() > 0:
            assert rho == pytest.approx(np.corrcoef(rx, ry)[0, 1],
                                        abs=1e-10), trial
        else:
            assert math.isnan(rho)
        C = D = 0
        for a in range(len(xs)):
            for b in range(a + 1, len(xs)):
                s = (xs[a] - xs[b]) * (ys[a] - ys[b])
                C += s > 0
                D += s < 0
        n0 = len(xs) * (len(xs) - 1) / 2
        n1 = sum(v * (v - 1) / 2 for v in np.bincount(xs.astype(int)))
        n2 = sum(v * (v - 1) / 2 for v in np.bincount(ys.astype(int)))
        den = (n0 - n1) * (n0 - n2)
        if den > 0:
            assert tau == pytest.approx((C - D) / math.sqrt(den),
                                        abs=1e-10), trial
        else:
            assert math.isnan(tau)


def test_uncertainty_coefficient_properties():
    from webval.drift import uncertainty_coefficient

    # X determines Y exactly -> U = 1
    u, hy, hyx, n = uncertainty_coefficient(np.array([[5, 0], [0, 7]]))
    assert u == pytest.approx(1.0) and hyx == pytest.approx(0.0)
    assert n == 12
    # independence -> U = 0 (joint = product of marginals)
    u, _, _, _ = uncertainty_coefficient(np.array([[4, 8], [2, 4]]))
    assert u == pytest.approx(0.0, abs=1e-12)
    # constant Y -> H(Y)=0 -> NaN
    u, hy, _, _ = uncertainty_coefficient(np.array([[3], [9]]))
    assert math.isnan(u) and hy == 0.0
    # brute entropy check on a random table
    rng = np.random.default_rng(9)
    m = rng.integers(1, 9, (4, 3)).astype(float)
    u, hy, hyx, _ = uncertainty_coefficient(m)
    nn = m.sum()
    py = m.sum(0) / nn
    want_hy = -sum(p * math.log(p) for p in py if p > 0)
    want_hyx = 0.0
    for i in range(4):
        r = m[i].sum()
        for j in range(3):
            if m[i, j] > 0:
                want_hyx -= (m[i, j] / nn) * math.log(m[i, j] / r)
    assert hy == pytest.approx(want_hy)
    assert hyx == pytest.approx(want_hyx)
    assert u == pytest.approx((want_hy - want_hyx) / want_hy)


def test_grouped_weighted_median_matches_pandas(ray_session):
    import ray.data as rd

    from webval.rank import grouped_weighted_median

    rng = np.random.default_rng(13)
    n = 3000
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c", "d"], n),
        "v": rng.integers(0, 25, n).astype(float),
        "w": rng.uniform(0.0, 5.0, n)})
    # nulls must drop
    df.loc[::41, "w"] = np.nan
    df.loc[1::53, "g"] = None
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    out = grouped_weighted_median(ds, "g", "v", "w").to_pandas() \
        .set_index("g")

    clean = df.dropna(subset=["g", "v", "w"])
    for g, grp in clean.groupby("g"):
        vw = grp.groupby("v")["w"].sum().sort_index()
        cum = vw.cumsum()
        tot = vw.sum()
        want = vw.index[(cum >= 0.5 * tot).to_numpy().argmax()]
        assert out.loc[g, "weighted_median"] == want, g
        assert out.loc[g, "total_weight"] == pytest.approx(tot)
    assert set(out.index) == set(clean["g"].unique())


def test_grouped_weighted_median_point_mass(ray_session):
    import ray.data as rd

    from webval.rank import grouped_weighted_median

    # one value holds >half the weight -> it IS the weighted median
    t = pa.table({"g": ["x"] * 4, "v": [1.0, 2.0, 3.0, 4.0],
                  "w": [1.0, 10.0, 1.0, 1.0]})
    out = grouped_weighted_median(rd.from_arrow(t), "g", "v", "w") \
        .to_pandas()
    assert out.loc[0, "weighted_median"] == 2.0


def _peel_oracle(pairs, k):
    adj = collections.defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    while True:
        rm = [n for n, s in adj.items() if len(s) < k]
        if not rm:
            break
        for n in rm:
            for nb in adj[n]:
                adj[nb].discard(n)
            del adj[n]
    return {n: len(s) for n, s in adj.items()}


def test_kcore_matches_peel_oracle(ray_session):
    import ray.data as rd

    from webval.graph import kcore

    rng = np.random.default_rng(17)
    # planted dense cluster + sparse noise, plus self-loops and dupes
    core = [(int(a), int(b)) for a in range(10) for b in range(10)
            if a < b and rng.random() < 0.9]
    noise = [(int(rng.integers(0, 60)), int(rng.integers(0, 60)))
             for _ in range(120)]
    pairs = core + noise + [(3, 3), (0, 1), (1, 0)]
    t = pa.table({"s": pa.array([a for a, _ in pairs], pa.int64()),
                  "d": pa.array([b for _, b in pairs], pa.int64())})
    for k in (2, 4, 6):
        got = kcore(rd.from_arrow(t).repartition(4), "s", "d", k=k,
                    max_iter=30).to_pandas()
        want = _peel_oracle(pairs, k)
        assert dict(zip(got["node"], got["core_degree"])) == want, k


def test_kcore_budget_diagnostic(ray_session):
    import ray.data as rd

    from webval.graph import kcore

    # a long path peels one layer per round: k=2 on a 12-path needs 6
    # rounds, so max_iter=2 must raise the named diagnostic
    pairs = [(i, i + 1) for i in range(12)]
    t = pa.table({"s": pa.array([a for a, _ in pairs], pa.int64()),
                  "d": pa.array([b for _, b in pairs], pa.int64())})
    with pytest.raises(RuntimeError, match="kcore: peel still shrinking"):
        kcore(rd.from_arrow(t), "s", "d", k=2, max_iter=2)


def test_jl_sign_matrix_deterministic_and_mixed():
    from webval.similarity import jl_sign_matrix

    m1 = jl_sign_matrix(64, 16)
    m2 = jl_sign_matrix(64, 16)
    assert np.array_equal(m1, m2)
    assert set(np.unique(np.abs(m1 * math.sqrt(16)))) == {1.0}
    # nonlinear hash: no column is a near-negation of another (the LCG
    # failure mode this replaced)
    c = np.corrcoef(m1.T)
    off = np.abs(c - np.eye(16)).max()
    assert off < 0.9, f"columns correlated {off}: rank collapse"
    # roughly balanced signs
    assert 0.35 < (m1 > 0).mean() < 0.65


def test_jl_project_matches_numpy(ray_session):
    import ray.data as rd

    from webval.similarity import jl_project, jl_sign_matrix

    rng = np.random.default_rng(29)
    n, d, k = 200, 24, 8
    x = rng.normal(size=(n, d)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(x), pa.list_(pa.float32()))})
    out = jl_project(rd.from_arrow(t).repartition(5), "embedding",
                     dim_out=k, id_col="vec_id").to_pandas() \
        .set_index("vec_id").sort_index()
    want = x.astype(np.float64) @ jl_sign_matrix(d, k)
    got = np.stack(out["y"].to_numpy())
    assert np.allclose(got, want, atol=1e-12)
    assert np.allclose(out["norm_in"],
                       np.sqrt((x.astype(np.float64) ** 2).sum(1)))
    assert np.allclose(out["norm_out"], np.sqrt((want ** 2).sum(1)))
    # JL sanity: mean squared-norm ratio near 1
    ratio = (out["norm_out"] / out["norm_in"]) ** 2
    assert 0.7 < ratio.mean() < 1.3
