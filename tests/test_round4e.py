"""Round-4 session-5 operators vs brute-force oracles: BH FDR selection,
2-D Pareto frontier, type-token richness, inter-arrival burstiness,
Markov sequence NLL."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

US = 1_000_000


def _bh_brute(p, q):
    """Literal step-up definition: largest k with p_(k) <= k q/m."""
    p = np.asarray(p, float)
    m = len(p)
    order = np.argsort(p, kind="stable")
    k = 0
    for i in range(m):
        if p[order[i]] <= (i + 1) * q / m:
            k = i + 1
    mask = np.zeros(m, bool)
    mask[order[:k]] = True
    return mask, k


def test_bh_select_matches_brute_force():
    from webval.drift import bh_select

    rng = np.random.default_rng(11)
    for _ in range(50):
        m = int(rng.integers(1, 40))
        # mix of uniform nulls and strong signals, with exact ties
        p = np.concatenate([rng.uniform(size=m),
                            rng.uniform(0, 1e-3, size=max(1, m // 4))])
        p[0] = p[-1]  # force a tie
        mask, k, thr = bh_select(p, q=0.1)
        bm, bk = _bh_brute(p, 0.1)
        assert k == bk
        assert np.array_equal(mask, bm)
        if k:
            assert thr == pytest.approx(k * 0.1 / len(p))
        else:
            assert thr == 0.0


def test_bh_select_edges():
    from webval.drift import bh_select

    mask, k, thr = bh_select([], q=0.05)
    assert len(mask) == 0 and k == 0 and thr == 0.0
    # nothing significant
    mask, k, thr = bh_select([0.9, 0.8, 0.95], q=0.05)
    assert not mask.any() and k == 0
    # everything significant
    mask, k, _ = bh_select([1e-9, 1e-8], q=0.05)
    assert mask.all() and k == 2


def _dominates_brute(x, y):
    """O(n^2) skyline oracle: i survives unless some j weakly dominates
    it with at least one strict inequality."""
    n = len(x)
    keep = np.ones(n, bool)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            if (x[j] >= x[i] and y[j] >= y[i]
                    and (x[j] > x[i] or y[j] > y[i])):
                keep[i] = False
                break
    return np.flatnonzero(keep)


def test_skyline_2d_matches_brute_force():
    from webval.rank import _skyline_2d

    rng = np.random.default_rng(7)
    for _ in range(60):
        n = int(rng.integers(0, 60))
        # small integer grid -> plenty of duplicates and axis ties
        x = rng.integers(0, 8, n).astype(float)
        y = rng.integers(0, 8, n).astype(float)
        got = _skyline_2d(x, y)
        want = _dominates_brute(x, y)
        assert np.array_equal(got, want), (x.tolist(), y.tolist())


def test_pareto_frontier_dataset(ray_session):
    import ray.data as rd

    from webval.rank import pareto_frontier

    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "a": rng.integers(0, 20, n).astype(float),
        "b": rng.integers(0, 20, n).astype(float)})
    # poke in nulls: must be dropped, never dominate
    df.loc[::37, "a"] = np.nan
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(7)
    out = pareto_frontier(ds, "a", "b").to_pandas()

    clean = df.dropna(subset=["a", "b"])
    keep = _dominates_brute(clean["a"].to_numpy(), clean["b"].to_numpy())
    want = set(clean.iloc[keep]["id"])
    assert set(out["id"]) == want
    # sorted by (x desc, y asc) and all columns preserved
    assert list(out.columns) == ["id", "a", "b"]
    assert (out["a"].to_numpy()[:-1] >= out["a"].to_numpy()[1:]).all()
    with pytest.raises(ValueError, match="max_frontier"):
        pareto_frontier(ds, "a", "b", max_frontier=1)


def test_pareto_frontier_duplicates_all_survive(ray_session):
    import ray.data as rd

    from webval.rank import pareto_frontier

    t = pa.table({"a": pa.array([5.0, 5.0, 1.0]),
                  "b": pa.array([5.0, 5.0, 1.0]),
                  "tag": pa.array(["x", "y", "z"])})
    out = pareto_frontier(rd.from_arrow(t), "a", "b").to_pandas()
    assert sorted(out["tag"]) == ["x", "y"]


def test_type_token_stats_matches_pandas(ray_session):
    import re

    import ray.data as rd

    from webval.textstats import type_token_stats

    rng = np.random.default_rng(23)
    vocab = ["the", "cat", "sat", "mat", "zz9", "Qux", "lo-fi"]
    rows = []
    for i in range(300):
        lang = ["en", "de", "fr"][int(rng.integers(0, 3))]
        words = rng.choice(vocab, size=int(rng.integers(1, 12)))
        rows.append({"lang": lang, "text": " ".join(words)})
    rows.append({"lang": None, "text": "dropped row"})
    rows.append({"lang": "en", "text": None})
    df = pd.DataFrame(rows)
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    out = type_token_stats(ds, "lang", "text").to_pandas() \
        .set_index("lang").sort_index()

    tok_re = re.compile(r"[a-z0-9]+")
    want = {}
    for lang, grp in df.dropna(subset=["lang", "text"]).groupby("lang"):
        counts = {}
        for txt in grp["text"]:
            for tok in tok_re.findall(txt.lower()):
                counts[tok] = counts.get(tok, 0) + 1
        n_tok = sum(counts.values())
        n_typ = len(counts)
        n_hap = sum(1 for c in counts.values() if c == 1)
        want[lang] = (n_tok, n_typ, n_hap)
    assert set(out.index) == set(want)
    for lang, (n_tok, n_typ, n_hap) in want.items():
        r = out.loc[lang]
        assert (r["n_tokens"], r["n_types"], r["n_hapax"]) \
            == (n_tok, n_typ, n_hap)
        assert r["ttr"] == pytest.approx(n_typ / n_tok)
        assert r["hapax_share"] == pytest.approx(n_hap / n_typ)


@pytest.fixture(scope="module")
def gap_events(ray_session):
    rng = np.random.default_rng(31)
    n = 2500
    ts = (np.datetime64("2025-06-01", "us")
          + (rng.integers(0, 3600 * 48, n) * US).astype("timedelta64[us]"))
    df = pd.DataFrame({
        "eid": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 40, n).astype(np.int64),
        "ts": ts})
    # a single-event key (must be dropped) and an all-equal-ts key
    df.loc[0, "k"] = 999
    df.loc[1:4, "k"] = 888
    df.loc[1:4, "ts"] = np.datetime64("2025-06-02", "us")
    import ray.data as rd
    return df, rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)


def test_interarrival_stats_matches_pandas(gap_events):
    from webval.windows import interarrival_stats

    df, ds = gap_events
    out = interarrival_stats(ds, "k", "ts", tie_cols=["eid"]).to_pandas() \
        .set_index("k")
    want = {}
    for k, grp in df.sort_values(["ts", "eid"]).groupby("k"):
        gaps = grp["ts"].astype("int64").diff().dropna().to_numpy(float)
        if len(gaps) == 0:
            continue
        mu, sd = gaps.mean(), gaps.std(ddof=0)
        want[k] = (len(gaps), mu, sd)
    assert set(out.index) == set(want)
    for k, (n, mu, sd) in want.items():
        r = out.loc[k]
        assert r["n_gaps"] == n
        assert r["mean_gap"] == pytest.approx(mu)
        assert r["std_gap"] == pytest.approx(sd)
        if sd + mu > 0:
            assert r["burstiness"] == pytest.approx((sd - mu) / (sd + mu))
    assert 999 not in out.index            # single event -> no gap
    assert np.isnan(out.loc[888, "burstiness"])  # all-zero gaps -> null


def test_sequence_nll_matches_brute_force(ray_session):
    import math

    import ray.data as rd

    from webval.windows import sequence_nll, transition_counts

    rng = np.random.default_rng(41)
    n = 1200
    states = ["a", "b", "c", "d", "e"]
    df = pd.DataFrame({
        "eid": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 30, n).astype(np.int64),
        "ts": (np.datetime64("2025-01-01", "us")
               + (rng.integers(0, 3600 * 24, n) * US)
               .astype("timedelta64[us]")),
        "state": rng.choice(states, n)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)

    trans = transition_counts(ds, "k", "ts", "state", tie_cols=["eid"])
    if hasattr(trans, "to_arrow_refs"):
        trans = pa.Table.from_pandas(trans.to_pandas())
    S = len(states)
    out = sequence_nll(ds, "k", "ts", "state", trans, n_states=S,
                       tie_cols=["eid"]).to_pandas().set_index("k")

    pair = {(p, s): c for p, s, c in
            zip(trans.column("prev_state").to_pylist(),
                trans.column("state").to_pylist(),
                trans.column("cnt").to_pylist())}
    ctx = {}
    for (p, _), c in pair.items():
        ctx[p] = ctx.get(p, 0) + c
    want = {}
    for k, grp in df.sort_values(["ts", "eid"]).groupby("k"):
        seq = grp["state"].tolist()
        lps = []
        for prev, cur in zip(seq, seq[1:]):
            c2 = pair.get((prev, cur), 0)
            cp = ctx.get(prev, 0)
            lps.append(math.log((c2 + 1) / (cp + S + 1)))
        if lps:
            want[k] = (len(lps), -sum(lps) / len(lps))
    assert set(out.index) == set(want)
    for k, (nt, nll) in want.items():
        assert out.loc[k, "n_trans"] == nt
        assert out.loc[k, "nll"] == pytest.approx(nll)


def test_sequence_nll_unseen_context_fallback(ray_session):
    import math

    import ray.data as rd

    from webval.windows import sequence_nll

    # model knows only a->b; sequence exercises seen pair, unseen pair
    # under a seen context, and a fully unseen context
    trans = pa.table({"prev_state": pa.array(["a"]),
                      "state": pa.array(["b"]),
                      "cnt": pa.array([3], pa.int64())})
    t = pa.table({"k": pa.array([1, 1, 1, 1], pa.int64()),
                  "ts": pa.array([1, 2, 3, 4], pa.timestamp("us")),
                  "state": pa.array(["a", "b", "z", "q"])})
    S = 4
    out = sequence_nll(rd.from_arrow(t), "k", "ts", "state", trans,
                       n_states=S).to_pandas()
    lp_seen = math.log((3 + 1) / (3 + S + 1))    # a->b: seen pair
    # b and z are unseen CONTEXTS (never a prev_state in the model)
    lp_oov = math.log(1 / (S + 1))               # b->z, z->q
    want = -(lp_seen + lp_oov + lp_oov) / 3
    assert out.loc[0, "n_trans"] == 3
    assert out.loc[0, "nll"] == pytest.approx(want)
