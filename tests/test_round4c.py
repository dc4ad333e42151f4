"""Round-4 session-3 operators vs brute-force oracles: SCD2 validity
intervals, event debounce, rank AUC, trimmed mean, min-max scaling,
readability counts, per-group dup share, degree assortativity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

US = 1_000_000


@pytest.fixture(scope="module")
def keyed_events(ray_session):
    rng = np.random.default_rng(43)
    n = 4000
    ts = (np.datetime64("2025-03-01", "us")
          + (rng.integers(0, 3600 * 48, n) * US).astype("timedelta64[us]"))
    df = pd.DataFrame({
        "eid": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 37, n).astype(np.int64),
        "ts": ts,
        "state": rng.choice(["a", "b", "c"], n)})
    # plant nulls: dropped by both engine and oracle
    df.loc[df.index[:7], "k"] = pd.NA
    df.loc[df.index[7:11], "ts"] = pd.NaT
    df["k"] = df["k"].astype("Int64")
    import ray.data as rd
    return df, rd.from_arrow(pa.Table.from_pandas(df)).repartition(7)


def test_validity_intervals_matches_pandas(keyed_events):
    from webval.windows import validity_intervals

    df, ds = keyed_events
    out = validity_intervals(ds, "k", "ts", attr_cols=["eid", "state"],
                             tie_cols=["eid"]).to_pandas()
    clean = df.dropna(subset=["k", "ts"]).sort_values(["k", "ts", "eid"])
    lead = clean.groupby("k")["ts"].shift(-1)
    assert len(out) == len(clean)
    got = out.set_index("eid").sort_index()
    truth = clean.set_index("eid").assign(valid_to=lead).sort_index()
    assert (got["valid_from"] == truth["ts"]).all()
    assert got["valid_to"].isna().equals(truth["valid_to"].isna())
    both = got["valid_to"].notna()
    assert (got.loc[both, "valid_to"] == truth.loc[both, "valid_to"]).all()
    assert (got["state"] == truth["state"]).all()
    # exactly one open (null valid_to) interval per key
    assert got["valid_to"].isna().sum() == clean["k"].nunique()


def test_debounce_matches_pandas(keyed_events):
    from webval.windows import debounce_events

    df, ds = keyed_events
    gap = 900 * US
    out = debounce_events(ds, "k", "ts", min_gap_us=gap,
                          tie_cols=["eid"]).to_pandas()
    clean = df.dropna(subset=["k", "ts"]).sort_values(["k", "ts", "eid"])
    prev = clean.groupby("k")["ts"].shift(1)
    gaps = (clean["ts"] - prev).dt.total_seconds() * US
    keep = prev.isna() | (gaps >= gap)
    truth = clean[keep]
    assert sorted(out["eid"]) == sorted(truth["eid"])
    got = out.set_index("eid")["gap_us"]
    # first-per-key rows carry a null gap
    n_null = got.isna().sum()
    assert n_null == clean["k"].nunique()


def test_rank_auc_matches_bruteforce(ray_session):
    import ray.data as rd

    from webval.rank import rank_auc

    rng = np.random.default_rng(7)
    n = 3000
    # heavy ties: integer scores, positives shifted up so AUC > 0.5
    pos = rng.integers(0, 2, n).astype(bool)
    score = rng.integers(0, 30, n) + np.where(pos, 4, 0)
    t = pa.table({"label": pa.array(np.where(pos, "y", "n")),
                  "score": pa.array(score.astype(np.float64))})
    out = rank_auc(rd.from_arrow(t).repartition(5), "label", "score",
                   positive="y")
    xp, xn = score[pos], score[~pos]
    wins = (xp[:, None] > xn[None, :]).sum()
    ties = (xp[:, None] == xn[None, :]).sum()
    brute = (wins + 0.5 * ties) / (len(xp) * len(xn))
    assert out.column("n_pos")[0].as_py() == pos.sum()
    assert out.column("n_neg")[0].as_py() == (~pos).sum()
    assert out.column("auc")[0].as_py() == pytest.approx(brute, abs=1e-12)


def test_rank_auc_single_class_is_null(ray_session):
    import ray.data as rd

    from webval.rank import rank_auc

    t = pa.table({"label": pa.array(["y", "y", "y"]),
                  "score": pa.array([1.0, 2.0, 3.0])})
    out = rank_auc(rd.from_arrow(t), "label", "score", positive="y")
    assert out.column("auc")[0].as_py() is None
    assert out.column("n_neg")[0].as_py() == 0


def test_grouped_trimmed_mean_matches_numpy(ray_session):
    import ray.data as rd

    from webval.rank import grouped_trimmed_mean

    rng = np.random.default_rng(11)
    n = 5000
    k = rng.choice(["a", "b", "c"], n)
    v = rng.normal(100, 30, n)
    v[:20] += 10_000  # tail outliers the trim must ignore
    t = pa.table({"k": pa.array(k), "v": pa.array(v)})
    out = grouped_trimmed_mean(rd.from_arrow(t).repartition(6), "k", "v",
                               lo=0.05, hi=0.95).to_pandas()
    got = out.set_index("k").sort_index()
    for key in "abc":
        x = np.sort(v[k == key])
        flo = np.quantile(x, 0.05, method="linear")
        fhi = np.quantile(x, 0.95, method="linear")
        kept = x[(x >= flo) & (x <= fhi)]
        assert got.loc[key, "n_kept"] == len(kept)
        assert got.loc[key, "trimmed_mean"] == pytest.approx(kept.mean())


def test_minmax_scale_matches_pandas(ray_session):
    import ray.data as rd

    from webval.clustering import minmax_scale

    rng = np.random.default_rng(3)
    n = 2000
    k = rng.choice(["x", "y", "z"], n)
    v = rng.integers(0, 1000, n).astype(np.int64)
    v[k == "z"] = 42  # constant group -> null scaled
    t = pa.table({"id": pa.array(np.arange(n)), "k": pa.array(k),
                  "v": pa.array(v)})
    out = (minmax_scale(rd.from_arrow(t).repartition(4), "k", "v")
           .to_pandas().set_index("id").sort_index())
    df = pd.DataFrame({"k": k, "v": v})
    mn = df.groupby("k")["v"].transform("min")
    mx = df.groupby("k")["v"].transform("max")
    truth = (df["v"] - mn) / (mx - mn)
    const = (mx == mn).to_numpy()
    assert out["scaled"].isna().to_numpy()[const].all()
    np.testing.assert_allclose(out["scaled"].to_numpy()[~const],
                               truth.to_numpy()[~const], rtol=0, atol=0)


def test_readability_counts_exact(ray_session):
    import ray.data as rd

    from webval.textstats import readability_stats

    texts = ["The cat sat. It was fine!", "no terminator here",
             None, "", "A b c? D e f. G!"]
    t = pa.table({"id": pa.array(list(range(5)), pa.int64()),
                  "text": pa.array(texts)})
    out = (readability_stats(rd.from_arrow(t), "id")
           .to_pandas().set_index("id").sort_index())
    assert out.loc[0, "n_words"] == 6 and out.loc[0, "n_sentences"] == 2
    assert out.loc[0, "n_alnum"] == 18
    ari0 = 4.71 * (18 / 6) + 0.5 * (6 / 2) - 21.43
    assert out.loc[0, "ari"] == pytest.approx(ari0, abs=0)
    assert out.loc[1, "n_sentences"] == 0 and pd.isna(out.loc[1, "ari"])
    assert pd.isna(out.loc[2, "ari"]) and pd.isna(out.loc[2, "n_words"])
    assert out.loc[3, "n_words"] == 0 and pd.isna(out.loc[3, "ari"])
    assert out.loc[4, "n_sentences"] == 3


def test_dup_share_by_group_planted(ray_session):
    import ray.data as rd

    from webval.dedup import dup_share_by_group

    rows = ([("h1", "dup text")] * 3 + [("h1", "solo one")]
            + [("h2", "dup text")] + [("h2", "other")] * 1
            + [("h3", "unique a"), ("h3", "unique b")]
            + [("h3", None)])  # null text never counts
    t = pa.table({"host": pa.array([r[0] for r in rows]),
                  "text": pa.array([r[1] for r in rows])})
    out = (dup_share_by_group(rd.from_arrow(t).repartition(3),
                              "host", "text", normalize=False)
           .to_pandas().set_index("host").sort_index())
    # 'dup text' occurs 4x corpus-wide -> dup everywhere it appears
    assert out.loc["h1", "n_docs"] == 4 and out.loc["h1", "n_dup_docs"] == 3
    assert out.loc["h2", "n_docs"] == 2 and out.loc["h2", "n_dup_docs"] == 1
    assert out.loc["h3", "n_docs"] == 2 and out.loc["h3", "n_dup_docs"] == 0
    assert out.loc["h1", "dup_share"] == pytest.approx(0.75)


def test_assortativity_matches_numpy(ray_session):
    import ray.data as rd

    from webval.graph import degree_assortativity

    rng = np.random.default_rng(17)
    m = 3000
    src = rng.integers(0, 80, m)
    dst = rng.integers(0, 80, m)
    t = pa.table({"s": pa.array([f"n{u}" for u in src]),
                  "d": pa.array([f"n{v}" for v in dst])})
    out = degree_assortativity(rd.from_arrow(t).repartition(5), "s", "d")
    # brute force on the distinct-edge set without self-loops
    edges = {(u, v) for u, v in zip(src, dst) if u != v}
    es = np.array(sorted(edges))
    outdeg = {u: int((es[:, 0] == u).sum()) for u in np.unique(es[:, 0])}
    indeg = {v: int((es[:, 1] == v).sum()) for v in np.unique(es[:, 1])}
    x = np.array([outdeg[u] for u, _ in es], dtype=float)
    y = np.array([indeg[v] for _, v in es], dtype=float)
    brute = np.corrcoef(x, y)[0, 1]
    assert out.column("n_edges")[0].as_py() == len(edges)
    assert out.column("assortativity")[0].as_py() == pytest.approx(
        brute, abs=1e-9)


def test_assortativity_zero_variance_is_null(ray_session):
    import ray.data as rd

    from webval.graph import degree_assortativity

    # perfect 2-regular ring: every out_deg == in_deg == 1 -> corr undefined
    t = pa.table({"s": pa.array(["a", "b", "c"]),
                  "d": pa.array(["b", "c", "a"])})
    out = degree_assortativity(rd.from_arrow(t), "s", "d")
    assert out.column("assortativity")[0].as_py() is None


def test_interpolate_gaps_matches_pandas(keyed_events):
    from webval.windows import interpolate_gaps

    df, _ = keyed_events
    rng = np.random.default_rng(29)
    d2 = df.dropna(subset=["k", "ts"]).copy()
    vals = rng.normal(10, 3, len(d2))
    vals[rng.random(len(d2)) < 0.3] = np.nan   # ~30% holes
    d2["v"] = vals
    d2["v"] = d2["v"].astype(float)
    import pyarrow as pa
    import ray.data as rd
    t = pa.Table.from_pandas(d2[["k", "ts", "eid", "v"]],
                             preserve_index=False)
    out = (interpolate_gaps(rd.from_arrow(t).repartition(6), "k", "ts", "v",
                            tie_cols=["eid"])
           .to_pandas().set_index("eid").sort_index())
    s = d2.sort_values(["k", "ts", "eid"]).set_index("eid")
    truth = {}
    for _, grp in s.groupby("k"):
        tsv = grp["ts"].astype("int64").to_numpy()
        v = grp["v"].to_numpy()
        filled = v.copy()
        valid = ~np.isnan(v)
        vi = np.flatnonzero(valid)
        for pos in np.flatnonzero(~valid):
            before = vi[vi < pos]
            after = vi[vi > pos]
            if len(before) and len(after):
                p, nx = before[-1], after[0]
                filled[pos] = v[p] + (v[nx] - v[p]) \
                    * float(tsv[pos] - tsv[p]) / float(tsv[nx] - tsv[p])
            else:
                filled[pos] = np.nan
        for eid, val in zip(grp.index, filled):
            truth[eid] = val
    assert len(out) == len(s)
    for eid, want in truth.items():
        got = out.loc[eid, "filled"]
        if np.isnan(want):
            assert pd.isna(got)
        else:
            assert got == pytest.approx(want, abs=0)
    # non-null inputs pass through untouched; some holes actually filled
    n_filled = sum(1 for e, w in truth.items()
                   if not np.isnan(w) and np.isnan(s.loc[e, "v"]))
    assert n_filled > 100
