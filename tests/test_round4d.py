"""Round-4 session-4 operators vs brute-force oracles: Cohen's kappa,
n-step path counts, Kaplan-Meier survival, calibration bins,
null co-occurrence, embedding quantization audit."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

US = 1_000_000


def test_cohens_kappa_known_values():
    from webval.drift import cohens_kappa

    # classic worked example: po=0.85, pe=0.5 -> kappa 0.7
    k, po, pe, n = cohens_kappa([[40, 5], [10, 45]])
    assert (k, po, pe, n) == (pytest.approx(0.7), pytest.approx(0.85),
                              pytest.approx(0.5), 100)
    # perfect agreement
    assert cohens_kappa([[30, 0], [0, 70]])[0] == pytest.approx(1.0)
    # both raters constant: pe=1 -> kappa 0 by convention
    assert cohens_kappa([[100, 0], [0, 0]])[0] == 0.0
    # empty matrix
    assert cohens_kappa([[0, 0], [0, 0]]) == (0.0, 0.0, 0.0, 0)
    with pytest.raises(ValueError):
        cohens_kappa([[1, 2, 3], [4, 5, 6]])


@pytest.fixture(scope="module")
def typed_events(ray_session):
    rng = np.random.default_rng(47)
    n = 3000
    ts = (np.datetime64("2025-04-01", "us")
          + (rng.integers(0, 3600 * 72, n) * US).astype("timedelta64[us]"))
    df = pd.DataFrame({
        "eid": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 25, n).astype(np.int64),
        "ts": ts,
        "state": rng.choice(["a", "b", "c", "d"], n)})
    df.loc[df.index[:5], "k"] = pd.NA
    df.loc[df.index[5:9], "state"] = None
    df["k"] = df["k"].astype("Int64")
    import ray.data as rd
    return df, rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)


@pytest.mark.parametrize("n", [2, 3, 4])
def test_path_counts_matches_pandas(typed_events, n):
    from collections import Counter

    from webval.windows import path_counts

    df, ds = typed_events
    out = path_counts(ds, "k", "ts", "state", n=n,
                      tie_cols=["eid"]).to_pandas()
    got = dict(zip(out["path"], out["cnt"]))
    clean = df.dropna(subset=["k", "ts", "state"]) \
        .sort_values(["k", "ts", "eid"])
    want = Counter()
    for _, grp in clean.groupby("k"):
        s = grp["state"].tolist()
        for i in range(len(s) - n + 1):
            want[">".join(s[i:i + n])] += 1
    assert got == dict(want)
    assert sum(got.values()) > 100      # substantive fixture


def test_path_counts_never_crosses_keys(ray_session):
    import ray.data as rd

    from webval.windows import path_counts

    t = pa.table({"k": pa.array([1, 1, 2, 2], pa.int64()),
                  "ts": pa.array([1, 2, 3, 4], pa.timestamp("us")),
                  "state": pa.array(["a", "b", "c", "d"])})
    out = path_counts(rd.from_arrow(t), "k", "ts", "state", n=2) \
        .to_pandas()
    assert dict(zip(out["path"], out["cnt"])) == {"a>b": 1, "c>d": 1}
    # n=3 never spans the key boundary -> zero rows
    assert path_counts(rd.from_arrow(t), "k", "ts", "state",
                       n=3).count() == 0


def test_kaplan_meier_hand_case(ray_session):
    """5 users, max ts = day 30: lifetimes/deaths chosen so the curve is
    hand-checkable.  gap > 2 days from the corpus max marks a death."""
    import ray.data as rd

    from webval.windows import kaplan_meier

    day = 86_400_000_000
    # user: (first_day, last_day) -> lifetime, observed(last < 28)
    spans = {1: (0, 10),    # t=10, observed
             2: (0, 10),    # t=10, observed
             3: (5, 15),    # t=10, observed
             4: (0, 20),    # t=20, observed
             5: (0, 30)}    # t=30, censored (defines corpus max)
    rows = [(u, d * day) for u, (f, l) in spans.items() for d in (f, l)]
    t = pa.table({"u": pa.array([r[0] for r in rows], pa.int64()),
                  "ts": pa.array([r[1] for r in rows],
                                 pa.timestamp("us"))})
    out = kaplan_meier(rd.from_arrow(t).repartition(3), "u", "ts",
                       censor_gap_us=2 * day).to_pandas()
    # t=10: n_risk 5, d 3 -> S = 2/5; t=20: n_risk 2, d 1 -> S = 1/5
    assert out["t"].tolist() == [10, 20]
    assert out["n_risk"].tolist() == [5, 2]
    assert out["n_events"].tolist() == [3, 1]
    assert out["survival"].tolist() == pytest.approx([0.4, 0.2])


def test_kaplan_meier_all_censored_is_empty(ray_session):
    import ray.data as rd

    from webval.windows import kaplan_meier

    t = pa.table({"u": pa.array([1, 2], pa.int64()),
                  "ts": pa.array([0, 1000], pa.timestamp("us"))})
    out = kaplan_meier(rd.from_arrow(t), "u", "ts",
                       censor_gap_us=10_000_000)
    assert out.num_rows == 0
    assert out.column_names == ["t", "n_risk", "n_events", "survival"]


def test_calibration_bins_matches_numpy(ray_session):
    import ray.data as rd

    from webval.rank import calibration_bins

    rng = np.random.default_rng(11)
    n = 5000
    p = rng.random(n)
    y = (rng.random(n) < p).astype(np.float64)   # perfectly calibrated
    p[0] = 1.0                                   # exercise the top clip
    t = pa.table({"pred": pa.array(p), "label": pa.array(y)})
    bt = calibration_bins(rd.from_arrow(t).repartition(5), "pred",
                          "label", bins=10).to_pandas()
    b = np.minimum(np.floor(p * 10).astype(np.int64), 9)
    for _, row in bt.iterrows():
        m = b == row["bin"]
        assert row["n"] == int(m.sum())
        assert row["sum_score"] == pytest.approx(p[m].sum(), rel=1e-12)
        assert row["sum_label"] == pytest.approx(y[m].sum(), rel=1e-12)
        assert row["sum_sqerr"] == pytest.approx(((p[m] - y[m]) ** 2).sum(),
                                                 rel=1e-12)
    assert bt["n"].sum() == n
    # calibrated input: per-bin |acc - conf| small
    acc = bt["sum_label"] / bt["n"]
    conf = bt["sum_score"] / bt["n"]
    assert float(np.abs(acc - conf).max()) < 0.1


def test_calibration_bins_drops_nulls_and_empty(ray_session):
    import ray.data as rd

    from webval.rank import calibration_bins

    t = pa.table({"pred": pa.array([0.5, None, 0.2], pa.float64()),
                  "label": pa.array([1.0, 1.0, None], pa.float64())})
    bt = calibration_bins(rd.from_arrow(t), "pred", "label", bins=10)
    assert bt.column("n").to_pylist() == [1]
    empty = calibration_bins(
        rd.from_arrow(t.slice(1, 1)), "pred", "label", bins=10)
    assert empty.num_rows == 0
    assert empty.column_names == ["bin", "n", "sum_score", "sum_label",
                                  "sum_sqerr"]


def test_null_cooccurrence_matches_pandas(ray_session):
    import ray.data as rd

    from webval.checks import null_cooccurrence

    rng = np.random.default_rng(21)
    n = 2000
    df = pd.DataFrame({
        "w": rng.random(n),                      # never null
        "x": np.where(rng.random(n) < 0.3, np.nan, rng.random(n)),
        "y": np.where(rng.random(n) < 0.2, np.nan, rng.random(n)),
        "z": rng.random(n)})                     # never null
    # structural co-missingness: y null wherever x is, on a slice
    df.loc[df.index[:500], "y"] = np.where(
        np.isnan(df["x"][:500]), np.nan, df["y"][:500])
    t = pa.Table.from_pandas(df, preserve_index=False)
    out = null_cooccurrence(rd.from_arrow(t).repartition(4),
                            ["x", "y", "z", "w"]).to_pandas()
    assert out[["col_a", "col_b"]].values.tolist() == [
        ["w", "x"], ["w", "y"], ["w", "z"],
        ["x", "y"], ["x", "z"], ["y", "z"]]
    idx = out.set_index(["col_a", "col_b"])
    mx, my = df["x"].isna().values, df["y"].isna().values
    row = idx.loc[("x", "y")]
    assert row["null_a"] == int(mx.sum())
    assert row["null_b"] == int(my.sum())
    assert row["null_both"] == int((mx & my).sum())
    assert row["null_jaccard"] == pytest.approx(
        (mx & my).sum() / (mx | my).sum())
    # one side never null -> jaccard 0/union = 0.0
    assert idx.loc[("y", "z"), "null_jaccard"] == 0.0
    # NEITHER side ever null -> 0/0 -> jaccard null
    assert pd.isna(idx.loc[("w", "z"), "null_jaccard"])
    with pytest.raises(ValueError):
        null_cooccurrence(rd.from_arrow(t), ["x"])


def test_quantization_error_bound_and_oracle(ray_session):
    import ray.data as rd

    from webval.similarity import quantization_error

    rng = np.random.default_rng(31)
    m = rng.normal(0, 3, (400, 8)).astype(np.float32)
    m[:, 3] = 1.25                                # constant dimension
    t = pa.table({"embedding": pa.array(list(m),
                                        pa.list_(pa.float32()))})
    out = quantization_error(rd.from_arrow(t).repartition(4),
                             "embedding", levels=255).to_pandas()
    assert out["dim"].tolist() == list(range(1, 9))
    assert bool(out["within_bound"].all())
    x = m.astype(np.float64)
    for d in range(8):
        lo, hi = x[:, d].min(), x[:, d].max()
        assert out.loc[d, "mn"] == lo and out.loc[d, "mx"] == hi
        if hi > lo:
            q = np.floor((x[:, d] - lo) * 255.0 / (hi - lo) + 0.5)
            err = np.abs(x[:, d] - (lo + q * (hi - lo) / 255.0))
            assert out.loc[d, "max_err"] == pytest.approx(err.max(),
                                                          abs=0)
        else:
            assert out.loc[d, "max_err"] == 0.0
    assert out.loc[3, "bound"] == 0.0             # constant dim
