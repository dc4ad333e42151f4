"""Blocked edit-distance join: vectorized DP vs a reference Wagner–Fischer,
fuzzy_pairs vs a brute-force oracle, oversized-block diagnostic."""

import random
import string

import numpy as np
import pyarrow as pa
import pytest

from webval.fuzzy import fuzzy_pairs, levenshtein_pairs


def _ref_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        nd = [i] + [0] * lb
        for j in range(1, lb + 1):
            nd[j] = min(d[j] + 1, nd[j - 1] + 1,
                        d[j - 1] + (a[i - 1] != b[j - 1]))
        d = nd
    return d[lb]


def test_levenshtein_pairs_matches_reference_dp():
    rng = random.Random(11)
    a = [''.join(rng.choices(string.ascii_lowercase[:6],
                             k=rng.randint(0, 14))) for _ in range(800)]
    b = [''.join(rng.choices(string.ascii_lowercase[:6],
                             k=rng.randint(0, 18))) for _ in range(800)]
    got = levenshtein_pairs(pa.array(a), pa.array(b))
    exp = np.array([_ref_lev(x, y) for x, y in zip(a, b)])
    assert (got == exp).all()


def test_levenshtein_pairs_edges():
    assert levenshtein_pairs(pa.array([], pa.string()),
                             pa.array([], pa.string())).size == 0
    got = levenshtein_pairs(pa.array(["", "abc", "kitten", "abc"]),
                            pa.array(["xy", "", "sitting", "abc"]))
    assert got.tolist() == [2, 3, 3, 0]
    # sliced (non-zero offset) arrow inputs must stay exact
    sl = pa.array(["pad", "kitten"])[1:]
    assert levenshtein_pairs(sl, pa.array(["sitting"])).tolist() == [3]


def test_fuzzy_pairs_matches_bruteforce(ray_session):
    import ray.data as rd

    rng = random.Random(5)
    words = ["ring", "rang", "wring", "gizmo", "gismo", "bolt", "boat"]
    rows = [{"id": i,
             "s": rng.choice(words),
             "blk": rng.choice(["a", "b", "c"])} for i in range(120)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    got = fuzzy_pairs(ds, "id", "s", ["blk"], max_dist=2) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    exp = sorted(
        (a["id"], b["id"], _ref_lev(a["s"], b["s"]))
        for i, a in enumerate(rows) for b in rows[i + 1:]
        if a["blk"] == b["blk"] and _ref_lev(a["s"], b["s"]) <= 2)
    assert list(map(tuple, got.itertuples(index=False))) == exp


def test_fuzzy_pairs_oversized_block_raises_named(ray_session):
    import ray.data as rd

    t = pa.table({"id": pa.array(range(50), pa.int64()),
                  "s": pa.array(["x"] * 50),
                  "blk": pa.array(["hot"] * 50)})
    ds = rd.from_arrow(t)
    with pytest.raises(Exception, match="hot"):
        fuzzy_pairs(ds, "id", "s", ["blk"],
                    max_dist=1, max_block_rows=10).materialize()


def _snm_brute(rows, window, scorer, keep):
    """All pairs within rank window of the (key, id) sort order."""
    srt = sorted(rows, key=lambda r: (r[1], r[0]))
    exp = set()
    for i in range(len(srt)):
        for j in range(i + 1, min(i + window + 1, len(srt))):
            d = scorer(srt[i][1], srt[j][1])
            if keep(d):
                exp.add((srt[i][0], srt[j][0]))
    return exp


def test_snm_pairs_matches_brute_force(ray_session):
    import random

    import ray.data as rd

    from webval.fuzzy import jaro_winkler_pairs, sorted_neighborhood_pairs

    random.seed(9)
    words = ["market", "markat", "world", "worlde", "alpha", "alpine",
             "beta", "betta", "delta", "dleta", "gamma", "gamme"]
    rows = []
    for i in range(300):
        w = random.choice(words)
        if random.random() < 0.3:
            p = random.randrange(len(w))
            w = w[:p] + random.choice("abcdez") + w[p + 1:]
        rows.append((i, w))
    ds = rd.from_arrow(pa.table({
        "id": pa.array([r[0] for r in rows], pa.int64()),
        "k": pa.array([r[1] for r in rows], pa.string())}))
    out = sorted_neighborhood_pairs(ds, "id", "k", window=4,
                                    min_sim=0.93,
                                    num_parts=16).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    exp = _snm_brute(
        rows, 4,
        lambda a, b: jaro_winkler_pairs(pa.array([a]), pa.array([b]))[0],
        lambda d: d >= 0.93)
    assert got == exp and len(got) > 100


def test_snm_pairs_tiny_parts_cross_boundary_chains(ray_session):
    """num_parts far above the row count forces sub-window-sized parts,
    so candidate pairs must chain across SEVERAL part boundaries — the
    hardest path of the exact boundary reconstruction."""
    import ray.data as rd

    from webval.fuzzy import sorted_neighborhood_pairs

    # 20 near-identical keys: in sort order every rank-distance-<=5
    # pair passes the threshold
    rows = [(i, f"aaaaaa{chr(ord('a') + i)}") for i in range(20)]
    ds = rd.from_arrow(pa.table({
        "id": pa.array([r[0] for r in rows], pa.int64()),
        "k": pa.array([r[1] for r in rows], pa.string())}))
    out = sorted_neighborhood_pairs(ds, "id", "k", window=5,
                                    min_sim=0.5,
                                    num_parts=64).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    exp = {(i, j) for i in range(20) for j in range(i + 1, min(i + 6, 20))}
    assert got == exp


def test_snm_pairs_levenshtein_metric(ray_session):
    import ray.data as rd

    from webval.fuzzy import levenshtein_pairs, sorted_neighborhood_pairs

    rows = [(0, "kitten"), (1, "sitten"), (2, "sitting"), (3, "zebra"),
            (4, "zebr"), (5, "apple"), (6, "appl"), (7, "apply")]
    ds = rd.from_arrow(pa.table({
        "id": pa.array([r[0] for r in rows], pa.int64()),
        "k": pa.array([r[1] for r in rows], pa.string())}))
    out = sorted_neighborhood_pairs(ds, "id", "k", window=3,
                                    metric="levenshtein", max_dist=1,
                                    num_parts=4).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    exp = _snm_brute(
        rows, 3,
        lambda a, b: levenshtein_pairs(pa.array([a]), pa.array([b]))[0],
        lambda d: d <= 1)
    assert got == exp
    assert out["edit_distance"].dtype == "int64"


def test_snm_pairs_rejects_unknown_metric(ray_session):
    import ray.data as rd

    from webval.fuzzy import sorted_neighborhood_pairs

    ds = rd.from_arrow(pa.table({"id": pa.array([1], pa.int64()),
                                 "k": pa.array(["x"], pa.string())}))
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(ds, "id", "k", metric="cosine")
