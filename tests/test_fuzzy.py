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
