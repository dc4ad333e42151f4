"""Round-4 session-3 wave 2: media-type sniffer, quantile binning,
Jaro-Winkler kernel/join, largest-remainder budget allocation."""

import numpy as np
import pyarrow as pa
import pytest


def test_detect_media_type_planted(ray_session):
    import ray.data as rd

    from webval.multimodal import detect_media_type

    payloads = [
        b"\x89PNG\r\n\x1a\n" + b"\0" * 8,          # png
        b"GIF89a\x03\x00\x02\x00",                  # gif
        b"\xff\xd8\xff\xe0junk",                    # jpeg
        b"RIFF\x24\x00\x00\x00WAVEfmt ",            # wav
        b"RIFF\x24\x00\x00\x00WEBPVP8 ",            # webp
        b"%PDF-1.7",                                 # pdf
        b"\x1f\x8b\x08\x00",                         # gzip
        b"PK\x03\x04rest",                           # zip
        b"RIFF\x24\x00\x00\x00AVI LIST",             # riff but not wav/webp
        b"plain",                                    # unknown
        b"",                                         # unknown (too short)
        None,                                        # null stays null
    ]
    t = pa.table({"m": pa.array(payloads, pa.binary())})
    out = detect_media_type(rd.from_arrow(t), "m").to_pandas()["m_type"]
    assert list(out[:10]) == ["png", "gif", "jpeg", "wav", "webp", "pdf",
                              "gzip", "zip", "unknown", "unknown"]
    assert out[10] == "unknown" and out[11] is None


def test_quantile_bin_matches_numpy(ray_session):
    import ray.data as rd

    from webval.rank import quantile_bin

    rng = np.random.default_rng(5)
    v = rng.integers(0, 200, 3000).astype(np.float64)
    mask = np.zeros(len(v), bool)
    mask[::97] = True  # nulls -> null bin
    t = pa.table({"v": pa.array(v, mask=mask)})
    out = (quantile_bin(rd.from_arrow(t).repartition(4), "v", 10)
           .to_pandas())
    clean = v[~mask]
    n = len(clean)
    s = np.sort(clean)
    edges = [s[int(np.ceil(q * n)) - 1] for q in
             [i / 10 for i in range(1, 10)]]  # quantile_disc
    truth = np.searchsorted(edges, out["v"].to_numpy(), side="right") + 1
    ok = ~out["v"].isna()
    assert (out.loc[ok, "bin"] == truth[ok.to_numpy()]).all()
    assert out.loc[~ok, "bin"].isna().all()
    # equal-frequency: every bin within one tie-run of n/10
    counts = out.loc[ok, "bin"].value_counts()
    assert set(counts.index) <= set(range(1, 11))


def test_jaro_winkler_matches_duckdb_fuzz():
    import random

    import duckdb

    from webval.fuzzy import jaro_winkler_pairs

    rng = random.Random(31)
    pairs = [("martha", "marhta"), ("dwayne", "duane"), ("", ""),
             ("a", ""), ("abc", "abc"), ("dixon", "dicksonx")]
    for _ in range(800):
        n, m = rng.randint(0, 15), rng.randint(0, 15)
        pairs.append((''.join(rng.choice("abcde ") for _ in range(n)),
                      ''.join(rng.choice("abcde ") for _ in range(m))))
    a = pa.array([x for x, _ in pairs])
    b = pa.array([y for _, y in pairs])
    got = jaro_winkler_pairs(a, b)
    con = duckdb.connect()
    want = [con.execute("SELECT jaro_winkler_similarity(?, ?)",
                        [x, y]).fetchone()[0] for x, y in pairs]
    # bit-exact, including boost threshold + empty-string semantics
    assert got.tolist() == want


def test_fuzzy_pairs_jw_metric(ray_session):
    import ray.data as rd

    from webval.fuzzy import fuzzy_pairs, jaro_winkler_pairs

    names = ["green metal box", "green metal bix", "green steel box",
             "red metal box", "red metal bax", "blue thing"]
    t = pa.table({"id": pa.array(list(range(6)), pa.int64()),
                  "s": pa.array(names),
                  "blk": pa.array(["g", "g", "g", "r", "r", "b"])})
    out = (fuzzy_pairs(rd.from_arrow(t), "id", "s", ["blk"],
                       metric="jaro_winkler", min_sim=0.9)
           .to_pandas().sort_values(["id_a", "id_b"]))
    # brute force within blocks
    want = []
    for i in range(6):
        for j in range(i + 1, 6):
            blk_i = "g" if i < 3 else ("r" if i < 5 else "b")
            blk_j = "g" if j < 3 else ("r" if j < 5 else "b")
            if blk_i != blk_j:
                continue
            sim = jaro_winkler_pairs(pa.array([names[i]]),
                                     pa.array([names[j]]))[0]
            if sim >= 0.9:
                want.append((i, j, sim))
    assert [tuple(r) for r in out.itertuples(index=False)] == want
    assert len(want) >= 2  # fixture actually exercises the keep path


def test_allocate_budget_exact(ray_session):
    import ray.data as rd

    from webval.pipelines import allocate_budget

    rng = np.random.default_rng(13)
    keys = rng.choice(["a", "b", "c", "d", "e"], 5000,
                      p=[0.5, 0.2, 0.15, 0.1, 0.05])
    t = pa.table({"k": pa.array(keys)})
    total = 777
    out = allocate_budget(rd.from_arrow(t).repartition(4), "k", total)
    b = out.column("budget").to_numpy(zero_copy_only=False)
    w = out.column("weight").to_numpy(zero_copy_only=False)
    q = out.column("quota").to_numpy(zero_copy_only=False)
    assert b.sum() == total                      # exact apportionment
    assert (np.abs(b - q) < 1.0).all()           # floor or floor+1
    assert w.sum() == 5000
    # budgets ordered like weights (Hamilton preserves order up to 1)
    assert (np.diff(b[np.argsort(w)]) >= -1).all()


def test_allocate_budget_weight_col(ray_session):
    import ray.data as rd

    from webval.pipelines import allocate_budget

    t = pa.table({"k": pa.array(["x", "x", "y"]),
                  "n": pa.array([3, 1, 4], pa.int64())})
    out = allocate_budget(rd.from_arrow(t), "k", 8, weight_col="n")
    d = {k: v for k, v in zip(out.column("k").to_pylist(),
                              out.column("budget").to_pylist())}
    assert d == {"x": 4, "y": 4}
