"""BM25 search (webval.search) vs a pure-Python oracle."""

import math
import re

import numpy as np
import pyarrow as pa
import pytest


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "a quick quick quick fox",
    "slow brown turtle",
    "nothing relevant here at all",
    "",          # zero tokens
    None,        # null text
    "fox fox fox fox fox and more fox",
]


def _tok(t):
    return [w for w in re.split(r"[^a-z0-9]+", (t or "").lower()) if w]


def _bm25_oracle(texts, query, k1=1.2, b=0.75):
    toks = [_tok(t) for t in texts]
    n = len(texts)
    avgdl = sum(len(x) for x in toks) / n
    q = sorted(set(_tok(query)))
    df = {t: sum(1 for x in toks if t in x) for t in q}
    scores = {}
    for i, x in enumerate(toks):
        s = 0.0
        for t in q:
            tf = x.count(t)
            if tf == 0:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(x) / avgdl)) \
                * idf
        if s > 0:
            scores[i] = s
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))


def test_bm25_matches_oracle(ray_session):
    import ray.data as rd

    from webval.search import bm25_search

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string())}))
    got = bm25_search(ds, "doc_id", "text", "quick fox", k=3).to_pandas() \
        .sort_values(["score", "doc_id"], ascending=[False, True]) \
        .reset_index(drop=True)
    want = _bm25_oracle(TEXTS, "quick fox")[:3]
    assert list(got["doc_id"]) == [i for i, _ in want]
    for r, (_, s) in zip(got["score"], want):
        assert r == pytest_approx(s)


def pytest_approx(x):
    import pytest

    return pytest.approx(x, abs=1e-12)


def test_bm25_no_match_and_small_blocks(ray_session):
    import ray.data as rd

    from webval.search import bm25_search

    t = pa.table({"doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                  "text": pa.array(TEXTS, pa.string())})
    ds = rd.from_arrow(t).repartition(5)   # force the fan-in tree
    got = bm25_search(ds, "doc_id", "text", "quick fox", k=100).to_pandas()
    want = _bm25_oracle(TEXTS, "quick fox")
    assert len(got) == len(want)  # only docs with a hit are returned
    got = got.sort_values(["score", "doc_id"],
                          ascending=[False, True]).reset_index(drop=True)
    assert list(got["doc_id"]) == [i for i, _ in want]

    out = bm25_search(ds, "doc_id", "text", "zzz-not-present", k=5)
    assert out.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_text_index_matches_scan_bm25(tmp_path):
    import numpy as np
    import ray.data as rd

    from webval.search import bm25_search, build_text_index, index_search

    rng = np.random.default_rng(89)
    vocab = ["fast", "vector", "scan", "slow", "table", "index", "query",
             "data", "page", "merge"]
    docs = [" ".join(rng.choice(vocab, size=int(rng.integers(4, 30))))
            for _ in range(300)]
    docs[5] = None                      # null text -> dl 0, never scored
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(300), pa.int64()),
        "text": pa.array(docs, pa.string())})).repartition(6)

    idx = str(tmp_path / "tidx")
    build_text_index(ds, "doc_id", "text", idx, n_shards=8)
    # idempotent rebuild: _DONE short-circuits (no duplicate postings)
    build_text_index(ds, "doc_id", "text", idx, n_shards=8)

    for q in ("fast vector scan", "slow", "query data merge"):
        scan = bm25_search(ds, "doc_id", "text", q, k=15).to_pandas()
        via_idx = index_search(idx, q, k=15).to_pandas()
        assert list(scan["doc_id"]) == list(via_idx["doc_id"])
        assert via_idx["score"].to_numpy() == pytest.approx(
            scan["score"].to_numpy(), rel=1e-9)

    # unseen term alone -> no hits
    assert index_search(idx, "zzzunseen", k=5).count() == 0
    with pytest.raises(ValueError, match="no terms"):
        index_search(idx, "...", k=5)

    # pruning: only the queried term's shards are read (structural
    # check: shard dirs exist and are a partition of the postings)
    import os
    shard_dirs = [d for d in os.listdir(idx) if d.startswith("shard=")]
    assert 1 <= len(shard_dirs) <= 8
