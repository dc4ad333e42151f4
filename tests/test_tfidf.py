"""TF-IDF pipeline: exact DuckDB oracle + tokenizer edge cases."""

import numpy as np
import pyarrow as pa
import pytest


def _collect(ds):
    import ray

    return pa.concat_tables([ray.get(x) for x in ds.to_arrow_refs()])


@pytest.mark.usefixtures("ray_session")
def test_doc_term_counts_edges():
    import ray.data as rd

    from webval.tfidf import doc_term_counts

    t = pa.table({"id": [1, 2, 3, 4],
                  "text": ["Hello, hello WORLD", None, "", "  --  "]})
    out = _collect(doc_term_counts(rd.from_arrow(t), "id", "text"))
    rows = {(r["id"], r["term"]): r["tf"] for r in out.to_pylist()}
    # null / empty / separator-only docs contribute nothing
    assert rows == {(1, "hello"): 2, (1, "world"): 1}


@pytest.mark.usefixtures("ray_session")
def test_tfidf_topk_matches_duckdb():
    import duckdb
    import ray.data as rd

    from webval.tfidf import tfidf_topk

    rng = np.random.default_rng(23)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    texts, ids = [], []
    for i in range(80):
        words = rng.choice(vocab, size=rng.integers(3, 25))
        texts.append(" ".join(words))
        ids.append(i)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    out = _collect(tfidf_topk(rd.from_arrow(t).repartition(6), "doc_id",
                              "text", 2, num_buckets=8))
    got = (out.select(["doc_id", "term", "tf", "df", "tfidf"])
              .sort_by([("doc_id", "ascending"), ("term", "ascending")])
              .combine_chunks())
    con = duckdb.connect()
    con.register("docs", t)
    want = con.sql("""
WITH terms AS (
  SELECT doc_id, t AS term
  FROM (SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t
        FROM docs) WHERE t <> ''
), tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM terms GROUP BY doc_id, term),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
       FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM docs)
SELECT doc_id, term, tf, df, round(tf * ln(n.n / df), 6) AS tfidf
FROM tf JOIN df USING (term), n
QUALIFY row_number() OVER (PARTITION BY doc_id
                           ORDER BY tfidf DESC, term) <= 2
ORDER BY doc_id, term
""").arrow()
    assert got.equals(want.cast(got.schema).combine_chunks())


@pytest.mark.usefixtures("ray_session")
def test_tfidf_modes_identical():
    import ray.data as rd

    from webval.tfidf import tfidf_topk

    rng = np.random.default_rng(29)
    vocab = [f"w{i}" for i in range(30)]
    t = pa.table({
        "doc_id": pa.array(np.arange(50), pa.int64()),
        "text": [" ".join(rng.choice(vocab, size=rng.integers(2, 40)))
                 for _ in range(50)]})
    ds = rd.from_arrow(t).repartition(4)
    cols = ["doc_id", "term", "tf", "df", "tfidf"]
    order = [("doc_id", "ascending"), ("term", "ascending")]
    a = _collect(tfidf_topk(ds, "doc_id", "text", 2, df_mode="broadcast",
                            num_buckets=4)).select(cols).sort_by(order)
    b = _collect(tfidf_topk(ds, "doc_id", "text", 2, df_mode="shuffle",
                            num_buckets=4)).select(cols).sort_by(order)
    assert a.combine_chunks().equals(b.combine_chunks())
