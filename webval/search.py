"""BM25 full-text search over a document Dataset — the lexical sibling of
``webval.similarity``'s vector search (Robertson-Sparck Jones probabilistic
ranking; the Okapi BM25 formulation is public textbook material).

Distributed shape for a single query (the interactive-retrieval path):

1. The query tokenizes ON THE DRIVER (it is a handful of terms by
   definition) with the same RE2 split contract as ``webval.tfidf``.
2. One stats pass: each batch reduces to (n_docs, n_tokens, df_1..df_Q)
   — Q+2 integers — and the driver sums per-block scalars (the
   big-map-then-tiny-rollup pattern).  Per-term IDF and the corpus average
   document length finalize on the driver from those integers, so both
   engines in the parity check compute them from identical ints.
3. One scoring pass: per batch, term frequencies of the Q query terms
   resolve vectorized (index_in + one bincount over doc·Q keys), the BM25
   sum evaluates as a (rows × Q) numpy expression, and the batch emits its
   local top-k rows only.  A fan-in tree of top-k reductions produces the
   global top-k — no global sort, nothing doc-sized on the driver.

Determinism: ranking is (score DESC, id ASC); exact score ties (identical
tf-vector and doc length) break on id in any engine.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webval.lm import _tokenize
from webval.tfidf import TOKEN_SPLIT_PATTERN


def query_terms(query: str, pattern: str = TOKEN_SPLIT_PATTERN) -> list[str]:
    """Driver-side tokenization of the query string — same split contract
    as the corpus tokenizer (python re and RE2 agree on this class)."""
    import re

    return sorted({w for w in re.split(pattern, query.lower()) if w})


def bm25_search(ds, id_col: str, text_col: str, query: str, k: int = 10, *,
                k1: float = 1.2, b: float = 0.75,
                pattern: str = TOKEN_SPLIT_PATTERN, fan: int = 64,
                batch_size: int | None = 8192):
    """Top-k documents for ``query`` by BM25.  Returns a Dataset of
    (id_col, score) rows, the global top-k ordered by (score DESC, id)."""
    import ray

    terms = query_terms(query, pattern)
    if not terms:
        raise ValueError(f"bm25_search: no terms in query {query!r}")
    nq = len(terms)
    terms_arr = pa.array(terms, pa.string())

    def stats_partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _tokenize(batch.column(text_col).combine_chunks(),
                                  pattern)
        pos = pc.index_in(flat, value_set=terms_arr) \
            .to_numpy(zero_copy_only=False)
        hit = ~np.isnan(pos)
        df = np.zeros(nq, dtype=np.int64)
        if hit.any():
            key = doc_idx[hit] * nq + pos[hit].astype(np.int64)
            uniq = np.unique(key)  # one per (doc, term) present
            np.add.at(df, uniq % nq, 1)
        cols = {"n": pa.array([batch.num_rows], pa.int64()),
                "toks": pa.array([len(flat)], pa.int64())}
        for j in range(nq):
            cols[f"df_{j}"] = pa.array([int(df[j])], pa.int64())
        return pa.table(cols)

    from webval.exchange import sum_block_scalars

    parts = ds.map_batches(stats_partial, batch_format="pyarrow",
                           batch_size=batch_size).materialize()
    totals = sum_block_scalars(
        parts, ["n", "toks"] + [f"df_{j}" for j in range(nq)])
    n_docs = totals["n"]
    if n_docs == 0:
        # keep the documented (id, score) OUTPUT schema even when empty
        import ray.data as rd
        sch = ds.schema()
        id_type = pa.int64()
        if sch is not None and sch.names is not None:
            id_type = dict(zip(sch.names, sch.types))[id_col]
        return rd.from_arrow(pa.table({id_col: pa.array([], id_type),
                                       "score": pa.array([], pa.float64())}))
    avgdl = totals["toks"] / n_docs
    idf = np.array([math.log((n_docs - totals[f"df_{j}"] + 0.5)
                             / (totals[f"df_{j}"] + 0.5) + 1.0)
                    for j in range(nq)], dtype=np.float64)

    def score_topk(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({id_col: pa.array([], batch.schema.field(id_col).type),
                             "score": pa.array([], pa.float64())})
        flat, doc_idx = _tokenize(batch.column(text_col).combine_chunks(),
                                  pattern)
        dl = np.bincount(doc_idx, minlength=n).astype(np.float64)
        pos = pc.index_in(flat, value_set=terms_arr) \
            .to_numpy(zero_copy_only=False)
        hit = ~np.isnan(pos)
        tf = np.zeros(n * nq, dtype=np.int64)
        if hit.any():
            key = doc_idx[hit] * nq + pos[hit].astype(np.int64)
            tf = np.bincount(key, minlength=n * nq)
        tf = tf.reshape(n, nq).astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * dl[:, None] / avgdl)
        with np.errstate(invalid="ignore"):
            contrib = tf * (k1 + 1.0) / denom * idf[None, :]
        score = np.nansum(contrib, axis=1)
        keep = np.flatnonzero(score > 0.0)
        t = pa.table({id_col: batch.column(id_col).take(
            pa.array(keep, pa.int64())),
            "score": pa.array(score[keep], pa.float64())})
        return t.sort_by([("score", "descending"),
                          (id_col, "ascending")]).slice(0, k)

    out = ds.map_batches(score_topk, batch_format="pyarrow",
                         batch_size=batch_size).materialize()
    while out.num_blocks() > 1:
        out = (out.repartition(max(1, math.ceil(out.num_blocks() / fan)))
               .map_batches(lambda t: t.sort_by(
                   [("score", "descending"), (id_col, "ascending")])
                   .slice(0, k), batch_format="pyarrow", batch_size=None)
               .materialize())
    return out


def rrf_fuse(rankings, id_col: str, *, rank_col: str = "rank",
             k: float = 60.0, weights: list[float] | None = None,
             top_k: int = 20, num_buckets: int | None = None):
    """Reciprocal-rank fusion (Cormack et al. 2009): merge N rankings
    of the same id space into one by

        score(id) = Σ_r  w_r / (k + rank_r(id))

    summing only over rankings where the id appears — the standard
    zero-tuning way to fuse lexical (BM25) and dense (ANN) retrieval,
    or any ensemble of orderings.  ``rankings`` are Datasets carrying
    (``id_col``, ``rank_col``) with 1-based ranks (compute them with a
    deterministic tiebreak — rankings must be reproducible before
    fusion can be).  k=60 is the canonical constant.  Returns
    Dataset[{id_col, rrf, n_lists}] of the ``top_k`` ids by
    (round(rrf, 9) desc, id asc).

    Scale shape: each ranking maps rank → w/(k+rank) vectorized, the
    tagged union feeds ONE per-id sum exchange, and the result sorts +
    limits; per-ranking inputs are typically already top-k lists, so
    nothing here exceeds the fused candidate set."""
    if not rankings:
        raise ValueError("rrf_fuse: no rankings given")
    w = list(weights) if weights is not None else [1.0] * len(rankings)
    if len(w) != len(rankings):
        raise ValueError(f"rrf_fuse: {len(rankings)} rankings but "
                         f"{len(w)} weights")

    from webval.exchange import grouped_agg

    tagged = None
    for r, wt in zip(rankings, w):
        def to_contrib(t: pa.Table, _w=float(wt)) -> pa.Table:
            i = t.column(id_col).combine_chunks()
            rk = pc.cast(t.column(rank_col).combine_chunks(),
                         pa.float64())
            m = pc.and_(pc.is_valid(i), pc.is_valid(rk))
            i, rk = i.filter(m), rk.filter(m)
            contrib = pc.divide(pa.scalar(_w),
                                pc.add(rk, pa.scalar(float(k))))
            return pa.table({id_col: i, "rrf": contrib,
                             "n_lists": pa.nulls(len(i), pa.int64())
                             .fill_null(1)})

        part = r.map_batches(to_contrib, batch_format="pyarrow")
        tagged = part if tagged is None else tagged.union(part)

    fused = grouped_agg(tagged, [id_col],
                        [("rrf", "sum"), ("n_lists", "sum")],
                        rename={"rrf_sum": "rrf",
                                "n_lists_sum": "n_lists"},
                        num_buckets=num_buckets)
    ranked = fused.map_batches(
        lambda t: t.append_column("r9", pc.round(t.column("rrf"),
                                                 ndigits=9)),
        batch_format="pyarrow") \
        .sort(["r9", id_col], descending=[True, False]).limit(top_k)
    return ranked.map_batches(lambda t: t.drop_columns(["r9"]),
                              batch_format="pyarrow")


def build_text_index(ds, id_col: str, text_col: str, index_dir: str, *,
                     n_shards: int = 64,
                     pattern: str = TOKEN_SPLIT_PATTERN,
                     num_buckets: int | None = None):
    """Persist an inverted text index: postings (term, id, tf) written
    as parquet PARTITIONED BY TERM-HASH SHARD (``shard=<s>/``) so a
    query later reads only its own terms' shards, plus a doc-length
    table and a meta.json with corpus totals — the on-disk BM25 layout
    (the text sibling of similarity.build_ann_index).  A ``_DONE``
    marker makes the build idempotent; delete ``index_dir`` to rebuild.

    Scale shape: tokenize + per-doc tf is batch-local (each doc's text
    lives in one row); postings co-locate per shard through ONE
    hash-bucket exchange whose bucket task writes its own files (the
    data never concentrates); doc lengths stream to their own dir;
    totals are per-block scalar partials."""
    import json
    import os
    import uuid

    import pyarrow.parquet as pq

    from webval.exchange import bucketed_group_apply, sum_block_scalars
    from webval.lm import _tokenize

    if os.path.exists(os.path.join(index_dir, "_DONE")):
        return index_dir
    os.makedirs(index_dir, exist_ok=True)

    def postings(t: pa.Table) -> pa.Table:
        flat, doc_idx = _tokenize(t.column(text_col).combine_chunks(),
                                  pattern)
        ids = t.column(id_col).combine_chunks()
        if len(flat) == 0:
            return pa.table({
                "term": pa.array([], pa.large_string()),
                id_col: pa.array([], ids.type),
                "tf": pa.array([], pa.int64()),
                "shard": pa.array([], pa.int64())})
        tab = pa.table({"term": flat.cast(pa.large_string()),
                        "doc": pa.array(doc_idx)})
        agg = tab.group_by(["term", "doc"]).aggregate([([],
                                                        "count_all")])
        from webval.sketches import hash64
        terms = agg.column("term").combine_chunks()
        shard = (hash64(terms.to_numpy(zero_copy_only=False))
                 % np.uint64(n_shards)).astype(np.int64)
        return pa.table({
            "term": terms,
            id_col: ids.take(agg.column("doc")),
            "tf": pc.cast(agg.column("count_all"), pa.int64()),
            "shard": pa.array(shard)})

    def write_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"rows": pa.array([], pa.int64())})
        out_rows = 0
        for s in pc.unique(g.column("shard")).to_pylist():
            part = g.filter(pc.equal(g.column("shard"), s)) \
                .drop_columns(["shard"])
            d = os.path.join(index_dir, f"shard={int(s)}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(part,
                           os.path.join(d,
                                        f"part-{uuid.uuid4().hex}.parquet"))
            out_rows += part.num_rows
        return pa.table({"rows": pa.array([out_rows], pa.int64())})

    post = ds.select_columns([id_col, text_col]) \
        .map_batches(postings, batch_format="pyarrow")
    bucketed_group_apply(post, ["shard"], write_shard,
                         num_buckets=num_buckets).materialize()

    def doclen(t: pa.Table) -> pa.Table:
        _, doc_idx = _tokenize(t.column(text_col).combine_chunks(),
                               pattern)
        dl = np.bincount(doc_idx, minlength=t.num_rows).astype(np.int64)
        return pa.table({id_col: t.column(id_col),
                         "dl": pa.array(dl)})

    dl_dir = os.path.join(index_dir, "doclen")
    os.makedirs(dl_dir, exist_ok=True)
    lens = ds.select_columns([id_col, text_col]) \
        .map_batches(doclen, batch_format="pyarrow")
    lens.write_parquet(dl_dir)

    import ray.data as rd

    totals = sum_block_scalars(
        rd.read_parquet(dl_dir).map_batches(
            lambda t: pa.table({
                "n": pa.array([t.num_rows], pa.int64()),
                "toks": pa.array([int(pc.sum(t.column("dl")).as_py()
                                      or 0)], pa.int64())}),
            batch_format="pyarrow").materialize(), ["n", "toks"])
    meta = {"n_docs": totals["n"], "total_tokens": totals["toks"],
            "n_shards": n_shards, "id_col": id_col, "pattern": pattern}
    tmp = os.path.join(index_dir, f"meta.json.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, "meta.json"))
    open(os.path.join(index_dir, "_DONE"), "w").write("ok")
    return index_dir


def index_search(index_dir: str, query: str, k: int = 10, *,
                 k1: float = 1.2, b: float = 0.75,
                 num_buckets: int | None = None):
    """BM25 top-k against a :func:`build_text_index` directory: reads
    ONLY the term-hash shards the query terms live in (partition
    pruning at the read — the rest of the postings never leave
    storage), joins doc lengths co-bucketed, and scores with the exact
    :func:`bm25_search` formula — same (id, score) output, same
    (score desc, id) order, so the two paths are interchangeable and
    cross-checkable.  Empty shards / unseen terms contribute idf only
    through df=0, like the scan path."""
    import json
    import math
    import os

    import ray.data as rd

    from webval.exchange import grouped_agg, sum_block_scalars
    from webval.joins import equi_join
    from webval.sketches import hash64

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    id_col = meta["id_col"]
    terms = query_terms(query, meta["pattern"])
    if not terms:
        raise ValueError(f"index_search: no terms in query {query!r}")
    nq = len(terms)
    terms_arr = pa.array(terms, pa.large_string())
    shards = sorted({int(h % np.uint64(meta["n_shards"]))
                     for h in hash64(np.asarray(terms, dtype=object))})
    files = []
    for s in shards:
        d = os.path.join(index_dir, f"shard={s}")
        if os.path.isdir(d):
            files.extend(os.path.join(d, fn)
                         for fn in sorted(os.listdir(d))
                         if fn.endswith(".parquet"))
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "score": pa.array([], pa.float64())})
    if not files:
        return rd.from_arrow(empty)

    post = rd.read_parquet(files).map_batches(
        lambda t: t.filter(pc.is_valid(pc.index_in(
            t.column("term").combine_chunks().cast(pa.large_string()),
            value_set=terms_arr))),
        batch_format="pyarrow").materialize()

    # df per term off the pruned postings ((term, doc) rows are unique)
    dfs = {r["term"]: r["df"] for r in grouped_agg(
        post, ["term"], [("tf", "count")], rename={"tf_count": "df"},
        num_buckets=num_buckets).take_all()}
    n_docs = meta["n_docs"]
    avgdl = meta["total_tokens"] / n_docs if n_docs else 0.0
    idf = {t: math.log((n_docs - dfs.get(t, 0) + 0.5)
                       / (dfs.get(t, 0) + 0.5) + 1.0) for t in terms}
    idf_arr = np.array([idf[t] for t in terms])

    hits = equi_join(post, rd.read_parquet(os.path.join(index_dir,
                                                        "doclen")),
                     on=[id_col], num_buckets=num_buckets)

    def score(t: pa.Table) -> pa.Table:
        pos = pc.index_in(t.column("term").combine_chunks()
                          .cast(pa.large_string()),
                          value_set=terms_arr) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        tf = t.column("tf").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        dl = t.column("dl").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * dl / avgdl)
        contrib = tf * (k1 + 1.0) / denom * idf_arr[pos]
        return pa.table({id_col: t.column(id_col),
                         "score": pa.array(contrib)})

    per_doc = grouped_agg(
        hits.map_batches(score, batch_format="pyarrow"),
        [id_col], [("score", "sum")], rename={"score_sum": "score"},
        num_buckets=num_buckets)
    return per_doc.map_batches(
        lambda t: t.filter(pc.greater(t.column("score"), 0.0)),
        batch_format="pyarrow") \
        .sort(["score", id_col], descending=[True, False]).limit(k)
