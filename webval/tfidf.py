"""Distributed TF-IDF — corpus-statistics text scoring built entirely from
the engine's own primitives (SURVEY.md training-data text-analysis family):

1. ``doc_term_counts``: one stateless ``map_batches`` pass tokenizes each
   document (RE2 ``[^a-z0-9]+`` split of the lowered text — byte-identical
   to DuckDB's ``regexp_split_to_array``, verified in-sandbox) and reduces
   it to (doc, term, tf) rows with Arrow's C++ ``group_by`` INSIDE the
   batch.  A document is one input row, so the per-batch grouping is exact
   (not a partial) and nothing shuffles at this stage.
2. ``document_frequencies``: since stage 1 emits each (doc, term) once,
   DF(term) is just the exchange ``grouped_count`` over ``term`` — the
   shuffle carries (term, partial count) pairs only.
3. ``tfidf_topk``: (doc, term, tf) ⋈ (term, df) through the large×large
   ``equi_join`` (the DF table has one row per vocabulary term — too big to
   assume broadcastable at web scale), score ``tf · ln(N/df)`` vectorized,
   then ``top_k_per_group`` keeps the k highest-scoring terms per doc with
   its per-batch top-k combiner.

Every shuffle is over the exchange; no stage materializes the corpus or
holds vocabulary state on the driver.  N (corpus size) is the one driver
scalar, read from Parquet metadata via ``ds.count()``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_SPLIT_PATTERN = r"[^a-z0-9]+"


def doc_term_counts(ds, id_col: str, text_col: str, *,
                    pattern: str = TOKEN_SPLIT_PATTERN):
    """(id, term, tf) rows: term frequency of every distinct token per
    document.  Tokens are the non-empty pieces of the RE2 ``pattern`` split
    of the lowercased text; null text yields no rows."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).combine_chunks()
        txt = batch.column(text_col).combine_chunks()
        lists = pc.split_pattern_regex(pc.utf8_lower(txt), pattern)
        la = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) \
            else lists
        lengths = pc.fill_null(pc.list_value_length(la), 0) \
            .to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(la)
        doc_idx = np.repeat(np.arange(len(la), dtype=np.int64), lengths)
        keep = pc.invert(pc.equal(flat, ""))
        long = pa.table({
            id_col: ids.take(pa.array(doc_idx, pa.int64())),
            "term": flat}).filter(keep)
        out = long.group_by([id_col, "term"]).aggregate([([], "count_all")])
        return out.rename_columns([id_col, "term", "tf"])

    return ds.map_batches(explode, batch_format="pyarrow")


def document_frequencies(doc_terms, *, num_buckets: int | None = None):
    """(term, df) from the output of ``doc_term_counts`` — each (doc, term)
    appears exactly once there, so DF is a plain exchange count."""
    from webval.exchange import grouped_count

    return grouped_count(doc_terms, "term", out_col="df",
                         num_buckets=num_buckets)


# vocabulary sizes up to this broadcast as one (term, df) Arrow table to
# every scoring task instead of shuffling every (doc, term, tf) row through
# the join exchange — the same auto-select pattern as minhash_dedup's
# components mode.  2M distinct terms ≈ tens of MB, comfortably ray.put-able.
BROADCAST_VOCAB_MAX = 2_000_000


def tfidf_topk(ds, id_col: str, text_col: str, k: int, *,
               pattern: str = TOKEN_SPLIT_PATTERN, round_to: int = 6,
               df_mode: str = "auto", num_buckets: int | None = None):
    """Top-k TF-IDF terms per document: score = tf · ln(N / df), ties
    broken by term ascending (deterministic output).  The score is rounded
    to ``round_to`` decimals BEFORE ranking so results are reproducible
    across engines (the SQL twin rounds identically).

    ``df_mode``: how the (term, df) table reaches the doc-term stream —
    "broadcast" (``ray.put`` once, ``pc.index_in`` per batch; no shuffle of
    the doc-term rows), "shuffle" (large×large ``equi_join`` — the path
    that holds at unbounded vocabulary), or "auto" (default: broadcast when
    the materialized DF table is ≤ BROADCAST_VOCAB_MAX terms).  Both modes
    are byte-identical in output (tested)."""
    import ray

    from webval.joins import equi_join
    from webval.rank import top_k_per_group

    if df_mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"tfidf_topk: df_mode={df_mode!r}")
    n_docs = ds.count()
    dt = doc_term_counts(ds, id_col, text_col, pattern=pattern)
    df = document_frequencies(dt, num_buckets=num_buckets)

    def score_cols(t: pa.Table, df_arr: pa.Array) -> pa.Table:
        idf = pc.ln(pc.divide(float(n_docs), pc.cast(df_arr, pa.float64())))
        s = pc.round(pc.multiply(pc.cast(t.column("tf"), pa.float64()), idf),
                     ndigits=round_to)
        return t.append_column("df", df_arr).append_column("tfidf", s)

    if df_mode != "shuffle":
        df = df.materialize()
        n_terms = df.count()
        if df_mode == "broadcast" or n_terms <= BROADCAST_VOCAB_MAX:
            vocab = pa.concat_tables(
                [ray.get(r) for r in df.to_arrow_refs()]).combine_chunks()
            vocab_ref = ray.put(vocab)

            def attach_df(t: pa.Table) -> pa.Table:
                v = ray.get(vocab_ref)
                pos = pc.index_in(t.column("term").combine_chunks(),
                                  value_set=v.column("term"))
                return score_cols(t, v.column("df").take(pos))

            scored = dt.map_batches(attach_df, batch_format="pyarrow")
            return top_k_per_group(scored, id_col, "tfidf", k,
                                   tie_cols=["term"],
                                   num_buckets=num_buckets)

    joined = equi_join(dt, df, on="term", num_buckets=num_buckets)
    scored = joined.map_batches(
        lambda t: score_cols(t.drop_columns(["df"]), t.column("df")),
        batch_format="pyarrow")
    return top_k_per_group(scored, id_col, "tfidf", k, tie_cols=["term"],
                           num_buckets=num_buckets)
