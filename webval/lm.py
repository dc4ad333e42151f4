"""Corpus-trained unigram language-model quality scoring (the CCNet /
Wenzek et al. 2020 perplexity-filter shape, arXiv:1911.00359 — CCNet trains
a KenLM 5-gram and buckets Common-Crawl documents into head/middle/tail by
perplexity; no pretrained LM exists in this sandbox, so the model here is a
unigram LM *trained on the corpus itself*, which keeps the distributed
shape honest while staying exactly reproducible in SQL).

Distributed shape (nothing corpus-sized ever sits on the driver):

1. ``term_counts``: one stateless ``map_batches`` pass tokenizes each batch
   (same RE2 split as ``webval.tfidf`` — byte-identical to DuckDB's
   ``regexp_split_to_array``) and reduces it to (term, partial-count) rows
   INSIDE the batch, then the hash-bucket exchange sums partials per term.
   The shuffle carries (term, int64) pairs only.
2. ``fit_unigram_lm``: the aggregated vocabulary (one row per DISTINCT
   term — bounded by vocabulary size, not corpus size; optionally truncated
   to the top ``vocab_size`` terms) is collected into one Arrow table and
   turned into add-one-smoothed log-probabilities::

       logp(w in vocab) = ln((c_w + 1) / (total + V + 1))
       logp(OOV)        = ln(          1 / (total + V + 1))

   where ``total`` counts every corpus token (including ones outside a
   truncated vocabulary) and ``V`` is the retained vocabulary size.  This
   is the standard Laplace estimate with one shared OOV symbol.
3. ``score_unigram_lm``: the (term, logp) table is ``ray.put`` ONCE and
   every scoring task reads it from the object store — the small side is
   broadcast, never re-shipped per batch and never joined through a
   shuffle.  Per batch: tokenize, ``pc.index_in`` against the vocab,
   ``np.bincount``-segmented sums → per-document mean negative
   log-likelihood (``nll``; CCNet's perplexity is ``exp(nll)``).

Scale notes: the vocabulary broadcast is the same auto-broadcast contract
as ``tfidf.tfidf_topk`` (tens of millions of terms fit the object store; a
truncated ``vocab_size`` bounds it regardless of corpus size).  Truncation
order is (count DESC, term ASC) — deterministic across engines.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webval.tfidf import TOKEN_SPLIT_PATTERN


def _tokenize(txt: pa.ChunkedArray, pattern: str):
    """-> (flat tokens Array, int64 doc index per token).  Tokens are the
    non-empty pieces of the RE2 split of the lowered text; null text
    yields no tokens."""
    lists = pc.split_pattern_regex(pc.utf8_lower(txt), pattern)
    la = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
    lengths = pc.fill_null(pc.list_value_length(la), 0) \
        .to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(la)
    doc_idx = np.repeat(np.arange(len(la), dtype=np.int64), lengths)
    keep = pc.invert(pc.equal(flat, "")).to_numpy(zero_copy_only=False)
    return flat.filter(pa.array(keep)), doc_idx[keep]


def term_counts(ds, text_col: str, *, pattern: str = TOKEN_SPLIT_PATTERN,
                num_buckets: int | None = None):
    """(term, count) Dataset: corpus-wide token frequencies.  Per-batch
    tokenize + value_counts combiner, then a bucketed int64 sum — the same
    two-phase exchange as ``exchange.grouped_count``."""
    from webval.exchange import bucketed_group_apply

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = _tokenize(batch.column(text_col).combine_chunks(), pattern)
        vc = flat.value_counts()
        return pa.table({"term": vc.field("values"),
                         "count": pc.cast(vc.field("counts"), pa.int64())})

    def final(g: pa.Table) -> pa.Table:
        agg = g.group_by("term").aggregate([("count", "sum")])
        return agg.select(["term", "count_sum"]) \
            .rename_columns(["term", "count"])

    return bucketed_group_apply(ds.select_columns([text_col]), ["term"],
                                final, num_buckets=num_buckets,
                                partial_fn=partial)


@dataclass
class UnigramLM:
    """Fitted model: vocab = Arrow table (term: string, logp: float64);
    OOV tokens score ``oov_logp``.  JSON-serializable via to/from_dict so a
    fitted LM can ride a SchemaSpec the way rdv persists extractor state."""

    vocab: pa.Table
    oov_logp: float
    total_tokens: int
    pattern: str = TOKEN_SPLIT_PATTERN

    def to_dict(self) -> dict:
        return {"terms": self.vocab.column("term").to_pylist(),
                "logp": self.vocab.column("logp").to_pylist(),
                "oov_logp": self.oov_logp,
                "total_tokens": self.total_tokens,
                "pattern": self.pattern}

    @classmethod
    def from_dict(cls, d: dict) -> "UnigramLM":
        return cls(vocab=pa.table({"term": pa.array(d["terms"], pa.string()),
                                   "logp": pa.array(d["logp"], pa.float64())}),
                   oov_logp=d["oov_logp"],
                   total_tokens=d["total_tokens"], pattern=d["pattern"])


#: largest distinct-term count the driver will collect whole; above it the
#: fit switches to the distributed top-``vocab_size`` selection (same
#: auto-gate contract as ``tfidf.BROADCAST_VOCAB_MAX``).
DRIVER_VOCAB_MAX = 2_000_000
#: vocabulary cap applied when ``vocab_size=None`` but the corpus
#: vocabulary exceeds ``DRIVER_VOCAB_MAX`` — CCNet-scale (a few hundred k
#: types cover >99% of tokens on web text; Wenzek et al. 2020 §3).
DEFAULT_VOCAB_CAP = 500_000

_EMPTY_COUNTS = pa.table({"term": pa.array([], pa.string()),
                          "count": pa.array([], pa.int64())})


def _topk_counts(t: pa.Table, k: int) -> pa.Table:
    """Top-k rows of a (term, count) table by (count DESC, term ASC)."""
    srt = t.sort_by([("count", "descending"), ("term", "ascending")])
    return srt.slice(0, k) if srt.num_rows > k else srt


def _collect_topk_distributed(counts, k: int) -> pa.Table:
    """Global top-``k`` (count DESC, term ASC) rows of a term-count
    Dataset WITHOUT collecting the full vocabulary to the driver:
    per-block top-k prune (dropping a row that is dominated by ≥k rows in
    its own partition can never drop a global top-k row), a fan-in
    repartition + prune round while more than 4·k pruned rows remain, then
    a ≤4·k driver merge.  Exact — proven equal to the driver-sort path in
    ``tests/test_lm.py``."""
    import ray

    pruned = counts.map_batches(lambda t: _topk_counts(t, k),
                                batch_format="pyarrow",
                                batch_size=None).materialize()
    # fan-in rounds: each halves-to-16ths the block count, re-pruning
    while pruned.count() > 4 * k and pruned.num_blocks() > 4:
        pruned = pruned.repartition(
            max(4, pruned.num_blocks() // 16)) \
            .map_batches(lambda t: _topk_counts(t, k),
                         batch_format="pyarrow",
                         batch_size=None).materialize()
    blocks = [ray.get(r) for r in pruned.to_arrow_refs()]
    blocks = [b for b in blocks if b.num_rows]
    if not blocks:
        return _EMPTY_COUNTS
    return _topk_counts(
        pa.concat_tables(blocks, promote_options="permissive")
        .combine_chunks(), k)


def _fit_vocab_counts(ds, text_col: str, *, vocab_size, pattern,
                      num_buckets, driver_vocab_max) -> tuple[pa.Table, int]:
    """Shared fit substrate: the (term, count) vocabulary table (bounded
    by the tfidf-style auto gate) and the EXACT total token count (per-
    block scalar sum over the exchange — never the term table driver-side
    above the gate)."""
    import ray

    from webval.exchange import sum_block_scalars

    counts = term_counts(ds, text_col, pattern=pattern,
                         num_buckets=num_buckets).materialize()
    total = sum_block_scalars(counts, ["count"])["count"]
    n_terms = counts.count()
    if n_terms > driver_vocab_max:
        k = vocab_size if vocab_size is not None else DEFAULT_VOCAB_CAP
        vocab = _collect_topk_distributed(counts, k)
    else:
        blocks = [ray.get(r) for r in counts.to_arrow_refs()]
        vocab = pa.concat_tables([b for b in blocks if b.num_rows],
                                 promote_options="permissive") \
            if any(b.num_rows for b in blocks) else _EMPTY_COUNTS
        vocab = vocab.combine_chunks() \
            .sort_by([("count", "descending"), ("term", "ascending")])
        if vocab_size is not None and vocab.num_rows > vocab_size:
            vocab = vocab.slice(0, vocab_size)
    return vocab, total


def fit_unigram_lm(ds, text_col: str, *, vocab_size: int | None = None,
                   pattern: str = TOKEN_SPLIT_PATTERN,
                   num_buckets: int | None = None,
                   driver_vocab_max: int = DRIVER_VOCAB_MAX) -> UnigramLM:
    """Train on the corpus: exchange-aggregated term counts → add-one
    smoothed log-probs.  ``vocab_size`` keeps the top terms by
    (count DESC, term ASC); ``total`` still counts every token (computed
    as a per-block scalar sum over the count exchange, never requiring the
    term table on the driver) so the probabilities of a truncated model
    remain a proper distribution over vocab ∪ {OOV}.

    Vocabulary bound (tfidf-style auto gate): when the distinct-term count
    exceeds ``driver_vocab_max`` the fit NEVER concatenates the full term
    table driver-side — it runs the distributed top-k selection
    ``_collect_topk_distributed`` with ``k = vocab_size`` (defaulting to
    ``DEFAULT_VOCAB_CAP`` when ``vocab_size=None``, so the default path is
    bounded on an open-vocabulary corpus too).  Below the gate the driver
    sort is used; both paths are proven identical in tests."""
    vocab, total = _fit_vocab_counts(
        ds, text_col, vocab_size=vocab_size, pattern=pattern,
        num_buckets=num_buckets, driver_vocab_max=driver_vocab_max)
    return _unigram_from_counts(vocab, total, pattern)


def _unigram_from_counts(vocab: pa.Table, total: int,
                         pattern: str) -> UnigramLM:
    v = vocab.num_rows
    denom = float(total + v + 1)
    c = vocab.column("count").to_numpy(zero_copy_only=False).astype(np.float64)
    logp = np.log((c + 1.0) / denom)
    return UnigramLM(
        vocab=pa.table({"term": vocab.column("term"),
                        "logp": pa.array(logp, pa.float64())}),
        oov_logp=float(np.log(1.0 / denom)),
        total_tokens=total, pattern=pattern)


def score_unigram_lm(ds, lm: UnigramLM, *, text_col: str = "text",
                     out_col: str = "nll", batch_size: int | None = 8192):
    """Append ``n_tokens`` (int64) and ``out_col`` (float64, mean negative
    log-likelihood; null when the document has no tokens).  The vocab table
    is broadcast once via ``ray.put``; scoring is a stateless map."""
    import ray

    vocab_ref = ray.put(lm.vocab)
    oov, pattern = lm.oov_logp, lm.pattern

    def score(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        flat, doc_idx = _tokenize(batch.column(text_col).combine_chunks(),
                                  pattern)
        vocab = ray.get(vocab_ref)
        pos = pc.index_in(flat, value_set=vocab.column("term"))
        lp = pc.fill_null(
            pc.take(vocab.column("logp"), pos), oov) \
            .to_numpy(zero_copy_only=False)
        sums = np.bincount(doc_idx, weights=lp, minlength=n)
        ntok = np.bincount(doc_idx, minlength=n).astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            nll = np.where(ntok > 0, -sums / np.maximum(ntok, 1), np.nan)
        out = batch.append_column("n_tokens", pa.array(ntok))
        return out.append_column(
            out_col, pa.array(nll, pa.float64(), from_pandas=True))

    return ds.map_batches(score, batch_format="pyarrow",
                          batch_size=batch_size)


def bigram_counts(ds, text_col: str, *, pattern: str = TOKEN_SPLIT_PATTERN,
                  num_buckets: int | None = None):
    """(pair, count) Dataset of adjacent-token bigrams, where ``pair`` is
    ``prev + ' ' + term`` (tokens are ``[a-z0-9]+`` after the RE2 split,
    so the space separator is unambiguous).  Pairs never cross document
    boundaries.  Same two-phase shape as ``term_counts``: per-batch
    vectorized pairing + value_counts combiner, then the bucketed int64
    sum — the shuffle carries (string, int64) rows only."""
    from webval.exchange import bucketed_group_apply

    def partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _tokenize(batch.column(text_col).combine_chunks(),
                                  pattern)
        if len(doc_idx) < 2:
            return pa.table({"pair": pa.array([], pa.string()),
                             "count": pa.array([], pa.int64())})
        same = doc_idx[1:] == doc_idx[:-1]
        idx = np.flatnonzero(same) + 1
        prev = flat.take(pa.array(idx - 1, pa.int64()))
        cur = flat.take(pa.array(idx, pa.int64()))
        pairs = pc.binary_join_element_wise(prev, cur, " ")
        vc = pairs.value_counts()
        return pa.table({"pair": vc.field("values"),
                         "count": pc.cast(vc.field("counts"), pa.int64())})

    def final(g: pa.Table) -> pa.Table:
        agg = g.group_by("pair").aggregate([("count", "sum")])
        return agg.select(["pair", "count_sum"]) \
            .rename_columns(["pair", "count"])

    return bucketed_group_apply(ds.select_columns([text_col]), ["pair"],
                                final, num_buckets=num_buckets,
                                partial_fn=partial)


@dataclass
class BigramLM:
    """Interpolated bigram model over the unigram base: a non-initial
    token w after context v scores

        ln( λ·(c(v,w)+1)/(c(v)+V+1)  +  (1−λ)·(c(w)+1)/(total+V+1) )

    (add-one smoothing on both components, shared vocabulary V from the
    unigram fit); each document's FIRST token scores its plain unigram
    log-probability.  An unseen pair contributes c(v,w)=0 and an unseen
    context c(v)=0 — the estimate degrades smoothly toward the unigram
    term, the standard fixed-weight interpolation (Jelinek-Mercer with
    constant λ; Chen & Goodman 1999 is the public reference)."""

    unigram: UnigramLM
    pairs: pa.Table                     # (pair "v w": string, count: int64)
    context: pa.Table                   # (term: string, count: int64)
    lam: float
    vocab_v: int


#: bigram-table cap for the fit (top pairs by count — bounds the broadcast
#: exactly like the unigram DEFAULT_VOCAB_CAP bounds the vocabulary).
DEFAULT_PAIR_CAP = 2_000_000


def fit_bigram_lm(ds, text_col: str, *, lam: float = 0.5,
                  vocab_size: int | None = None,
                  pair_cap: int | None = None,
                  pattern: str = TOKEN_SPLIT_PATTERN,
                  num_buckets: int | None = None,
                  driver_vocab_max: int = DRIVER_VOCAB_MAX) -> BigramLM:
    """Fit the interpolated bigram model: one unigram fit (same auto-gated
    vocabulary bound as ``fit_unigram_lm``) plus one bigram-count exchange
    whose retained table is bounded by ``pair_cap`` via the SAME
    distributed top-k selection — nothing unbounded reaches the driver on
    any default path.  Context counts reuse the unigram count table."""
    import ray

    vocab_counts, total = _fit_vocab_counts(
        ds, text_col, vocab_size=vocab_size, pattern=pattern,
        num_buckets=num_buckets, driver_vocab_max=driver_vocab_max)
    uni = _unigram_from_counts(vocab_counts, total, pattern)
    ctx = vocab_counts   # context counts ARE the retained vocab counts

    pairs_ds = bigram_counts(ds, text_col, pattern=pattern,
                             num_buckets=num_buckets).materialize()
    cap = pair_cap if pair_cap is not None else DEFAULT_PAIR_CAP
    if pairs_ds.count() > cap:
        pairs = _collect_topk_distributed(
            pairs_ds.map_batches(
                lambda t: t.rename_columns(["term", "count"]),
                batch_format="pyarrow"), cap) \
            .rename_columns(["pair", "count"])
    else:
        blocks = [ray.get(r) for r in pairs_ds.to_arrow_refs()]
        pairs = pa.concat_tables([b for b in blocks if b.num_rows],
                                 promote_options="permissive") \
            .combine_chunks() if any(b.num_rows for b in blocks) else \
            pa.table({"pair": pa.array([], pa.string()),
                      "count": pa.array([], pa.int64())})
    return BigramLM(unigram=uni, pairs=pairs, context=ctx, lam=lam,
                    vocab_v=uni.vocab.num_rows)


def score_bigram_lm(ds, blm: BigramLM, *, text_col: str = "text",
                    out_col: str = "nll", batch_size: int | None = 8192):
    """Append ``n_tokens`` and ``out_col`` = mean negative interpolated
    log-likelihood per document (null for zero-token docs).  The pair,
    context and unigram tables are each ``ray.put`` ONCE; scoring is a
    stateless vectorized map (index_in + bincount, no per-row python)."""
    import ray

    uni = blm.unigram
    pairs_ref = ray.put(blm.pairs)
    ctx_ref = ray.put(blm.context)
    vocab_ref = ray.put(uni.vocab)
    lam, v, total = blm.lam, blm.vocab_v, uni.total_tokens
    oov, pattern = uni.oov_logp, uni.pattern

    def score(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        flat, doc_idx = _tokenize(batch.column(text_col).combine_chunks(),
                                  pattern)
        vocab = ray.get(vocab_ref)
        pairs_t = ray.get(pairs_ref)
        ctx_t = ray.get(ctx_ref)
        ntok = np.bincount(doc_idx, minlength=n).astype(np.int64)
        m = len(doc_idx)
        if m == 0:
            nll = np.full(n, np.nan)
        else:
            # unigram log-prob of every token (used directly for doc-first
            # tokens, and as the interpolation base for the rest)
            pos = pc.index_in(flat, value_set=vocab.column("term"))
            lp1 = pc.fill_null(pc.take(vocab.column("logp"), pos), oov) \
                .to_numpy(zero_copy_only=False)
            p1 = np.exp(lp1)
            is_first = np.r_[True, doc_idx[1:] != doc_idx[:-1]]
            scores = lp1.copy()
            rest = np.flatnonzero(~is_first)
            if len(rest):
                prev = flat.take(pa.array(rest - 1, pa.int64()))
                cur = flat.take(pa.array(rest, pa.int64()))
                key = pc.binary_join_element_wise(prev, cur, " ")
                ppos = pc.index_in(key, value_set=pairs_t.column("pair"))
                c2 = pc.fill_null(
                    pc.take(pairs_t.column("count"), ppos), 0) \
                    .to_numpy(zero_copy_only=False).astype(np.float64)
                cpos = pc.index_in(prev, value_set=ctx_t.column("term"))
                c1 = pc.fill_null(
                    pc.take(ctx_t.column("count"), cpos), 0) \
                    .to_numpy(zero_copy_only=False).astype(np.float64)
                p2 = (c2 + 1.0) / (c1 + v + 1.0)
                scores[rest] = np.log(lam * p2 + (1.0 - lam) * p1[rest])
            sums = np.bincount(doc_idx, weights=scores, minlength=n)
            with np.errstate(divide="ignore", invalid="ignore"):
                nll = np.where(ntok > 0, -sums / np.maximum(ntok, 1),
                               np.nan)
        out = batch.append_column("n_tokens", pa.array(ntok))
        return out.append_column(
            out_col, pa.array(nll, pa.float64(), from_pandas=True))

    return ds.map_batches(score, batch_format="pyarrow",
                          batch_size=batch_size)


def bpe_train(ds, text_col: str, n_merges: int, *,
              pattern: str = TOKEN_SPLIT_PATTERN,
              vocab_size: int | None = 262_144,
              end_of_word: str = "</w>",
              num_buckets: int | None = None):
    """Byte-pair-encoding merge training (Sennrich et al. 2016) the way
    the original implementation works: BPE statistics depend on the
    corpus only through the WORD-FREQUENCY table, so the distributed
    part is exactly ONE word-count exchange (capped at the
    ``vocab_size`` most frequent word types, the same bound
    :func:`fit_unigram_lm` uses) and the ``n_merges`` greedy rounds run
    over that vocabulary table — never over the corpus.  Ties on pair
    count break lexicographically (deterministic across runs and
    engines).  Each word is a character sequence with ``end_of_word``
    appended to its last symbol.

    Returns {"merges": [(a, b), ...] in order, "vocab": {symbol: rank}}
    where rank orders single characters first (sorted), then merges.

    Scale shape: corpus → (word, count) exchange (combiner-bounded) →
    driver merge loop over the word table; each round re-counts pairs
    with numpy over the segmented words — O(vocab · avg_word_len) per
    round, independent of corpus size."""
    from webval.rank import top_k_per_group

    if n_merges < 0:
        raise ValueError(f"bpe_train: n_merges must be >= 0, "
                         f"got {n_merges}")
    counts = term_counts(ds, text_col, pattern=pattern,
                         num_buckets=num_buckets)
    if vocab_size is not None:
        counts = counts.map_batches(
            lambda t: t.append_column(
                "_one", pa.nulls(t.num_rows, pa.int64()).fill_null(1)),
            batch_format="pyarrow")
        counts = top_k_per_group(counts, "_one", "count", vocab_size,
                                 tie_cols=["term"],
                                 num_buckets=num_buckets)
        counts = counts.map_batches(
            lambda t: t.drop_columns(["_one"]), batch_format="pyarrow")
    # the word table is vocab_size-bounded — this read is the trainer
    import ray

    blocks = [b for b in (ray.get(r)
                          for r in counts.materialize().to_arrow_refs())
              if b.num_rows > 0]
    words, freqs = [], []
    for b in blocks:
        words += [str(w) for w in b.column("term").to_pylist()]
        freqs += b.column("count").to_pylist()

    segs = [tuple(w[:-1]) + (w[-1] + end_of_word,) for w in words]
    chars = sorted({c for s in segs for c in s})
    merges: list[tuple[str, str]] = []
    from collections import Counter
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for s, f in zip(segs, freqs):
            for a, b in zip(s, s[1:]):
                pair_counts[(a, b)] += f
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        new_segs = []
        for s in segs:
            if a not in s:
                new_segs.append(s)
                continue
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            new_segs.append(tuple(out))
        segs = new_segs
    vocab = {c: i for i, c in enumerate(chars)}
    for a, b in merges:
        vocab[a + b] = len(vocab)
    return {"merges": merges, "vocab": vocab}


def bpe_apply(ds, text_col: str, merges: list, *,
              pattern: str = TOKEN_SPLIT_PATTERN,
              end_of_word: str = "</w>",
              out_col: str = "bpe_tokens",
              batch_size: int | None = 8192):
    """Apply a trained BPE merge list: appends ``out_col`` with the
    number of BPE tokens per document — the REAL token count a trainer
    budget needs (whitespace counts undercount non-English by 2-4×).

    Scale shape: per batch, segmentation runs once per UNIQUE word
    (value_counts first — web text repeats words heavily) with the
    merge-rank dict broadcast in the closure; counts map back to docs
    through an index_in take, so per-row work is vectorized except the
    per-unique-word merge walk every BPE tokenizer pays."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def count_word(w: str) -> int:
        s = list(w[:-1]) + [w[-1] + end_of_word]
        while len(s) > 1:
            best_i, best_r = -1, None
            for i in range(len(s) - 1):
                r = ranks.get((s[i], s[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            s[best_i:best_i + 2] = [s[best_i] + s[best_i + 1]]
        return len(s)

    def apply(t: pa.Table) -> pa.Table:
        flat, doc_idx = _tokenize(t.column(text_col).combine_chunks(),
                                  pattern)
        if len(flat) == 0:
            return t.append_column(
                out_col, pa.array(np.zeros(t.num_rows, np.int64)))
        vc = flat.value_counts()
        uniq = vc.field("values")
        per_word = np.array([count_word(str(w))
                             for w in uniq.to_pylist()], dtype=np.int64)
        pos = pc.index_in(flat, value_set=uniq) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        tok_per_token = per_word[pos]
        out = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(out, doc_idx, tok_per_token)
        return t.append_column(out_col, pa.array(out))

    return ds.map_batches(apply, batch_format="pyarrow",
                          batch_size=batch_size)
