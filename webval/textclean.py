"""Corpus-level line deduplication (CCNet-style boilerplate removal) and
within-document repetition metrics (Gopher-style quality signals).

Both are standard LLM-training-data curation passes over web text:

- ``remove_boilerplate_lines``: a line that appears in >= ``min_docs``
  DISTINCT documents is boilerplate (nav bars, cookie banners, footers);
  drop it from every document.  Two streaming passes: (1) per-batch
  line-split + per-document dedup + hash, counted through the hash-bucket
  exchange carrying ONLY (int64 line-hash, count) rows; (2) the frequent
  set (small by construction — boilerplate is the repeated tail) is
  broadcast once via ``ray.put`` and every batch rewrites its documents
  with a vectorized searchsorted membership test.  Like CCNet's paragraph
  dedup, identity is by 64-bit hash: across ~1e10 lines the expected
  collision count is <<1, and a collision only ever drops one extra line.
- ``repetition_stats``: per-document duplicate-line counts/char-fraction
  and the top (overlapping) 2-gram coverage — pure per-batch numpy over
  Arrow list offsets, no shuffle, no per-row Python.

Line semantics are byte-exact ``split(delimiter)`` (Arrow
``split_pattern``): no trimming, empty segments kept — mirrored 1:1 by the
DuckDB ``string_split`` twins in webval/queries.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webval.exchange import grouped_count
from webval.sketches import hash64


def _split_lines(text_col: pa.ChunkedArray | pa.Array, delimiter: str):
    """(flat large_string values, int64 offsets) of the per-row line
    lists.  Normalizes to large offsets so 128MB binary-heavy blocks
    cannot overflow 32-bit list offsets."""
    arr = text_col.combine_chunks() if isinstance(text_col, pa.ChunkedArray) \
        else text_col
    arr = pc.cast(arr, pa.large_string())
    ls = pc.split_pattern(arr, delimiter)
    if isinstance(ls, pa.ChunkedArray):
        ls = ls.combine_chunks()
    return ls.values, ls.offsets.to_numpy().astype(np.int64)


def _per_doc_dedup_hashes(flat: pa.Array, offsets: np.ndarray):
    """Hashes of the flat lines plus a boolean mask selecting the FIRST
    occurrence of each distinct line within its document (vectorized:
    lexsort by (row, hash), drop adjacent equals)."""
    h = hash64(flat.to_numpy(zero_copy_only=False))
    counts = np.diff(offsets)
    rows = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    if len(h) == 0:
        return h, rows, np.zeros(0, dtype=bool)
    order = np.lexsort((h, rows))
    hs, rs = h[order], rows[order]
    first_sorted = np.empty(len(h), dtype=bool)
    first_sorted[0] = True
    first_sorted[1:] = (hs[1:] != hs[:-1]) | (rs[1:] != rs[:-1])
    first = np.empty(len(h), dtype=bool)
    first[order] = first_sorted
    return h, rows, first


def frequent_lines(ds, text_col: str = "text", *, min_docs: int,
                   delimiter: str = "\n", num_buckets: int | None = None):
    """Dataset of ``(line_hash: int64, n_docs: int64)`` for every line
    appearing in >= ``min_docs`` distinct documents.  The shuffle carries
    int64 hashes only; per-batch per-document dedup makes the exchange
    count a distinct-document count (each document lives in exactly one
    input row)."""
    if min_docs < 2:
        raise ValueError("frequent_lines: min_docs must be >= 2 "
                         "(1 would mark every line boilerplate)")

    def explode(t: pa.Table) -> pa.Table:
        flat, off = _split_lines(t.column(text_col), delimiter)
        h, _rows, first = _per_doc_dedup_hashes(flat, off)
        return pa.table({"line_hash": pa.array(h[first].astype(np.int64))})

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    return grouped_count(exploded, "line_hash", min_count=min_docs,
                         out_col="n_docs", num_buckets=num_buckets)


def remove_boilerplate_lines(ds, id_col: str, text_col: str = "text", *,
                             min_docs: int, delimiter: str = "\n",
                             out_col: str = "clean_text",
                             num_buckets: int | None = None):
    """CCNet-style corpus line dedup: drop every line that occurs in >=
    ``min_docs`` distinct documents.  Returns ``(id_col, out_col,
    n_removed)``; documents whose every line is boilerplate come back as
    the empty string (matching the SQL twin's coalesce('')).

    The frequent-line set is materialized once (small — it is the
    *repeated* tail) and broadcast read-only via ``ray.put``; the rewrite
    pass is a stateless map with a searchsorted membership probe."""
    import ray

    freq = frequent_lines(ds, text_col, min_docs=min_docs,
                          delimiter=delimiter, num_buckets=num_buckets)
    hashes = np.sort(np.concatenate(
        [b.column("line_hash").to_numpy(zero_copy_only=False)
         for b in freq.iter_batches(batch_format="pyarrow")] or
        [np.array([], np.int64)]).astype(np.uint64))
    ref = ray.put(hashes)

    def rewrite(t: pa.Table) -> pa.Table:
        bad = ray.get(ref)
        flat, off = _split_lines(t.column(text_col), delimiter)
        h = hash64(flat.to_numpy(zero_copy_only=False))
        if len(bad):
            pos = np.searchsorted(bad, h)
            pos[pos == len(bad)] = 0
            drop = bad[pos] == h
        else:
            drop = np.zeros(len(h), dtype=bool)
        keep = ~drop
        counts = np.diff(off)
        rows = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        kept_per_row = np.bincount(rows[keep], minlength=len(counts)) \
            if len(rows) else np.zeros(len(counts), np.int64)
        new_off = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(kept_per_row, out=new_off[1:])
        kept_flat = flat.filter(pa.array(keep))
        la = pa.LargeListArray.from_arrays(pa.array(new_off, pa.int64()),
                                           kept_flat)
        clean = pc.binary_join(la, pa.scalar(delimiter, pa.large_string()))
        return pa.table({
            id_col: t.column(id_col),
            out_col: clean,
            "n_removed": pa.array((counts - kept_per_row).astype(np.int64)),
        })

    return ds.map_batches(rewrite, batch_format="pyarrow")


def repetition_stats(ds, id_col: str, text_col: str = "text", *,
                     delimiter: str = "\n",
                     keep_cols: list[str] | None = None):
    """Gopher-style within-document repetition signals, one row per doc:

    - ``n_lines``: segment count after splitting on ``delimiter``.
    - ``n_dup_lines``: occurrences beyond the first of each distinct line
      (a line repeated c times contributes c-1).
    - ``dup_char_frac``: characters (sum of line lengths, no separators)
      inside those beyond-first occurrences / total line characters
      (null when the doc has zero line characters).
    - ``top_bigram_chars``: max over (overlapping) line 2-grams of
      occurrences × len("a<delim>b") — the numerator of Gopher's
      top-2-gram coverage; null for docs with < 2 lines.

    One vectorized pass per batch (lexsort + run-length reductions over
    Arrow list offsets); no shuffle.
    """

    def stats(t: pa.Table) -> pa.Table:
        flat, off = _split_lines(t.column(text_col), delimiter)
        counts = np.diff(off)
        n_rows = len(counts)
        h = hash64(flat.to_numpy(zero_copy_only=False))
        rows = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(h):
            order = np.lexsort((h, rows))
            hs, rs, lns = h[order], rows[order], lens[order]
            first = np.empty(len(h), dtype=bool)
            first[0] = True
            first[1:] = (hs[1:] != hs[:-1]) | (rs[1:] != rs[:-1])
            dup = ~first
            n_dup = np.bincount(rs[dup], minlength=n_rows)
            dup_chars = np.bincount(rs[dup], weights=lns[dup],
                                    minlength=n_rows)
            tot_chars = np.bincount(rows, weights=lens, minlength=n_rows)
        else:
            n_dup = np.zeros(n_rows, np.int64)
            dup_chars = np.zeros(n_rows, np.float64)
            tot_chars = np.zeros(n_rows, np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            dup_frac = dup_chars / tot_chars
        no_chars = tot_chars == 0

        # overlapping 2-grams: pair i with i+1 within the same row
        pair_mask = np.zeros(len(h), dtype=bool)
        if len(h):
            pair_mask[:-1] = rows[:-1] == rows[1:]
        pi = np.flatnonzero(pair_mask)
        top = np.zeros(n_rows, dtype=np.int64)
        has_bigram = counts >= 2
        if len(pi):
            with np.errstate(over="ignore"):
                bh = h[pi] * np.uint64(0x9E3779B97F4A7C15) ^ h[pi + 1]
            brows = rows[pi]
            blen = lens[pi] + lens[pi + 1] + len(delimiter)
            order = np.lexsort((bh, brows))
            bhs, brs, bls = bh[order], brows[order], blen[order]
            new = np.empty(len(pi), dtype=bool)
            new[0] = True
            new[1:] = (bhs[1:] != bhs[:-1]) | (brs[1:] != brs[:-1])
            starts = np.flatnonzero(new)
            run_counts = np.diff(np.append(starts, len(pi)))
            covered = run_counts * bls[starts]
            np.maximum.at(top, brs[starts], covered)

        return pa.table({
            id_col: t.column(id_col),
            **{c: t.column(c) for c in (keep_cols or [])},
            "n_lines": pa.array(counts.astype(np.int64)),
            "n_dup_lines": pa.array(n_dup.astype(np.int64)),
            # exact integer numerator/denominator alongside the ratio —
            # rounding a ratio that lands exactly on a decimal tie (e.g.
            # 33/128) differs between round-half-even and SQL's
            # half-away, so cross-engine comparisons should use these
            "dup_chars": pa.array(dup_chars.astype(np.int64)),
            "total_chars": pa.array(tot_chars.astype(np.int64)),
            "dup_char_frac": pa.array(
                np.where(no_chars, np.nan, dup_frac), pa.float64(),
                mask=no_chars),
            "top_bigram_chars": pa.array(
                np.where(has_bigram, top, 0).astype(np.int64),
                mask=~has_bigram),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


def chunk_text(ds, id_col: str, text_col: str = "text", *,
               window: int, overlap: int = 0, delimiter: str = " "):
    """Split documents into sliding ``window``-token chunks overlapping by
    ``overlap`` tokens — the standard pre-training/RAG passage-chunking
    pass.  Tokens are ``delimiter``-split segments; chunk starts are
    ``0, window-overlap, 2*(window-overlap), ...`` while they stay below
    ``max(n_tokens - overlap, 1)``, so every token is covered and a
    document shorter than one window yields exactly one chunk.

    Output: one row per chunk ``(id_col, chunk_id, chunk_text, n_tokens)``
    in document order.  Pure per-batch numpy/Arrow gather over list
    offsets (token strings are never materialized row-by-row); a flat_map
    shape, so downstream stages see chunk-sized rows and the streaming
    executor rebalances block sizes automatically.
    """
    if window <= 0 or overlap < 0 or overlap >= window:
        raise ValueError(f"chunk_text: need 0 <= overlap < window "
                         f"(got window={window}, overlap={overlap})")
    step = window - overlap

    def chunks(t: pa.Table) -> pa.Table:
        flat, off = _split_lines(t.column(text_col), delimiter)
        counts = np.diff(off)
        n_rows = len(counts)
        span = np.maximum(counts - overlap, 1)
        n_chunks = (span + step - 1) // step
        doc_idx = np.repeat(np.arange(n_rows, dtype=np.int64), n_chunks)
        row_first = np.cumsum(n_chunks) - n_chunks  # ordinal of row's chunk 0
        chunk_id = np.arange(len(doc_idx), dtype=np.int64) \
            - np.repeat(row_first, n_chunks)
        s = chunk_id * step
        a_start = off[doc_idx] + s
        a_end = np.minimum(a_start + window, off[doc_idx + 1])
        lens = a_end - a_start
        total = int(lens.sum())
        if total:
            starts_rep = np.repeat(a_start, lens)
            base = np.repeat(np.cumsum(lens) - lens, lens)
            idx = starts_rep + (np.arange(total) - base)
            vals = flat.take(pa.array(idx, pa.int64()))
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
        else:
            vals = pa.array([], pa.large_string())
        new_off = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=new_off[1:])
        la = pa.LargeListArray.from_arrays(pa.array(new_off, pa.int64()),
                                           vals)
        txt = pc.binary_join(la, pa.scalar(delimiter, pa.large_string()))
        ids = t.column(id_col).take(pa.array(doc_idx, pa.int64()))
        return pa.table({
            id_col: ids,
            "chunk_id": pa.array(chunk_id, pa.int64()),
            "chunk_text": txt,
            "n_tokens": pa.array(lens.astype(np.int64)),
        })

    return ds.map_batches(chunks, batch_format="pyarrow")


def contamination_check(ds, id_col: str, text_col: str = "text", *,
                        eval_texts: list, window: int = 8):
    """Benchmark-decontamination pass: flag every training document that
    shares at least one character ``window``-gram with any text in the
    evaluation set (the standard n-gram-overlap contamination test).

    The eval set is shingled ONCE on the driver (it is benchmark-sized by
    definition), its unique shingle hashes broadcast via ``ray.put``; each
    batch computes per-doc unique rolling hashes directly off the Arrow
    string buffer (textstats.rolling_hashes_arrow — zero per-row Python)
    and probes them with one searchsorted.  Output, one row per doc:
    ``(id_col, n_shingles, n_contaminated, contaminated)`` where
    ``n_contaminated`` counts distinct overlapping shingles; documents
    shorter than ``window`` chars have zero shingles and are clean.
    """
    import ray

    from webval.textstats import rolling_hashes_arrow, rolling_hashes_batch

    _kept, _counts, ev_hashes = rolling_hashes_batch(list(eval_texts),
                                                     window)
    ev = np.unique(ev_hashes)
    ref = ray.put(ev)

    def probe(t: pa.Table) -> pa.Table:
        bad = ray.get(ref)
        kept, counts, hashes = rolling_hashes_arrow(t.column(text_col),
                                                    window)
        n = t.num_rows
        n_sh = np.zeros(n, dtype=np.int64)
        n_sh[kept] = counts
        n_cont = np.zeros(n, dtype=np.int64)
        if len(hashes) and len(bad):
            pos = np.searchsorted(bad, hashes)
            pos[pos == len(bad)] = 0
            hit = bad[pos] == hashes
            doc_of = np.repeat(kept, counts)
            n_cont += np.bincount(doc_of[hit], minlength=n).astype(np.int64)
        return pa.table({
            id_col: t.column(id_col),
            "n_shingles": pa.array(n_sh),
            "n_contaminated": pa.array(n_cont),
            "contaminated": pa.array(n_cont > 0),
        })

    return ds.map_batches(probe, batch_format="pyarrow")


def curate_web_text(ds, id_col: str, text_col: str = "text", *,
                    min_docs: int, window: int, overlap: int = 0,
                    max_dup_num: int = 1, max_dup_den: int = 4,
                    delimiter: str = " ", num_buckets: int | None = None):
    """End-to-end web-text curation composite, one streaming pipeline:

    1. corpus boilerplate-line removal (``remove_boilerplate_lines``),
    2. within-document repetition filter on the CLEANED text — keep docs
       with ``dup_chars * max_dup_den <= total_chars * max_dup_num``
       (default: at most 1/4 of characters inside repeated lines; empty
       docs have 0 <= 0 and are kept, then yield one empty chunk),
    3. sliding-window passage chunking (``chunk_text``).

    Returns the chunk Dataset ``(id_col, chunk_id, chunk_text,
    n_tokens)``.  Every stage is individually oracle-checked; the
    ``curation_v2`` query checks this COMPOSITION against one SQL twin.
    Integer cross-multiplication keeps the filter exact (no float ratio).
    """
    clean = remove_boilerplate_lines(ds, id_col, text_col,
                                     min_docs=min_docs,
                                     delimiter=delimiter,
                                     num_buckets=num_buckets)
    stats = repetition_stats(clean, id_col, "clean_text",
                             delimiter=delimiter,
                             keep_cols=["clean_text"])

    def keep(t: pa.Table) -> pa.Table:
        ok = pc.less_equal(
            pc.multiply(t.column("dup_chars"),
                        pa.scalar(max_dup_den, pa.int64())),
            pc.multiply(t.column("total_chars"),
                        pa.scalar(max_dup_num, pa.int64())))
        return t.filter(ok).select([id_col, "clean_text"])

    kept = stats.map_batches(keep, batch_format="pyarrow")
    return chunk_text(kept, id_col, "clean_text", window=window,
                      overlap=overlap, delimiter=delimiter)


def frequent_ngrams(ds, text_col: str = "text", *, n: int = 2,
                    min_count: int, delimiter: str = " ",
                    num_buckets: int | None = None):
    """Corpus-wide frequent word n-grams (template/boilerplate discovery —
    the corpus-level companion of ``frequent_lines``): every n-token window
    of every document, counted exactly, keeping n-grams seen ≥ ``min_count``
    times.

    Scale shape: n-gram construction is pure Arrow take + join over the
    split word lists (no per-row Python); each batch pre-reduces with a
    ``value_counts`` combiner so the exchange shuffles (ngram, partial
    count) pairs — bounded by DISTINCT n-grams per batch, not corpus size.
    Output: (ngram, cnt) rows.
    """
    from webval.exchange import bucketed_group_apply

    if n < 1:
        raise ValueError(f"frequent_ngrams: n={n}")

    def partial(t: pa.Table) -> pa.Table:
        flat, off = _split_lines(t.column(text_col), delimiter)
        counts = np.diff(off)
        empty = pa.table({"ngram": pa.array([], pa.large_string()),
                          "cnt": pa.array([], pa.int64())})
        if len(flat) == 0:
            return empty
        rows_len = np.repeat(counts, counts)
        pos_in_doc = np.arange(len(flat)) - np.repeat(off[:-1], counts)
        starts = np.nonzero(pos_in_doc + n <= rows_len)[0]
        if len(starts) == 0:
            return empty
        parts = [flat.take(pa.array(starts + j, pa.int64()))
                 for j in range(n)]
        ng = parts[0] if n == 1 else pc.binary_join_element_wise(
            *parts, pa.scalar(delimiter, pa.large_string()))
        vc = ng.value_counts()
        return pa.table({"ngram": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    def final(g: pa.Table) -> pa.Table:
        agg = g.group_by("ngram").aggregate([("cnt", "sum")])
        agg = agg.select(["ngram", "cnt_sum"]).rename_columns(["ngram", "cnt"])
        return agg.filter(pc.greater_equal(agg.column("cnt"), min_count))

    return bucketed_group_apply(ds.select_columns([text_col]), ["ngram"],
                                final, num_buckets=num_buckets,
                                partial_fn=partial)


#: lazily built, per-process cache: form -> RE2 character-class pattern
#: matching every "suspect" codepoint (see ``_norm_suspect_pattern``).
_NORM_SUSPECT_PAT: dict[str, str] = {}

# Hangul jamo V/T ranges — the second characters of the *algorithmic*
# LV / LVT compositions, which no decomposition-table scan can discover.
_JAMO_V = (0x1161, 0x1176)
_JAMO_T = (0x11A8, 0x11C3)


def _norm_suspect_pattern(form: str) -> str:
    """Build (once per process, ~0.7 s, cached) an RE2 character class of
    every codepoint that could make a string NOT be a fixed point of
    ``unicodedata.normalize(form, ...)``:

    - codepoints with combining class > 0 (may need canonical reordering,
      and are the second characters of most primary composites),
    - codepoints that are not themselves fixed points of ``form``
      (anything with a relevant decomposition: singletons, composition
      exclusions, compatibility characters under NFK*),
    - for the composing forms (NFC/NFKC) additionally the "maybe" set:
      second characters of recomposing canonical pairs — including the
      ccc=0 Indic length marks (e.g. U+0BBE) — plus Hangul V/T jamo.

    A string containing NO suspect codepoint is provably already in
    ``form``: every char is a ccc=0 fixed point, so no reordering, no
    decomposition, and (for NFC/NFKC) no composition can fire because
    every composition's second character is in the suspect set.
    Exhaustively property-tested in ``tests/test_textclean.py``.

    Derived from the stdlib ``unicodedata`` tables so the vectorized
    fast path can never diverge from the Python-loop semantics (this
    box's pyarrow 16.1 ``pc.utf8_normalize`` kernel does NOT compose —
    ``form="NFC"`` returns NFD output — so it is unusable here; see
    ``test_pyarrow_utf8_normalize_kernel_still_broken``)."""
    import unicodedata

    pat = _NORM_SUSPECT_PAT.get(form)
    if pat is not None:
        return pat
    sus = set()
    for cp in range(0x110000):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        ch = chr(cp)
        if unicodedata.combining(ch) > 0 or \
                unicodedata.normalize(form, ch) != ch:
            sus.add(cp)
    if form in ("NFC", "NFKC"):
        for cp in range(0x110000):
            if 0xD800 <= cp <= 0xDFFF:
                continue
            d = unicodedata.normalize("NFD", chr(cp))
            if len(d) == 2 and unicodedata.normalize("NFC", d) == chr(cp):
                sus.add(ord(d[1]))
        sus.update(range(*_JAMO_V))
        sus.update(range(*_JAMO_T))
    cps = sorted(sus)
    parts, i = [], 0
    while i < len(cps):
        j = i
        while j + 1 < len(cps) and cps[j + 1] == cps[j] + 1:
            j += 1
        a, b = cps[i], cps[j]
        parts.append(f"\\x{{{a:X}}}" if a == b
                     else f"\\x{{{a:X}}}-\\x{{{b:X}}}")
        i = j + 1
    pat = "[" + "".join(parts) + "]"
    _NORM_SUSPECT_PAT[form] = pat
    return pat


def normalize_unicode(ds, text_col: str = "text", *, form: str = "NFC",
                      out_col: str | None = None,
                      batch_size: int | None = 8192):
    """Unicode normalization of a text column (stdlib ``unicodedata``
    semantics, no external deps).  Vectorized quick-check: one RE2 scan
    per batch flags rows containing any "suspect" codepoint
    (``_norm_suspect_pattern``); unflagged rows — pure ASCII, precomposed
    Latin/CJK/Hangul, anything already in ``form`` without combining
    marks — are provably fixed points and pass through zero-copy.  Only
    flagged rows (genuinely decomposed / reorderable / compat text) are
    taken out, normalized in Python, and scattered back with a single
    vectorized ``take`` — the per-row loop is bounded by the non-NFC row
    count, not the batch.  DuckDB twin for NFC: ``nfc_normalize``."""
    import unicodedata

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"normalize_unicode: form={form!r}")
    out = out_col or text_col

    def fn(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        pat = _norm_suspect_pattern(form)
        work = pc.fill_null(pc.match_substring_regex(col, pat), False) \
            .to_numpy(zero_copy_only=False).astype(bool)
        if not work.any():
            norm = col
        else:
            idx = np.nonzero(work)[0]
            sub = col.take(pa.array(idx, pa.int64()))
            fixed = pa.array([None if v is None
                              else unicodedata.normalize(form, v)
                              for v in sub.to_pylist()], col.type)
            take_idx = np.arange(len(col), dtype=np.int64)
            take_idx[idx] = len(col) + np.arange(len(idx), dtype=np.int64)
            norm = pa.concat_arrays([col, fixed]).take(
                pa.array(take_idx, pa.int64()))
        if out == text_col:
            return t.set_column(t.column_names.index(text_col), out, norm)
        return t.append_column(out, norm)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def tag_blocklist(ds, text_col: str, phrases: list[str], *,
                  out_col: str = "blocked"):
    """Row-level blocklist tagger: appends a boolean ``out_col`` true
    when the lowercased text contains ANY of the (lowercase) phrases
    as a substring — the safety-filter stage of a curation pipeline.
    Substring (not word-boundary) semantics: "f—g" matches obfuscated
    and embedded forms alike; anchor with spaces in the phrase itself
    if word-ish behavior is wanted.  Null text tags false.

    Scale shape: stateless map; one vectorized RE2-free
    ``match_substring`` kernel pass per phrase per batch (phrase lists
    are policy-sized — tens to low thousands; for very large lists
    compile one alternation upstream)."""
    if not phrases:
        raise ValueError("tag_blocklist: empty phrase list")
    phrases = [p.lower() for p in phrases]

    def tag(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(pc.fill_null(
            t.column(text_col).combine_chunks().cast(pa.large_string()),
            ""))
        m = pc.match_substring(low, phrases[0])
        for p in phrases[1:]:
            m = pc.or_(m, pc.match_substring(low, p))
        return t.append_column(out_col, m)

    return ds.map_batches(tag, batch_format="pyarrow")


def blocklist_counts(ds, text_col: str, phrases: list[str], *,
                     num_buckets: int | None = None):
    """Blocklist audit summary: per phrase, how many documents contain
    it (case-insensitive substring), plus an ``__any__`` row counting
    documents hit by at least one phrase (not derivable from the
    per-phrase counts — phrases overlap).  ``share`` is over non-null
    documents.  Returns Dataset[{phrase, n_docs, share}] sorted by
    phrase; phrases that match nothing still appear with n_docs = 0.

    Scale shape: one vectorized substring kernel per phrase per batch,
    collapsed to a ≤ (len(phrases)+2)-row partial before ONE tiny
    exchange; the doc total rides the exchange as a sentinel row."""
    import ray.data as rd

    from webval.exchange import grouped_agg

    if not phrases:
        raise ValueError("blocklist_counts: empty phrase list")
    plist = [p.lower() for p in phrases]

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(text_col).combine_chunks()
        col = col.filter(pc.is_valid(col))
        low = pc.utf8_lower(col.cast(pa.large_string()))
        names = list(plist) + ["__any__", ""]
        counts = []
        any_mask = None
        for p in plist:
            m = pc.match_substring(low, p)
            counts.append(pc.sum(m).as_py() or 0)
            any_mask = m if any_mask is None else pc.or_(any_mask, m)
        counts.append(pc.sum(any_mask).as_py() or 0)
        counts.append(len(low))
        return pa.table({"phrase": pa.array(names, pa.large_string()),
                         "n_docs": pa.array(counts, pa.int64())})

    agg = grouped_agg(
        ds.select_columns([text_col]).map_batches(partial,
                                                  batch_format="pyarrow"),
        ["phrase"], [("n_docs", "sum")], rename={"n_docs_sum": "n_docs"},
        num_buckets=num_buckets).materialize()
    sent = agg.filter(expr="phrase == ''").take_all()
    total = sent[0]["n_docs"] if sent else 0
    if total == 0:
        return rd.from_arrow(pa.schema(
            [("phrase", pa.large_string()), ("n_docs", pa.int64()),
             ("share", pa.float64())]).empty_table())

    def finalize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t.column("phrase"), "")))
        share = pc.divide(pc.cast(t.column("n_docs"), pa.float64()),
                          pa.scalar(float(total)))
        return pa.table({"phrase": t.column("phrase"),
                         "n_docs": t.column("n_docs"), "share": share})

    return agg.map_batches(finalize, batch_format="pyarrow") \
        .sort("phrase")


def prefix_rule_match(ds, col: str, rules: list[tuple[str, str, int]], *,
                      default_action: str = "allow",
                      batch_size: int | None = 65536):
    """Longest-prefix rule matching (robots.txt / URL-blocklist semantics):
    each row's ``col`` is matched against every rule prefix and the LONGEST
    matching prefix wins (ties broken by rule_id for determinism); rows no
    rule matches get rule_id −1 and ``default_action``.

    ``rules``: list of (prefix, action, rule_id).  The rule set is a
    closure-shipped constant (rule tables are KBs even for real crawl
    policies — 100k-rule sets should move to a broadcast trie, same
    interface); matching is one vectorized ``pc.starts_with`` kernel per
    rule + one numpy argmax over the (rules × rows) mask — no Python loop
    over rows.  Appends ``rule_id`` (int64) and ``action`` (string).
    """
    prefixes = [r[0] for r in rules]
    actions = np.asarray([r[1] for r in rules] + [default_action])
    ids = np.asarray([int(r[2]) for r in rules] + [-1], dtype=np.int64)
    # longest prefix wins; ties by LOWER rule_id: sort ranks accordingly
    order = sorted(range(len(prefixes)),
                   key=lambda i: (-len(prefixes[i]), ids[i]))
    rank = np.empty(len(prefixes), dtype=np.int64)
    for pos, i in enumerate(order):
        rank[i] = len(prefixes) - pos  # higher rank = wins argmax
    if len(set(prefixes)) != len(prefixes):
        raise ValueError("prefix_rule_match: duplicate rule prefixes")

    def tag(t: pa.Table) -> pa.Table:
        vals = t.column(col).combine_chunks()
        n = len(vals)
        if n == 0 or not prefixes:
            idx = np.full(n, len(ids) - 1, dtype=np.int64)
        else:
            score = np.zeros((len(prefixes), n), dtype=np.int64)
            for i, p in enumerate(prefixes):
                m = pc.fill_null(pc.starts_with(vals, p), False) \
                      .to_numpy(zero_copy_only=False)
                score[i][m] = rank[i]
            best = score.argmax(axis=0)
            hit = score[best, np.arange(n)] > 0
            idx = np.where(hit, best, len(ids) - 1)
        return (t.append_column("rule_id", pa.array(ids[idx]))
                 .append_column("action", pa.array(actions[idx])))

    return ds.map_batches(tag, batch_format="pyarrow", batch_size=batch_size)
