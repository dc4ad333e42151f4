"""Blocked edit-distance similarity join (fuzzy matching).

The classic entity-resolution shape: a cheap deterministic BLOCKING key
bounds the candidate set (pairs form only within a block — standard
practice per the record-linkage literature, e.g. Christen's survey), then
the exact Levenshtein distance of every candidate pair is computed with a
pair-axis-vectorized Wagner–Fischer DP.

Distribution: hash-bucket exchange on the block key
(``exchange.bucketed_group_apply``), so the all-to-all moves only
(block, id, string) triples; each bucket task enumerates its own pairs
with the shared ``dedup._within_group_pairs`` lexsort machinery and
scores them locally.  Combiner-less op: an oversized block raises the
exchange's named diagnostic instead of OOMing, and the semantics stay
block-complete (no silent truncation) so the DuckDB twin — the same
blocked self-join with its built-in ``levenshtein()`` — is exact.

Vectorized DP: one python step per ROW of the Wagner–Fischer matrix
(bounded by the longest left string, never by the pair count); the
in-row left-to-right dependency collapses via the min-plus prefix scan
``D[i,j] = j + min_{k<=j}(t[k] - k)`` (t = the up/diagonal candidate),
so every step is a handful of (P, L)-wide numpy kernels.  Distances are
BYTE-level — identical to character-level for ASCII; callers on
multibyte text must normalize first (queries assert ASCII like
``ngram_dup_pairs`` does).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webval.dedup import _within_group_pairs
from webval.exchange import bucketed_group_apply

_PAIR_CHUNK = 65536


def _padded_bytes(col) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string array → (``(n, Lmax)`` uint8 matrix zero-padded on the
    right, ``(n,)`` int64 byte lengths), built with one scatter off the
    arrow value buffer — no per-row python."""
    from webval.multimodal import _binary_buffers

    starts, lens, data, _valid = _binary_buffers(col)
    n = len(lens)
    lmax = int(lens.max()) if n else 0
    mat = np.zeros((n, lmax), dtype=np.uint8)
    if n and lens.sum():
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        cols = np.arange(int(lens.sum()), dtype=np.int64) \
            - np.repeat(np.cumsum(lens) - lens, lens)
        src = np.concatenate([data[s:s + l] for s, l
                              in zip(starts, lens)]) \
            if not _contiguous(starts, lens) else \
            data[starts[0]: starts[0] + int(lens.sum())]
        mat[rows, cols] = src
    return mat, lens.astype(np.int64)


def _contiguous(starts: np.ndarray, lens: np.ndarray) -> bool:
    return len(starts) == 0 or bool(
        np.all(starts[1:] == starts[:-1] + lens[:-1]))


def levenshtein_pairs(a_col, b_col) -> np.ndarray:
    """Exact Levenshtein distance for P aligned string pairs → int64[P].

    Wagner–Fischer advanced one matrix row per python iteration (≤ the
    longest string in ``a_col``), all arithmetic vectorized across the
    pair axis; the per-row snapshot at ``i == len(a)`` makes padding
    inert, so mixed-length batches are exact."""
    A, la = _padded_bytes(a_col)
    B, lb = _padded_bytes(b_col)
    p = len(la)
    if p == 0:
        return np.empty(0, np.int64)
    if A.shape[1] > B.shape[1]:           # iterate over the shorter side
        A, B, la, lb = B, A, lb, la
    lmax_b = B.shape[1]
    jj = np.arange(lmax_b + 1, dtype=np.int32)
    prev = np.broadcast_to(jj, (p, lmax_b + 1)).copy()
    out = np.where(la == 0, lb, -1)
    for i in range(1, A.shape[1] + 1):
        cost = (A[:, i - 1][:, None] != B).astype(np.int32)
        t = np.empty((p, lmax_b + 1), np.int32)
        t[:, 0] = i
        np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost, out=t[:, 1:])
        np.subtract(t, jj, out=t)
        np.minimum.accumulate(t, axis=1, out=t)
        np.add(t, jj, out=t)
        prev = t
        hit = la == i
        if hit.any():
            out[hit] = prev[hit, lb[hit]]
    return out.astype(np.int64)


def fuzzy_pairs(ds, id_col: str, str_col: str, block_cols: list[str], *,
                max_dist: int = 2, out_col: str | None = None,
                metric: str = "levenshtein", min_sim: float = 0.9,
                num_buckets: int | None = None,
                max_block_rows: int = 1024):
    """Blocked string-similarity self-join: every unordered pair of rows
    that shares all ``block_cols`` and passes the metric's threshold —
    ``metric="levenshtein"`` keeps ``levenshtein(a, b) <= max_dist``
    (int64 ``edit_distance``); ``metric="jaro_winkler"`` keeps
    ``jaro_winkler(a, b) >= min_sim`` (float64 ``similarity``, DuckDB
    semantics incl. the 0.7 boost threshold).

    Returns Dataset[{id_a, id_b, <out_col>}] with ``id_a < id_b`` (int64).
    Pairs never cross blocks — the blocking key IS part of the operator's
    contract (and of the SQL twin), not an approximation being hidden.
    A block larger than ``max_block_rows`` raises the exchange's named
    diagnostic (O(block²) pairs must stay bounded); per-pair work is the
    pair-axis-vectorized kernels above, no per-row python anywhere."""
    if metric not in ("levenshtein", "jaro_winkler"):
        raise ValueError(f"fuzzy_pairs: unknown metric {metric!r}")
    jw = metric == "jaro_winkler"
    if out_col is None:
        out_col = "similarity" if jw else "edit_distance"
    out_type = pa.float64() if jw else pa.int64()
    block_cols = list(block_cols)
    proj = ds.map_batches(
        lambda t, cols=[id_col, str_col] + block_cols: t.select(cols),
        batch_format="pyarrow")

    empty = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                       (out_col, out_type)])

    def score_block(g: pa.Table) -> pa.Table:
        ids = pc.cast(g.column(id_col), pa.int64()).combine_chunks() \
                .to_numpy(zero_copy_only=False)
        keys = tuple(
            pc.dictionary_encode(g.column(c).combine_chunks())
              .indices.to_numpy(zero_copy_only=False)
            for c in block_cols)
        pos_a, pos_b = _within_group_pairs(keys, ids, max_block_rows)
        if len(pos_a) == 0:
            return empty.empty_table()
        strs = g.column(str_col).combine_chunks()
        out_a, out_b, out_d = [], [], []
        for s in range(0, len(pos_a), _PAIR_CHUNK):
            ca, cb = pos_a[s:s + _PAIR_CHUNK], pos_b[s:s + _PAIR_CHUNK]
            if jw:
                d = jaro_winkler_pairs(strs.take(pa.array(ca)),
                                       strs.take(pa.array(cb)))
                keep = d >= min_sim
            else:
                d = levenshtein_pairs(strs.take(pa.array(ca)),
                                      strs.take(pa.array(cb)))
                keep = d <= max_dist
            out_a.append(ids[ca[keep]])
            out_b.append(ids[cb[keep]])
            out_d.append(d[keep])
        ia = np.concatenate(out_a)
        ib = np.concatenate(out_b)
        dd = np.concatenate(out_d)
        return pa.table({"id_a": pa.array(np.minimum(ia, ib), pa.int64()),
                         "id_b": pa.array(np.maximum(ia, ib), pa.int64()),
                         out_col: pa.array(dd, out_type)})

    return bucketed_group_apply(proj, block_cols, score_block,
                                num_buckets=num_buckets,
                                max_group_rows=max_block_rows)


def jaro_winkler_pairs(a_col, b_col, *, prefix_weight: float = 0.1,
                       max_prefix: int = 4) -> np.ndarray:
    """Jaro-Winkler similarity for P aligned string pairs → float64[P]
    (Winkler 1990, public formula; byte-level like levenshtein_pairs).

    Same vectorization shape as the DP above: one python step per
    character POSITION of the a side (≤ Lmax), each step a handful of
    (P, L)-wide numpy kernels that advance the greedy match assignment
    for every pair at once — never a python loop over pairs.  The greedy
    rule is the standard one (each a[i] takes the leftmost unused b[j]
    with b[j]==a[i] inside the match window), transpositions compare the
    matched sequences in a-order vs b-order, and the Winkler prefix boost
    is applied only when jaro exceeds the classic 0.7 boost threshold —
    with ANY empty string (even both) scoring 0.0.  Both rules are
    DuckDB's jaro_winkler_similarity semantics, fuzz-verified against it
    in tests.
    """
    A, la = _padded_bytes(a_col)
    B, lb = _padded_bytes(b_col)
    p = len(la)
    if p == 0:
        return np.empty(0, np.float64)
    La, Lb = A.shape[1], B.shape[1]
    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    jj = np.arange(Lb, dtype=np.int64)[None, :]
    in_b = jj < lb[:, None]
    used = np.zeros((p, Lb), dtype=bool)
    jpick = np.full((p, La), -1, dtype=np.int64)
    for i in range(La):
        active = i < la
        if not active.any():
            break
        cand = (B == A[:, i:i + 1]) & ~used & in_b \
            & (np.abs(jj - i) <= w[:, None]) & active[:, None]
        has = cand.any(axis=1)
        j = cand.argmax(axis=1)
        jpick[has, i] = j[has]
        used[has, j[has]] = True
    m = (jpick >= 0).sum(axis=1).astype(np.float64)

    # transpositions: matched chars in a-order vs in b-order
    rows, ii = np.nonzero(jpick >= 0)          # row-major → i ascending
    t_half = np.zeros(p, dtype=np.float64)
    if len(rows):
        a_chars = A[rows, ii]
        jv = jpick[rows, ii]
        order = np.lexsort((jv, rows))          # within row: j ascending
        b_chars = B[rows[order], jv[order]]
        mism = a_chars != b_chars
        np.add.at(t_half, rows[mism], 1.0)
    t = np.floor(t_half / 2.0)

    la_f = la.astype(np.float64)
    lb_f = lb.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = np.where(
            m > 0,
            (m / la_f + m / lb_f + (m - t) / np.where(m > 0, m, 1)) / 3.0,
            0.0)
    # common-prefix length, capped
    kmax = min(max_prefix, La, Lb)
    if kmax:
        eq = A[:, :kmax] == B[:, :kmax]
        k_ok = np.arange(kmax)[None, :] < np.minimum(la, lb)[:, None]
        run = np.cumprod(eq & k_ok, axis=1)
        l = run.sum(axis=1).astype(np.float64)
    else:
        l = np.zeros(p, np.float64)
    boosted = np.where(jaro > 0.7,
                       jaro + l * prefix_weight * (1.0 - jaro), jaro)
    return np.where((la == 0) | (lb == 0), 0.0, boosted)


def _score_pairs(a_col, b_col, metric: str, min_sim: float, max_dist: int):
    """Chunked metric kernel + keep mask over aligned pair columns."""
    outs, keeps = [], []
    for s in range(0, len(a_col), _PAIR_CHUNK):
        ca, cb = a_col.slice(s, _PAIR_CHUNK), b_col.slice(s, _PAIR_CHUNK)
        if metric == "jaro_winkler":
            d = jaro_winkler_pairs(ca, cb)
            keeps.append(d >= min_sim)
        else:
            d = levenshtein_pairs(ca, cb)
            keeps.append(d <= max_dist)
        outs.append(d)
    if not outs:
        return np.empty(0, np.float64), np.empty(0, bool)
    return np.concatenate(outs), np.concatenate(keeps)


def sorted_neighborhood_pairs(ds, id_col: str, str_col: str, *,
                              window: int = 3,
                              metric: str = "jaro_winkler",
                              min_sim: float = 0.9, max_dist: int = 2,
                              num_parts: int | None = None,
                              samples_per_block: int = 4,
                              max_part_rows: int = 2_000_000):
    """Sorted-neighborhood similarity self-join (Hernández & Stolfo's
    SNM blocking): sort all rows by ``str_col`` (ties by id), slide a
    ``window``-row window down the sorted order, score every pair at
    rank distance ≤ window with the metric, keep matches.  The blocking
    complement of ``fuzzy_pairs``: no block key needed — near-equal
    strings land adjacent in sort order even when no prefix/attribute
    block would group them.

    Returns Dataset[{id_a, id_b, similarity|edit_distance}] with id_a
    the RANK-earlier row (SQL twin: rns a JOIN rns b ON b.rn BETWEEN
    a.rn+1 AND a.rn+window).  The pair set is EXACT for the global sort
    order, independent of partitioning:

    - rows are range-partitioned by sampled key split points (per-block
      order-statistic samples; splits only affect balance, never the
      pair set),
    - within-part pairs are generated vectorized per part (one
      shifted-comparison pass per rank distance d = 1..window),
    - pairs that straddle part boundaries are reconstructed exactly
      from each part's first/last ``window`` rows + part sizes (any
      pair at rank distance ≤ window that crosses a boundary has BOTH
      ends and ALL intermediate rows inside that boundary set, so the
      rank gap a→b = rows_after_a_in_part + sum(sizes of whole parts
      between) + rows_before_b_in_part + 1 is computable without global
      row numbers); that set is O(window × num_parts) — driver-small by
      construction.

    Two passes over (id, key): a per-block order-statistic sampling
    pass for the split points (standard for range partitioning), then
    ONE range exchange; the materialize holds only the OUTPUT pairs +
    the boundary sliver.  A part larger than ``max_part_rows`` raises
    the exchange's named diagnostic."""
    import ray.data as rd

    from webval.exchange import resolve_num_buckets

    if metric not in ("levenshtein", "jaro_winkler"):
        raise ValueError(f"sorted_neighborhood_pairs: unknown metric "
                         f"{metric!r}")
    jw = metric == "jaro_winkler"
    out_col = "similarity" if jw else "edit_distance"
    out_type = pa.float64() if jw else pa.int64()
    nparts = resolve_num_buckets(num_parts)

    def clean(t: pa.Table) -> pa.Table:
        t = t.select([id_col, str_col])
        return t.filter(pc.and_(pc.is_valid(t.column(id_col)),
                                pc.is_valid(t.column(str_col))))

    base = ds.map_batches(clean, batch_format="pyarrow")

    # ---- phase 0: split points from per-block order-statistic samples
    def samp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k": pa.array([], pa.string())})
        ks = pc.cast(t.column(str_col), pa.string()).combine_chunks()
        srt = ks.take(pc.array_sort_indices(ks))
        idx = np.unique(np.linspace(0, len(srt) - 1,
                                    samples_per_block).astype(np.int64))
        return pa.table({"k": srt.take(pa.array(idx))})

    sample_batches = list(
        base.map_batches(samp, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow", batch_size=65536))
    ks = sorted(pa.concat_tables(sample_batches,
                                 promote_options="permissive")
                .column("k").to_pylist()) if sample_batches else []
    raw = [ks[(i * len(ks)) // nparts] for i in range(1, nparts)] \
        if ks else []
    splits = np.array(sorted(set(raw)), dtype="U") if raw \
        else np.empty(0, dtype="U1")

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("part", pa.array([], pa.int64()))
        k = t.column(str_col).combine_chunks() \
             .to_numpy(zero_copy_only=False).astype("U")
        part = np.searchsorted(splits, k, side="right") \
            if len(splits) else np.zeros(len(k), np.int64)
        return t.append_column("part", pa.array(part.astype(np.int64)))

    union_schema = pa.schema([
        ("kind", pa.int64()), ("id_a", pa.int64()), ("id_b", pa.int64()),
        (out_col, out_type), ("part", pa.int64()),
        ("idx_start", pa.int64()), ("idx_end", pa.int64()),
        ("size", pa.int64()), ("k", pa.string())])

    def final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return union_schema.empty_table()
        parts_np = g.column("part").combine_chunks() \
                    .to_numpy(zero_copy_only=False)
        ids_np = pc.cast(g.column(id_col), pa.int64()).combine_chunks() \
                   .to_numpy(zero_copy_only=False)
        keys_arr = pc.cast(g.column(str_col), pa.string()).combine_chunks()
        keys_np = keys_arr.to_numpy(zero_copy_only=False).astype("U")
        order = np.lexsort((ids_np, keys_np, parts_np))
        parts_s, ids_s = parts_np[order], ids_np[order]
        keys_s = keys_arr.take(pa.array(order))
        n = len(parts_s)
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = parts_s[1:] != parts_s[:-1]
        starts = np.nonzero(new)[0]
        sizes = np.diff(np.append(starts, n))
        pos = np.arange(n) - np.repeat(starts, sizes)
        idx_end = np.repeat(sizes, sizes) - 1 - pos

        out_a, out_b, out_d = [], [], []
        for d in range(1, window + 1):
            if d >= n:
                break
            cand = np.nonzero(parts_s[:-d] == parts_s[d:])[0]
            if len(cand) == 0:
                continue
            dd, keep = _score_pairs(keys_s.take(pa.array(cand)),
                                    keys_s.take(pa.array(cand + d)),
                                    metric, min_sim, max_dist)
            out_a.append(ids_s[cand[keep]])
            out_b.append(ids_s[cand[keep] + d])
            out_d.append(dd[keep])
        npairs = sum(len(x) for x in out_a)
        pairs_t = pa.table({
            "kind": pa.array(np.zeros(npairs, np.int64)),
            "id_a": pa.array(np.concatenate(out_a) if out_a
                             else np.empty(0, np.int64), pa.int64()),
            "id_b": pa.array(np.concatenate(out_b) if out_b
                             else np.empty(0, np.int64), pa.int64()),
            out_col: pa.array(np.concatenate(out_d) if out_d
                              else np.empty(0, np.float64), out_type),
            "part": pa.nulls(npairs, pa.int64()),
            "idx_start": pa.nulls(npairs, pa.int64()),
            "idx_end": pa.nulls(npairs, pa.int64()),
            "size": pa.nulls(npairs, pa.int64()),
            "k": pa.nulls(npairs, pa.string())})

        bmask = (pos < window) | (idx_end < window)
        bidx = np.nonzero(bmask)[0]
        bound_t = pa.table({
            "kind": pa.array(np.ones(len(bidx), np.int64)),
            "id_a": pa.array(ids_s[bidx], pa.int64()),
            "id_b": pa.nulls(len(bidx), pa.int64()),
            out_col: pa.nulls(len(bidx), out_type),
            "part": pa.array(parts_s[bidx], pa.int64()),
            "idx_start": pa.array(pos[bidx], pa.int64()),
            "idx_end": pa.array(idx_end[bidx], pa.int64()),
            "size": pa.array(np.repeat(sizes, sizes)[bidx], pa.int64()),
            "k": keys_s.take(pa.array(bidx))})
        return pa.concat_tables([pairs_t, bound_t])

    u = bucketed_group_apply(base.map_batches(assign,
                                              batch_format="pyarrow"),
                             ["part"], final, num_buckets=num_parts,
                             max_group_rows=max_part_rows).materialize()

    pairs_ds = u.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), 0))
                   .select(["id_a", "id_b", out_col]),
        batch_format="pyarrow")

    bt = pa.concat_tables(
        [b for b in u.map_batches(
            lambda t: t.filter(pc.equal(t.column("kind"), 1)),
            batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=65536)] or
        [union_schema.empty_table()], promote_options="permissive")

    # ---- phase B: exact cross-boundary pairs from the boundary sliver
    sizes_by_part: dict[int, int] = {}
    heads: dict[int, list] = {}
    tails: dict[int, list] = {}
    for row in bt.to_pylist():
        p = row["part"]
        sizes_by_part[p] = row["size"]
        if row["idx_start"] < window:
            heads.setdefault(p, []).append(row)
        if row["idx_end"] < window:
            tails.setdefault(p, []).append(row)
    ca, cb, cka, ckb = [], [], [], []
    plist = sorted(sizes_by_part)
    for i, p in enumerate(plist):
        inter = 0
        for q in plist[i + 1:]:
            if inter + 1 > window:
                break
            for a in tails.get(p, ()):
                for b in heads.get(q, ()):
                    if a["idx_end"] + inter + b["idx_start"] + 1 <= window:
                        ca.append(a["id_a"])
                        cb.append(b["id_a"])
                        cka.append(a["k"])
                        ckb.append(b["k"])
            inter += sizes_by_part[q]
    if ca:
        dd, keep = _score_pairs(pa.array(cka, pa.string()),
                                pa.array(ckb, pa.string()),
                                metric, min_sim, max_dist)
        cross_t = pa.table({
            "id_a": pa.array(np.asarray(ca, np.int64)[keep], pa.int64()),
            "id_b": pa.array(np.asarray(cb, np.int64)[keep], pa.int64()),
            out_col: pa.array(dd[keep], out_type)})
    else:
        cross_t = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                             (out_col, out_type)]).empty_table()
    return pairs_ds.union(rd.from_arrow(cross_t))
