"""Order statistics over the hash-bucket exchange: EXACT grouped quantiles
and top-k rows per group at any key cardinality.

Both are SURVEY.md §2-E8/F2 family ops that Ray's sort-based ``groupby``
cannot express efficiently (per-group Python walk) and the t-digest path
answers only approximately.  Shapes:

- ``grouped_exact_quantiles``: no combiner exists for exact quantiles, so the
  shuffle carries exactly two columns (key, value) — project before calling.
  One whole key group must fit a bucket task (same bound as sessionize /
  as-of joins; enforced via ``max_group_rows``).
- ``top_k_per_group``: HAS a combiner — each input batch is pre-reduced to at
  most k rows per key before the shuffle, so a hot key contributes k rows per
  batch, not its full row set (bounded skew, same argument as the exchange
  count combiner).

Quantile semantics match DuckDB's ``quantile_disc`` (lower discrete
quantile): on the n non-null values sorted ascending, q maps to index
``ceil(q*n) - 1`` (verified against DuckDB 1.x in-sandbox; n=9/q=0.9 -> 9,
n=3/q=0.75 -> 3 disambiguate it from the floor(q*(n-1)) variant).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webval.exchange import bucketed_group_apply


def _group_boundaries(sorted_keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, counts) of equal-key runs in an already-sorted key array."""
    n = len(sorted_keys)
    new = np.empty(n, dtype=bool)
    new[0] = True
    np.not_equal(sorted_keys[1:], sorted_keys[:-1], out=new[1:])
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, n))
    return starts, counts


def grouped_exact_quantiles(ds, key: str, value_col: str,
                            qs: dict[str, float], *,
                            interpolate: bool = False,
                            num_buckets: int | None = None,
                            max_group_rows: int | None = 4_000_000):
    """Exact per-group quantiles of ``value_col`` grouped by ``key`` —
    discrete (DuckDB ``quantile_disc``) by default, linear-interpolated
    continuous (``quantile_cont`` / percentile_cont: rank q*(n-1),
    interpolate between the flanking values) with ``interpolate=True``.

    ``qs`` maps output column name -> quantile in [0, 1].  Null values are
    ignored; a key whose values are all null is absent from the output
    (mirrors SQL ``WHERE value IS NOT NULL``).  Output value columns keep
    the input value type (discrete) or are float64 (continuous).
    """
    qs = dict(qs)
    proj = ds.map_batches(
        lambda t: t.select([key, value_col]).filter(
            pc.is_valid(t.column(value_col))),
        batch_format="pyarrow")

    def final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            vt = (pa.float64() if interpolate
                  else g.schema.field(value_col).type)
            return pa.table(
                {key: pa.array([], g.schema.field(key).type),
                 **{name: pa.array([], vt) for name in qs}})
        g = g.sort_by([(key, "ascending"), (value_col, "ascending")])
        kk = g.column(key).to_numpy(zero_copy_only=False)
        starts, counts = _group_boundaries(kk)
        vals = g.column(value_col)
        out = {key: g.column(key).take(pa.array(starts, pa.int64()))}
        if interpolate:
            vnum = vals.to_numpy(zero_copy_only=False).astype(np.float64)
        for name, q in qs.items():
            if interpolate:
                rank = q * (counts - 1)
                lo = np.floor(rank).astype(np.int64)
                frac = rank - lo
                hi = np.minimum(lo + 1, counts - 1)
                v = (vnum[starts + lo] * (1.0 - frac)
                     + vnum[starts + hi] * frac)
                out[name] = pa.array(v, pa.float64())
            else:
                idx = starts + np.maximum(
                    np.ceil(q * counts).astype(np.int64), 1) - 1
                out[name] = vals.take(pa.array(idx, pa.int64()))
        return pa.table(out)

    return bucketed_group_apply(proj, [key], final, num_buckets=num_buckets,
                                max_group_rows=max_group_rows)


def _topk_table(t: pa.Table, key: str, order_col: str, k: int,
                descending: bool, tie_cols: list[str]) -> pa.Table:
    """Rows of ``t`` ranking in the first k of their key group when ordered
    by ``order_col`` (then ``tie_cols`` ascending).  Null order values are
    dropped; output order is (key asc, order, ties)."""
    t = t.filter(pc.is_valid(t.column(order_col)))
    if t.num_rows == 0:
        return t
    direction = "descending" if descending else "ascending"
    t = t.sort_by([(key, "ascending"), (order_col, direction)]
                  + [(c, "ascending") for c in tie_cols])
    kk = t.column(key).to_numpy(zero_copy_only=False)
    starts, counts = _group_boundaries(kk)
    seg_id = np.repeat(np.arange(len(starts)), counts)
    rank = np.arange(len(kk)) - starts[seg_id]
    return t.filter(pa.array(rank < k))


def window_ops(ds, key: str, order_cols: list[str], *,
               cumsum_cols: list[str] | None = None,
               lag_cols: list[str] | None = None,
               rolling_mean_cols: list[str] | None = None,
               rolling_window: int = 10,
               ntile: int | None = None,
               row_number: bool = True,
               percent_rank: bool = False,
               num_buckets: int | None = None,
               max_group_rows: int | None = 4_000_000):
    """SQL window functions per key partition: ``row_number() OVER w``,
    ``sum(col) OVER w`` (running sum, null until the first non-null like
    SQL), ``lag(col) OVER w``, and ``avg(col) OVER (w ROWS BETWEEN
    rolling_window-1 PRECEDING AND CURRENT ROW)`` for ``w AS (PARTITION BY
    key ORDER BY order_cols)``.  Output = input columns + ``row_number`` /
    ``cum_<col>`` / ``lag_<col>`` / ``rmean_<col>`` (null when the frame
    holds no non-null values, like SQL avg).  ``ntile=n`` adds SQL's
    ``ntile(n) OVER w`` equi-depth bucket (1-based; the first
    ``count % n`` buckets get the extra row, exactly like SQL).

    Pass a tie-breaking column in ``order_cols`` (e.g. a unique id) —
    window functions over an ambiguous order are not deterministic in any
    engine.  Combiner-less (each key partition must be seen whole, in
    order), so one key partition must fit a bucket task; enforced via
    ``max_group_rows`` with a named diagnostic.
    """
    order_cols = list(order_cols)
    cumsum_cols = list(cumsum_cols or [])
    lag_cols = list(lag_cols or [])
    rolling_mean_cols = list(rolling_mean_cols or [])
    if rolling_mean_cols and rolling_window < 1:
        raise ValueError(f"window_ops: rolling_window={rolling_window}")
    if ntile is not None and ntile < 1:
        raise ValueError(f"window_ops: ntile={ntile}")

    def final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            cols = {n: g.column(n) for n in g.column_names}
            if row_number:
                cols["row_number"] = pa.array([], pa.int64())
            for c in cumsum_cols:
                cols[f"cum_{c}"] = pa.array([], pa.float64())
            for c in lag_cols:
                cols[f"lag_{c}"] = pa.array([], g.schema.field(c).type)
            for c in rolling_mean_cols:
                cols[f"rmean_{c}"] = pa.array([], pa.float64())
            if ntile is not None:
                cols["ntile"] = pa.array([], pa.int64())
            if percent_rank:
                cols["percent_rank"] = pa.array([], pa.float64())
            return pa.table(cols)
        g = g.sort_by([(key, "ascending")]
                      + [(c, "ascending") for c in order_cols])
        kk = g.column(key).to_numpy(zero_copy_only=False)
        starts, counts = _group_boundaries(kk)
        seg_id = np.repeat(np.arange(len(starts)), counts)
        pos = np.arange(len(kk)) - starts[seg_id]
        cols = {n: g.column(n) for n in g.column_names}
        if row_number:
            cols["row_number"] = pa.array(pos + 1, pa.int64())
        if ntile is not None:
            c = counts[seg_id]  # partition size per row
            q, r = c // ntile, c % ntile
            cut = r * (q + 1)  # rows in the (q+1)-sized leading buckets
            small_q = np.maximum(q, 1)  # q=0: all buckets are size 1
            nt = np.where(pos < cut, pos // (q + 1),
                          r + (pos - cut) // small_q) + 1
            cols["ntile"] = pa.array(nt.astype(np.int64))
        if percent_rank:
            # SQL percent_rank = (RANK-1)/(rows-1), where RANK gives order-
            # value PEERS the first peer's position (nulls are peers too)
            new_peer = np.zeros(len(kk), dtype=bool)
            new_peer[starts] = True
            for oc in order_cols:
                arr = g.column(oc).combine_chunks()
                a, b = arr.slice(1), arr.slice(0, len(arr) - 1)
                eq = pc.fill_null(pc.equal(a, b), False) \
                    .to_numpy(zero_copy_only=False).astype(bool)
                both_null = pc.and_(pc.is_null(a), pc.is_null(b)) \
                    .to_numpy(zero_copy_only=False).astype(bool)
                new_peer[1:] |= ~(eq | both_null)
            idx = np.arange(len(kk))
            rank_pos = np.maximum.accumulate(np.where(new_peer, idx, 0))
            rank0 = rank_pos - starts[seg_id]   # 0-based RANK
            c = counts[seg_id]
            pr = np.where(c > 1, rank0 / np.maximum(c - 1, 1), 0.0)
            cols["percent_rank"] = pa.array(pr, pa.float64())
        for c in cumsum_cols:
            arr = g.column(c)
            valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
            v = np.where(valid,
                         arr.to_numpy(zero_copy_only=False).astype(np.float64),
                         0.0)
            cs = np.cumsum(v)
            base = cs[starts] - v[starts]
            nn = np.cumsum(valid.astype(np.int64))
            nn_base = nn[starts] - valid[starts].astype(np.int64)
            run = cs - base[seg_id]
            has_any = (nn - nn_base[seg_id]) > 0
            cols[f"cum_{c}"] = pa.array(run, pa.float64(),
                                        mask=~has_any)
        if lag_cols:
            idx = np.arange(len(kk)) - 1
            first = pos == 0
            take_idx = pa.array(np.where(first, 0, idx), pa.int64())
            for c in lag_cols:
                taken = g.column(c).take(take_idx)
                if isinstance(taken, pa.ChunkedArray):
                    taken = taken.combine_chunks()
                cols[f"lag_{c}"] = pc.if_else(
                    pa.array(~first), taken,
                    pa.scalar(None, g.schema.field(c).type))
        if rolling_mean_cols:
            i = np.arange(len(kk))
            lo = i - np.minimum(pos, rolling_window - 1)  # frame start
            for c in rolling_mean_cols:
                arr = g.column(c)
                valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
                v = np.where(
                    valid,
                    arr.to_numpy(zero_copy_only=False).astype(np.float64),
                    0.0)
                cs = np.concatenate([[0.0], np.cumsum(v)])
                cn = np.concatenate([[0], np.cumsum(valid.astype(np.int64))])
                nn = cn[i + 1] - cn[lo]
                with np.errstate(invalid="ignore", divide="ignore"):
                    rm = (cs[i + 1] - cs[lo]) / nn
                empty = nn == 0
                cols[f"rmean_{c}"] = pa.array(
                    np.where(empty, np.nan, rm), pa.float64(), mask=empty)
        return pa.table(cols)

    return bucketed_group_apply(ds, [key], final, num_buckets=num_buckets,
                                max_group_rows=max_group_rows)


def top_k_per_group(ds, key: str, order_col: str, k: int, *,
                    descending: bool = True,
                    tie_cols: list[str] | None = None,
                    num_buckets: int | None = None):
    """Top-k whole rows per key group ordered by ``order_col`` — the exact
    ``row_number() OVER (PARTITION BY key ORDER BY ...) <= k`` semantics.
    ``tie_cols`` make the selection deterministic when order values tie
    (always pass one for reproducible output).

    Scale shape: the same top-k selection runs per input batch as the
    combiner, so the shuffle moves at most k rows per key per batch.
    """
    tie_cols = list(tie_cols or [])

    def partial(batch: pa.Table) -> pa.Table:
        return _topk_table(batch, key, order_col, k, descending, tie_cols)

    def final(g: pa.Table) -> pa.Table:
        return _topk_table(g, key, order_col, k, descending, tie_cols)

    return bucketed_group_apply(ds, [key], final, num_buckets=num_buckets,
                                partial_fn=partial)


def value_histogram(ds, col: str, *, num_buckets: int | None = None):
    """(value, cnt) table of the non-null distinct values of ``col`` via the
    count-combiner exchange — the shared substrate for exact global order
    statistics (:func:`global_exact_quantiles`, :func:`equidepth_histogram`,
    queries' MAD/median finalizers).

    Scale contract: the exchange is bounded by the DISTINCT-value
    cardinality, not the row count — exact global quantiles of a
    bounded-domain column (quantities, scores, enum-ish measures) stay
    driver-cheap at any corpus size.  For near-unique continuous columns
    (prices, timestamps) this table is row-sized: use the t-digest path
    (``aggregates.TDigestQuantile``) there instead."""
    from webval.exchange import grouped_agg

    proj = ds.map_batches(
        lambda t: pa.table({col: t.column(col).combine_chunks().filter(
            pc.is_valid(t.column(col).combine_chunks()))}),
        batch_format="pyarrow")
    return grouped_agg(proj, [col], [(col, "count")],
                       rename={f"{col}_count": "cnt"},
                       num_buckets=num_buckets)


def quantiles_from_histogram(vals: np.ndarray, counts: np.ndarray,
                             qs: list[float], *,
                             interpolate: bool = False) -> list[float]:
    """Exact global quantiles from a (distinct value, count) histogram.
    ``interpolate=False`` = DuckDB ``quantile_disc`` (value at sorted index
    ceil(q*n) - 1); ``interpolate=True`` = ``quantile_cont`` (linear
    between the flanking order statistics at rank q*(n-1))."""
    order = np.argsort(vals)
    v = np.asarray(vals, dtype=np.float64)[order]
    cum = np.cumsum(np.asarray(counts, dtype=np.int64)[order])
    n = int(cum[-1])
    out = []
    for q in qs:
        if interpolate:
            rank = q * (n - 1)            # 0-based fractional rank
            lo = int(np.floor(rank))
            frac = rank - lo
            i = int(np.searchsorted(cum, lo + 1))
            j = int(np.searchsorted(cum, min(lo + 1, n - 1) + 1))
            out.append(float(v[i]) * (1.0 - frac) + float(v[j]) * frac)
        else:
            k = max(int(np.ceil(q * n)), 1)   # 1-based rank
            out.append(float(v[int(np.searchsorted(cum, k))]))
    return out


def equidepth_histogram(ds, col: str, k: int, *,
                        num_buckets: int | None = None) -> pa.Table:
    """Equi-depth (quantile-binned) histogram: k buckets whose upper edges
    are the ``quantile_disc(i/k)`` order statistics, with the exact row
    count falling in each half-open bin (lo_edge, hi_edge] — the binning
    profilers/drift monitors use when fixed-width bins would starve the
    tail.  Duplicate edges (heavy values spanning a quantile) keep SQL's
    first-matching-bin assignment: later duplicate bins count zero.

    One value-count exchange (see :func:`value_histogram` for the scale
    contract); the per-bin rollup is a cumsum over the distinct-value
    table on the driver."""
    if k < 1:
        raise ValueError(f"equidepth_histogram: k={k}")
    t = _collect_histogram(ds, col, num_buckets)
    if t.num_rows == 0:
        return pa.table({"bin": pa.array([], pa.int64()),
                         "hi_edge": pa.array([], pa.float64()),
                         "cnt": pa.array([], pa.int64())})
    v = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
    c = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(v)
    v, c = v[order], c[order]
    edges = quantiles_from_histogram(
        v, c, [(i + 1) / k for i in range(k)], interpolate=False)
    # cumulative count at each edge -> per-bin counts by difference;
    # searchsorted 'right' = rows with value <= edge
    cum = np.cumsum(c)
    cum_at = np.array([cum[np.searchsorted(v, e, side="right") - 1]
                       if np.searchsorted(v, e, side="right") > 0 else 0
                       for e in edges], dtype=np.int64)
    cnts = np.diff(np.concatenate([[0], cum_at]))
    return pa.table({"bin": pa.array(np.arange(1, k + 1), pa.int64()),
                     "hi_edge": pa.array(edges, pa.float64()),
                     "cnt": pa.array(cnts, pa.int64())})


def global_exact_quantiles(ds, col: str, qs: list[float], *,
                           interpolate: bool = False,
                           num_buckets: int | None = None) -> list[float]:
    """Exact global quantiles of ``col`` (disc or cont semantics) via the
    value-count exchange.  Returns one float per q.  See
    :func:`value_histogram` for when this is the right path vs t-digest."""
    t = _collect_histogram(ds, col, num_buckets)
    if t.num_rows == 0:
        return [float("nan")] * len(qs)
    return quantiles_from_histogram(
        t.column("value").to_numpy(zero_copy_only=False),
        t.column("cnt").to_numpy(zero_copy_only=False),
        qs, interpolate=interpolate)


def _collect_histogram(ds, col: str, num_buckets) -> pa.Table:
    """Collect the (distinct value, cnt) exchange output to the driver —
    this read is bounded by distinct-value cardinality, not row count."""
    hist = value_histogram(ds, col, num_buckets=num_buckets)
    parts = [b.rename_columns(["value", "cnt"])
             for b in hist.iter_batches(batch_format="pyarrow",
                                        batch_size=65536) if b.num_rows]
    if not parts:
        return pa.table({"value": pa.array([], pa.float64()),
                         "cnt": pa.array([], pa.int64())})
    return pa.concat_tables(parts)


def rank_auc(ds, label_col: str, value_col: str, *, positive,
             num_buckets: int | None = None) -> pa.Table:
    """ROC-AUC of a numeric score against a binary label via the
    Mann-Whitney U statistic — the standard "does this quality score
    separate the classes" evaluation, computed without materializing or
    globally sorting the rows:

        AUC = P(X_pos > X_neg) + ½·P(X_pos = X_neg)
            = Σ_v a_v · (B(<v) + ½·b_v) / (n_pos·n_neg)

    where a_v/b_v are per-distinct-value counts of the positive/negative
    class.  Rows with a null label or value are dropped (SQL WHERE).

    Scale shape: one count-combiner exchange on (value, is_pos) — shuffle
    and driver load are bounded by DISTINCT score values, not rows (same
    caveat as value_histogram: pre-bin near-unique continuous scores).
    The tiny (value, a, b) table is finalized on the driver with one sort
    + cumsum.  Returns a one-row table (n_pos, n_neg, auc); auc is null
    when either class is empty (matching SQL NULL division semantics).
    """
    from webval.exchange import grouped_agg

    def proj(t: pa.Table) -> pa.Table:
        lbl = t.column(label_col).combine_chunks()
        val = t.column(value_col).combine_chunks()
        m = pc.and_(pc.is_valid(lbl), pc.is_valid(val))
        is_pos = pc.cast(pc.equal(lbl, positive), pa.int64())
        return pa.table({"value": val, "is_pos": is_pos}).filter(m)

    counts = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                         ["value", "is_pos"], [("is_pos", "count")],
                         rename={"is_pos_count": "cnt"},
                         num_buckets=num_buckets)
    parts = [b for b in counts.iter_batches(batch_format="pyarrow",
                                            batch_size=65536) if b.num_rows]
    if not parts:
        return pa.table({"n_pos": pa.array([0], pa.int64()),
                         "n_neg": pa.array([0], pa.int64()),
                         "auc": pa.array([None], pa.float64())})
    t = pa.concat_tables(parts).sort_by([("value", "ascending")])
    v = t.column("value").to_numpy(zero_copy_only=False)
    pos = t.column("is_pos").to_numpy(zero_copy_only=False)
    c = t.column("cnt").to_numpy(zero_copy_only=False)
    a = np.where(pos == 1, c, 0).astype(np.float64)
    b = np.where(pos == 0, c, 0).astype(np.float64)
    # collapse the (value, is_pos) rows to per-distinct-value (a, b) pairs
    uniq_start = np.r_[True, v[1:] != v[:-1]]
    seg = np.cumsum(uniq_start) - 1
    n_vals = int(seg[-1]) + 1
    av = np.zeros(n_vals); bv = np.zeros(n_vals)
    np.add.at(av, seg, a)
    np.add.at(bv, seg, b)
    n_pos, n_neg = av.sum(), bv.sum()
    if n_pos == 0 or n_neg == 0:
        auc = None
    else:
        b_below = np.r_[0.0, np.cumsum(bv)[:-1]]
        auc = float((av * (b_below + 0.5 * bv)).sum() / (n_pos * n_neg))
    return pa.table({"n_pos": pa.array([int(n_pos)], pa.int64()),
                     "n_neg": pa.array([int(n_neg)], pa.int64()),
                     "auc": pa.array([auc], pa.float64())})


def grouped_trimmed_mean(ds, key: str, value_col: str, *,
                         lo: float = 0.05, hi: float = 0.95,
                         num_buckets: int | None = None):
    """Per-group trimmed mean: the mean of each key's values inside its
    own [quantile_cont(lo), quantile_cont(hi)] fences (inclusive) — the
    robust-location aggregate that ignores tail outliers without a global
    clip threshold.  Output per key: (key, n_kept, trimmed_mean).

    Scale shape: the (key, value)-only quantile exchange computes both
    fences exactly; the per-key fence table is broadcast ONCE via ray.put
    into a stateless filter map (iqr_outliers shape), and the kept rows
    reduce through a count/sum-combiner exchange — no driver pass over
    data, nothing key-group-sized materializes.  Null values (and keys
    absent from the fence table) are dropped, mirroring SQL FILTER.
    """
    import ray

    from webval.exchange import grouped_agg

    fences_ds = grouped_exact_quantiles(
        ds, key, value_col, {"f_lo": lo, "f_hi": hi}, interpolate=True,
        num_buckets=num_buckets)
    blocks = [ray.get(r) for r in fences_ds.materialize().to_arrow_refs()]
    blocks = [b for b in blocks if b.num_rows]
    if not blocks:
        return ds.limit(0).map_batches(
            lambda t: pa.table({key: pa.array([], pa.string()),
                                "n_kept": pa.array([], pa.int64()),
                                "trimmed_mean": pa.array([], pa.float64())}),
            batch_format="pyarrow")
    fences_ref = ray.put(pa.concat_tables(blocks).combine_chunks())

    def keep(batch: pa.Table) -> pa.Table:
        f = ray.get(fences_ref)
        kcol = batch.column(key).combine_chunks()
        vals = pc.cast(batch.column(value_col).combine_chunks(),
                       pa.float64())
        pos = pc.index_in(kcol, value_set=f.column(key))
        flo = pc.take(f.column("f_lo"), pos)
        fhi = pc.take(f.column("f_hi"), pos)
        m = pc.and_(pc.greater_equal(vals, flo), pc.less_equal(vals, fhi))
        return pa.table({key: kcol, "v": vals}).filter(pc.fill_null(m, False))

    kept = ds.map_batches(keep, batch_format="pyarrow")
    agg = grouped_agg(kept, [key], [("v", "count"), ("v", "sum")],
                      rename={"v_count": "n_kept", "v_sum": "v_sum"},
                      num_buckets=num_buckets)

    def finalize(t: pa.Table) -> pa.Table:
        mean = pc.divide(t.column("v_sum"),
                         pc.cast(t.column("n_kept"), pa.float64()))
        return pa.table({key: t.column(key), "n_kept": t.column("n_kept"),
                         "trimmed_mean": mean})

    return agg.map_batches(finalize, batch_format="pyarrow")


def quantile_bin(ds, value_col: str, k: int, *, out_col: str = "bin",
                 num_buckets: int | None = None):
    """Equal-frequency (quantile) binning featurizer: append ``out_col`` =
    the row's 1-based bin among ``k`` buckets, where the interior edges
    are the EXACT discrete quantiles at i/k (quantile_disc semantics) and
    a value in bin b satisfies  #edges ≤ value == b−1  (ties share a bin —
    value-deterministic, unlike SQL ntile's row-position split, so the
    assignment is reproducible across engines and runs).  Null values get
    a null bin.

    Scale shape: edges from the value-count exchange (bounded by DISTINCT
    values — pre-bin near-unique continuous columns, same caveat as
    value_histogram), broadcast in the closure (k−1 floats), then one
    stateless vectorized searchsorted map.
    """
    if k < 2:
        raise ValueError(f"quantile_bin: k={k}")
    edges = global_exact_quantiles(
        ds.map_batches(lambda t: t.select([value_col]),
                       batch_format="pyarrow"),
        value_col, [i / k for i in range(1, k)], num_buckets=num_buckets)
    edges = np.asarray(edges, dtype=np.float64)

    def assign(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).combine_chunks()
        x = v.to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.searchsorted(edges, x, side="right") + 1
        arr = pc.if_else(pc.is_valid(v), pa.array(b, pa.int64()),
                         pa.scalar(None, pa.int64()))
        return batch.append_column(out_col, arr)

    return ds.map_batches(assign, batch_format="pyarrow")


def calibration_bins(ds, score_col: str, label_col: str, *, bins: int = 10,
                     num_buckets: int | None = None) -> pa.Table:
    """Reliability-diagram substrate for a probabilistic score in [0, 1]
    against a binary label: equal-width bin b = min(floor(score·bins),
    bins−1), and per bin the exact sums a calibration audit needs —
    (bin, n, sum_score, sum_label, sum_sqerr) with sum_sqerr the Brier
    numerator Σ(score − label)².  Driver-small output (≤ ``bins`` rows);
    downstream derives avg confidence, observed positive rate, expected
    calibration error Σ nᵢ/N·|accᵢ − confᵢ| and the Brier score from it.
    Null scores/labels are dropped (SQL WHERE semantics).

    Scale shape: stateless vectorized per-batch partial (np.bincount on
    the bin index) → sum-combiner exchange bounded by ``bins`` keys.
    """
    from webval.exchange import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        s = pc.cast(t.column(score_col).combine_chunks(), pa.float64())
        y = pc.cast(t.column(label_col).combine_chunks(), pa.float64())
        m = pc.and_(pc.is_valid(s), pc.is_valid(y))
        s = s.filter(m).to_numpy(zero_copy_only=False)
        y = y.filter(m).to_numpy(zero_copy_only=False)
        if len(s) == 0:
            return pa.table({"bin": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sum_score": pa.array([], pa.float64()),
                             "sum_label": pa.array([], pa.float64()),
                             "sum_sqerr": pa.array([], pa.float64())})
        b = np.minimum(np.floor(s * bins).astype(np.int64), bins - 1)
        n = np.bincount(b, minlength=bins)
        ss = np.bincount(b, weights=s, minlength=bins)
        sl = np.bincount(b, weights=y, minlength=bins)
        se = np.bincount(b, weights=(s - y) ** 2, minlength=bins)
        nz = np.flatnonzero(n)
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "n": pa.array(n[nz], pa.int64()),
                         "sum_score": pa.array(ss[nz], pa.float64()),
                         "sum_label": pa.array(sl[nz], pa.float64()),
                         "sum_sqerr": pa.array(se[nz], pa.float64())})

    out = grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"), ["bin"],
        [("n", "sum"), ("sum_score", "sum"), ("sum_label", "sum"),
         ("sum_sqerr", "sum")],
        rename={"n_sum": "n", "sum_score_sum": "sum_score",
                "sum_label_sum": "sum_label",
                "sum_sqerr_sum": "sum_sqerr"},
        num_buckets=num_buckets)
    import ray
    blocks = [ray.get(r) for r in out.materialize().to_arrow_refs()]
    blocks = [b for b in blocks if b.num_rows]
    if not blocks:
        return pa.table({"bin": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64()),
                         "sum_score": pa.array([], pa.float64()),
                         "sum_label": pa.array([], pa.float64()),
                         "sum_sqerr": pa.array([], pa.float64())})
    return pa.concat_tables(blocks).combine_chunks() \
        .sort_by([("bin", "ascending")])


def _skyline_2d(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Indices of the 2-D maximal (Pareto-optimal) points: row i survives
    unless some j has x_j ≥ x_i AND y_j ≥ y_i with at least one strict.
    Exact duplicates are mutually non-dominating and all survive.
    O(n log n): sort by (x desc, y desc), keep the max-y rows of each
    distinct x whose y strictly exceeds every y seen at larger x."""
    n = len(x)
    if n == 0:
        return np.empty(0, np.int64)
    order = np.lexsort((-y, -x))
    xs, ys = x[order], y[order]
    new_x = np.r_[True, xs[1:] != xs[:-1]]
    # group max y = first y of each distinct-x run (sorted y desc in-run)
    grp_first = np.maximum.accumulate(np.where(new_x, np.arange(n), 0))
    grp_max_y = ys[grp_first]
    is_grp_max = ys == grp_max_y
    # best y among STRICTLY larger x = running max over previous groups
    run_max = np.maximum.accumulate(np.where(new_x, ys, -np.inf))
    starts = np.flatnonzero(new_x)
    best_before_grp = np.r_[-np.inf, run_max[starts - 1][1:]] \
        if len(starts) > 1 else np.array([-np.inf])
    prev_best = best_before_grp[np.cumsum(new_x) - 1]
    keep = is_grp_max & (ys > prev_best)
    return np.sort(order[keep])


def pareto_frontier(ds, x_col: str, y_col: str, *,
                    max_frontier: int = 1_000_000):
    """2-D Pareto frontier (skyline) of a Dataset, maximizing both
    columns: the rows no other row weakly dominates — the classic
    "best trade-off set" audit (e.g. newest AND highest-value).  Null
    coordinates are dropped.  Returns a driver-small pa.Table of the
    surviving rows in input column order, sorted by (x desc, y asc).

    Scale shape: the skyline has a true COMBINER — a block's local
    frontier is a superset-free sketch of its contribution, so each
    batch collapses to its own frontier before anything moves; the
    global pass runs the same O(n log n) sweep over the concatenated
    local frontiers (≈ frontier-sized, guarded by ``max_frontier``
    with a named diagnostic — real frontiers are tiny because
    domination is transitive)."""
    import ray

    def local(t: pa.Table) -> pa.Table:
        xv = pc.cast(t.column(x_col).combine_chunks(), pa.float64())
        yv = pc.cast(t.column(y_col).combine_chunks(), pa.float64())
        t = t.filter(pc.and_(pc.is_valid(xv), pc.is_valid(yv)))
        if t.num_rows == 0:
            return t
        x = pc.cast(t.column(x_col).combine_chunks(), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        y = pc.cast(t.column(y_col).combine_chunks(), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        keep = _skyline_2d(x, y)
        return t.take(pa.array(keep, pa.int64()))

    locals_ds = ds.map_batches(local, batch_format="pyarrow").materialize()
    blocks = [ray.get(r) for r in locals_ds.to_arrow_refs()]
    blocks = [b for b in blocks if b.num_rows]
    if not blocks:
        sch = locals_ds.schema()
        if sch is None or sch.names is None:
            return pa.table({})
        return pa.table({n: pa.array([], type=t)
                         for n, t in zip(sch.names, sch.types)})
    cand = pa.concat_tables(blocks, promote_options="permissive") \
        .combine_chunks()
    if cand.num_rows > max_frontier:
        raise ValueError(
            f"pareto_frontier: {cand.num_rows} local-frontier candidates "
            f"exceed max_frontier={max_frontier}; the coordinate pair is "
            "likely anti-correlated (near-total frontier) — raise the cap "
            "or reconsider the objective")
    x = pc.cast(cand.column(x_col).combine_chunks(), pa.float64()) \
        .to_numpy(zero_copy_only=False)
    y = pc.cast(cand.column(y_col).combine_chunks(), pa.float64()) \
        .to_numpy(zero_copy_only=False)
    keep = _skyline_2d(x, y)
    out = cand.take(pa.array(keep, pa.int64()))
    return out.sort_by([(x_col, "descending"), (y_col, "ascending")])


def grouped_weighted_median(ds, group_col: str, val_col: str,
                            weight_col: str, *,
                            num_buckets: int | None = None) -> pa.Table:
    """Per-group weighted (lower) median: the smallest value whose
    cumulative weight reaches half the group's total — e.g. the
    quantity level at which half the group's REVENUE sits, the
    size-weighted robust center a plain median (every row equal)
    misses.  Null group/value/weight rows are dropped.  Returns a
    driver-small pa.Table (group, weighted_median, total_weight),
    group-sorted.

    Scale shape: ONE sum-combiner exchange on (group, value) — bounded
    by distinct (group, value) pairs, never rows (the exact-path
    precondition shared with value_histogram; near-unique value columns
    belong on the t-digest route).  The finalize (per-group sort +
    cumsum + first-crossing pick) runs on that key-sized table."""
    import numpy as np

    from webval.exchange import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        g = t.column(group_col).combine_chunks()
        v = pc.cast(t.column(val_col).combine_chunks(), pa.float64())
        w = pc.cast(t.column(weight_col).combine_chunks(), pa.float64())
        m = pc.and_(pc.and_(pc.is_valid(g), pc.is_valid(v)),
                    pc.is_valid(w))
        t2 = pa.table({"g": g.filter(m), "v": v.filter(m),
                       "w": w.filter(m)})
        agg = t2.group_by(["g", "v"]).aggregate([("w", "sum")])
        return agg.rename_columns(["g", "v", "w"])

    vw = grouped_agg(
        ds.select_columns([group_col, val_col, weight_col])
          .map_batches(partial, batch_format="pyarrow"),
        ["g", "v"], [("w", "sum")], rename={"w_sum": "w"},
        num_buckets=num_buckets)
    import ray
    blocks = [ray.get(r) for r in vw.materialize().to_arrow_refs()]
    blocks = [b for b in blocks if b.num_rows]
    if not blocks:
        return pa.table({group_col: pa.array([], pa.string()),
                         "weighted_median": pa.array([], pa.float64()),
                         "total_weight": pa.array([], pa.float64())})
    t = pa.concat_tables(blocks).combine_chunks() \
        .sort_by([("g", "ascending"), ("v", "ascending")])
    g = t.column("g").to_numpy(zero_copy_only=False)
    v = t.column("v").to_numpy(zero_copy_only=False)
    w = t.column("w").to_numpy(zero_copy_only=False)
    starts = np.r_[True, g[1:] != g[:-1]]
    code = np.cumsum(starts) - 1
    nk = code[-1] + 1
    tot = np.bincount(code, weights=w, minlength=nk)
    cum = np.cumsum(w)
    base = np.zeros(nk)
    first = np.flatnonzero(starts)
    base[1:] = cum[first[1:] - 1]
    cum_in = cum - base[code]                 # per-group running weight
    crossed = cum_in >= 0.5 * tot[code]
    # first crossing per group: smallest row index with crossed True
    # (always exists: the group's last row has cum_in == tot ≥ tot/2)
    idx = np.full(nk, len(g), np.int64)
    rows = np.flatnonzero(crossed)
    np.minimum.at(idx, code[rows], rows)
    med = v[idx]
    return pa.table({
        group_col: t.column("g").take(pa.array(first, pa.int64())),
        "weighted_median": pa.array(med, pa.float64()),
        "total_weight": pa.array(tot, pa.float64())})


def grouped_mad(ds, key: str, value_col: str, *,
                num_buckets: int | None = None,
                max_group_rows: int | None = 4_000_000):
    """Per-group median absolute deviation: median(|x − median_g(x)|)
    with interpolated (quantile_cont) medians at both levels — the
    robust spread that ignores the heavy tails wrecking grouped
    std-dev, SQL ``mad(x)`` semantics.  Null values are ignored; keys
    whose values are all null are absent.  Dataset[{key, median, mad}].

    Scale shape: grouped_exact_quantiles for the group medians (its
    per-group-rows bound applies), an equi_join to ship each row its
    group median on the SAME key exchange (works at any group count —
    no driver median table), a second grouped_exact_quantiles over the
    absolute deviations, and a group-sized join to present median and
    mad side by side."""
    from webval.joins import equi_join

    med = grouped_exact_quantiles(ds, key, value_col, {"median": 0.5},
                                  interpolate=True,
                                  num_buckets=num_buckets,
                                  max_group_rows=max_group_rows)
    rows = ds.map_batches(
        lambda t: t.select([key, value_col]).filter(
            pc.is_valid(t.column(value_col))),
        batch_format="pyarrow")
    withmed = equi_join(rows, med, on=[key], how="inner",
                        num_buckets=num_buckets)

    def absdev(t: pa.Table) -> pa.Table:
        x = pc.cast(t.column(value_col).combine_chunks(), pa.float64())
        return pa.table({
            key: t.column(key),
            "absdev": pc.abs(pc.subtract(x, t.column("median")))})

    mad = grouped_exact_quantiles(
        withmed.map_batches(absdev, batch_format="pyarrow"),
        key, "absdev", {"mad": 0.5}, interpolate=True,
        num_buckets=num_buckets, max_group_rows=max_group_rows)
    return equi_join(med, mad, on=[key], how="inner",
                     num_buckets=num_buckets)


def grouped_hindex(ds, key: str, value_col: str, *,
                   num_buckets: int | None = None,
                   max_group_rows: int | None = 4_000_000):
    """Per-key h-index: the largest h such that at least h of the key's
    values are >= h — the single-number "sustained volume" signal
    (h days with >= h events, h docs with >= h inlinks) that one
    outlier day cannot inflate, unlike max or sum.  Values are floored
    to integers; null/negative values are ignored.
    Dataset[{key, hindex}].

    Scale shape: the per-batch partial collapses to (key, value)
    COUNTS, so the exchange is bounded by distinct (key, floor(value))
    pairs; the finalize sorts each key's distinct values descending
    and takes max(min(value, cumulative_count)) — one vectorized pass
    per bucket, group sizes bounded by the value range."""
    import numpy as np

    from webval.exchange import bucketed_group_apply

    def partial(t: pa.Table) -> pa.Table:
        k = t.column(key).combine_chunks()
        v = pc.cast(pc.floor(pc.cast(
            t.column(value_col).combine_chunks(), pa.float64())),
            pa.int64())
        m = pc.and_(pc.and_(pc.is_valid(k), pc.is_valid(v)),
                    pc.greater_equal(v, 1))
        pairs = pa.table({key: k.filter(m), "v": v.filter(m),
                          "n": pa.array(np.ones(
                              int(pc.sum(pc.cast(m, pa.int64()))
                                  .as_py() or 0), np.int64))})
        agg = pairs.group_by([key, "v"]).aggregate([("n", "sum")])
        return agg.rename_columns([key, "v", "n"])

    def final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({
                key: pa.array([], g.schema.field(key).type),
                "hindex": pa.array([], pa.int64())})
        agg = g.group_by([key, "v"]).aggregate([("n", "sum")]) \
               .rename_columns([key, "v", "n"]) \
               .sort_by([(key, "ascending"), ("v", "descending")])
        kk = agg.column(key).to_numpy(zero_copy_only=False)
        vv = agg.column("v").to_numpy(zero_copy_only=False)
        nn = agg.column("n").to_numpy(zero_copy_only=False)
        new_key = np.r_[True, kk[1:] != kk[:-1]]
        kcode = np.cumsum(new_key) - 1
        nk = kcode[-1] + 1
        cum = np.cumsum(nn)
        firsts = np.flatnonzero(new_key)
        base = np.zeros(nk, np.int64)
        base[1:] = cum[firsts[1:] - 1]
        cum_in = cum - base[kcode]
        cand = np.minimum(vv, cum_in)
        h = np.zeros(nk, np.int64)
        np.maximum.at(h, kcode, cand)
        return pa.table({
            key: agg.column(key).take(pa.array(firsts, pa.int64())),
            "hindex": pa.array(h, pa.int64())})

    return bucketed_group_apply(
        ds.select_columns([key, value_col]), [key], final,
        num_buckets=num_buckets, partial_fn=partial,
        max_group_rows=max_group_rows)


def hill_tail_index(ds, key: str, *, k: int = 100,
                    num_buckets: int | None = None):
    """Hill estimator of the power-law tail index of a frequency
    distribution (Hill 1975): over the k+1 largest per-key counts,
    alpha = k / sum_i ln(x_(i) / x_(k+1)) — the "how heavy is the head"
    audit for host/user/term frequency skew (alpha near 1 = Zipf-like
    head that will hot-spot any hash partition; large alpha = benign).

    Scale shape: one count-combiner exchange builds the per-key counts;
    each count block contributes only its local top-(k+1) rows to the
    driver merge, so the driver sees O(k × blocks) ints, never the key
    table.  Returns (k_eff, x_kplus1, alpha) with k_eff = min(k,
    n_keys - 1); alpha = nan when fewer than 2 keys."""
    import numpy as np

    from webval.exchange import grouped_agg

    counts = grouped_agg(
        ds.map_batches(lambda t: t.select([key]).filter(
            pc.is_valid(t.column(key))), batch_format="pyarrow"),
        [key], [(key, "count")], rename={f"{key}_count": "cnt"},
        num_buckets=num_buckets)

    def local_top(t: pa.Table) -> pa.Table:
        c = t.column("cnt").combine_chunks()
        idx = pc.array_sort_indices(c, order="descending")
        return pa.table({"cnt": c.take(idx.slice(0, k + 1))})

    parts = [b for b in counts.map_batches(
        local_top, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=65536)]
    if not parts:
        return 0, 0, float("nan")
    x = np.sort(pa.concat_tables(parts).column("cnt")
                .to_numpy(zero_copy_only=False))[::-1][:k + 1] \
        .astype(np.float64)
    k_eff = min(k, len(x) - 1)
    if k_eff < 1:
        return 0, 0, float("nan")
    xk1 = x[k_eff]
    s = float(np.log(x[:k_eff] / xk1).sum())
    alpha = k_eff / s if s > 0 else float("inf")
    return k_eff, int(xk1), alpha


def gini_coefficient(ds, col: str, *, num_buckets: int | None = None):
    """Exact Gini coefficient of a nonnegative value column — the
    corpus-concentration audit ("what fraction of the crawl is a handful
    of megahosts").  Uses the rank formula over ascending values

        G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n

    which is permutation-invariant within tied values, so no tiebreak
    can flip the result across engines.  Nulls are skipped; negative
    values raise (Gini is undefined); an all-zero or empty column
    yields None.  Returns the float, computed exactly.

    Scale shape: ONE distinct-value count exchange (bounded by the
    distinct-value cardinality, not the row count — per-key counts and
    scores are narrow domains); each (value, count) block of c tied
    keys starting at rank r contributes x·(c·r + c·(c−1)/2) in closed
    form, accumulated over the sorted distinct-value table driver-side
    (value-histogram-sized, the documented exact-order-statistics
    substrate)."""
    t = _collect_value_histogram(ds, col, num_buckets=num_buckets)
    if t.num_rows == 0:
        return None
    v = pc.cast(t.column("value"), pa.float64()) \
        .to_numpy(zero_copy_only=False)
    c = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
    if (v < 0).any():
        raise ValueError("gini_coefficient: negative values are undefined")
    order = np.argsort(v)
    v, c = v[order], c[order]
    n = c.sum()
    total = (v * c).sum()
    if n == 0 or total == 0:
        return None
    start = np.concatenate(([1.0], 1.0 + np.cumsum(c)[:-1]))  # rank of
    # first element of each tie block (ascending, 1-based)
    s_iw = (v * (c * start + c * (c - 1.0) / 2.0)).sum()
    return float(2.0 * s_iw / (n * total) - (n + 1.0) / n)


def _collect_value_histogram(ds, col: str, *, num_buckets=None) -> pa.Table:
    """Driver-side (value, cnt) table off :func:`value_histogram` — the
    read IS the finisher (distinct-value-bounded), not the compute path.
    Zero-row blocks are skipped (r3s4: they keep the input schema)."""
    import ray

    mat = value_histogram(ds, col, num_buckets=num_buckets).materialize()
    blocks = [b for b in (ray.get(r) for r in mat.to_arrow_refs())
              if b.num_rows > 0]
    if not blocks:
        return pa.table({"value": pa.array([], pa.float64()),
                         "cnt": pa.array([], pa.int64())})
    t = pa.concat_tables(blocks, promote_options="default")
    return t.rename_columns(["value", "cnt"]) \
        if t.column_names != ["value", "cnt"] else t


def tukey_outlier_audit(ds, key: str, value_col: str, *, k: float = 1.5,
                        num_buckets: int | None = None):
    """Tukey-fence outlier audit per group: exact interpolated Q1/Q3
    per key, fences Q1 − k·IQR / Q3 + k·IQR, and the count of values
    outside them — the boxplot rule every data-quality report uses,
    robust where z-scores are wrecked by the outliers they hunt.
    Nulls are ignored; k=1.5 is Tukey's inner fence (3.0 = "far out").
    Returns Dataset[{key, n, q1, q3, n_low, n_high, out_rate}].

    Scale shape: one exact-quantile pass (value-count exchange per
    key), fences broadcast back via a co-bucketed join keyed the same
    way, one (count, low, high) combiner exchange — the fence compare
    is bit-identical across engines because both sides evaluate the
    same arithmetic on the same interpolated quantiles."""
    from webval.exchange import grouped_agg
    from webval.joins import equi_join

    q = grouped_exact_quantiles(ds, key, value_col,
                                {"q1": 0.25, "q3": 0.75},
                                interpolate=True,
                                num_buckets=num_buckets)

    def fences(t: pa.Table) -> pa.Table:
        iqr = pc.subtract(t.column("q3"), t.column("q1"))
        lo = pc.subtract(t.column("q1"),
                         pc.multiply(iqr, pa.scalar(float(k))))
        hi = pc.add(t.column("q3"), pc.multiply(iqr, pa.scalar(float(k))))
        return pa.table({key: t.column(key), "q1": t.column("q1"),
                         "q3": t.column("q3"), "lo": lo, "hi": hi})

    f = q.map_batches(fences, batch_format="pyarrow")
    proj = ds.map_batches(
        lambda t: t.select([key, value_col]).filter(
            pc.is_valid(t.column(value_col))),
        batch_format="pyarrow")
    joined = equi_join(proj, f, on=[key], num_buckets=num_buckets)

    def flag(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column(value_col), pa.float64())
        low = pc.less(v, t.column("lo"))
        high = pc.greater(v, t.column("hi"))
        tab = pa.table({
            key: t.column(key), "q1": t.column("q1"),
            "q3": t.column("q3"),
            "n": pa.nulls(t.num_rows, pa.int64()).fill_null(1),
            "n_low": pc.cast(low, pa.int64()),
            "n_high": pc.cast(high, pa.int64())})
        agg = tab.group_by([key, "q1", "q3"]).aggregate(
            [("n", "sum"), ("n_low", "sum"), ("n_high", "sum")])
        return agg.rename_columns([key, "q1", "q3", "n", "n_low",
                                   "n_high"])

    out = grouped_agg(joined.map_batches(flag, batch_format="pyarrow"),
                      [key, "q1", "q3"],
                      [("n", "sum"), ("n_low", "sum"), ("n_high", "sum")],
                      rename={"n_sum": "n", "n_low_sum": "n_low",
                              "n_high_sum": "n_high"},
                      num_buckets=num_buckets)

    def finalize(t: pa.Table) -> pa.Table:
        rate = pc.divide(
            pc.cast(pc.add(t.column("n_low"), t.column("n_high")),
                    pa.float64()),
            pc.cast(t.column("n"), pa.float64()))
        return pa.table({key: t.column(key), "n": t.column("n"),
                         "q1": t.column("q1"), "q3": t.column("q3"),
                         "n_low": t.column("n_low"),
                         "n_high": t.column("n_high"),
                         "out_rate": rate})

    return out.map_batches(finalize, batch_format="pyarrow")


def winsorized_mean(ds, key: str, value_col: str, *, lo: float = 0.05,
                    hi: float = 0.95, num_buckets: int | None = None):
    """Winsorized per-group mean: values are CLAMPED to the group's
    exact interpolated [lo, hi] quantiles before averaging — unlike the
    trimmed mean (which drops the tails) every row still votes, just
    with bounded influence; the robust location estimate for heavy-
    tailed metrics where dropping rows biases small groups.  Nulls are
    ignored.  Returns Dataset[{key, n, q_lo, q_hi, winsorized_mean}].

    Scale shape: one exact-quantile pass per key, quantile bounds join
    back co-bucketed, one (count, Σclamped) combiner exchange — the
    clamp is bit-identical across engines (same quantiles, same
    least/greatest)."""
    from webval.exchange import grouped_agg
    from webval.joins import equi_join

    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError(f"winsorized_mean: bad quantile range "
                         f"[{lo}, {hi}]")
    q = grouped_exact_quantiles(ds, key, value_col,
                                {"q_lo": lo, "q_hi": hi},
                                interpolate=True,
                                num_buckets=num_buckets)
    proj = ds.map_batches(
        lambda t: t.select([key, value_col]).filter(
            pc.is_valid(t.column(value_col))),
        batch_format="pyarrow")
    joined = equi_join(proj, q, on=[key], num_buckets=num_buckets)

    def clamp(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column(value_col), pa.float64())
        w = pc.min_element_wise(pc.max_element_wise(v, t.column("q_lo")),
                                t.column("q_hi"))
        tab = pa.table({key: t.column(key), "q_lo": t.column("q_lo"),
                        "q_hi": t.column("q_hi"),
                        "n": pa.nulls(t.num_rows, pa.int64()).fill_null(1),
                        "s": w})
        agg = tab.group_by([key, "q_lo", "q_hi"]).aggregate(
            [("n", "sum"), ("s", "sum")])
        return agg.rename_columns([key, "q_lo", "q_hi", "n", "s"])

    out = grouped_agg(joined.map_batches(clamp, batch_format="pyarrow"),
                      [key, "q_lo", "q_hi"],
                      [("n", "sum"), ("s", "sum")],
                      rename={"n_sum": "n", "s_sum": "s"},
                      num_buckets=num_buckets)
    return out.map_batches(
        lambda t: pa.table({
            key: t.column(key), "n": t.column("n"),
            "q_lo": t.column("q_lo"), "q_hi": t.column("q_hi"),
            "winsorized_mean": pc.divide(
                t.column("s"), pc.cast(t.column("n"), pa.float64()))}),
        batch_format="pyarrow")


def global_top_k(ds, order_col: str, k: int, *,
                 batch_size: int | None = 65536) -> pa.Table:
    """Global top-k rows by ``order_col`` WITHOUT a sort shuffle: every
    batch pre-reduces to its own top-k via argpartition (the combiner that
    makes this k·n_blocks, not n), the k-sized partials land on the driver,
    one final argpartition picks the winners.  Nulls in ``order_col`` are
    the caller's bug — argpartition on NaN would sort them last silently,
    so they are rejected loudly.  Returns a pa.Table (driver-sized: ≤ k
    rows)."""

    def partial(t: pa.Table) -> pa.Table:
        if t.column(order_col).null_count:
            raise ValueError(f"global_top_k: {order_col} contains nulls")
        if t.num_rows > k:
            v = t.column(order_col).to_numpy(zero_copy_only=False)
            idx = np.argpartition(v, len(v) - k)[len(v) - k:]
            t = t.take(pa.array(np.sort(idx)))
        return t

    batches = list(
        ds.map_batches(partial, batch_format="pyarrow",
                       batch_size=batch_size)
          .iter_batches(batch_format="pyarrow", batch_size=None))
    if not batches:
        # an entirely-empty Dataset yields ZERO blocks (r3s4 finding);
        # rebuild the schema so callers see named columns, not an error
        sch = ds.schema()
        if sch is None or sch.names is None:
            return pa.table({})
        return pa.table({n: pa.array([], type=t)
                         for n, t in zip(sch.names, sch.types)})
    parts = pa.concat_tables(batches, promote_options="permissive")
    if parts.num_rows > k:
        v = parts.column(order_col).to_numpy(zero_copy_only=False)
        idx = np.argpartition(v, len(v) - k)[len(v) - k:]
        parts = parts.take(pa.array(np.sort(idx)))
    return parts
