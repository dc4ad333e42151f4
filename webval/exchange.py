"""Hash-bucket exchange: the engine's high-cardinality groupby primitive.

Ray Data's ``groupby(key)`` sort-based aggregate walks group boundaries in
Python — fine for dozens of groups (lang, returnflag), but ~100µs/group makes
millions of url/fingerprint/band-hash groups unusable (measured: 5s CPU per
50k string groups).  The scalable shape used throughout this engine:

1. map_batches: combine within the batch with Arrow's C++ ``Table.group_by``
   (the combiner), then attach ``__bucket__ = hash64(key) % num_buckets``.
2. ``groupby("__bucket__").map_groups(fn)``: Ray shuffles by a SMALL int key
   (num_buckets groups → boundary walking is trivial), co-locating all rows
   of equal keys; ``fn`` finishes each bucket with another C++ group_by.

num_buckets is the reducer parallelism — when not given it is DERIVED from
the cluster (2 × total CPUs, floor 64, VERDICT r2 wrong-4) so a bigger
cluster automatically gets more, smaller reduce tasks; hash bucketing
spreads hot keys' *partials* uniformly, and because step 1 pre-combined per
batch, a hot key contributes at most one row per input batch (bounded skew,
SURVEY.md §2-G G2).

Combiner-less uses (sessionize, as-of/interval joins, dedup keep-min) hold
one whole bucket in a task's memory; they pass ``max_group_rows`` so a
single key group that cannot fit a bucket task fails with a diagnostic
naming the key instead of an opaque OOM.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webval.sketches import hash64

DEFAULT_BUCKETS = 64
# default single-group cap for combiner-less ops (sessionize, as-of /
# interval joins): ~4M rows ≈ low hundreds of MB of typical event rows per
# bucket task — an explicit diagnostic beyond this instead of an OOM
DEFAULT_MAX_GROUP_ROWS = 4_000_000


def resolve_num_buckets(num_buckets: int | None) -> int:
    """Explicit value wins; None derives 2×cluster-CPUs (floor
    DEFAULT_BUCKETS) — at cluster scale the reducer count follows the
    cluster instead of a constant."""
    if num_buckets is not None:
        return num_buckets
    try:
        import ray
        cpus = (int(ray.cluster_resources().get("CPU", 0))
                if ray.is_initialized() else 0)
    except Exception:
        cpus = 0
    return max(DEFAULT_BUCKETS, 2 * cpus)


def _bucket_of(batch: pa.Table, key_cols: list[str], num_buckets: int) -> pa.Array:
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for c in key_cols:
        col = batch.column(c)
        vals = col.to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = h * np.uint64(1099511628211) ^ hash64(vals)
    return pa.array((h % np.uint64(num_buckets)).astype(np.int32))


def bucketed_group_apply(ds, key_cols: list[str], fn, *,
                         num_buckets: int | None = None,
                         partial_fn=None, batch_size: int | None = 65536,
                         max_group_rows: int | None = None):
    """Apply ``fn(table) -> table`` once per hash bucket, with all rows of any
    ``key_cols`` combination guaranteed to be in the same call.  ``partial_fn``
    (optional combiner, table -> table keeping key_cols) runs per input batch
    BEFORE the shuffle to shrink what moves.

    ``max_group_rows``: combiner-less callers (whole groups must fit one
    bucket task) set this so a single key group larger than the cap raises
    a ValueError NAMING the key — not an opaque task OOM.  The size scan
    only runs on buckets already over the cap (cheap on healthy data)."""
    key_cols = list(key_cols)
    num_buckets = resolve_num_buckets(num_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        if partial_fn is not None:
            batch = partial_fn(batch)
        if batch.num_rows == 0:
            return batch.append_column("__bucket__", pa.array([], pa.int32()))
        return batch.append_column("__bucket__",
                                   _bucket_of(batch, key_cols, num_buckets))

    def apply_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket__"])
        if max_group_rows is not None and g.num_rows > max_group_rows:
            counts = g.group_by(key_cols).aggregate([([], "count_all")])
            mx = pc.max(counts.column("count_all")).as_py()
            if mx > max_group_rows:
                big = counts.filter(
                    pc.equal(counts.column("count_all"), mx)).slice(0, 1)
                keyvals = {c: big.column(c)[0].as_py() for c in key_cols}
                raise ValueError(
                    f"bucketed_group_apply: key group {keyvals} has {mx} "
                    f"rows > max_group_rows={max_group_rows}; one key group "
                    f"must fit a single bucket task — re-key the operation "
                    f"(salt / sub-window the key) or raise max_group_rows")
        return fn(g)

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           batch_size=batch_size)
              .groupby("__bucket__")
              .map_groups(apply_bucket, batch_format="pyarrow"))


def grouped_count(ds, key: str, *, num_buckets: int | None = None,
                  min_count: int | None = None, out_col: str = "cnt",
                  batch_size: int | None = 65536):
    """Exact per-key counts at any cardinality (two-phase: per-batch
    value_counts combiner → bucketed sum).  Optionally keep only keys with
    count ≥ min_count (uniqueness violations: min_count=2)."""

    def partial(batch: pa.Table) -> pa.Table:
        vc = batch.column(key).combine_chunks().value_counts()
        t = pa.table({key: vc.field("values"),
                      out_col: pc.cast(vc.field("counts"), pa.int64())})
        return t.filter(pc.is_valid(t.column(key)))

    def final(g: pa.Table) -> pa.Table:
        agg = g.group_by(key).aggregate([(out_col, "sum")])
        agg = agg.select([key, f"{out_col}_sum"]).rename_columns([key, out_col])
        if min_count is not None:
            agg = agg.filter(pc.greater_equal(agg.column(out_col), min_count))
        return agg

    return bucketed_group_apply(ds.select_columns([key]), [key], final,
                                num_buckets=num_buckets, partial_fn=partial,
                                batch_size=batch_size)


def grouped_agg(ds, key_cols: list[str], aggs: list[tuple[str, str]], *,
                num_buckets: int | None = None,
                rename: dict[str, str] | None = None,
                batch_size: int | None = 65536):
    """Exact high-cardinality grouped aggregation via Arrow kernels.

    ``aggs`` are pyarrow group_by aggregations [(col, "sum"|"min"|"max"|
    "count"), ...]; mergeable ones are pre-combined per batch (sum→sum,
    min→min, max→max, count→sum of counts)."""
    key_cols = list(key_cols)
    _RECOMBINE = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}

    def partial(batch: pa.Table) -> pa.Table:
        # arrow names outputs "<col>_<agg>"
        return batch.group_by(key_cols).aggregate(aggs)

    def final(g: pa.Table) -> pa.Table:
        # re-aggregate the partials; arrow names these "<col>_<agg>_<agg2>" —
        # rename back to the partial names so callers see "<col>_<agg>"
        t = g.group_by(key_cols).aggregate(
            [(f"{c}_{a}", _RECOMBINE[a]) for c, a in aggs])
        wanted = [f"{c}_{a}_{_RECOMBINE[a]}" for c, a in aggs]
        t = t.select(key_cols + wanted)
        t = t.rename_columns(key_cols + [f"{c}_{a}" for c, a in aggs])
        if rename:
            t = t.rename_columns([rename.get(n, n) for n in t.column_names])
        return t

    return bucketed_group_apply(ds, key_cols, final, num_buckets=num_buckets,
                                partial_fn=partial, batch_size=batch_size)


def distinct_rows(ds, key_cols: list[str], *,
                  num_buckets: int | None = None,
                  batch_size: int | None = 65536):
    """Exact distinct over key_cols at any cardinality."""

    def dedup(t: pa.Table) -> pa.Table:
        return t.group_by(list(key_cols)).aggregate([])

    return bucketed_group_apply(ds.select_columns(list(key_cols)), list(key_cols),
                                dedup, num_buckets=num_buckets,
                                partial_fn=dedup, batch_size=batch_size)


def grouped_distinct_count(ds, key: str, val: str, *,
                           num_buckets: int | None = None,
                           out_col: str = "n_distinct",
                           batch_size: int | None = 65536):
    """Exact ``count(DISTINCT val) GROUP BY key`` at any cardinality of
    either column: phase 1 dedups (key, val) pairs through one exchange
    (per-batch dedup combiner bounds the shuffle at distinct-per-batch),
    phase 2 counts the surviving pairs per key through a second, much
    smaller exchange.  Null vals are not counted (SQL semantics); null-KEY
    rows are dropped (grouped_count's convention — SQL keeps a null group,
    so filter/fill upstream if you need it)."""
    pairs = distinct_rows(
        ds.map_batches(lambda t: t.select([key, val]).filter(
            pc.is_valid(t.column(val))), batch_format="pyarrow",
            batch_size=batch_size),
        [key, val], num_buckets=num_buckets, batch_size=batch_size)
    return grouped_count(pairs, key, out_col=out_col,
                         num_buckets=num_buckets, batch_size=batch_size)


def detect_hot_keys(ds, col: str, *, min_count: int, k: int = 64,
                    batch_size: int | None = 65536) -> list:
    """Keys of ``col`` that MAY occur ≥ ``min_count`` times, via a
    tree-reduced Misra-Gries sketch (k counters per partial — KB-sized
    accumulators regardless of input size).  No false negatives above the
    sketch's certified error bound: every key truly ≥ min_count is
    returned (plus possibly a few under it, harmless for skew remedies
    like salted joins, which only over-protect).  One streaming pass."""
    import math
    import pickle

    from webval.sketches import MisraGries

    def partial(t: pa.Table) -> pa.Table:
        mg = MisraGries(k=k)
        c = t.column(col).combine_chunks()
        vc = c.value_counts()
        vals, cnts = vc.field("values"), vc.field("counts")
        ok = pc.is_valid(vals)
        mg.add_counts(vals.filter(ok).to_pylist(),
                      cnts.filter(ok).to_numpy(zero_copy_only=False))
        return pa.table({"mg": pa.array([pickle.dumps(mg)],
                                        pa.large_binary())})

    def merge_rows(t: pa.Table) -> pa.Table:
        merged = None
        for b in t.column("mg").to_pylist():
            mg = pickle.loads(b)
            merged = mg if merged is None else merged.merge(mg)
        return pa.table({"mg": pa.array([pickle.dumps(
            merged or MisraGries(k=k))], pa.large_binary())})

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size).materialize()
    n = parts.count()
    while n > 64:
        parts = (parts.repartition(max(1, math.ceil(n / 64)))
                 .map_batches(merge_rows, batch_format="pyarrow",
                              batch_size=None).materialize())
        n = parts.count()
    final = MisraGries(k=k)
    for row in parts.take_all():
        final.merge(pickle.loads(row["mg"]))
    return [v for v, _lo, hi in final.heavy_hitters(min_count)
            if hi >= min_count]


def sum_block_scalars(materialized_ds, names: list[str]) -> dict[str, int]:
    """Driver-side sum of int64 partial columns over a MATERIALIZED
    dataset's blocks — the finisher of the big-map-then-tiny-rollup
    pattern (a trailing .sum() would cap the upstream map via the AllToAll
    resource reservation; BENCH/BASELINE.md finding 2).

    Skips zero-row blocks: an empty input block bypasses map UDFs entirely
    and keeps the INPUT schema, so reading the partial columns off it would
    KeyError (r3s4 finding)."""
    import ray

    totals = {n: 0 for n in names}
    for ref in materialized_ds.to_arrow_refs():
        b = ray.get(ref)
        if b.num_rows == 0:
            continue
        for n in names:
            totals[n] += int(pc.sum(b.column(n)).as_py() or 0)
    return totals


def grouped_approx_distinct(ds, key: str, val: str, *, p: int = 12,
                            num_buckets: int | None = None,
                            out_col: str = "approx_distinct",
                            batch_size: int | None = 65536):
    """Approximate COUNT(DISTINCT val) per key via per-group HyperLogLog
    sketches riding the exchange — the scale path when the exact
    ``grouped_distinct_count`` would shuffle every (key, val) pair: here
    the shuffle carries one 2^p-byte register blob per key per batch
    (p=12 → 4 KB, ~1.6% standard error), independent of value cardinality.

    Per batch: group rows by key, one vectorized ``np.maximum.at`` per
    group's hash slice; per bucket: register-matrix ``maximum.reduceat``
    across batches and a vectorized estimate with the standard
    linear-counting small-range correction (sketches.HyperLogLog formula).
    Null keys/values are dropped (SQL count(DISTINCT) semantics).
    """
    import math

    from webval.sketches import hash64

    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key, val])
        t = t.filter(pc.and_(pc.is_valid(t.column(key).combine_chunks()),
                             pc.is_valid(t.column(val).combine_chunks())))
        if t.num_rows == 0:
            return pa.table({key: pa.array([], t.schema.field(key).type),
                             "__regs__": pa.array([], pa.large_binary())})
        t = t.sort_by([(key, "ascending")])
        kk = t.column(key).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, kk[1:] != kk[:-1]])
        counts = np.diff(np.r_[starts, len(kk)])
        h = hash64(t.column(val).to_numpy(zero_copy_only=False))
        idx = (h & np.uint64(m - 1)).astype(np.int64)
        w = (h >> np.uint64(p)).astype(np.uint64)
        bl = np.zeros(len(w), dtype=np.int64)
        nz = w > 0
        if nz.any():
            _, e = np.frexp(w[nz].astype(np.float64))
            bl[nz] = e
        rho = ((64 - p) - bl + 1).astype(np.uint8)
        # one flat maximum.at over (group_row, register) keys — no loop
        seg = np.repeat(np.arange(len(starts), dtype=np.int64), counts)
        regs = np.zeros((len(starts), m), dtype=np.uint8)
        np.maximum.at(regs.reshape(-1), seg * m + idx, rho)
        blobs = pa.array([regs[i].tobytes() for i in range(len(starts))],
                         pa.large_binary())
        return pa.table({key: t.column(key).take(
            pa.array(starts, pa.int64())), "__regs__": blobs})

    def final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({key: pa.array([], g.schema.field(key).type),
                             out_col: pa.array([], pa.int64())})
        kk = g.column(key).to_numpy(zero_copy_only=False)
        order = np.argsort(kk, kind="stable")
        kk = kk[order]
        starts = np.flatnonzero(np.r_[True, kk[1:] != kk[:-1]])
        blobs = g.column("__regs__").to_pylist()
        flat = np.frombuffer(b"".join(blobs[i] for i in order),
                             dtype=np.uint8).reshape(len(kk), m)
        merged = np.maximum.reduceat(flat, starts, axis=0)
        mf = float(m)
        alpha = 0.7213 / (1.0 + 1.079 / mf)
        est = alpha * mf * mf / np.sum(np.exp2(-merged.astype(np.float64)),
                                       axis=1)
        zeros = (merged == 0).sum(axis=1)
        small = (est <= 2.5 * mf) & (zeros > 0)
        with np.errstate(divide="ignore"):
            lin = mf * np.log(mf / np.maximum(zeros, 1))
        est = np.where(small, lin, est)
        return pa.table({
            key: g.column(key).take(pa.array(order[starts], pa.int64())),
            out_col: pa.array(np.rint(est).astype(np.int64))})

    return bucketed_group_apply(ds, [key], final, num_buckets=num_buckets,
                                partial_fn=partial, batch_size=batch_size)


def _compress_centroid_groups(seg_starts: np.ndarray, means: np.ndarray,
                              weights: np.ndarray, delta: int
                              ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized MULTI-GROUP t-digest compression: ``means``/``weights``
    sorted by (group, mean) with group boundaries at ``seg_starts`` →
    one k1-bucketed ``np.add.reduceat`` merge across ALL groups at once
    (same math as sketches.TDigest._compress, no per-group Python loop).
    Returns (group_index_per_centroid, merged_means, merged_weights)."""
    import math

    from webval.sketches import _k1

    n = len(means)
    sizes = np.diff(np.r_[seg_starts, n])
    grp = np.repeat(np.arange(len(seg_starts), dtype=np.int64), sizes)
    cw = np.cumsum(weights)
    base = np.r_[0.0, cw][seg_starts]
    totals = np.add.reduceat(weights, seg_starts)
    qmid = (cw - np.repeat(base, sizes) - weights / 2.0) \
        / np.repeat(totals, sizes)
    buckets = np.floor(_k1(qmid, float(delta))).astype(np.int64)
    new = np.r_[True, (grp[1:] != grp[:-1]) | (buckets[1:] != buckets[:-1])]
    starts = np.flatnonzero(new)
    wm = np.add.reduceat(weights, starts)
    mm = np.add.reduceat(weights * means, starts) / wm
    return grp[starts], mm, wm


def grouped_tdigest(ds, key: str, val: str, qs: list[float], *,
                    delta: int = 300, num_buckets: int | None = None,
                    batch_size: int | None = 65536,
                    out_cols: list[str] | None = None):
    """Approximate per-key quantiles at ANY key cardinality: per-(key,
    batch) t-digest blobs ride the exchange the way grouped_approx_distinct
    ships HLL registers (VERDICT r4 next-2) — the shuffle carries ≤ ~2·delta
    float64 centroids per key per batch instead of every value, and the
    finalize is a vectorized multi-group merge-compress, so 1M+ keys never
    touch Ray's sort-based groupby or a driver concat.

    Blob layout (all float64): [min, max, means…, weights…].  Quantile
    extraction reuses sketches.TDigest.quantiles (the rank-error-tested
    implementation) on the merged centroids.  Null keys/values drop.
    Returns Dataset[{key, <out_cols>}] with one row per key.
    """
    from webval.sketches import TDigest

    qs = [float(q) for q in qs]
    if out_cols is None:
        out_cols = [f"p{int(round(q * 100)):02d}" for q in qs]

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key, val])
        t = t.filter(pc.and_(pc.is_valid(t.column(key).combine_chunks()),
                             pc.is_valid(t.column(val).combine_chunks())))
        if t.num_rows == 0:
            return pa.table({key: pa.array([], t.schema.field(key).type),
                             "__tdg__": pa.array([], pa.large_binary())})
        t = t.sort_by([(key, "ascending"), (val, "ascending")])
        kk = t.column(key).to_numpy(zero_copy_only=False)
        vv = t.column(val).to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(vv)
        if not ok.all():
            kk, vv = kk[ok], vv[ok]
        if len(kk) == 0:
            return pa.table({key: pa.array([], t.schema.field(key).type),
                             "__tdg__": pa.array([], pa.large_binary())})
        seg_starts = np.flatnonzero(np.r_[True, kk[1:] != kk[:-1]])
        seg_ends = np.r_[seg_starts[1:], len(kk)]
        g_of, mm, wm = _compress_centroid_groups(
            seg_starts, vv, np.ones(len(vv)), delta)
        c_starts = np.flatnonzero(np.r_[True, g_of[1:] != g_of[:-1]])
        c_sizes = np.diff(np.r_[c_starts, len(g_of)])
        blobs = []
        for gi in range(len(seg_starts)):
            s, c = c_starts[gi], c_sizes[gi]
            blobs.append(np.concatenate((
                [vv[seg_starts[gi]], vv[seg_ends[gi] - 1]],
                mm[s:s + c], wm[s:s + c])).tobytes())
        return pa.table({
            key: t.column(key).take(pa.array(seg_starts, pa.int64())),
            "__tdg__": pa.array(blobs, pa.large_binary())})

    def final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({key: pa.array([], g.schema.field(key).type),
                             **{c: pa.array([], pa.float64())
                                for c in out_cols}})
        kk = g.column(key).to_numpy(zero_copy_only=False)
        col = g.column("__tdg__").combine_chunks()
        # zero-copy blob parse: one float64 view over the whole data buffer,
        # per-blob extents from the arrow offsets buffer
        off_b, data_b = col.buffers()[1], col.buffers()[2]
        off = (np.frombuffer(off_b, dtype=np.int64)[col.offset:
                                                    col.offset + len(col) + 1]
               // 8)
        data = np.frombuffer(data_b, dtype=np.float64)
        n_cent = (np.diff(off) - 2) // 2
        # order blobs by key so each key's centroids are contiguous
        order = np.argsort(kk, kind="stable")
        kk_s = kk[order]
        key_starts = np.flatnonzero(np.r_[True, kk_s[1:] != kk_s[:-1]])
        key_blob_cnt = np.diff(np.r_[key_starts, len(kk_s)])
        # gather all (mean, weight) pairs, tagged by key index
        cnt = n_cent[order]
        tot = int(cnt.sum())
        # flat indices of each blob's means segment: off[i]+2 .. +2+cnt
        rep = np.repeat(np.arange(len(order), dtype=np.int64), cnt)
        pos_in = np.arange(tot, dtype=np.int64) - \
            np.repeat(np.r_[0, np.cumsum(cnt)][:-1], cnt)
        base = off[order] + 2
        means = data[np.repeat(base, cnt) + pos_in]
        weights = data[np.repeat(base + cnt, cnt) + pos_in]
        key_of = np.repeat(
            np.repeat(np.arange(len(key_starts), dtype=np.int64),
                      key_blob_cnt), cnt)
        mins = np.minimum.reduceat(data[off[order]], key_starts)
        maxs = np.maximum.reduceat(data[off[order] + 1], key_starts)
        so = np.lexsort((means, key_of))
        means, weights, key_of = means[so], weights[so], key_of[so]
        seg_starts = np.flatnonzero(np.r_[True, key_of[1:] != key_of[:-1]])
        g_of, mm, wm = _compress_centroid_groups(seg_starts, means, weights,
                                                 delta)
        c_starts = np.flatnonzero(np.r_[True, g_of[1:] != g_of[:-1]])
        c_ends = np.r_[c_starts[1:], len(g_of)]
        out_vals: list[list[float]] = [[] for _ in qs]
        for ki in range(len(key_starts)):
            td = TDigest(delta=delta)
            td.means = mm[c_starts[ki]:c_ends[ki]]
            td.weights = wm[c_starts[ki]:c_ends[ki]]
            td.min, td.max = float(mins[ki]), float(maxs[ki])
            for qi, v in enumerate(td.quantiles(qs)):
                out_vals[qi].append(v)
        return pa.table({
            key: g.column(key).take(pa.array(order[key_starts], pa.int64())),
            **{c: pa.array(out_vals[qi], pa.float64())
               for qi, c in enumerate(out_cols)}})

    return bucketed_group_apply(ds.select_columns([key, val]), [key], final,
                                num_buckets=num_buckets, partial_fn=partial,
                                batch_size=batch_size)


def skew_report(ds, key_cols: list[str], *, num_buckets: int | None = None,
                top_k: int = 10) -> dict:
    """Pre-shuffle skew diagnosis: how evenly would ``key_cols`` hash
    over the exchange's buckets, and which keys are hot — the question
    to ask BEFORE a join/groupby on a new key at full scale (a 10×
    max/mean bucket ratio means one straggler task; a single key owning
    a bucket means salting is required, cf. equi_join's ``hot_keys``).

    Returns {"n_rows", "num_buckets", "bucket_max", "bucket_mean",
    "skew_ratio", "top_keys": [(key-dict, count), ...]} — top keys by
    row count (exact, via the same count-combiner exchange the real
    shuffle would use).

    Scale shape: ONE (key → count) exchange (combiner-bounded); bucket
    sizes derive from the key counts by hashing the KEY TABLE, not the
    rows; only ``top_k`` keys and ``num_buckets`` integers reach the
    driver."""
    import ray

    key_cols = list(key_cols)
    nb = resolve_num_buckets(num_buckets)
    counts = grouped_agg(
        ds.select_columns(key_cols).map_batches(
            lambda t: t.drop_null(), batch_format="pyarrow"),
        key_cols, [(key_cols[0], "count")],
        rename={f"{key_cols[0]}_count": "n"},
        num_buckets=num_buckets).materialize()

    def bucket_partial(t: pa.Table) -> pa.Table:
        b = _bucket_of(t, key_cols, nb).to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        sums = np.bincount(b, weights=n.astype(np.float64),
                           minlength=nb).astype(np.int64)
        return pa.table({"bucket": pa.array(np.arange(nb, dtype=np.int64)),
                         "rows": pa.array(sums)})

    per_bucket = grouped_agg(
        counts.map_batches(bucket_partial, batch_format="pyarrow"),
        ["bucket"], [("rows", "sum")], rename={"rows_sum": "rows"},
        num_buckets=num_buckets).materialize()
    sizes = np.zeros(nb, dtype=np.int64)
    for ref in per_bucket.to_arrow_refs():
        blk = ray.get(ref)
        if blk.num_rows == 0:
            continue
        sizes[blk.column("bucket").to_numpy(zero_copy_only=False)] += \
            blk.column("rows").to_numpy(zero_copy_only=False)
    total = int(sizes.sum())
    top = counts.sort(["n"] + key_cols,
                      descending=[True] + [False] * len(key_cols)) \
        .limit(top_k).take_all()
    mean = total / nb if nb else 0.0
    return {
        "n_rows": total, "num_buckets": nb,
        "bucket_max": int(sizes.max()) if nb else 0,
        "bucket_mean": mean,
        "skew_ratio": (float(sizes.max()) / mean) if mean else 0.0,
        "top_keys": [({c: r[c] for c in key_cols}, r["n"]) for r in top],
    }
