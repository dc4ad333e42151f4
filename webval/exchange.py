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

num_buckets is the reducer parallelism — at cluster scale set it ≥ total
cores; hash bucketing spreads hot keys' *partials* uniformly, and because
step 1 pre-combined per batch, a hot key contributes at most one row per
input batch (bounded skew, SURVEY.md §2-G G2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webval.sketches import hash64

DEFAULT_BUCKETS = 64


def _bucket_of(batch: pa.Table, key_cols: list[str], num_buckets: int) -> pa.Array:
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for c in key_cols:
        col = batch.column(c)
        vals = col.to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = h * np.uint64(1099511628211) ^ hash64(vals)
    return pa.array((h % np.uint64(num_buckets)).astype(np.int32))


def bucketed_group_apply(ds, key_cols: list[str], fn, *,
                         num_buckets: int = DEFAULT_BUCKETS,
                         partial_fn=None, batch_size: int | None = 65536):
    """Apply ``fn(table) -> table`` once per hash bucket, with all rows of any
    ``key_cols`` combination guaranteed to be in the same call.  ``partial_fn``
    (optional combiner, table -> table keeping key_cols) runs per input batch
    BEFORE the shuffle to shrink what moves."""
    key_cols = list(key_cols)

    def add_bucket(batch: pa.Table) -> pa.Table:
        if partial_fn is not None:
            batch = partial_fn(batch)
        if batch.num_rows == 0:
            return batch.append_column("__bucket__", pa.array([], pa.int32()))
        return batch.append_column("__bucket__",
                                   _bucket_of(batch, key_cols, num_buckets))

    def apply_bucket(g: pa.Table) -> pa.Table:
        return fn(g.drop_columns(["__bucket__"]))

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           batch_size=batch_size)
              .groupby("__bucket__")
              .map_groups(apply_bucket, batch_format="pyarrow"))


def grouped_count(ds, key: str, *, num_buckets: int = DEFAULT_BUCKETS,
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
                num_buckets: int = DEFAULT_BUCKETS,
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
                  num_buckets: int = DEFAULT_BUCKETS,
                  batch_size: int | None = 65536):
    """Exact distinct over key_cols at any cardinality."""

    def dedup(t: pa.Table) -> pa.Table:
        return t.group_by(list(key_cols)).aggregate([])

    return bucketed_group_apply(ds.select_columns(list(key_cols)), list(key_cols),
                                dedup, num_buckets=num_buckets,
                                partial_fn=dedup, batch_size=batch_size)
