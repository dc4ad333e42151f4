"""Distributed build of broadcast-side lookup structures.

The broadcast-filter pattern (D1 referential, minhash verification) needs a
small structure — a distinct-key array or a Bloom filter — derived from a
potentially huge Dataset.  Building it by iterating the Dataset on the driver
serializes the whole parent table through one process (VERDICT r1 wrong-2);
instead these helpers compute per-block PARTIALS inside ``map_batches`` and
collapse them with a fan-in tree of Dataset levels, so the driver only ever
receives the final merged structure (KB–MB for a bloom sketch; O(distinct)
for an exact key array, which is inherent to broadcast mode).

All-to-all cost: none — each level is a repartition of already-tiny partial
rows.  At 10^9 parent keys the bloom partials are ~150 MB each (bit-array
size is fixed by capacity), which is why ``fan`` defaults low (8) for blobs:
a merge task touches ≤ fan × blob bytes.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webval.sketches import BloomFilter, hash64


def _tree_collapse(mat, merge_fn, fan: int):
    """Repartition+merge levels until one block remains; returns that block
    as a pyarrow Table.  ``mat`` must be materialized; ``merge_fn`` maps one
    whole block (Table) → one-or-few-row Table and must be associative."""
    while mat.num_blocks() > 1:
        mat = (mat.repartition(max(1, math.ceil(mat.num_blocks() / fan)))
                  .map_batches(merge_fn, batch_format="pyarrow",
                               batch_size=None)
                  .materialize())
    batches = list(mat.iter_batches(batch_format="pyarrow", batch_size=None))
    if not batches:
        return None
    return merge_fn(pa.concat_tables(batches, promote_options="permissive"))


def bloom_from_dataset(ds, col: str, capacity: int, *, fp_rate: float = 0.01,
                       fan: int = 8, batch_size: int | None = None,
                       max_partial_bytes: int = 4 * 2**30) -> BloomFilter:
    """Bloom filter of all non-null values of ``col``, built distributed:
    one partial filter per block (map_batches) → tree OR-merge of the packed
    bit arrays → driver unpickles only the FINAL filter.  Same params
    everywhere (capacity/fp_rate fix n_bits and k), so merge is bitwise OR.

    Every partial is a FULL bit array, so the materialized partial volume is
    ``n_blocks × n_bits/8`` — at large capacity over a many-block input that
    silently multiplies into tens of GB of store/spill (the r5 160M-doc
    rehearsal OOD'd exactly here: a ~28 MB array per block × 512+ pair-
    exchange blocks).  When one partial exceeds 4 MB the input is therefore
    repartitioned so all inflight partials fit ``max_partial_bytes`` (one
    extra exchange of just the key column — cheap next to the blowup)."""
    n_bits = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
    bit_bytes = ((n_bits + 63) // 64) * 8
    ds = ds.select_columns([col])
    if bit_bytes > 4 * 2**20:
        n_parts = int(max(8, min(64, max_partial_bytes // bit_bytes)))
        ds = ds.repartition(n_parts)

    def partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(capacity, fp_rate)
        vals = batch.column(col).combine_chunks().drop_null()
        if len(vals):
            bf.add_hashes(hash64(vals.to_numpy(zero_copy_only=False)))
        return pa.table({"blob": pa.array([bf.bits.tobytes()],
                                          pa.large_binary())})

    def merge(batch: pa.Table) -> pa.Table:
        acc: np.ndarray | None = None
        for b in batch.column("blob").to_pylist():
            a = np.frombuffer(b, dtype=np.uint64)
            if acc is None:
                acc = a.copy()
            else:
                np.bitwise_or(acc, a, out=acc)
        blob = acc.tobytes() if acc is not None else b""
        return pa.table({"blob": pa.array([blob], pa.large_binary())})

    partials = (ds.map_batches(partial, batch_format="pyarrow",
                               batch_size=batch_size)
                  .materialize())
    final = _tree_collapse(partials, merge, fan)
    bf = BloomFilter(capacity, fp_rate)
    if final is not None and final.num_rows:
        blob = final.column("blob")[0].as_py()
        if blob:
            bf.bits = np.frombuffer(blob, dtype=np.uint64).copy()
    return bf


def distinct_array_from_dataset(ds, col: str, *, fan: int = 64,
                                batch_size: int | None = 65536) -> pa.Array:
    """Distinct non-null values of ``col`` as one pyarrow Array, built with
    per-block ``pc.unique`` partials + a fan-in unique-merge tree.  The final
    array lands on the driver (it is the broadcast payload); every earlier
    level holds only per-block distinct sets."""

    def partial(batch: pa.Table) -> pa.Table:
        u = pc.unique(batch.column(col).combine_chunks()).drop_null()
        return pa.table({col: u})

    partials = (ds.select_columns([col])
                  .map_batches(partial, batch_format="pyarrow",
                               batch_size=batch_size)
                  .materialize())
    final = _tree_collapse(partials, partial, fan)
    if final is None:
        return pa.array([], pa.string())
    return final.column(col).combine_chunks()


def broadcast_join(ds, dim: pa.Table, on: str, *, how: str = "inner",
                   batch_size: int | None = 65536):
    """Map-side hash join of a big Dataset against a SMALL dimension table
    (SURVEY.md §2-D: broadcast the small side instead of shuffling the big
    one).  ``dim`` is ``ray.put`` ONCE; every map task reads it from the
    local object store (zero re-ship per batch) and joins its batch with
    ``pc.index_in`` + ``take`` — fully vectorized, no all-to-all exchange.

    ``how``: "inner" drops probe rows without a match; "left" keeps them
    with null dim columns.  ``on`` must be unique in ``dim`` (dimension
    semantics); duplicate dim keys would silently match only the first
    occurrence, so they raise.
    """
    import ray

    if how not in ("inner", "left"):
        raise ValueError(f"broadcast_join: how={how!r} not in (inner, left)")
    dim = dim.combine_chunks()
    keys = dim.column(on)
    if len(keys) != len(pc.unique(keys)):
        raise ValueError(
            f"broadcast_join: dim key {on!r} is not unique — aggregate the "
            f"dimension table first")
    dim_ref = ray.put(dim)
    payload_cols = [c for c in dim.column_names if c != on]

    def join_batch(batch: pa.Table) -> pa.Table:
        d = ray.get(dim_ref)
        pos = pc.index_in(batch.column(on).combine_chunks(),
                          value_set=d.column(on).combine_chunks())
        if how == "inner":
            keep = pc.is_valid(pos)
            batch = batch.filter(keep)
            pos = pos.filter(keep)
        for c in payload_cols:
            # take with a null index yields a null value (the "left" fill)
            batch = batch.append_column(c, d.column(c).take(pos))
        return batch

    return ds.map_batches(join_batch, batch_format="pyarrow",
                          batch_size=batch_size)
