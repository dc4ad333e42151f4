"""Type normalization / parsing map stage (SURVEY.md §2-B B8).

The reference assumes clean in-memory frames; web-scale parquet does not —
casts and timestamp parses must tolerate malformed values by yielding NULL
plus a counted violation, never a task error (SURVEY.md §4 'semantic
tolerance').  All kernels are pyarrow.compute; rows that fail a safe cast
are retried element-wise only within the failing batch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _safe_cast(col, target: pa.DataType, ts_format: str | None):
    """Cast with per-value null-on-error semantics."""
    if pa.types.is_timestamp(target) and (
            pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
        fmt = ts_format or "%Y-%m-%dT%H:%M:%S"
        return pc.strptime(col, format=fmt, unit="us", error_is_null=True)
    try:
        return pc.cast(col, target, safe=True)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        # element-wise fallback: null out the uncastable values
        vals = col.to_pylist()
        out = []
        for v in vals:
            if v is None:
                out.append(None)
                continue
            try:
                out.append(pa.scalar(v).cast(target).as_py())
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                    ValueError, OverflowError):
                out.append(None)
        return pa.array(out, type=target)


def normalize_types(ds, schema: dict[str, pa.DataType], *,
                    ts_format: str | None = None,
                    count_col: str | None = "__cast_errors__",
                    batch_size: int | None = 8192):
    """Cast the named columns to target types; values that cannot be parsed
    become NULL.  When ``count_col`` is set, an int column counting this
    row's newly-nulled values is appended (feed it to a null-rate check to
    turn parse failures into violations)."""

    def fn(batch: pa.Table) -> pa.Table:
        import numpy as np

        errors = np.zeros(batch.num_rows, dtype=np.int32)
        for name, target in schema.items():
            if name not in batch.column_names:
                continue
            col = batch.column(name).combine_chunks()
            before_null = pc.is_null(col).to_numpy(zero_copy_only=False)
            cast = _safe_cast(col, target, ts_format)
            if isinstance(cast, pa.ChunkedArray):
                cast = cast.combine_chunks()
            after_null = pc.is_null(cast).to_numpy(zero_copy_only=False)
            errors += (after_null & ~before_null).astype(np.int32)
            batch = batch.set_column(batch.column_names.index(name), name, cast)
        if count_col:
            batch = batch.append_column(count_col, pa.array(errors))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
