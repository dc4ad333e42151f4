"""Row-level constraint predicates + verdict assembly (SURVEY.md §2-B).

rdv's Schema.check(row) walks components and emits tags — feature tags plus
``*-err`` tags for range / domain / nan violations
[rdv:rdv/schema.py Schema.check → tags, UNVERIFIED].  Here the same semantics
run vectorized: one ``map_batches(batch_format="pyarrow")`` evaluates every
row-level CheckSpec as a boolean mask (pyarrow.compute kernels), folds them
into a ``pass`` column, and materializes per-row failure detail only for the
failing rows (violations are rare — the Python list build is off the hot path).

Null semantics (mirrors rdv): a null value does NOT fail range/domain/regex —
nulls are governed by the nan-rate check (dataset/partition level, B3) and,
when configured, a row-level ``not_null`` check.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webval.schema import CheckSpec, SchemaSpec

def _mask_range(col, params):
    if pa.types.is_timestamp(col.type):
        col = pc.cast(col, pa.int64())
    m = pc.and_(pc.greater_equal(col, params["min"]),
                pc.less_equal(col, params["max"]))
    return pc.fill_null(m, True)  # nulls pass; the null-rate check owns them


def _mask_domain(col, params):
    m = pc.is_in(col, value_set=pa.array(params["values"], type=col.type))
    return pc.if_else(pc.is_null(col), True, m)


def _mask_regex(col, params):
    return pc.fill_null(pc.match_substring_regex(col, params["pattern"]), True)


def _mask_not_null(col, params):
    return pc.invert(pc.is_null(col, nan_is_null=True))


# §2-J extension surface: new predicate kinds register a batch-kernel
# function (column, params) -> BooleanArray(True=pass) here — the analog of
# subclassing rdv's Extractor/Stats [rdv:rdv/extractors, UNVERIFIED].
CHECK_KINDS: dict = {
    "range": _mask_range,
    "domain": _mask_domain,
    "regex": _mask_regex,
    "not_null": _mask_not_null,
}


def _mask_conditional(batch: pa.Table, params):
    """Cross-column implication: rows where the ``when`` sub-check holds
    must pass the ``then`` sub-check; rows out of scope pass trivially.

    ``params`` = {"when": {column, kind, params}, "then": {...same...}} —
    both sides use the registered single-column kinds.  Scope semantics are
    SQL-natural: a null ``when`` column puts the row OUT of scope (matching
    ``WHERE when_col = ...``, which drops nulls), overriding the null-pass
    convention the kinds use when standing alone."""
    w, t = params["when"], params["then"]
    wcol = batch.column(w["column"])
    wm = CHECK_KINDS[w["kind"]](wcol, w["params"])
    cond = pc.and_(wm, pc.is_valid(wcol))
    tm = CHECK_KINDS[t["kind"]](batch.column(t["column"]), t["params"])
    return pc.or_(pc.invert(cond), tm)


# kinds whose kernel needs the whole batch (cross-column predicates):
# mask_fn(batch: pa.Table, params) -> bool mask, True = pass
BATCH_CHECK_KINDS: dict = {
    "conditional": _mask_conditional,
}

ROW_LEVEL_KINDS = CHECK_KINDS.keys() | BATCH_CHECK_KINDS.keys()


def register_check_kind(kind: str, mask_fn) -> None:
    """Plugin hook: mask_fn(column: pa.ChunkedArray, params: dict) -> bool
    mask (True = pass).  Nulls should pass unless the kind is about nulls."""
    global ROW_LEVEL_KINDS
    CHECK_KINDS[kind] = mask_fn
    ROW_LEVEL_KINDS = CHECK_KINDS.keys() | BATCH_CHECK_KINDS.keys()


def register_batch_check_kind(kind: str, mask_fn) -> None:
    """Plugin hook for cross-column kinds: mask_fn(batch: pa.Table,
    params: dict) -> bool mask (True = pass)."""
    global ROW_LEVEL_KINDS
    BATCH_CHECK_KINDS[kind] = mask_fn
    ROW_LEVEL_KINDS = CHECK_KINDS.keys() | BATCH_CHECK_KINDS.keys()


def check_mask(batch: pa.Table, check: CheckSpec) -> np.ndarray:
    """Evaluate one row-level check → bool ndarray, True = pass."""
    if check.kind in BATCH_CHECK_KINDS:
        m = BATCH_CHECK_KINDS[check.kind](batch, check.params)
    elif check.kind in CHECK_KINDS:
        m = CHECK_KINDS[check.kind](batch.column(check.column), check.params)
    else:
        raise ValueError(f"not a row-level check kind: {check.kind}")
    return np.asarray(m.combine_chunks() if isinstance(m, pa.ChunkedArray) else m,
                      dtype=bool)


def row_checks_of(schema: SchemaSpec) -> list[CheckSpec]:
    return [c for c in schema.checks if c.kind in ROW_LEVEL_KINDS]


def make_verdict_fn(schema: SchemaSpec, keep_cols: list[str] | None = None,
                    per_check_cols: bool = False):
    """Build the B6 verdict map_batches function.

    Output columns: ``keep_cols`` (default: all input columns) + ``pass``
    (bool) + ``failed_checks`` (list<string> of check names, empty when pass)
    + optionally one ``fail_<name>`` bool column per check (vectorized
    downstream filtering by which-check without list membership kernels).
    """
    checks = [c for c in schema.checks if c.kind in ROW_LEVEL_KINDS]

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        masks = [(c.name, check_mask(batch, c)) for c in checks]
        if masks:
            pass_arr = np.logical_and.reduce([m for _, m in masks])
        else:
            pass_arr = np.ones(n, dtype=bool)
        # failed_checks built from offsets + a flat values array — ZERO
        # Python objects when the batch is all-pass (VERDICT r2 wrong-3;
        # the old per-row list build allocated n empty lists per batch of
        # the headline pipeline)
        if masks and not pass_arr.all():
            fail_mat = ~np.stack([m for _, m in masks], axis=1)  # (n, k)
            rows_i, cols_i = np.nonzero(fail_mat)  # row-major = check order
            offsets = np.zeros(n + 1, dtype=np.int32)
            np.cumsum(fail_mat.sum(axis=1), out=offsets[1:], dtype=np.int32)
            names_np = np.array([name for name, _ in masks], dtype=object)
            values = pa.array(names_np[cols_i], type=pa.string())
        else:
            offsets = np.zeros(n + 1, dtype=np.int32)
            values = pa.array([], type=pa.string())
        failed_arr = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), values)
        out = batch.select(keep_cols) if keep_cols else batch
        out = out.append_column("pass", pa.array(pass_arr))
        out = out.append_column("failed_checks", failed_arr)
        if per_check_cols:
            for name, m in masks:
                out = out.append_column(f"fail_{name}", pa.array(~m))
        return out

    return fn


def check_dataset(ds, schema: SchemaSpec, keep_cols: list[str] | None = None,
                  batch_size: int | None = 8192, per_check_cols: bool = False):
    """P2 core: verdict Dataset (streaming; stateless map tasks)."""
    return ds.map_batches(make_verdict_fn(schema, keep_cols, per_check_cols),
                          batch_format="pyarrow", batch_size=batch_size)


def violations_of(verdicts):
    """B7: the failing rows, as their own (still lazy) Dataset."""
    return verdicts.map_batches(
        lambda t: t.filter(pc.invert(t.column("pass").combine_chunks())),
        batch_format="pyarrow")


# rdv tag-format adapter (VERDICT r1 missing-4): rdv's Schema.check emits a
# per-row TAG LIST — {name, value, type, group} dicts, with feature tags in
# group "default" and one "<check>-err" tag per failed check in group
# "schema-errors" [rdv:rdv/tags.py, UNVERIFIED — reference checkout empty].
# Verdict rows here carry the semantically-equal (pass, failed_checks)
# columns; this adapter materializes the rdv shape for drop-in consumers.

TAG_TYPE = pa.struct([("name", pa.string()), ("value", pa.string()),
                      ("type", pa.string()), ("group", pa.string())])


def to_tags(verdicts, *, feature_cols: list[str] | None = None,
            batch_size: int | None = 8192):
    """Append a ``tags`` column (list<struct{name,value,type,group}>) to a
    verdict Dataset: one ``<check>-err`` tag per entry of ``failed_checks``
    (group "schema-errors") plus, when ``feature_cols`` is given, one
    feature tag per named column (group "default") — the rdv Schema.check
    output shape.

    Default (``feature_cols=None``): error tags ONLY, built vectorized from
    the failed_checks list offsets — no per-row Python (VERDICT r2
    wrong-5).  ``feature_cols`` stringifies feature values per row; it is a
    shape-compatibility surface, not a scale path."""

    def err_tags_vectorized(batch: pa.Table):
        fc = batch.column("failed_checks")
        if isinstance(fc, pa.ChunkedArray):
            fc = fc.combine_chunks()
        flat = pc.list_flatten(fc)  # null lists contribute no elements
        k = len(flat)
        # a null failed_checks entry (verdicts round-tripped through user
        # storage) counts as empty, like the old per-row path's `or []` —
        # without fill_null the NaN poisons the int32 offsets (review r3)
        counts = pc.fill_null(pc.list_value_length(fc), 0) \
            .to_numpy(zero_copy_only=False)
        offsets = np.zeros(batch.num_rows + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:], dtype=np.int32)
        names = pc.binary_join_element_wise(
            flat, pa.scalar("-err", pa.string()), pa.scalar("", pa.string()))
        const = lambda v: pc.fill_null(pa.nulls(k, pa.string()), v)  # noqa: E731
        structs = pa.StructArray.from_arrays(
            [names, const("1"), const("error"), const("schema-errors")],
            fields=list(TAG_TYPE))
        return offsets, structs

    def fn_err_only(batch: pa.Table) -> pa.Table:
        offsets, structs = err_tags_vectorized(batch)
        tags = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), structs)
        return batch.append_column("tags", tags)

    def fn_with_features(batch: pa.Table) -> pa.Table:
        feats = {c: batch.column(c).to_pylist() for c in feature_cols}
        failed = batch.column("failed_checks").to_pylist()
        rows = []
        for i in range(batch.num_rows):
            tags = [{"name": c, "value": str(feats[c][i]),
                     "type": "feature", "group": "default"}
                    for c in feature_cols if feats[c][i] is not None]
            tags.extend({"name": f"{name}-err", "value": "1",
                         "type": "error", "group": "schema-errors"}
                        for name in (failed[i] or []))
            rows.append(tags)
        return batch.append_column("tags", pa.array(rows,
                                                    type=pa.list_(TAG_TYPE)))

    return verdicts.map_batches(
        fn_with_features if feature_cols else fn_err_only,
        batch_format="pyarrow", batch_size=batch_size)


def null_cooccurrence(ds, cols: list[str], *,
                      num_buckets: int | None = None) -> pa.Table:
    """Co-missingness audit: for every unordered column pair, how often
    the two are null TOGETHER — the structural-missingness signal (a
    whole extraction stage failing nulls its outputs jointly; independent
    sensor dropouts don't).  Output one driver-small row per pair
    (col_a, col_b lexicographic, n_rows, null_a, null_b, null_both,
    null_jaccard = both/(a+b−both), null when no nulls on either side).

    Scale shape: stateless vectorized partial — per batch the k null
    masks and their O(k²) pairwise AND-counts collapse to ≤ k(k−1)/2
    count rows — then a sum-combiner exchange keyed by the pair name.
    """
    from webval.exchange import grouped_agg

    cols = sorted(cols)
    if len(cols) < 2:
        raise ValueError("null_cooccurrence needs at least two columns")

    def partial(t: pa.Table) -> pa.Table:
        masks = {c: pc.is_null(t.column(c).combine_chunks())
                 .to_numpy(zero_copy_only=False) for c in cols}
        ca, cb, na, nb, nboth, nn = [], [], [], [], [], []
        for i, a in enumerate(cols):
            for b in cols[i + 1:]:
                ca.append(a)
                cb.append(b)
                na.append(int(masks[a].sum()))
                nb.append(int(masks[b].sum()))
                nboth.append(int((masks[a] & masks[b]).sum()))
                nn.append(t.num_rows)
        return pa.table({"col_a": pa.array(ca, pa.string()),
                         "col_b": pa.array(cb, pa.string()),
                         "n_rows": pa.array(nn, pa.int64()),
                         "null_a": pa.array(na, pa.int64()),
                         "null_b": pa.array(nb, pa.int64()),
                         "null_both": pa.array(nboth, pa.int64())})

    out = grouped_agg(
        ds.select_columns(cols).map_batches(partial, batch_format="pyarrow"),
        ["col_a", "col_b"],
        [("n_rows", "sum"), ("null_a", "sum"), ("null_b", "sum"),
         ("null_both", "sum")],
        rename={"n_rows_sum": "n_rows", "null_a_sum": "null_a",
                "null_b_sum": "null_b", "null_both_sum": "null_both"},
        num_buckets=num_buckets)
    import ray
    blocks = [ray.get(r) for r in out.materialize().to_arrow_refs()]
    blocks = [b for b in blocks if b.num_rows]
    empty = pa.table({"col_a": pa.array([], pa.string()),
                      "col_b": pa.array([], pa.string()),
                      "n_rows": pa.array([], pa.int64()),
                      "null_a": pa.array([], pa.int64()),
                      "null_b": pa.array([], pa.int64()),
                      "null_both": pa.array([], pa.int64())})
    t = pa.concat_tables(blocks).combine_chunks() if blocks else empty
    a = t.column("null_a").to_numpy(zero_copy_only=False).astype(np.float64)
    b = t.column("null_b").to_numpy(zero_copy_only=False).astype(np.float64)
    both = t.column("null_both").to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    union = a + b - both
    with np.errstate(divide="ignore", invalid="ignore"):
        jac = np.where(union > 0, both / union, np.nan)
    t = t.append_column("null_jaccard",
                        pa.array(jac, pa.float64(), from_pandas=True))
    return t.sort_by([("col_a", "ascending"), ("col_b", "ascending")])
