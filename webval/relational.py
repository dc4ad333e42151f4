"""Hierarchical (rollup) aggregates and wide-table pivoting over the
hash-bucket exchange — SURVEY.md §2-E8 extensions with exact SQL twins
(``GROUP BY ROLLUP`` / ``FILTER``-style conditional aggregation).

Scale shapes:

- ``rollup_agg``: the FINEST level scans the input once through the
  exchange; every coarser level re-aggregates the previous level's
  (already grouped, much smaller) output — the standard rollup
  optimization, so the raw data is read exactly once regardless of how
  many levels the key hierarchy has.  Only mergeable aggregates
  (sum/min/max/count) are allowed, which is what makes level-from-level
  re-aggregation exact.
- ``pivot_wider``: one exchange pass groups by (row_key, col_key); the
  tiny grouped result is then reshaped per row_key bucket.  The pivot
  column set must be DECLARED (``values``) — a fixed output schema is what
  keeps the operator streaming-safe (an inferred wide schema would need a
  full pass before the plan is known; pass ``ds.unique(col_key)`` yourself
  for the exploratory case).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webval.exchange import bucketed_group_apply, grouped_agg

_RECOMBINE = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}


def rollup_agg(ds, keys: list[str], aggs: list[tuple[str, str]], *,
               num_buckets: int | None = None):
    """``GROUP BY ROLLUP(keys...)`` semantics: one output row set per key
    prefix — (k1..kn), (k1..kn-1), ..., (k1), () — with the dropped key
    columns null (the grand-total row has every key null).

    ``aggs`` are mergeable [(col, "sum"|"min"|"max"|"count"), ...]; output
    aggregate columns are named ``<col>_<agg>`` (count → ``<col>_count``,
    an int64 row count of non-null values, matching SQL ``count(col)``).
    Returns one Dataset: the union of all levels.
    """
    keys = list(keys)
    if not keys:
        raise ValueError("rollup_agg: need at least one key")
    for c, a in aggs:
        if a not in _RECOMBINE:
            raise ValueError(f"rollup_agg: non-mergeable aggregate {a!r}")
    out_names = [f"{c}_{a}" for c, a in aggs]
    schema = ds.schema()
    key_types = {k: schema.types[list(schema.names).index(k)] for k in keys}

    finest = grouped_agg(ds, keys, aggs, num_buckets=num_buckets)
    levels = [finest]
    cur = finest
    # each coarser level re-aggregates the previous level's output
    re_aggs = [(n, _RECOMBINE[a]) for n, (_c, a) in zip(out_names, aggs)]
    rename = {f"{n}_{_RECOMBINE[a]}": n
              for n, (_c, a) in zip(out_names, aggs)}
    for i in range(len(keys) - 1, 0, -1):
        cur = grouped_agg(cur, keys[:i], re_aggs, rename=rename,
                          num_buckets=num_buckets)
        levels.append(cur)
    # grand total: a literal key routes the (small) level-1 partials
    # through one reduce task, then drops it
    marked = cur.map_batches(
        lambda t: t.append_column("__all__",
                                  pa.array(np.zeros(t.num_rows, np.int8))),
        batch_format="pyarrow")
    total = grouped_agg(marked, ["__all__"], re_aggs, rename=rename,
                        num_buckets=num_buckets)
    levels.append(total.map_batches(
        lambda t: t.drop_columns(["__all__"]), batch_format="pyarrow"))

    def widen(level_keys: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for k in keys:
                cols[k] = (t.column(k) if k in level_keys
                           else pa.nulls(t.num_rows, key_types[k]))
            for n in out_names:
                cols[n] = t.column(n)
            return pa.table(cols)
        return fn

    out = levels[0].map_batches(widen(keys), batch_format="pyarrow")
    for i, lvl in enumerate(levels[1:], start=1):
        out = out.union(lvl.map_batches(widen(keys[:len(keys) - i]),
                                        batch_format="pyarrow"))
    return out


def _set_op(a, b, cols: list[str], mode: str, *,
            num_buckets: int | None = None):
    """Shared INTERSECT / EXCEPT (DISTINCT) machinery: tag each side,
    dedup per batch (the combiner — at most one row per key per input
    batch crosses the shuffle), co-bucket both streams on the key hash,
    then one Arrow group_by per bucket reads off side membership.

    SQL bag-of-NULLs semantics: NULL keys compare equal (Arrow's group_by
    groups nulls together, matching INTERSECT/EXCEPT)."""
    cols = list(cols)

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            d = t.select(cols).group_by(cols).aggregate([])
            return d.append_column(
                "__side__", pa.array(np.full(d.num_rows, side, np.int8)))
        return fn

    both = (a.map_batches(tag(0), batch_format="pyarrow")
             .union(b.map_batches(tag(1), batch_format="pyarrow")))

    def final(g: pa.Table) -> pa.Table:
        agg = g.group_by(cols).aggregate([("__side__", "min"),
                                          ("__side__", "max")])
        lo, hi = agg.column("__side___min"), agg.column("__side___max")
        if mode == "intersect":
            mask = pc.and_(pc.equal(lo, 0), pc.equal(hi, 1))
        else:  # except: present on the left only
            mask = pc.equal(hi, 0)
        return agg.filter(mask).select(cols)

    return bucketed_group_apply(both, cols, final, num_buckets=num_buckets)


def intersect_distinct(a, b, cols: list[str], *,
                       num_buckets: int | None = None):
    """SQL ``INTERSECT`` (distinct rows of ``cols`` present in BOTH
    datasets).  One co-bucketed exchange; per-batch dedup bounds what
    moves to one row per distinct key per batch."""
    return _set_op(a, b, cols, "intersect", num_buckets=num_buckets)


def except_distinct(a, b, cols: list[str], *,
                    num_buckets: int | None = None):
    """SQL ``EXCEPT`` (distinct rows of ``cols`` in ``a`` but not in
    ``b``)."""
    return _set_op(a, b, cols, "except", num_buckets=num_buckets)


def grouping_sets_agg(ds, sets: list[list[str]],
                      aggs: list[tuple[str, str]], *,
                      num_buckets: int | None = None):
    """``GROUP BY GROUPING SETS (...)`` semantics: one output row set per
    requested key subset, dropped key columns null, ``[]`` = the
    grand-total row.  Same one-raw-scan shape as rollup/cube: the finest
    level groups by the UNION of all requested keys; every requested set
    re-aggregates that (already small) output — exact because only
    mergeable aggregates (sum/min/max/count) are allowed."""
    sets = [list(s) for s in sets]
    if not sets:
        raise ValueError("grouping_sets_agg: need at least one set")
    seen = set()
    for s in sets:
        key = tuple(sorted(s))
        if key in seen:
            raise ValueError(f"grouping_sets_agg: duplicate set {s}")
        seen.add(key)
    for c, a in aggs:
        if a not in _RECOMBINE:
            raise ValueError(f"grouping_sets_agg: non-mergeable "
                             f"aggregate {a!r}")
    all_keys: list[str] = []
    for s in sets:
        for k in s:
            if k not in all_keys:
                all_keys.append(k)
    if not all_keys:
        raise ValueError("grouping_sets_agg: at least one set must "
                         "name a key")
    out_names = [f"{c}_{a}" for c, a in aggs]
    schema = ds.schema()
    key_types = {k: schema.types[list(schema.names).index(k)]
                 for k in all_keys}

    finest = grouped_agg(ds, all_keys, aggs, num_buckets=num_buckets)
    re_aggs = [(n, _RECOMBINE[a]) for n, (_c, a) in zip(out_names, aggs)]
    rename = {f"{n}_{_RECOMBINE[a]}": n
              for n, (_c, a) in zip(out_names, aggs)}

    def widen(level_keys: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for k in all_keys:
                cols[k] = (t.column(k) if k in level_keys
                           else pa.nulls(t.num_rows, key_types[k]))
            for n in out_names:
                cols[n] = t.column(n)
            return pa.table(cols)
        return fn

    out = None
    for s in sets:
        if sorted(s) == sorted(all_keys):
            lvl = finest
        elif s:
            lvl = grouped_agg(finest, s, re_aggs, rename=rename,
                              num_buckets=num_buckets)
        else:  # grand total via the literal-key single-reduce trick
            marked = finest.map_batches(
                lambda t: t.append_column(
                    "__all__", pa.array(np.zeros(t.num_rows, np.int8))),
                batch_format="pyarrow")
            lvl = grouped_agg(marked, ["__all__"], re_aggs, rename=rename,
                              num_buckets=num_buckets).map_batches(
                lambda t: t.drop_columns(["__all__"]),
                batch_format="pyarrow")
        wide = lvl.map_batches(widen(s), batch_format="pyarrow")
        out = wide if out is None else out.union(wide)
    return out


def cube_agg(ds, keys: list[str], aggs: list[tuple[str, str]], *,
             num_buckets: int | None = None):
    """``GROUP BY CUBE(keys...)`` semantics: one output row set per SUBSET
    of the keys (2^len(keys) levels), dropped key columns null, the empty
    subset = the grand-total row.

    Same scale shape as ``rollup_agg``: the raw data is scanned exactly
    once (the finest level); every other subset re-aggregates the finest
    level's already-grouped output, which is what mergeable aggregates
    (sum/min/max/count) make exact.  Keep ``len(keys)`` small — output
    level count is 2^k by definition of CUBE.
    """
    keys = list(keys)
    if not keys:
        raise ValueError("cube_agg: need at least one key")
    if len(keys) > 6:
        raise ValueError("cube_agg: 2^len(keys) levels — keep keys <= 6")
    for c, a in aggs:
        if a not in _RECOMBINE:
            raise ValueError(f"cube_agg: non-mergeable aggregate {a!r}")
    out_names = [f"{c}_{a}" for c, a in aggs]
    schema = ds.schema()
    key_types = {k: schema.types[list(schema.names).index(k)] for k in keys}

    finest = grouped_agg(ds, keys, aggs, num_buckets=num_buckets)
    re_aggs = [(n, _RECOMBINE[a]) for n, (_c, a) in zip(out_names, aggs)]
    rename = {f"{n}_{_RECOMBINE[a]}": n
              for n, (_c, a) in zip(out_names, aggs)}

    def widen(level_keys: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for k in keys:
                cols[k] = (t.column(k) if k in level_keys
                           else pa.nulls(t.num_rows, key_types[k]))
            for n in out_names:
                cols[n] = t.column(n)
            return pa.table(cols)
        return fn

    out = finest.map_batches(widen(keys), batch_format="pyarrow")
    # every proper non-empty subset re-aggregates the finest level
    for m in range(1, (1 << len(keys)) - 1):
        sub = [k for i, k in enumerate(keys) if m & (1 << i)]
        lvl = grouped_agg(finest, sub, re_aggs, rename=rename,
                          num_buckets=num_buckets)
        out = out.union(lvl.map_batches(widen(sub), batch_format="pyarrow"))
    # grand total: a literal key routes the finest partials through one
    # reduce task, then drops it (same trick as rollup_agg)
    marked = finest.map_batches(
        lambda t: t.append_column("__all__",
                                  pa.array(np.zeros(t.num_rows, np.int8))),
        batch_format="pyarrow")
    total = grouped_agg(marked, ["__all__"], re_aggs, rename=rename,
                        num_buckets=num_buckets)
    out = out.union(total.map_batches(
        lambda t: widen([])(t.drop_columns(["__all__"])),
        batch_format="pyarrow"))
    return out


def pivot_wider(ds, row_key: str, col_key: str, value_col: str, *,
                values: list, agg: str = "sum", fill=None,
                num_buckets: int | None = None):
    """Reshape long → wide: one output row per ``row_key``, one column per
    entry of ``values`` holding ``agg(value_col)`` of the rows whose
    ``col_key`` equals it (SQL twin: ``agg(value) FILTER (col_key = v)``).

    Rows whose ``col_key`` is not in ``values`` are dropped; a
    (row_key, value) cell with no input rows gets ``fill`` (default null —
    note SQL's FILTER yields null there too, but 0 is the usual choice for
    sum/count pivots).  Output columns are named ``str(v)`` for each v.
    """
    if agg not in _RECOMBINE:
        raise ValueError(f"pivot_wider: non-mergeable aggregate {agg!r}")
    values = list(values)
    if len(values) != len(set(values)) or not values:
        raise ValueError("pivot_wider: values must be non-empty and unique")

    kept = ds.map_batches(
        lambda t: t.select([row_key, col_key, value_col]).filter(
            pc.is_in(t.column(col_key), value_set=pa.array(values))),
        batch_format="pyarrow")
    long = grouped_agg(kept, [row_key, col_key], [(value_col, agg)],
                       num_buckets=num_buckets)
    agg_name = f"{value_col}_{agg}"

    def reshape(g: pa.Table) -> pa.Table:
        g = g.sort_by([(row_key, "ascending")])
        rk = g.column(row_key)
        uniq = rk.unique()
        pos = pc.index_in(rk, value_set=uniq).to_numpy(zero_copy_only=False)
        cols = {row_key: uniq}
        vals = g.column(agg_name)
        ck = g.column(col_key)
        for v in values:
            mask = pc.equal(ck, pa.scalar(v, ck.type))
            mask = pc.fill_null(mask, False)
            idx = np.full(len(uniq), -1, np.int64)
            sel = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
            idx[pos[sel]] = sel
            taken = vals.take(pa.array(np.where(idx >= 0, idx, 0),
                                       pa.int64()))
            cell = pc.if_else(pa.array(idx >= 0),
                              taken.combine_chunks()
                              if isinstance(taken, pa.ChunkedArray)
                              else taken,
                              pa.scalar(None, vals.type))
            if fill is not None:
                cell = pc.fill_null(cell, pa.scalar(fill, vals.type))
            cols[str(v)] = cell
        return pa.table(cols)

    return bucketed_group_apply(long, [row_key], reshape,
                                num_buckets=num_buckets)


def table_diff(old, new, key: str, compare_cols: list[str], *,
               num_buckets: int | None = None,
               max_group_rows: int | None = 4_000_000):
    """Snapshot diff between two versions of a keyed table — the
    validation question "what changed between crawls/runs": for every key,
    status ∈ added (new only) / removed (old only) / changed (both sides,
    any compare column IS DISTINCT FROM the other).  Unchanged keys are
    NOT emitted (at crawl scale they are the overwhelming majority; the
    diff is the small output).

    Both snapshots project to (key, compare_cols), tag their side, and
    co-bucket on the key hash; each bucket splits sides and compares
    null-safely via one Arrow full-outer join.  ``key`` must be unique
    within each snapshot — a duplicate raises a named ValueError (run
    uniqueness_violations first; a diff over dup keys is ill-posed).
    """
    compare_cols = list(compare_cols)
    proj = [key] + compare_cols

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            # null keys are excluded (a null-keyed row can't be matched
            # across snapshots; the not_null check owns that defect)
            d = t.select(proj).filter(
                pc.is_valid(t.column(key).combine_chunks()))
            return d.append_column(
                "__side__", pa.array(np.full(d.num_rows, side, np.int8)))
        return fn

    both = (old.map_batches(tag(0), batch_format="pyarrow")
            .union(new.map_batches(tag(1), batch_format="pyarrow")))

    def final(g: pa.Table) -> pa.Table:
        side = g.column("__side__")
        o = g.filter(pc.equal(side, 0)).select(proj)
        n = g.filter(pc.equal(side, 1)).select(proj)
        for name, t in (("old", o), ("new", n)):
            if t.num_rows:
                vc = t.column(key).combine_chunks().value_counts()
                dup = vc.filter(pc.greater(vc.field("counts"), 1))
                if len(dup):
                    raise ValueError(
                        f"table_diff: duplicate key in {name} snapshot: "
                        f"{key}={dup.field('values')[0].as_py()!r} "
                        f"(×{dup.field('counts')[0].as_py()})")
        n = n.rename_columns([key] + [f"{c}__new" for c in compare_cols])
        j = o.join(n, keys=[key], join_type="full outer")
        # membership: recompute via index_in against each side's key set
        # (keys are non-null and unique per side at this point)
        jk = j.column(key).combine_chunks()
        in_old = pc.is_valid(pc.index_in(jk, value_set=o.column(key)
                                         .combine_chunks())) \
            .to_numpy(zero_copy_only=False).astype(bool)
        in_new = pc.is_valid(pc.index_in(jk, value_set=n.column(key)
                                         .combine_chunks())) \
            .to_numpy(zero_copy_only=False).astype(bool)
        changed = np.zeros(j.num_rows, dtype=bool)
        for c in compare_cols:
            a_ = j.column(c).combine_chunks()
            b_ = j.column(f"{c}__new").combine_chunks()
            eq = pc.fill_null(pc.equal(a_, b_), False) \
                .to_numpy(zero_copy_only=False).astype(bool)
            both_null = (pc.and_(pc.is_null(a_), pc.is_null(b_))
                         .to_numpy(zero_copy_only=False).astype(bool))
            changed |= ~(eq | both_null)
        status = np.where(~in_old, "added",
                          np.where(~in_new, "removed",
                                   np.where(changed, "changed",
                                            "unchanged")))
        keep = status != "unchanged"
        return pa.table({key: jk.filter(pa.array(keep)),
                         "status": pa.array(status[keep], pa.string())})

    return bucketed_group_apply(both, [key], final,
                                num_buckets=num_buckets,
                                max_group_rows=max_group_rows)


def unpivot(ds, id_cols: list[str], value_cols: list[str], *,
            var_name: str = "variable", value_name: str = "value",
            batch_size: int | None = 65536):
    """Wide→long reshape (the inverse of ``pivot_wider``): each input row
    emits one output row per ``value_cols`` entry, carrying ``id_cols``,
    the column's name in ``var_name``, and its value (cast to a common
    float64) in ``value_name``.  Pure stateless flat-map shape — column
    take + tile, no shuffle, no per-row Python."""
    id_cols, value_cols = list(id_cols), list(value_cols)
    if not value_cols:
        raise ValueError("unpivot: value_cols is empty")

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        parts = []
        for c in value_cols:
            cols = {k: t.column(k) for k in id_cols}
            cols[var_name] = pa.array(np.repeat(np.array([c], object), n),
                                      pa.string())
            cols[value_name] = pc.cast(t.column(c), pa.float64())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def fd_strength(ds, pairs: list[tuple[str, str]], *,
                num_buckets: int | None = None):
    """Approximate functional-dependency strength mining: for each
    candidate pair (lhs → rhs), the g3-style strength = (max rows
    keepable while making the FD hold exactly) / (total rows) =
    Σ_x max_y count(x, y) / N (Kivinen & Mannila 1995's g3 error is
    1 − strength).  1.0 means the FD holds exactly (rhs is derivable
    from lhs — a dedup/normalization opportunity); values below 1 rank
    how dirty the dependency is, the profiling complement of
    ``fd_violations`` (which emits the offending rows for ONE declared
    FD instead of scoring many candidates).

    Scale shape, per pair: one (lhs, rhs) count exchange, one per-lhs
    max+sum re-aggregation of the (already tiny) count table, then a
    per-block scalar rollup — raw rows shuffle once per pair and only
    as (value, value, count) triples.  Returns a driver-small pyarrow
    Table [{lhs, rhs, n, keep, strength}] with one row per pair.
    """
    rows = []
    for lhs, rhs in pairs:
        def proj(t: pa.Table, lhs=lhs, rhs=rhs) -> pa.Table:
            t = t.filter(pc.and_(
                pc.is_valid(t.column(lhs).combine_chunks()),
                pc.is_valid(t.column(rhs).combine_chunks())))
            return t.select([lhs, rhs])

        counts = grouped_agg(
            ds.select_columns([lhs, rhs])
              .map_batches(proj, batch_format="pyarrow"),
            [lhs, rhs], [(rhs, "count")], rename={f"{rhs}_count": "cnt"},
            num_buckets=num_buckets)
        per_lhs = grouped_agg(counts, [lhs],
                              [("cnt", "max"), ("cnt", "sum")],
                              rename={"cnt_max": "mx", "cnt_sum": "tot"},
                              num_buckets=num_buckets)
        keep = n = 0
        for b in per_lhs.map_batches(
                lambda t: pa.table({
                    "keep": pa.array([pc.sum(t.column("mx")).as_py() or 0],
                                     pa.int64()),
                    "n": pa.array([pc.sum(t.column("tot")).as_py() or 0],
                                  pa.int64())}),
                batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow", batch_size=65536):
            keep += b.column("keep").to_pylist()[0]
            n += b.column("n").to_pylist()[0]
        rows.append({"lhs": lhs, "rhs": rhs, "n": n, "keep": keep,
                     "strength": (keep / n) if n else None})
    return pa.table({
        "lhs": pa.array([r["lhs"] for r in rows], pa.string()),
        "rhs": pa.array([r["rhs"] for r in rows], pa.string()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
        "keep": pa.array([r["keep"] for r in rows], pa.int64()),
        "strength": pa.array([r["strength"] for r in rows], pa.float64()),
    })


def association_rules(ds, basket_col: str, item_col: str, *,
                      min_pair: int = 2, max_items: int = 64,
                      top_k: int = 20, num_buckets: int | None = None):
    """Market-basket association mining (Agrawal & Srikant 1994 style,
    pairs): for item pairs co-occurring in ≥ ``min_pair`` baskets,

        support = n_ab / N     confidence(a→b) = n_ab / n_a
        lift = N · n_ab / (n_a · n_b)

    — "users who trigger event A also trigger B" / tag co-occurrence.
    Baskets are the distinct ``basket_col`` values; items are presence-
    based (duplicates in a basket count once).  Baskets larger than
    ``max_items`` participate with their lexicographically smallest
    ``max_items`` items (deterministic, mirrorable — same rule as
    :func:`webval.graph.cocitation_pairs`, which provides the pair
    counts).  Returns the ``top_k`` pairs by (round(lift, 6) desc,
    a, b) as Dataset[{a, b, n_ab, n_a, n_b, support, conf_a_b,
    conf_b_a, lift}].

    Scale shape: ONE distinct (basket, item) exchange feeds both the
    pair fan-out (bounded by C(max_items, 2) per basket) and the
    per-item basket counts; N rides as block partials; two co-bucketed
    joins attach marginals; final rank is a pair-table sort."""
    from webval.exchange import distinct_rows, grouped_agg, sum_block_scalars
    from webval.graph import cocitation_pairs
    from webval.joins import equi_join

    e = distinct_rows(
        ds.select_columns([basket_col, item_col]).map_batches(
            lambda t: t.drop_null(), batch_format="pyarrow"),
        [basket_col, item_col], num_buckets=num_buckets).materialize()

    pairs = cocitation_pairs(e, basket_col, item_col,
                             max_out=max_items, min_cocite=min_pair,
                             top_k=1 << 40, num_buckets=num_buckets)
    pairs = pairs.map_batches(
        lambda t: t.rename_columns(["a", "b", "n_ab"]),
        batch_format="pyarrow")

    items = grouped_agg(
        e.map_batches(lambda t: pa.table({
            "item": t.column(item_col).combine_chunks()
            .cast(pa.large_string()),
            "nb": pa.nulls(t.num_rows, pa.int64()).fill_null(1)}),
            batch_format="pyarrow"),
        ["item"], [("nb", "sum")], rename={"nb_sum": "nb"},
        num_buckets=num_buckets)
    n_baskets = sum_block_scalars(
        distinct_rows(e.select_columns([basket_col]), [basket_col],
                      num_buckets=num_buckets)
        .map_batches(lambda t: pa.table({
            "n": pa.array([t.num_rows], pa.int64())}),
            batch_format="pyarrow").materialize(), ["n"])["n"]
    if n_baskets == 0:
        import ray.data as rd

        return rd.from_arrow(pa.schema(
            [("a", pa.large_string()), ("b", pa.large_string()),
             ("n_ab", pa.int64()), ("n_a", pa.int64()),
             ("n_b", pa.int64()), ("support", pa.float64()),
             ("conf_a_b", pa.float64()), ("conf_b_a", pa.float64()),
             ("lift", pa.float64())]).empty_table())

    j1 = equi_join(pairs, items, on=["a"], right_on=["item"],
                   num_buckets=num_buckets)
    j1 = j1.map_batches(lambda t: t.rename_columns(
        ["n_a" if c == "nb" else c for c in t.column_names]),
        batch_format="pyarrow")
    j2 = equi_join(j1, items, on=["b"], right_on=["item"],
                   num_buckets=num_buckets)
    j2 = j2.map_batches(lambda t: t.rename_columns(
        ["n_b" if c == "nb" else c for c in t.column_names]),
        batch_format="pyarrow")

    big_n = float(n_baskets)

    def score(t: pa.Table) -> pa.Table:
        ab = t.column("n_ab").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        na = t.column("n_a").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        nb = t.column("n_b").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        lift = big_n * ab / (na * nb)
        return pa.table({"a": t.column("a"), "b": t.column("b"),
                         "n_ab": t.column("n_ab"),
                         "n_a": t.column("n_a"), "n_b": t.column("n_b"),
                         "support": pa.array(ab / big_n),
                         "conf_a_b": pa.array(ab / na),
                         "conf_b_a": pa.array(ab / nb),
                         "lift": pa.array(lift),
                         "rl": pa.array(lift.round(6))})

    ranked = j2.map_batches(score, batch_format="pyarrow") \
        .sort(["rl", "a", "b"], descending=[True, False, False]) \
        .limit(top_k)
    return ranked.map_batches(lambda t: t.drop_columns(["rl"]),
                              batch_format="pyarrow")


def fd_violations(ds, lhs: str, rhs: str, *,
                  num_buckets: int | None = None):
    """Functional-dependency violation extraction: for lhs→rhs, each
    lhs group's MAJORITY rhs (ties to the smallest rhs) is the repair
    candidate, and every row carrying a different rhs is a violation —
    the row-level companion of :func:`fd_strength` (which only scores;
    this names the offenders a cleaning pass would fix).  Null lhs/rhs
    rows are ignored.  Returns Dataset[{lhs, rhs, n, expected_rhs}]
    with one row per VIOLATING (lhs, rhs) value pair and n its count.

    Scale shape: ONE (lhs, rhs) count exchange; the majority is a
    top-1-per-key selection over that count table (batch-combined);
    violations come from a co-bucketed join of the same count table
    against the winners — the raw rows never move."""
    from webval.exchange import grouped_agg
    from webval.joins import equi_join
    from webval.rank import top_k_per_group

    pairs = grouped_agg(
        ds.select_columns([lhs, rhs]).map_batches(
            lambda t: t.drop_null(), batch_format="pyarrow"),
        [lhs, rhs], [(rhs, "count")], rename={f"{rhs}_count": "n"},
        num_buckets=num_buckets).materialize()
    winners = top_k_per_group(pairs, lhs, "n", 1, descending=True,
                              tie_cols=[rhs], num_buckets=num_buckets)
    winners = winners.map_batches(
        lambda t: pa.table({lhs: t.column(lhs),
                            "expected_rhs": t.column(rhs)}),
        batch_format="pyarrow")
    joined = equi_join(pairs, winners, on=[lhs],
                       num_buckets=num_buckets)
    return joined.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(
            t.column(rhs).combine_chunks(),
            t.column("expected_rhs").combine_chunks()))),
        batch_format="pyarrow")


def sum_reconciliation(parent, child, *, key: str, child_key: str,
                       parent_col: str, child_col: str,
                       tolerance: float = 0.0,
                       num_buckets: int | None = None):
    """Parent↔child sum reconciliation: per key, the parent's recorded
    total vs the sum of its child rows, with the difference and a
    within-``tolerance`` verdict — the "does the order header equal its
    line items" / ledger-integrity check.  Parents with NO child rows
    reconcile against 0 (they fail unless their total is ≤ tolerance);
    child groups with no parent are reported with a null parent total
    (orphan mass).  Returns Dataset[{key, parent_total, child_total,
    n_children, diff, ok}].

    Scale shape: ONE child (count, sum) exchange; a co-bucketed FULL
    join against the parent keyed column; everything after is
    vectorized arithmetic on the key table."""
    from webval.exchange import grouped_agg
    from webval.joins import equi_join

    sums = grouped_agg(
        child.select_columns([child_key, child_col]).map_batches(
            lambda t: pa.table({
                key: t.column(child_key),
                "s": pc.cast(t.column(child_col), pa.float64()),
                "c": pa.nulls(t.num_rows, pa.int64()).fill_null(1)})
            .drop_null(),
            batch_format="pyarrow"),
        [key], [("s", "sum"), ("c", "sum")],
        rename={"s_sum": "child_total", "c_sum": "n_children"},
        num_buckets=num_buckets)
    par = parent.select_columns([key, parent_col]).map_batches(
        lambda t: t.drop_null().rename_columns([key, "parent_total"]),
        batch_format="pyarrow")
    par = par.map_batches(
        lambda t: t.set_column(
            t.column_names.index("parent_total"), "parent_total",
            pc.cast(t.column("parent_total"), pa.float64())),
        batch_format="pyarrow")
    joined = equi_join(par, sums, on=[key], how="full",
                       num_buckets=num_buckets)

    def finalize(t: pa.Table) -> pa.Table:
        ct = pc.fill_null(t.column("child_total"), 0.0)
        nc = pc.fill_null(t.column("n_children"),
                          pa.scalar(0, pa.int64()))
        pt = t.column("parent_total")
        diff = pc.subtract(pc.fill_null(pt, 0.0), ct)
        ok = pc.and_(pc.is_valid(pt.combine_chunks()),
                     pc.less_equal(pc.abs(diff),
                                   pa.scalar(float(tolerance))))
        return pa.table({key: t.column(key), "parent_total": pt,
                         "child_total": ct, "n_children": nc,
                         "diff": diff, "ok": ok})

    return joined.map_batches(finalize, batch_format="pyarrow")


def id_continuity_audit(ds, id_col: str, *,
                        num_buckets: int | None = None) -> dict:
    """Ingestion-continuity audit of a supposedly dense integer id
    column: from ONE pass — row count, min/max, exact distinct count —
    derive the missing-id count (span − distinct) and the duplicate
    mass (rows − distinct) without ever sorting the ids globally; the
    "did the exporter skip or double-ship a chunk" check run before
    anything downstream trusts the ids.  Nulls are counted separately.
    Returns {"n_rows", "n_nulls", "min", "max", "n_distinct",
    "n_missing", "n_duplicate_rows"} (min/max/missing None on empty).

    Scale shape: min/max/counts are per-block scalar partials; the
    distinct count is the value-count exchange (id-cardinality bounded,
    the same cost exact uniqueness pays)."""
    from webval.exchange import grouped_agg, sum_block_scalars

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(id_col).combine_chunks()
        nn = v.filter(pc.is_valid(v))
        return pa.table({
            "n": pa.array([len(v)], pa.int64()),
            "nulls": pa.array([v.null_count], pa.int64()),
            "mn": pa.array([pc.min(nn).as_py() if len(nn) else None],
                           pa.int64()),
            "mx": pa.array([pc.max(nn).as_py() if len(nn) else None],
                           pa.int64())})

    import ray

    n, nulls, mn, mx = 0, 0, None, None
    mat = ds.select_columns([id_col]).map_batches(
        partial, batch_format="pyarrow").materialize()
    for ref in mat.to_arrow_refs():
        b = ray.get(ref)
        if b.num_rows == 0:
            continue
        n += int(pc.sum(b.column("n")).as_py() or 0)
        nulls += int(pc.sum(b.column("nulls")).as_py() or 0)
        bm = pc.min(b.column("mn")).as_py()
        bx = pc.max(b.column("mx")).as_py()
        mn = bm if mn is None else (mn if bm is None else min(mn, bm))
        mx = bx if mx is None else (mx if bx is None else max(mx, bx))

    def vals(t: pa.Table) -> pa.Table:
        v = t.column(id_col).combine_chunks()
        vc = v.filter(pc.is_valid(v)).value_counts()
        return pa.table({"v": vc.field("values"),
                         "c": pc.cast(vc.field("counts"), pa.int64())})

    dist = sum_block_scalars(
        grouped_agg(ds.select_columns([id_col]).map_batches(
            vals, batch_format="pyarrow"),
            ["v"], [("c", "sum")], rename={"c_sum": "c"},
            num_buckets=num_buckets)
        .map_batches(lambda t: pa.table({
            "d": pa.nulls(t.num_rows, pa.int64()).fill_null(1)}),
            batch_format="pyarrow").materialize(), ["d"])["d"]
    nn_rows = n - nulls
    return {
        "n_rows": n, "n_nulls": nulls, "min": mn, "max": mx,
        "n_distinct": dist,
        "n_missing": (mx - mn + 1 - dist) if mn is not None else None,
        "n_duplicate_rows": nn_rows - dist}
