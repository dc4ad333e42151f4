"""As-of join — a custom operator the Ray Data Dataset API lacks
(SURVEY.md §2 note on custom operators; the brief's canonical example).

Semantics: each LEFT row is matched to the LATEST right row with
``right.on <= left.on`` within the same ``by`` group (backward, inclusive —
DuckDB's ``ASOF LEFT JOIN`` with ``l.on >= r.on`` is the oracle twin).

Shape: both streams are tagged and hash-bucket-exchanged on ``by``
(exchange.bucketed_group_apply), so a group's rows co-locate; inside each
bucket ONE lexsort of the merged rows (by, on, side — right before left on
ties, making the match inclusive) plus a segmented forward maximum
(np.maximum.accumulate over group-offset keys) assigns every left row its
match.  No per-group Python loop; shuffle volume is the two projected
streams.  Partitioning assumption: a single ``by`` group's rows fit in one
bucket task (same bound as every exchange-based groupby here).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def asof_join(left, right, *, on: str, by: str,
              right_cols: list[str] | None = None, suffix: str = "_r",
              num_buckets: int | None = None,
              max_group_rows: int | None = None):
    """Backward-inclusive as-of join of two Datasets.

    Returns a Dataset with every left row plus, for each name in
    ``right_cols`` (default: just ``on``), a ``<name><suffix>`` column from
    the matched right row (null when the group has no right row at or
    before ``on``).  Left rows with null ``on``/``by`` never match.

    A single ``by`` group (left+right rows together) must fit one bucket
    task; a group over ``max_group_rows`` (default
    exchange.DEFAULT_MAX_GROUP_ROWS) raises a ValueError naming the key.
    """
    from webval.exchange import DEFAULT_MAX_GROUP_ROWS, bucketed_group_apply

    if max_group_rows is None:
        max_group_rows = DEFAULT_MAX_GROUP_ROWS

    right_cols = list(right_cols or [on])
    left_schema = left.schema()
    left_names = list(left_schema.names)
    out_right_names = [f"{c}{suffix}" for c in right_cols]

    def tag_left(t: pa.Table) -> pa.Table:
        for c, rc in zip(right_cols, out_right_names):
            t = t.append_column(rc, pa.nulls(t.num_rows,
                                             right.schema().types[
                                                 right.schema().names.index(c)]))
        return t.append_column("__side__",
                               pa.array(np.zeros(t.num_rows, np.int8)))

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {by: t.column(by), on: t.column(on)}
        for c, rc in zip(right_cols, out_right_names):
            cols[rc] = t.column(c)
        out = pa.table(cols)
        for name, typ in zip(left_names, left_schema.types):
            if name not in (by, on):
                out = out.append_column(name, pa.nulls(t.num_rows, typ))
        out = out.append_column("__side__",
                                pa.array(np.ones(t.num_rows, np.int8)))
        return out.select(left_names + out_right_names + ["__side__"])

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = (right.select_columns(sorted({by, on, *right_cols}))
               .map_batches(tag_right, batch_format="pyarrow"))

    def bucket_join(g: pa.Table) -> pa.Table:
        side = g.column("__side__").to_numpy(zero_copy_only=False)
        lmask = side == 0
        ltab = g.filter(pa.array(lmask)).select(left_names)
        rtab = g.filter(pa.array(~lmask))
        # drop right rows with null keys; left null-key rows simply never match
        rvalid = pc.and_(pc.is_valid(rtab.column(by)),
                         pc.is_valid(rtab.column(on)))
        rtab = rtab.filter(rvalid)
        nL, nR = ltab.num_rows, rtab.num_rows
        if nL == 0:
            return pa.table(
                {**{c: ltab.column(c) for c in left_names},
                 **{rc: pa.nulls(0, rtab.column(rc).type)
                    for rc in out_right_names}})
        l_by = pc.fill_null(pc.cast(ltab.column(by), pa.int64()),
                            np.iinfo(np.int64).min) \
            .to_numpy(zero_copy_only=False)
        l_on = pc.fill_null(pc.cast(ltab.column(on), pa.int64()),
                            np.iinfo(np.int64).min) \
            .to_numpy(zero_copy_only=False)
        l_null = (np.asarray(pc.is_null(ltab.column(by)), bool)
                  | np.asarray(pc.is_null(ltab.column(on)), bool))
        r_by = pc.cast(rtab.column(by), pa.int64()).to_numpy(zero_copy_only=False)
        r_on = pc.cast(rtab.column(on), pa.int64()).to_numpy(zero_copy_only=False)
        all_by = np.concatenate([l_by, r_by])
        all_on = np.concatenate([l_on, r_on])
        # right (0) sorts before left (1) on equal (by, on) → inclusive
        all_side = np.concatenate([np.ones(nL, np.int8),
                                   np.zeros(nR, np.int8)])
        order = np.lexsort((all_side, all_on, all_by))
        gb = all_by[order]
        new_grp = np.zeros(len(order), dtype=bool)
        if len(order):
            new_grp[0] = True
            new_grp[1:] = gb[1:] != gb[:-1]
        grp_id = np.cumsum(new_grp) - 1
        n = len(order)
        # forward-fill the LAST right row seen in scan order (positions are
        # monotonic, so max position == most recent right row); the base
        # offset per group resets the fill at group boundaries
        base = grp_id.astype(np.int64) * (n + 1)
        pos = np.arange(n, dtype=np.int64)
        fill = np.where(order >= nL, base + pos + 1, base)
        acc = np.maximum.accumulate(fill)
        matchp = acc - base  # 0 = no match yet in group, else position + 1
        lsel = order < nL
        mp = matchp[lsel] - 1
        ridx_of = np.where(mp >= 0,
                           order[np.clip(mp, 0, n - 1)] - nL, -1)
        res = np.full(nL, -1, dtype=np.int64)
        res[order[lsel]] = ridx_of
        res[l_null] = -1
        hit = res >= 0
        take_idx = pa.array(np.where(hit, res, 0), pa.int64())
        cols = {c: ltab.column(c) for c in left_names}
        for rc in out_right_names:
            vals = rtab.column(rc).take(take_idx) if nR else \
                pa.nulls(nL, rtab.column(rc).type)
            cols[rc] = pc.if_else(pa.array(hit),
                                  vals.combine_chunks()
                                  if isinstance(vals, pa.ChunkedArray) else vals,
                                  pa.scalar(None, rtab.column(rc).type))
        return pa.table(cols)

    return bucketed_group_apply(lt.union(rt), [by], bucket_join,
                                num_buckets=num_buckets,
                                max_group_rows=max_group_rows)


def interval_join(points, intervals, *, on: str, lo: str, hi: str, by: str,
                  right_cols: list[str] | None = None, suffix: str = "_r",
                  max_span_us: int, num_buckets: int | None = None,
                  max_group_rows: int | None = None):
    """Range (interval) join: each point row joined with EVERY interval of
    the same ``by`` group containing it (``lo <= on <= hi``) — inner join,
    multi-match.

    ``max_span_us`` bounds interval length (asserted per interval): a point
    can then only match intervals whose ``lo`` lies in
    ``(on - max_span_us, on]``, so the per-bucket work is two of the as-of
    forward-fill merges (one for each window edge) + a vectorized
    repeat/arange expansion of the candidate ranges — no per-row loop, and
    candidate counts are bounded by interval density × span rather than
    group size.

    A single ``by`` group (points+intervals together) must fit one bucket
    task; beyond ``max_group_rows`` (default
    exchange.DEFAULT_MAX_GROUP_ROWS) a ValueError names the key.
    """
    from webval.exchange import DEFAULT_MAX_GROUP_ROWS, bucketed_group_apply

    if max_group_rows is None:
        max_group_rows = DEFAULT_MAX_GROUP_ROWS

    right_cols = list(right_cols or [lo, hi])
    p_schema = points.schema()
    p_names = list(p_schema.names)
    out_right = [f"{c}{suffix}" for c in right_cols]

    def tag_points(t: pa.Table) -> pa.Table:
        for c, rc in zip(right_cols, out_right):
            t = t.append_column(rc, pa.nulls(
                t.num_rows, intervals.schema().types[
                    intervals.schema().names.index(c)]))
        t = t.append_column("__lo__", pa.nulls(t.num_rows, pa.int64()))
        t = t.append_column("__hi__", pa.nulls(t.num_rows, pa.int64()))
        return t.append_column("__side__",
                               pa.array(np.zeros(t.num_rows, np.int8)))

    def tag_intervals(t: pa.Table) -> pa.Table:
        cols = {by: t.column(by)}
        for c, rc in zip(right_cols, out_right):
            cols[rc] = t.column(c)
        out = pa.table(cols)
        for name, typ in zip(p_names, p_schema.types):
            if name != by:
                out = out.append_column(name, pa.nulls(t.num_rows, typ))
        out = out.append_column("__lo__",
                                pc.cast(t.column(lo), pa.int64()))
        out = out.append_column("__hi__",
                                pc.cast(t.column(hi), pa.int64()))
        out = out.append_column("__side__",
                                pa.array(np.ones(t.num_rows, np.int8)))
        return out.select(p_names + out_right + ["__lo__", "__hi__",
                                                 "__side__"])

    pt = points.map_batches(tag_points, batch_format="pyarrow")
    it = (intervals.select_columns(sorted({by, lo, hi, *right_cols}))
                   .map_batches(tag_intervals, batch_format="pyarrow"))

    def last_leq(q_by, q_on, r_by, r_lo, inclusive: bool):
        """For each query (by, on): index (into the (by, lo)-sorted interval
        order) of the LAST interval with lo <= on (or < on when not
        inclusive); -1 when none.  The as-of forward-fill merge."""
        nQ, nR = len(q_by), len(r_by)
        all_by = np.concatenate([q_by, r_by])
        all_on = np.concatenate([q_on, r_lo])
        # inclusive: interval sorts BEFORE the query at equal keys
        q_rank = np.full(nQ, 1 if inclusive else 0, dtype=np.int8)
        r_rank = np.full(nR, 0 if inclusive else 1, dtype=np.int8)
        all_rank = np.concatenate([q_rank, r_rank])
        order = np.lexsort((all_rank, all_on, all_by))
        n = len(order)
        gb = all_by[order]
        new_grp = np.zeros(n, dtype=bool)
        if n:
            new_grp[0] = True
            new_grp[1:] = gb[1:] != gb[:-1]
        grp_id = np.cumsum(new_grp) - 1
        base = grp_id.astype(np.int64) * (n + 1)
        pos = np.arange(n, dtype=np.int64)
        is_r = order >= nQ
        # r_sorted_rank: rank of each interval within the (by, lo) sort —
        # the scan order IS that sort restricted to intervals
        r_count = np.cumsum(is_r) - is_r.astype(np.int64)  # intervals before
        fill = np.where(is_r, base + pos + 1, base)
        acc = np.maximum.accumulate(fill)
        matchp = acc - base
        qsel = ~is_r
        mp = matchp[qsel] - 1
        # sorted-interval rank at matched position
        r_rank_at = np.where(mp >= 0, r_count[np.clip(mp, 0, n - 1)], -1)
        res = np.full(nQ, -1, dtype=np.int64)
        res[order[qsel]] = r_rank_at
        return res

    def bucket_join(g: pa.Table) -> pa.Table:
        side = g.column("__side__").to_numpy(zero_copy_only=False)
        pmask = side == 0
        ptab = g.filter(pa.array(pmask)).select(p_names)
        rtab = g.filter(pa.array(~pmask))
        rvalid = pc.and_(pc.is_valid(rtab.column(by)),
                         pc.and_(pc.is_valid(rtab.column("__lo__")),
                                 pc.is_valid(rtab.column("__hi__"))))
        rtab = rtab.filter(rvalid)
        nP, nR = ptab.num_rows, rtab.num_rows
        empty = pa.table({**{c: ptab.column(c).slice(0, 0)
                             for c in p_names},
                          **{rc: rtab.column(rc).slice(0, 0)
                             for rc in out_right}})
        if nP == 0 or nR == 0:
            return empty
        p_by = pc.fill_null(pc.cast(ptab.column(by), pa.int64()),
                            np.iinfo(np.int64).min) \
            .to_numpy(zero_copy_only=False)
        p_on = pc.fill_null(pc.cast(ptab.column(on), pa.int64()),
                            np.iinfo(np.int64).min) \
            .to_numpy(zero_copy_only=False)
        p_null = (np.asarray(pc.is_null(ptab.column(by)), bool)
                  | np.asarray(pc.is_null(ptab.column(on)), bool))
        r_by = rtab.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
        r_lo = rtab.column("__lo__").to_numpy(zero_copy_only=False)
        r_hi = rtab.column("__hi__").to_numpy(zero_copy_only=False)
        if (r_hi - r_lo > max_span_us).any():
            raise ValueError(f"interval longer than max_span_us={max_span_us}")
        r_order = np.lexsort((r_lo, r_by))
        # candidate window in (by, lo)-sorted interval rank space:
        # (last lo < on - max_span, last lo <= on]; when the group has no
        # interval before the window, clamp the start to the group's first
        # rank (NOT global rank 0 — that would span other groups)
        end_rank = last_leq(p_by, p_on, r_by, r_lo, inclusive=True)
        start_rank = last_leq(p_by, p_on - max_span_us, r_by, r_lo,
                              inclusive=False)
        r_by_sorted = r_by[r_order]
        gstart = np.searchsorted(r_by_sorted, p_by, side="left")
        start_rank = np.maximum(start_rank, gstart - 1)
        counts = np.maximum(end_rank - start_rank, 0)
        counts[p_null] = 0
        total = int(counts.sum())
        if total == 0:
            return empty
        p_idx = np.repeat(np.arange(nP), counts)
        offs = np.cumsum(counts) - counts
        rank = (np.arange(total) - np.repeat(offs, counts)
                + np.repeat(start_rank + 1, counts))
        r_idx = r_order[rank]
        contained = ((p_by[p_idx] == r_by[r_idx])
                     & (p_on[p_idx] >= r_lo[r_idx])
                     & (p_on[p_idx] <= r_hi[r_idx]))
        p_idx, r_idx = p_idx[contained], r_idx[contained]
        cols = {c: ptab.column(c).take(pa.array(p_idx, pa.int64()))
                for c in p_names}
        for rc in out_right:
            cols[rc] = rtab.column(rc).take(pa.array(r_idx, pa.int64()))
        return pa.table(cols)

    return bucketed_group_apply(pt.union(it), [by], bucket_join,
                                num_buckets=num_buckets,
                                max_group_rows=max_group_rows)


_ARROW_JOIN_TYPE = {"inner": "inner", "left": "left outer",
                    "right": "right outer", "full": "full outer",
                    "semi": "left semi", "anti": "left anti"}


def equi_join(left, right, *, on, right_on=None, how: str = "inner",
              right_suffix: str = "_r", num_buckets: int | None = None,
              max_group_rows: int | None = None,
              hot_keys=None, salt: int = 16):
    """General large×large equi-join through the hash-bucket exchange —
    the D-family shape for when NEITHER side fits a broadcast
    (broadcast.broadcast_join covers the small-dimension case).

    Both streams are tagged into one union-compatible schema and
    co-bucketed on the key hash (exchange.bucketed_group_apply), so rows of
    equal keys land in the same bucket task; inside each bucket the split
    sides join via Arrow's C++ hash join (``pa.Table.join`` — SQL key
    semantics: null keys never match, many-to-many duplicates expand).
    Shuffle volume is the two projected streams, once each; reducer
    parallelism is ``num_buckets`` (derived from cluster size when None).

    ``on`` / ``right_on``: key column name(s); right keys are renamed to
    the left names in the exchange.  ``how``: "inner", "left" (left outer),
    "right" (right outer), "full" (full outer — unmatched rows of BOTH
    sides survive with coalesced keys, the reconciliation shape),
    "semi" (left rows WITH a match, left columns only), "anti" (left rows
    WITHOUT a match — the referential-orphans shape at any right-side
    cardinality).  Non-key right columns colliding with a left name get
    ``right_suffix``.

    Partitioning assumption (shared with every exchange op): one key
    group's rows — both sides together — fit a single bucket task;
    ``max_group_rows`` turns an oversized hot key into a named ValueError
    instead of an OOM.  The JOIN OUTPUT of a bucket additionally
    materializes in that task, so a many-to-many hot key explodes there
    first — pre-aggregate one side when that is possible.

    ``hot_keys`` (single-key joins): the skew remedy the diagnostic points
    at — left rows of those keys are spread across ``salt`` shards and the
    MATCHING RIGHT ROWS ARE REPLICATED to every shard, so a hot key's
    per-task load drops ~salt× while the join result (including
    left/semi/anti semantics — each left row still lives in exactly one
    shard, with its key's full right side present there) is unchanged.
    Right-side hot rows should be few (dimension-like); the replication
    cost is salt × their count.  ``hot_keys="auto"`` detects them with one
    Misra-Gries pass over the left keys (exchange.detect_hot_keys;
    threshold ``max_group_rows // 2`` — no false negatives, a few
    over-protected keys are harmless).
    """
    from webval.exchange import DEFAULT_MAX_GROUP_ROWS, bucketed_group_apply

    if how not in _ARROW_JOIN_TYPE:
        raise ValueError(f"equi_join: how={how!r} not in "
                         f"{sorted(_ARROW_JOIN_TYPE)}")
    if max_group_rows is None:
        max_group_rows = DEFAULT_MAX_GROUP_ROWS
    keys = [on] if isinstance(on, str) else list(on)
    rkeys = keys if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))
    if len(rkeys) != len(keys):
        raise ValueError("equi_join: on / right_on length mismatch")

    if hot_keys is not None and len(keys) != 1:
        raise ValueError("equi_join: hot_keys supports single-key joins")
    if hot_keys is not None and how in ("right", "full"):
        # right rows are REPLICATED across salt shards: an unmatched hot
        # right row would emit a null-left result in every shard
        raise ValueError(f"equi_join: hot_keys is incompatible with "
                         f"how={how!r} (replicated right rows would "
                         "duplicate unmatched-right output); salt the "
                         "reversed join instead")
    if hot_keys is not None and salt < 2:
        raise ValueError(f"equi_join: salt={salt} must be >= 2")
    if isinstance(hot_keys, str):
        if hot_keys != "auto":
            raise ValueError(f"equi_join: hot_keys={hot_keys!r} "
                             "(pass a list of key values or 'auto')")
        from webval.exchange import detect_hot_keys
        hot_keys = detect_hot_keys(left, keys[0],
                                   min_count=max_group_rows // 2)
    hot_set = pa.array(list(hot_keys)) if hot_keys else None

    l_schema, r_schema = left.schema(), right.schema()
    # a side whose pipeline produced ZERO blocks (e.g. an exchange over an
    # empty input) has schema None — no column names to join on.  The
    # exactly-answerable cases resolve here; the rest raise a named error
    # instead of an AttributeError deep in the planner.
    if l_schema is None or l_schema.names is None:
        if how in ("right", "full"):
            raise ValueError(
                f"equi_join(how={how!r}): left side is empty with no "
                "schema (zero blocks), so its column names/types are "
                "unknowable — guard the caller or materialize a "
                "schema-bearing empty table")
        return left.limit(0)   # empty in, empty out (semantics-free)
    if r_schema is None or r_schema.names is None:
        if how == "semi":
            return left.limit(0)      # nothing can match
        if how == "anti":
            return left               # nothing matches ⇒ every row survives
        raise ValueError(
            f"equi_join(how={how!r}): right side is empty with no schema "
            "(zero blocks), so its column names/types are unknowable — "
            "guard the caller (skip the join when the right side is empty) "
            "or materialize a schema-bearing empty table")
    l_names = list(l_schema.names)
    l_payload = [c for c in l_names if c not in keys]
    r_payload_in = [c for c in r_schema.names if c not in rkeys]
    r_payload_out = [f"{c}{right_suffix}" if c in l_names else c
                     for c in r_payload_in]
    union_names = keys + l_payload + r_payload_out + ["__side__", "__salt__"]

    def _salts_left(key_col: pa.ChunkedArray, n: int) -> pa.Array:
        # shard assignment only routes a hot left row to one of the salt
        # shards — ANY assignment yields the same join result because the
        # right side is replicated to every shard; round-robin balances
        if hot_set is None:
            return pa.array(np.zeros(n, np.int32))
        hot = pc.fill_null(pc.is_in(key_col, value_set=hot_set), False) \
                .to_numpy(zero_copy_only=False)
        return pa.array(np.where(hot, np.arange(n) % salt, 0)
                        .astype(np.int32))

    def r_type(c: str) -> pa.DataType:
        return r_schema.types[list(r_schema.names).index(c)]

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c) for c in keys + l_payload}
        for cin, cout in zip(r_payload_in, r_payload_out):
            cols[cout] = pa.nulls(t.num_rows, r_type(cin))
        cols["__side__"] = pa.array(np.zeros(t.num_rows, np.int8))
        cols["__salt__"] = _salts_left(t.column(keys[0]), t.num_rows)
        return pa.table({n: cols[n] for n in union_names})

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {k: t.column(rk) for k, rk in zip(keys, rkeys)}
        for c in l_payload:
            cols[c] = pa.nulls(
                t.num_rows, l_schema.types[l_names.index(c)])
        for cin, cout in zip(r_payload_in, r_payload_out):
            cols[cout] = t.column(cin)
        cols["__side__"] = pa.array(np.ones(t.num_rows, np.int8))
        cols["__salt__"] = pa.array(np.zeros(t.num_rows, np.int32))
        out = pa.table({n: cols[n] for n in union_names})
        if hot_set is None:
            return out
        hot_mask = pc.fill_null(pc.is_in(out.column(keys[0]),
                                         value_set=hot_set), False)
        hot_rows = out.filter(hot_mask)
        parts = [out.filter(pc.invert(hot_mask))]
        salt_idx = out.column_names.index("__salt__")
        for s in range(salt):  # replicate hot right rows to every shard
            parts.append(hot_rows.set_column(
                salt_idx, "__salt__",
                pa.array(np.full(hot_rows.num_rows, s, np.int32))))
        return pa.concat_tables(parts)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = (right.select_columns(rkeys + r_payload_in)
               .map_batches(tag_right, batch_format="pyarrow"))
    join_type = _ARROW_JOIN_TYPE[how]

    def bucket_join(g: pa.Table) -> pa.Table:
        side = g.column("__side__").to_numpy(zero_copy_only=False)
        lmask = pa.array(side == 0)
        # join on (keys, salt): one bucket can hold several salt shards of
        # the same key (bucket-hash collision), and a key-only join would
        # match a left row against every replica of its right rows
        ltab = g.filter(lmask).select(keys + ["__salt__"] + l_payload)
        rtab = g.filter(pc.invert(lmask)).select(keys + ["__salt__"]
                                                 + r_payload_out)
        out = ltab.join(rtab, keys=keys + ["__salt__"],
                        join_type=join_type).drop_columns(["__salt__"])
        # Arrow varies column ORDER by join type (right outer leads with
        # left payload); blocks must share one schema across buckets
        order = keys + l_payload if how in ("semi", "anti") \
            else keys + l_payload + r_payload_out
        return out.select(order).combine_chunks()

    return bucketed_group_apply(lt.union(rt), keys + ["__salt__"],
                                bucket_join, num_buckets=num_buckets,
                                max_group_rows=max_group_rows)


def join_size_estimate(left, right, *, on, right_on=None,
                       num_buckets: int | None = None) -> dict:
    """Join-output cardinality WITHOUT running the join: the inner
    equi-join size is exactly Σ_k cL(k)·cR(k) over matching keys, so
    two key-count exchanges and one count-table join answer "how big
    will this join be / is it about to explode" at distinct-key cost —
    the planning probe to run before committing a full-scale join
    (a multiplicity blowup shows up here as a cheap scalar instead of
    an OOM).  Null keys never match (SQL semantics).  Returns
    {"inner_rows", "left_rows", "right_rows", "left_keys",
    "right_keys", "matching_keys", "max_key_multiplicity"} — the last
    being the largest cL·cR of any single key (the straggler bound).

    Scale shape: two count-combiner exchanges + one co-bucketed join of
    the COUNT tables (distinct-key-sized); per-block scalar partials
    finish on the driver."""
    from webval.exchange import grouped_agg, sum_block_scalars

    on = [on] if isinstance(on, str) else list(on)
    right_on = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))

    def counts(ds, keys):
        return grouped_agg(
            ds.select_columns(keys).map_batches(
                lambda t: t.drop_null(), batch_format="pyarrow"),
            keys, [(keys[0], "count")],
            rename={f"{keys[0]}_count": "c"}, num_buckets=num_buckets)

    lc = counts(left, on).materialize()
    rc = counts(right, right_on)
    if right_on != on:
        rc = rc.map_batches(
            lambda t: t.rename_columns(on + ["c"]),
            batch_format="pyarrow")
    rc = rc.map_batches(
        lambda t: t.rename_columns(on + ["cr"]),
        batch_format="pyarrow").materialize()

    def totals_of(mat, col):
        return sum_block_scalars(mat.map_batches(
            lambda t: pa.table({
                "rows": pa.array([int(pc.sum(t.column(col)).as_py()
                                      or 0)], pa.int64()),
                "keys": pa.array([t.num_rows], pa.int64())}),
            batch_format="pyarrow").materialize(), ["rows", "keys"])

    lt = totals_of(lc, "c")
    rt = totals_of(rc, "cr")
    joined = equi_join(lc, rc, on=on, num_buckets=num_buckets) \
        .materialize()

    import ray

    inner, matching, max_mult = 0, 0, 0
    for ref in joined.to_arrow_refs():
        b = ray.get(ref)
        if b.num_rows == 0:
            continue
        prod = pc.multiply(pc.cast(b.column("c"), pa.int64()),
                           pc.cast(b.column("cr"), pa.int64()))
        inner += int(pc.sum(prod).as_py() or 0)
        matching += b.num_rows
        max_mult = max(max_mult, int(pc.max(prod).as_py() or 0))
    return {"inner_rows": inner, "left_rows": lt["rows"],
            "right_rows": rt["rows"], "left_keys": lt["keys"],
            "right_keys": rt["keys"], "matching_keys": matching,
            "max_key_multiplicity": max_mult}
