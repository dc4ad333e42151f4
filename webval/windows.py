"""Windowed aggregates over timestamped tables (SURVEY.md §2-I note).

The reference is strictly batch — no event-time semantics — but
training-data pipelines routinely bucket logs by time.  These are BATCH
window aggregates: assign each row to window(s) with ``floor_temporal``
arithmetic in a map stage, then aggregate with the high-cardinality exchange
(a (key, window) pair easily reaches millions of groups).  No watermarks, no
late data: window membership is pure row arithmetic, so the operator is
deterministic and shuffle volume is one partial row per (batch, key, window).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from webval.exchange import grouped_agg

_UNITS_US = {"second": 1_000_000, "minute": 60_000_000, "hour": 3_600_000_000,
             "day": 86_400_000_000}


def _window_start(ts_col, size_us: int, offset_us: int = 0) -> pa.Array:
    """Window start timestamps via EXACT int64 arithmetic (any size, not
    just the calendar units floor_temporal supports).  The r1 version
    round-tripped through float64, which is silently approximate within ~5×
    of the 2^53-µs cliff (VERDICT r1 wrong-7); numpy's floor-mod gives the
    exact floored window start for any int64, negatives included."""
    import numpy as np

    t = pc.cast(ts_col, pa.int64())
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    null_mask = pc.is_null(t)
    tv = pc.fill_null(t, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    shifted = tv - np.int64(offset_us)
    start = shifted - (shifted % np.int64(size_us)) + np.int64(offset_us)
    arr = pc.if_else(null_mask, pa.scalar(None, pa.int64()),
                     pa.array(start, type=pa.int64()))
    return pc.cast(arr, pa.timestamp("us"))


def tumbling_window_agg(ds, ts_col: str, aggs, *, size: str = "hour",
                        size_us: int | None = None,
                        key_cols: list[str] | None = None,
                        num_buckets: int | None = None):
    """Tumbling-window aggregate: one window per row.

    ``aggs``: pyarrow group_by aggregations [(col, "sum"|"min"|"max"|"count")].
    ``size`` is a calendar unit name or pass ``size_us`` for arbitrary sizes.
    Output columns: key_cols + window_start + "<col>_<agg>".
    """
    su = size_us or _UNITS_US[size]
    keys = list(key_cols or [])

    def assign(batch: pa.Table) -> pa.Table:
        w = _window_start(batch.column(ts_col), su)
        return batch.append_column("window_start", w).drop_columns([ts_col])

    windowed = ds.map_batches(assign, batch_format="pyarrow")
    return grouped_agg(windowed, keys + ["window_start"], list(aggs),
                       num_buckets=num_buckets)


def sliding_window_agg(ds, ts_col: str, aggs, *, size_us: int, step_us: int,
                       key_cols: list[str] | None = None,
                       num_buckets: int | None = None):
    """Sliding windows: each row lands in ``size_us / step_us`` windows
    (flat-map style row replication in the assign stage — shuffle volume
    scales with the overlap factor; keep size/step small multiples).
    """
    assert size_us % step_us == 0, "size must be a multiple of step"
    reps = size_us // step_us
    keys = list(key_cols or [])

    def assign(batch: pa.Table) -> pa.Table:
        import numpy as np

        out = []
        for r in range(reps):
            w = _window_start(batch.column(ts_col), size_us,
                              offset_us=r * step_us)
            out.append(batch.append_column("window_start", w)
                            .drop_columns([ts_col]))
        return pa.concat_tables(out)

    windowed = ds.map_batches(assign, batch_format="pyarrow")
    return grouped_agg(windowed, keys + ["window_start"], list(aggs),
                       num_buckets=num_buckets)


def sessionize(ds, *, ts_col: str, by: str, gap_us: int,
               out_col: str = "session_seq", num_buckets: int | None = None,
               max_group_rows: int | None = None):
    """Gap-based sessionization: within each ``by`` group (events ordered
    by (ts, row order)), a new session starts when the gap from the
    previous event exceeds ``gap_us``; emits a 1-based per-group session
    sequence number.

    Hash-bucket exchange on ``by`` co-locates each group; per bucket ONE
    lexsort + vectorized segmented cumsum (group-boundary rows always open
    a session) — no per-group Python.  The SQL twin is the classic
    lag()/sum() window-function pair.  A single ``by`` group must fit one
    bucket task (over ``max_group_rows``, default
    exchange.DEFAULT_MAX_GROUP_ROWS, raises naming the key).
    """
    import numpy as np

    from webval.exchange import DEFAULT_MAX_GROUP_ROWS, bucketed_group_apply

    if max_group_rows is None:
        max_group_rows = DEFAULT_MAX_GROUP_ROWS
    cols = list(ds.schema().names)

    def assign(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return g.append_column(out_col, pa.array([], pa.int64()))
        by_v = pc.cast(g.column(by), pa.int64()).to_numpy(zero_copy_only=False)
        ts_v = pc.cast(g.column(ts_col), pa.int64()) \
                 .to_numpy(zero_copy_only=False)
        order = np.lexsort((ts_v, by_v))
        b_s, t_s = by_v[order], ts_v[order]
        new_s = np.ones(n, dtype=np.int64)
        if n > 1:
            same_grp = b_s[1:] == b_s[:-1]
            new_s[1:] = np.where(same_grp & (t_s[1:] - t_s[:-1] <= gap_us),
                                 0, 1)
        # per-group cumulative session number: global cumsum minus the
        # cumsum value at each group's start (+1 for the start row itself)
        cs = np.cumsum(new_s)
        grp_start = np.zeros(n, dtype=bool)
        grp_start[0] = True
        if n > 1:
            grp_start[1:] = b_s[1:] != b_s[:-1]
        start_cs = np.maximum.accumulate(np.where(grp_start, cs - 1, 0))
        seq_sorted = cs - start_cs
        seq = np.empty(n, dtype=np.int64)
        seq[order] = seq_sorted
        return g.append_column(out_col, pa.array(seq, pa.int64()))

    return bucketed_group_apply(ds.select_columns(cols), [by], assign,
                                num_buckets=num_buckets,
                                max_group_rows=max_group_rows)


def session_rollup(ds, *, ts_col: str, by: str, gap_us: int,
                   num_buckets: int | None = None,
                   max_group_rows: int | None = None):
    """Per-session aggregates on top of :func:`sessionize`: one row per
    (by, session_seq) with the event count and the session's duration in
    microseconds (max ts − min ts, exact int64).  Sessions are
    high-cardinality (≈ users × sessions/user) so the grouped aggregation
    runs on the exchange; callers wanting a global summary do a tiny
    rollup over this output (one partial row per block).
    """
    from webval.exchange import grouped_agg

    sess = sessionize(ds, ts_col=ts_col, by=by, gap_us=gap_us,
                      num_buckets=num_buckets, max_group_rows=max_group_rows)

    def to_int_ts(t: pa.Table) -> pa.Table:
        i = t.column_names.index(ts_col)
        return t.set_column(i, ts_col, pc.cast(t.column(ts_col), pa.int64()))

    per = grouped_agg(sess.map_batches(to_int_ts, batch_format="pyarrow"),
                      [by, "session_seq"],
                      [(ts_col, "count"), (ts_col, "min"), (ts_col, "max")],
                      num_buckets=num_buckets,
                      rename={f"{ts_col}_count": "n_events",
                              f"{ts_col}_min": "ts_min_us",
                              f"{ts_col}_max": "ts_max_us"})

    def add_dur(t: pa.Table) -> pa.Table:
        return t.append_column(
            "duration_us",
            pc.subtract(t.column("ts_max_us"), t.column("ts_min_us")))

    return per.map_batches(add_dur, batch_format="pyarrow")


def retention_cells(ds, *, key: str, ts_col: str,
                    num_buckets: int | None = None,
                    max_group_rows: int | None = None):
    """Cohort retention matrix: keys bucketed by first-seen day; for each
    (cohort_day, day_offset) the count of distinct keys active that day.

    Shape: (key, day) dedup exchange + per-key first-touch (min-day)
    exchange → co-bucketed large×large equi-join on the key → tiny
    (cohort, offset) count exchange — four exchanges, no driver loop.
    Output: (cohort_us int64 epoch-µs of the cohort day, day_offset
    int64, n_users int64).
    """
    import numpy as np

    from webval.exchange import distinct_rows, grouped_agg
    from webval.joins import equi_join

    day_us = 86_400_000_000

    def proj(t: pa.Table) -> pa.Table:
        t = t.select([key, ts_col])
        t = t.filter(pc.and_(
            pc.is_valid(t.column(key).combine_chunks()),
            pc.is_valid(t.column(ts_col).combine_chunks())))
        d = pc.cast(t.column(ts_col), pa.int64()).combine_chunks() \
              .to_numpy(zero_copy_only=False) // day_us * day_us
        return pa.table({key: t.column(key), "day_us": pa.array(d)})

    days = ds.map_batches(proj, batch_format="pyarrow")
    # first-touch over the DEDUPED pairs (min over distinct days ≡ min over
    # raw events), materialized because it feeds two consumers — otherwise
    # the read + dedup exchange executes twice (same defect class as the
    # r3s5 rolling_distinct_count finding), and the deduped stream is the
    # cheapest thing to pin
    active = distinct_rows(days, [key, "day_us"],
                           num_buckets=num_buckets).materialize()
    first = grouped_agg(active, [key], [("day_us", "min")],
                        num_buckets=num_buckets,
                        rename={"day_us_min": "cohort_us"})
    # combiner-less join: equi_join applies DEFAULT_MAX_GROUP_ROWS itself
    # when None — callers can lower/raise the named-diagnostic cap here
    j = equi_join(active, first, on=key, how="inner",
                  num_buckets=num_buckets, max_group_rows=max_group_rows)

    def to_cell(t: pa.Table) -> pa.Table:
        d = t.column("day_us").combine_chunks().to_numpy(zero_copy_only=False)
        c = t.column("cohort_us").combine_chunks() \
             .to_numpy(zero_copy_only=False)
        return pa.table({"cohort_us": pa.array(c),
                         "day_offset": pa.array((d - c) // day_us)})

    return grouped_agg(j.map_batches(to_cell, batch_format="pyarrow"),
                       ["cohort_us", "day_offset"],
                       [("day_offset", "count")],
                       num_buckets=num_buckets,
                       rename={"day_offset_count": "n_users"})


def rolling_distinct_count(ds, *, key: str, ts_col: str, window: int = 7,
                           num_buckets: int | None = None):
    """Trailing-``window``-day distinct-``key`` count per observed day —
    the rolling active-users metric, exact at any key cardinality.

    Shape: dedup (key, day) through the exchange; EXPAND each surviving
    pair to its ≤window contributing window-end days (bounded flat map —
    the shuffle carries at most ``window`` small rows per distinct pair,
    never per raw event); drop window days never observed in the data
    (broadcast of the tiny observed-day set, ray.put once); dedup
    (key, window_day) and count.  Two distinct exchanges + one count —
    nothing key-cardinality-sized ever lands on the driver.

    Output: (window_day int64 epoch-days, active int64), one row per
    observed day; a key active on day d contributes to window days
    d .. d+window−1 (i.e. each window day counts keys active in its
    trailing ``window`` days).
    """
    import numpy as np
    import ray

    from webval.exchange import distinct_rows, grouped_agg

    day_us = 86_400_000_000

    def proj(t: pa.Table) -> pa.Table:
        t = t.select([key, ts_col])
        t = t.filter(pc.and_(
            pc.is_valid(t.column(key).combine_chunks()),
            pc.is_valid(t.column(ts_col).combine_chunks())))
        d = pc.cast(t.column(ts_col), pa.int64()).combine_chunks() \
              .to_numpy(zero_copy_only=False) // day_us
        return pa.table({key: t.column(key), "d": pa.array(d)})

    # materialized: consumed TWICE (observed-day scan + expansion) — without
    # this the whole read→dedup exchange re-executes for the second consumer
    pairs = distinct_rows(ds.map_batches(proj, batch_format="pyarrow"),
                          [key, "d"], num_buckets=num_buckets).materialize()

    # observed-day set: per-block unique (tiny) → driver union → broadcast
    obs_parts = pairs.map_batches(
        lambda t: pa.table({"d": pc.unique(t.column("d").combine_chunks())}),
        batch_format="pyarrow")
    obs_days = sorted({v for b in obs_parts.iter_batches(
        batch_format="pyarrow", batch_size=None)
        if "d" in b.column_names
        for v in b.column("d").to_pylist()})
    obs_ref = ray.put(np.asarray(obs_days, dtype=np.int64))

    def expand(t: pa.Table) -> pa.Table:
        obs = ray.get(obs_ref)
        d = t.column("d").combine_chunks().to_numpy(zero_copy_only=False)
        n = len(d)
        wd = (d[:, None] + np.arange(window, dtype=np.int64)).ravel()
        idx = np.repeat(np.arange(n, dtype=np.int64), window)
        keep = np.isin(wd, obs)
        return pa.table({
            key: t.column(key).combine_chunks().take(pa.array(idx[keep])),
            "wd": pa.array(wd[keep]),
        })

    expanded = pairs.map_batches(expand, batch_format="pyarrow")
    pairs2 = distinct_rows(expanded, [key, "wd"], num_buckets=num_buckets)
    return grouped_agg(pairs2, ["wd"], [("wd", "count")],
                       num_buckets=num_buckets,
                       rename={"wd_count": "active"})


def ordered_inversions(ds, key: str, order_col: str, val_col: str, *,
                       num_buckets: int | None = None,
                       max_group_rows: int | None = 4_000_000):
    """Per-key monotonicity audit (an ordering check, SURVEY.md §2-B
    family): order each key's rows by ``order_col`` and count adjacent
    pairs where ``val_col`` strictly DECREASES — e.g. "within an order,
    ship dates must not go backwards as line numbers increase".  Emits one
    row per key that has at least one adjacent pair:
    (key, n_pairs, n_inversions); the caller filters n_inversions > 0 for
    violation rows.

    Rows with a null key, order or value are dropped (mirrors the SQL
    twin's WHERE ... IS NOT NULL).  Ties in ``order_col`` are broken by
    the VALUE (ascending), so a tie-pair never counts as an inversion and
    the answer is deterministic however the engine ordered the tied rows
    (the SQL twin orders its lag() window the same way).  Combiner-less
    exchange (a key's rows are consumed whole, in order): one sort +
    shifted vectorized compare per bucket, no per-row Python; oversized
    key groups raise the named exchange diagnostic.
    """
    import numpy as np

    from webval.exchange import bucketed_group_apply

    proj_cols = [key, order_col, val_col]

    def proj_fn(t: pa.Table) -> pa.Table:
        t = t.select(proj_cols)
        m = pc.is_valid(t.column(key).combine_chunks())
        for c in (order_col, val_col):
            m = pc.and_(m, pc.is_valid(t.column(c).combine_chunks()))
        return t.filter(m)

    proj = ds.map_batches(proj_fn, batch_format="pyarrow")

    def final(g: pa.Table) -> pa.Table:
        kt = g.schema.field(key).type
        empty = pa.table({key: pa.array([], kt),
                          "n_pairs": pa.array([], pa.int64()),
                          "n_inversions": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        g = g.sort_by([(key, "ascending"), (order_col, "ascending"),
                       (val_col, "ascending")])
        kk = g.column(key).to_numpy(zero_copy_only=False)
        vv = g.column(val_col)
        if pa.types.is_temporal(vv.type):
            vv = pc.cast(vv, pa.int64())
        v = vv.combine_chunks().to_numpy(zero_copy_only=False)
        n = len(kk)
        starts = np.flatnonzero(np.r_[True, kk[1:] != kk[:-1]])
        counts = np.diff(np.r_[starts, n])
        is_pair = np.ones(n, dtype=bool)
        is_pair[starts] = False          # first row of a key opens no pair
        dec = np.zeros(n, dtype=bool)
        dec[1:] = v[1:] < v[:-1]
        dec &= is_pair
        seg = np.repeat(np.arange(len(starts)), counts)
        n_pairs = np.bincount(seg[is_pair], minlength=len(starts))
        n_inv = np.bincount(seg[dec], minlength=len(starts))
        keep = n_pairs > 0
        if not keep.any():
            return empty
        return pa.table({
            key: g.column(key).take(pa.array(starts[keep], pa.int64())),
            "n_pairs": pa.array(n_pairs[keep].astype(np.int64)),
            "n_inversions": pa.array(n_inv[keep].astype(np.int64)),
        })

    return bucketed_group_apply(proj, [key], final, num_buckets=num_buckets,
                                max_group_rows=max_group_rows)


def funnel_stages(ds, user_col: str, ts_col: str, type_col: str,
                  steps: list[str], *, num_buckets: int | None = None,
                  max_group_rows: int | None = 4_000_000):
    """Ordered-sequence funnel: per user, the deepest prefix of ``steps``
    completed with STRICTLY increasing timestamps (step i+1 must occur
    after the FIRST qualifying occurrence of step i — the standard
    first-touch funnel; ties in ts do not advance).  Output: one row per
    user with ``stage`` ∈ [0, len(steps)].

    Scale shape: events project to (user, ts, type) and co-bucket by user
    through the exchange; inside each bucket the k steps each resolve in
    one vectorized pass (sorted group runs + first-eligible-per-group via
    unique-on-segment), no per-row Python.  A user's events must fit one
    bucket task (max_group_rows guard, shared with sessionize/joins).
    """
    import numpy as np

    from webval.exchange import bucketed_group_apply

    if not steps:
        raise ValueError("funnel_stages: steps is empty")

    def proj_fn(t: pa.Table) -> pa.Table:
        t = t.select([user_col, ts_col, type_col])
        # null users are dropped (SQL's JOIN USING would lose them after
        # stage 1 anyway, and a null id also poisons the int64 group key
        # by forcing a float64/NaN numpy conversion)
        m = pc.and_(pc.is_valid(t.column(user_col).combine_chunks()),
                    pc.and_(pc.is_valid(t.column(ts_col).combine_chunks()),
                            pc.is_valid(t.column(type_col)
                                        .combine_chunks())))
        return t.filter(m)

    proj = ds.map_batches(proj_fn, batch_format="pyarrow")

    def final(g: pa.Table) -> pa.Table:
        ut = g.schema.field(user_col).type
        if g.num_rows == 0:
            return pa.table({user_col: pa.array([], ut),
                             "stage": pa.array([], pa.int64())})
        ts_int = pc.cast(g.column(ts_col), pa.int64())
        g = g.set_column(g.column_names.index(ts_col), ts_col, ts_int)
        g = g.sort_by([(user_col, "ascending"), (ts_col, "ascending")])
        users = g.column(user_col).to_numpy(zero_copy_only=False)
        ts = g.column(ts_col).to_numpy(zero_copy_only=False)
        types = g.column(type_col)
        starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        n_grp = len(starts)
        counts = np.diff(np.r_[starts, len(users)])
        seg = np.repeat(np.arange(n_grp), counts)
        t_prev = np.full(n_grp, -(2 ** 63), dtype=np.int64)
        alive = np.ones(n_grp, dtype=bool)
        stage = np.zeros(n_grp, dtype=np.int64)
        for s in steps:
            is_s = pc.equal(types, s)
            m = pc.fill_null(is_s, False).to_numpy(zero_copy_only=False) \
                .astype(bool)
            elig = m & alive[seg] & (ts > t_prev[seg])
            idx = np.flatnonzero(elig)
            if len(idx) == 0:
                break
            segs_hit, first = np.unique(seg[idx], return_index=True)
            hit_ts = ts[idx[first]]
            advanced = np.zeros(n_grp, dtype=bool)
            advanced[segs_hit] = True
            t_prev[segs_hit] = hit_ts
            stage[advanced] += 1
            alive &= advanced
            if not alive.any():
                break
        return pa.table({
            user_col: g.column(user_col).take(pa.array(starts, pa.int64())),
            "stage": pa.array(stage)})

    return bucketed_group_apply(proj, [user_col], final,
                                num_buckets=num_buckets,
                                max_group_rows=max_group_rows)


def funnel_counts(ds, user_col: str, ts_col: str, type_col: str,
                  steps: list[str], *, num_buckets: int | None = None):
    """Aggregate funnel: for each step i (1-based), how many users reached
    at least stage i.  One small rollup over funnel_stages' per-user rows."""
    import numpy as np

    stages = funnel_stages(ds, user_col, ts_col, type_col, steps,
                           num_buckets=num_buckets)

    def partial(t: pa.Table) -> pa.Table:
        st = t.column("stage").to_numpy(zero_copy_only=False)
        k = len(steps)
        reach = [int((st >= i).sum()) for i in range(1, k + 1)]
        return pa.table({"stage": pa.array(range(1, k + 1), pa.int64()),
                         "n_users": pa.array(reach, pa.int64())})

    parts = stages.map_batches(partial, batch_format="pyarrow")

    def final(g: pa.Table) -> pa.Table:
        agg = g.group_by("stage").aggregate([("n_users", "sum")])
        return agg.rename_columns(["stage", "n_users"])

    from webval.exchange import bucketed_group_apply
    return bucketed_group_apply(parts, ["stage"], final, num_buckets=8)


def inter_arrival_stats(ds, key: str, ts_col: str, *,
                        order_cols: list[str] | None = None,
                        num_buckets: int | None = None,
                        max_group_rows: int | None = 4_000_000):
    """Per-key gaps between consecutive events — the crawl-politeness /
    rate-limit audit (per-domain inter-fetch spacing): order each key's
    events by (ts, *order_cols), difference adjacent timestamps, and
    reduce to (key, n_gaps, min_gap_us, avg_gap_us).  Keys with a single
    event have no gaps and are not emitted (SQL HAVING count(gap) > 0).

    Combiner-less (each key partition is consumed whole, in order) —
    co-bucketed exchange with the shared max_group_rows diagnostic;
    inside a bucket everything is sort + vectorized diff, no per-row
    Python.  Null timestamps are dropped.
    """
    import numpy as np

    from webval.exchange import bucketed_group_apply

    order_cols = list(order_cols or [])
    proj_cols = [key, ts_col] + order_cols

    def proj_fn(t: pa.Table) -> pa.Table:
        t = t.select(proj_cols)
        m = pc.and_(pc.is_valid(t.column(key).combine_chunks()),
                    pc.is_valid(t.column(ts_col).combine_chunks()))
        return t.filter(m)

    proj = ds.map_batches(proj_fn, batch_format="pyarrow")

    def final(g: pa.Table) -> pa.Table:
        kt = g.schema.field(key).type
        empty = pa.table({key: pa.array([], kt),
                          "n_gaps": pa.array([], pa.int64()),
                          "min_gap_us": pa.array([], pa.int64()),
                          "avg_gap_us": pa.array([], pa.float64())})
        if g.num_rows == 0:
            return empty
        ts_int = pc.cast(g.column(ts_col), pa.int64())
        g = g.set_column(g.column_names.index(ts_col), ts_col, ts_int)
        g = g.sort_by([(key, "ascending"), (ts_col, "ascending")]
                      + [(c, "ascending") for c in order_cols])
        kk = g.column(key).to_numpy(zero_copy_only=False)
        ts = g.column(ts_col).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, kk[1:] != kk[:-1]])
        counts = np.diff(np.r_[starts, len(kk)])
        gaps = np.diff(ts)
        is_gap = np.ones(len(kk), dtype=bool)
        is_gap[starts] = False          # no gap into a new key
        seg = np.repeat(np.arange(len(starts)), counts)
        n_gaps = np.bincount(seg[is_gap], minlength=len(starts))
        keep = n_gaps > 0
        if not keep.any():
            return empty
        gap_vals = gaps[is_gap[1:]]     # aligned: gaps[i] = ts[i+1]-ts[i]
        gseg = seg[is_gap]
        sums = np.bincount(gseg, weights=gap_vals.astype(np.float64),
                           minlength=len(starts))
        mins = np.full(len(starts), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mins, gseg, gap_vals)
        return pa.table({
            key: g.column(key).take(
                pa.array(starts[keep], pa.int64())),
            "n_gaps": pa.array(n_gaps[keep]),
            "min_gap_us": pa.array(mins[keep]),
            "avg_gap_us": pa.array(sums[keep] / n_gaps[keep], pa.float64()),
        })

    return bucketed_group_apply(proj, [key], final,
                                num_buckets=num_buckets,
                                max_group_rows=max_group_rows)


def transition_counts(ds, key: str, ts_col: str, state_col: str, *,
                      tie_cols: list[str] | None = None,
                      num_buckets: int | None = None,
                      max_group_rows: int | None = 4_000_000):
    """First-order (Markov) transition counts of ``state_col`` along each
    key's time-ordered event sequence: one output row per observed
    (prev_state, state) pair with its corpus-wide count — the behavioral
    profile funnel/session analyses start from.

    Ordering is (``ts_col``, then ``tie_cols``) within each key, matching
    the SQL twin ``lag(state) OVER (PARTITION BY key ORDER BY ts, ties)``
    exactly — pass a unique tie column (e.g. an event id) or tied
    timestamps make the answer engine-dependent.  Rows with a null key,
    ts or state are dropped first (SQL WHERE ... IS NOT NULL semantics,
    so a null never forms or breaks a pair).

    Scale shape: combiner-less co-bucketed exchange on ``key`` (whole
    sequences are consumed in order; ``max_group_rows`` guards oversized
    keys) → one vectorized sort + shifted compare per bucket, emitting
    per-bucket PARTIAL (prev, state, cnt) rows → a count-combiner exchange
    sums the partials, so the second shuffle is bounded by distinct state
    pairs, not events."""
    import numpy as np

    from webval.exchange import bucketed_group_apply

    tie_cols = list(tie_cols or [])
    cols = [key, ts_col, state_col] + tie_cols

    def proj_fn(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        m = pc.is_valid(t.column(key).combine_chunks())
        for c in (ts_col, state_col):
            m = pc.and_(m, pc.is_valid(t.column(c).combine_chunks()))
        return t.filter(m)

    proj = ds.map_batches(proj_fn, batch_format="pyarrow")
    st_type = None

    def final(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "prev_state": pa.array([], g.schema.field(state_col).type),
            "state": pa.array([], g.schema.field(state_col).type),
            "cnt": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        g = g.sort_by([(key, "ascending"), (ts_col, "ascending")]
                      + [(c, "ascending") for c in tie_cols])
        kk = g.column(key).to_numpy(zero_copy_only=False)
        same_key = kk[1:] == kk[:-1]          # pair (i-1, i) is in-key
        if not same_key.any():
            return empty
        idx = np.flatnonzero(same_key) + 1
        states = g.column(state_col).combine_chunks()
        pairs = pa.table({
            "prev_state": states.take(pa.array(idx - 1, pa.int64())),
            "state": states.take(pa.array(idx, pa.int64()))})
        part = pairs.group_by(["prev_state", "state"]).aggregate(
            [("state", "count")])
        return part.rename_columns(["prev_state", "state", "cnt"])

    partials = bucketed_group_apply(proj, [key], final,
                                    num_buckets=num_buckets,
                                    max_group_rows=max_group_rows)
    return grouped_agg(partials, ["prev_state", "state"],
                       [("cnt", "sum")], rename={"cnt_sum": "cnt"},
                       num_buckets=num_buckets)


def interval_coverage(ds, key: str, start_col: str, end_col: str, *,
                      num_buckets: int | None = None,
                      max_group_rows: int | None = 4_000_000):
    """Per-key covered span after merging overlapping intervals (the
    "total active time" rollup: union of [start, end) intervals, summed) —
    the interval-union counterpart of sessionize, for data that already
    carries explicit spans.  Output per key:
    (key, n_intervals, n_islands, covered) where covered is in the
    columns' own integer units (µs for timestamps) and islands are the
    maximal merged runs.

    Rows with a null key or bound, and degenerate intervals with
    end < start, are dropped (mirror the SQL twin's WHERE).  Combiner-less
    exchange — a key's intervals are consumed whole: one (key, start, end)
    sort per bucket, then a vectorized segmented cumulative-max island
    sweep (no per-row Python); oversized keys raise the named exchange
    diagnostic.
    """
    import numpy as np

    from webval.exchange import bucketed_group_apply

    def proj_fn(t: pa.Table) -> pa.Table:
        t = t.select([key, start_col, end_col])
        s = t.column(start_col).combine_chunks()
        e = t.column(end_col).combine_chunks()
        if pa.types.is_temporal(s.type):
            s, e = pc.cast(s, pa.int64()), pc.cast(e, pa.int64())
            t = pa.table({key: t.column(key), start_col: s, end_col: e})
        m = pc.and_(pc.and_(pc.is_valid(t.column(key).combine_chunks()),
                            pc.and_(pc.is_valid(s), pc.is_valid(e))),
                    pc.less_equal(s, e))
        return t.filter(m)

    proj = ds.map_batches(proj_fn, batch_format="pyarrow")

    def final(g: pa.Table) -> pa.Table:
        kt = g.schema.field(key).type
        empty = pa.table({key: pa.array([], kt),
                          "n_intervals": pa.array([], pa.int64()),
                          "n_islands": pa.array([], pa.int64()),
                          "covered": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        g = g.sort_by([(key, "ascending"), (start_col, "ascending"),
                       (end_col, "ascending")])
        kk = g.column(key).to_numpy(zero_copy_only=False)
        s = g.column(start_col).to_numpy(zero_copy_only=False)
        e = g.column(end_col).to_numpy(zero_copy_only=False)
        n = len(kk)
        starts = np.flatnonzero(np.r_[True, kk[1:] != kk[:-1]])
        seg = np.repeat(np.arange(len(starts)), np.diff(np.r_[starts, n]))
        # segmented cumulative max of `e` (running furthest-end within the
        # key); pandas' C groupby-cummax — an int64 offset-banding trick
        # would overflow at segments × span scale
        import pandas as pd

        cme = pd.Series(e).groupby(seg).cummax().to_numpy()
        # island opens where the interval starts past every prior end
        new_island = np.ones(n, dtype=bool)
        new_island[1:] = (s[1:] > cme[:-1]) | (kk[1:] != kk[:-1])
        isl = np.cumsum(new_island) - 1
        isl_start = s[new_island]
        isl_end = np.maximum.reduceat(cme, np.flatnonzero(new_island))
        cov = isl_end - isl_start
        isl_per_key = np.bincount(seg[new_island], minlength=len(starts))
        cov_per_key = np.bincount(isl[new_island],
                                  weights=cov.astype(np.float64))
        # island ids are contiguous per key, so summing island coverage
        # into keys is a reduceat over the per-key island counts
        key_cov = np.add.reduceat(
            cov_per_key, np.r_[0, np.cumsum(isl_per_key)[:-1]])
        return pa.table({
            key: g.column(key).take(pa.array(starts, pa.int64())),
            "n_intervals": pa.array(np.diff(np.r_[starts, n])
                                    .astype(np.int64)),
            "n_islands": pa.array(isl_per_key.astype(np.int64)),
            "covered": pa.array(key_cov.astype(np.int64)),
        })

    return bucketed_group_apply(proj, [key], final, num_buckets=num_buckets,
                                max_group_rows=max_group_rows)


def grouped_ewma(ds, key: str, ts_col: str, val_col: str, *,
                 alpha: float, tie_cols: list[str] | None = None,
                 out_col: str = "ewma", num_buckets: int | None = None,
                 max_group_rows: int | None = None):
    """Per-key exponentially-weighted moving average along each key's
    time-ordered value series (``y_0 = x_0``, ``y_i = (1-alpha)·y_{i-1} +
    alpha·x_i`` — the adjust-free EWMA every anomaly/smoothing pipeline
    uses).  Appends ``out_col`` to the (key, ts, ties, value) rows.

    Combiner-less key exchange (a series is consumed whole; oversized keys
    raise the named diagnostic); per bucket one lexsort + pandas' cython
    grouped-EWM kernel over the whole bucket frame — no per-row or
    per-group Python.  Null AND NaN values are dropped (mirror the SQL
    twin's WHERE; the recurrence has no null semantics, and Arrow NaN ≠
    null would otherwise poison the tail of a series).
    """
    import numpy as np
    import pandas as pd

    from webval.exchange import DEFAULT_MAX_GROUP_ROWS, bucketed_group_apply

    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"grouped_ewma: alpha={alpha} not in (0, 1]")
    if max_group_rows is None:
        max_group_rows = DEFAULT_MAX_GROUP_ROWS
    ties = list(tie_cols or [])
    cols = [key, ts_col, *ties, val_col]

    def proj(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        v = t.column(val_col).combine_chunks()
        ok = pc.is_valid(v)
        if pa.types.is_floating(v.type):
            ok = pc.and_(ok, pc.invert(pc.is_nan(v)))
        m = pc.and_(pc.is_valid(t.column(key).combine_chunks()),
                    pc.and_(pc.is_valid(t.column(ts_col).combine_chunks()),
                            ok))
        return t.filter(m)

    def smooth(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.append_column(out_col, pa.array([], pa.float64()))
        sort_keys = [(key, "ascending"), (ts_col, "ascending")] \
            + [(c, "ascending") for c in ties]
        g = g.sort_by(sort_keys)
        kv = g.column(key).to_numpy(zero_copy_only=False)
        x = g.column(val_col).to_numpy(zero_copy_only=False) \
             .astype(np.float64)
        # groups are contiguous post-sort: integer segment ids feed the
        # cython grouped-EWM kernel directly
        n = len(kv)
        seg = np.cumsum(np.r_[False, kv[1:] != kv[:-1]])
        y = (pd.Series(x).groupby(seg, sort=False)
             .ewm(alpha=alpha, adjust=False).mean()
             .droplevel(0).sort_index().to_numpy())
        return g.append_column(out_col, pa.array(y, pa.float64()))

    return bucketed_group_apply(
        ds.map_batches(proj, batch_format="pyarrow"), [key], smooth,
        num_buckets=num_buckets, max_group_rows=max_group_rows)


def validity_intervals(ds, key: str, ts_col: str, *,
                       attr_cols: list[str] | None = None,
                       tie_cols: list[str] | None = None,
                       num_buckets: int | None = None,
                       max_group_rows: int | None = 4_000_000):
    """SCD2-style validity intervals: per key, order events by
    (``ts_col``, ``tie_cols``) and emit one row per event with
    ``valid_from`` = its timestamp and ``valid_to`` = the NEXT event's
    timestamp (null for the key's latest event — the "current" row).
    ``attr_cols`` are carried through — the attribute snapshot that was
    valid over the interval.  This is the history-table build step of a
    slowly-changing-dimension load, and exactly SQL's
    ``lead(ts) OVER (PARTITION BY key ORDER BY ts, ties)``.

    Rows with a null key or timestamp are dropped first (they can neither
    form nor terminate an interval; mirrors the SQL twin's WHERE).

    Scale shape: combiner-less co-bucketed exchange on ``key`` (each key's
    history is consumed whole and in order; oversized keys raise the named
    exchange diagnostic) → one vectorized sort + shifted compare per
    bucket.  No driver materialization; output is the same size as the
    input.
    """
    import numpy as np

    from webval.exchange import bucketed_group_apply

    attr_cols = list(attr_cols or [])
    tie_cols = list(tie_cols or [])
    cols = [key, ts_col]
    for c in attr_cols + tie_cols:   # dedup: a column may be attr AND tie
        if c not in cols:
            cols.append(c)

    def proj(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        m = pc.and_(pc.is_valid(t.column(key).combine_chunks()),
                    pc.is_valid(t.column(ts_col).combine_chunks()))
        return t.filter(m)

    def final(g: pa.Table) -> pa.Table:
        ts_type = g.schema.field(ts_col).type
        out_cols = [key] + attr_cols
        if g.num_rows == 0:
            return pa.table(
                {c: pa.array([], g.schema.field(c).type) for c in out_cols}
                | {"valid_from": pa.array([], ts_type),
                   "valid_to": pa.array([], ts_type)})
        g = g.sort_by([(key, "ascending"), (ts_col, "ascending")]
                      + [(c, "ascending") for c in tie_cols])
        kk = g.column(key).to_numpy(zero_copy_only=False)
        ts = g.column(ts_col).combine_chunks()
        # lead(ts): shift up by one, null where the next row is another key
        n = len(kk)
        same_next = np.r_[kk[1:] == kk[:-1], False]   # row i's next is in-key
        idx = np.arange(n) + 1
        idx[~same_next] = 0    # in-range placeholder; masked to null below
        lead = ts.take(pa.array(idx, pa.int64()))
        lead = pc.if_else(pa.array(same_next), lead, pa.scalar(None, ts_type))
        res = {c: g.column(c) for c in out_cols}
        res["valid_from"] = ts
        res["valid_to"] = lead
        return pa.table(res)

    return bucketed_group_apply(
        ds.map_batches(proj, batch_format="pyarrow"), [key], final,
        num_buckets=num_buckets, max_group_rows=max_group_rows)


def debounce_events(ds, key: str, ts_col: str, *, min_gap_us: int,
                    tie_cols: list[str] | None = None,
                    num_buckets: int | None = None,
                    max_group_rows: int | None = 4_000_000):
    """Debounce a per-key event stream: keep each key's FIRST event and
    every event at least ``min_gap_us`` after its immediately PRECEDING
    event (lag semantics — the gap is measured to the previous raw event,
    not the previous kept one, so the operator is one vectorized pass and
    exactly SQL's ``lag(ts) OVER w``; greedy rate-limiting to the previous
    KEPT event is a sequential recurrence, deliberately not this op).
    Appends ``gap_us`` (null for each key's first event) and filters.

    Ordering is (``ts_col``, ``tie_cols``); pass a unique tie column or
    tied timestamps make kept-set membership engine-dependent.  Null keys
    or timestamps are dropped.  Scale shape: combiner-less co-bucketed
    exchange on ``key``, one sort + shifted subtract per bucket.
    """
    import numpy as np

    from webval.exchange import bucketed_group_apply

    tie_cols = list(tie_cols or [])

    def proj(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(t.column(key).combine_chunks()),
                    pc.is_valid(t.column(ts_col).combine_chunks()))
        return t.filter(m)

    def final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.append_column("gap_us", pa.array([], pa.int64()))
        g = g.sort_by([(key, "ascending"), (ts_col, "ascending")]
                      + [(c, "ascending") for c in tie_cols])
        kk = g.column(key).to_numpy(zero_copy_only=False)
        ts = g.column(ts_col).combine_chunks()
        tsi = pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False)
        n = len(kk)
        same_prev = np.r_[False, kk[1:] == kk[:-1]]
        gap = np.empty(n, np.int64)
        gap[1:] = tsi[1:] - tsi[:-1]
        keep = ~same_prev | (gap >= min_gap_us)
        gap_arr = pc.if_else(pa.array(same_prev),
                             pa.array(gap, pa.int64()),
                             pa.scalar(None, pa.int64()))
        return g.append_column("gap_us", gap_arr).filter(pa.array(keep))

    return bucketed_group_apply(
        ds.map_batches(proj, batch_format="pyarrow"), [key], final,
        num_buckets=num_buckets, max_group_rows=max_group_rows)


def interpolate_gaps(ds, key: str, ts_col: str, val_col: str, *,
                     out_col: str = "filled",
                     tie_cols: list[str] | None = None,
                     num_buckets: int | None = None,
                     max_group_rows: int | None = 4_000_000):
    """Per-key linear time interpolation of missing values: rows whose
    ``val_col`` is null get

        prev + (next − prev) · (t − t_prev) / (t_next − t_prev)

    between each key's nearest non-null neighbors in (``ts_col``,
    ``tie_cols``) order — evaluated with the multiply BEFORE the divide,
    exactly as the SQL twin's ``pv + (nv−pv)*(t−pt)/(nt−pt)`` parses, so
    values are bit-identical unrounded.  Leading/trailing nulls (no
    neighbor on one side) stay null; non-null rows pass through as
    float64.  The standard telemetry gap-fill (SQL: IGNORE NULLS window
    scans), as an operator.

    Scale shape: combiner-less co-bucketed exchange on ``key``; per
    bucket one sort + two segmented cummax scans (forward/backward
    nearest-valid index) — no per-row python.  Null keys/timestamps are
    dropped.
    """
    import numpy as np

    from webval.exchange import bucketed_group_apply

    tie_cols = list(tie_cols or [])

    def proj(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(t.column(key).combine_chunks()),
                    pc.is_valid(t.column(ts_col).combine_chunks()))
        return t.filter(m)

    def final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.append_column(out_col, pa.array([], pa.float64()))
        g = g.sort_by([(key, "ascending"), (ts_col, "ascending")]
                      + [(c, "ascending") for c in tie_cols])
        kk = g.column(key).to_numpy(zero_copy_only=False)
        tsi = pc.cast(g.column(ts_col).combine_chunks(), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        vcol = g.column(val_col).combine_chunks()
        valid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
        v = pc.cast(vcol, pa.float64()).to_numpy(zero_copy_only=False)
        if pa.types.is_floating(vcol.type):
            valid &= ~np.isnan(np.where(valid, v, 0.0))
        n = len(kk)
        idx = np.arange(n, dtype=np.int64)
        same = np.r_[False, kk[1:] == kk[:-1]]
        # segment start per row (cummax of segment-opening positions)
        seg_start = np.maximum.accumulate(np.where(same, -1, idx))
        # forward nearest-valid index (may leak across segments; a leaked
        # index is < this row's segment start, so the mask catches it)
        ff = np.maximum.accumulate(np.where(valid, idx, -1))
        # backward nearest-valid index: same cummax trick on the reversed
        # array (reversed position r = original n-1-r); -1 sentinel maps
        # to n = invalid.  A backward leak lands in the NEXT key, caught
        # by the key-equality mask below.
        r = idx                                  # reversed positions 0..n-1
        bf = np.maximum.accumulate(np.where(valid[::-1], r, -1))
        bf = (n - 1 - bf)[::-1]
        pv_ok = (ff >= seg_start) & (ff >= 0)
        nv_ok = bf < n
        nv_ok &= np.where(nv_ok, kk[np.clip(bf, 0, n - 1)] == kk, False)
        fill = np.full(n, np.nan)
        can = (~valid) & pv_ok & nv_ok
        if can.any():
            pi = ff[can]
            ni = bf[can]
            pv = v[pi]
            nv = v[ni]
            pt = tsi[pi]
            nt = tsi[ni]
            t = tsi[can]
            with np.errstate(divide="ignore", invalid="ignore"):
                interp = pv + (nv - pv) * (t - pt).astype(np.float64) \
                    / (nt - pt).astype(np.float64)
            fill[can] = interp
        out = np.where(valid, v, fill)
        arr = pa.array(out, pa.float64())
        keep_null = ~(valid | can)
        if keep_null.any():
            arr = pc.if_else(pa.array(~keep_null), arr,
                             pa.scalar(None, pa.float64()))
        return g.append_column(out_col, arr)

    return bucketed_group_apply(
        ds.map_batches(proj, batch_format="pyarrow"), [key], final,
        num_buckets=num_buckets, max_group_rows=max_group_rows)


def path_counts(ds, key: str, ts_col: str, state_col: str, *, n: int = 3,
                sep: str = ">", tie_cols: list[str] | None = None,
                num_buckets: int | None = None,
                max_group_rows: int | None = 4_000_000):
    """Order-``n`` behavioral path counts: one output row per observed run
    of ``n`` consecutive ``state_col`` values along a key's time-ordered
    sequence, joined with ``sep`` — the n-step generalization of
    :func:`transition_counts` (n=2 ≡ its pairs, pre-joined).  The classic
    "most common 3-step user journeys" funnel-mining rollup.

    Ordering/null semantics match transition_counts exactly (the SQL twin
    is ``n−1`` chained lag() windows over (ts, tie_cols)); runs never
    cross key boundaries.  Scale shape: combiner-less co-bucketed
    exchange on ``key`` → one sort + ``n−1`` shifted boundary checks per
    bucket, paths joined with the vectorized Arrow kernel, per-bucket
    partial (path, cnt) → count-combiner exchange bounded by distinct
    paths, not events.
    """
    import numpy as np

    from webval.exchange import bucketed_group_apply, grouped_agg

    if n < 2:
        raise ValueError(f"path_counts needs n >= 2, got {n}")
    tie_cols = list(tie_cols or [])
    cols = [key, ts_col, state_col] + tie_cols

    def proj_fn(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        m = pc.is_valid(t.column(key).combine_chunks())
        for c in (ts_col, state_col):
            m = pc.and_(m, pc.is_valid(t.column(c).combine_chunks()))
        return t.filter(m)

    def final(g: pa.Table) -> pa.Table:
        empty = pa.table({"path": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        if g.num_rows < n:
            return empty
        g = g.sort_by([(key, "ascending"), (ts_col, "ascending")]
                      + [(c, "ascending") for c in tie_cols])
        kk = g.column(key).to_numpy(zero_copy_only=False)
        same = kk[1:] == kk[:-1]               # (i-1, i) share a key
        # run start i is valid when all n-1 links i..i+n-2 are in-key
        ok = same.copy()
        for s in range(1, n - 1):
            ok[: len(same) - s] &= same[s:]
        starts = np.flatnonzero(ok[: len(kk) - (n - 1)])
        if len(starts) == 0:
            return empty
        states = pc.cast(g.column(state_col).combine_chunks(), pa.string())
        steps = [states.take(pa.array(starts + s, pa.int64()))
                 for s in range(n)]
        paths = pc.binary_join_element_wise(*steps, sep)
        vc = paths.value_counts()
        return pa.table({"path": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    partials = bucketed_group_apply(
        ds.map_batches(proj_fn, batch_format="pyarrow"), [key], final,
        num_buckets=num_buckets, max_group_rows=max_group_rows)
    return grouped_agg(partials, ["path"], [("cnt", "sum")],
                       rename={"cnt_sum": "cnt"}, num_buckets=num_buckets)


def kaplan_meier(ds, key: str, ts_col: str, *, censor_gap_us: int,
                 unit_us: int = 86_400_000_000,
                 num_buckets: int | None = None) -> pa.Table:
    """Kaplan-Meier survival curve of per-key lifetimes with right
    censoring (Kaplan & Meier 1958): each key's lifetime is
    ``floor((last_ts − first_ts) / unit_us)`` units; the "death"
    (churn) is OBSERVED when the key's last activity precedes the
    corpus-wide max timestamp by more than ``censor_gap_us``, else the
    lifetime is right-censored (the key may still be alive).  Output:
    one driver-small row per distinct lifetime with ≥1 observed death —
    (t, n_risk, n_events, survival) where survival is the running
    product Π(1 − d_i/n_i) over death times ascending; censored-only
    lifetimes shrink later risk sets without a row.

    Scale shape: corpus max ts via a one-row-per-block partial +
    driver max (per-block-scalar pattern); per-key (first, last) via the
    min/max-combiner exchange; a stateless map folds each key to
    (lifetime, observed) partial counts, so the final count exchange is
    bounded by distinct lifetimes × 2, and only THAT tiny table reaches
    the driver for the cumulative product.
    """
    import numpy as np
    import ray

    from webval.exchange import grouped_agg

    def block_max(t: pa.Table) -> pa.Table:
        col = pc.cast(t.column(ts_col).combine_chunks(), pa.int64())
        return pa.table({"mx": pa.array([pc.max(col).as_py()], pa.int64())})

    probe = ds.map_batches(block_max, batch_format="pyarrow").materialize()
    mx = None
    for ref in probe.to_arrow_refs():
        b = ray.get(ref)
        if b.num_rows and "mx" in b.column_names:
            v = b.column("mx")[0].as_py()
            if v is not None and (mx is None or v > mx):
                mx = v
    if mx is None:
        return pa.table({"t": pa.array([], pa.int64()),
                         "n_risk": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64()),
                         "survival": pa.array([], pa.float64())})

    def proj(t: pa.Table) -> pa.Table:
        t = t.select([key, ts_col])
        v = pc.cast(t.column(ts_col).combine_chunks(), pa.int64())
        t = pa.table({key: t.column(key), "ts_i": v})
        return t.filter(pc.and_(pc.is_valid(t.column(key).combine_chunks()),
                                pc.is_valid(v)))

    spans = grouped_agg(ds.map_batches(proj, batch_format="pyarrow"),
                        [key], [("ts_i", "min"), ("ts_i", "max")],
                        rename={"ts_i_min": "first", "ts_i_max": "last"},
                        num_buckets=num_buckets)

    cutoff = mx - censor_gap_us

    def fold(t: pa.Table) -> pa.Table:
        first = t.column("first").to_numpy(zero_copy_only=False)
        last = t.column("last").to_numpy(zero_copy_only=False)
        life = (last - first) // unit_us
        obs = last < cutoff
        tt = pa.table({"t": pa.array(life, pa.int64()),
                       "observed": pa.array(obs)})
        agg = tt.group_by(["t", "observed"]).aggregate([("t", "count")])
        return agg.rename_columns(["t", "observed", "cnt"])

    counts = grouped_agg(spans.map_batches(fold, batch_format="pyarrow"),
                         ["t", "observed"], [("cnt", "sum")],
                         rename={"cnt_sum": "cnt"}, num_buckets=num_buckets)
    tab = counts.materialize()
    blocks = [ray.get(r) for r in tab.to_arrow_refs()]
    blocks = [b for b in blocks if b.num_rows]
    small = pa.concat_tables(blocks).combine_chunks() if blocks else \
        pa.table({"t": pa.array([], pa.int64()),
                  "observed": pa.array([], pa.bool_()),
                  "cnt": pa.array([], pa.int64())})
    tv = small.column("t").to_numpy(zero_copy_only=False)
    ov = small.column("observed").to_numpy(zero_copy_only=False)
    cv = small.column("cnt").to_numpy(zero_copy_only=False)
    order = np.argsort(tv, kind="stable")
    tv, ov, cv = tv[order], ov[order], cv[order]
    uniq = np.unique(tv)
    total = int(cv.sum())
    # at-risk before time t = total - (all lifetimes < t)
    deaths = np.array([cv[(tv == u) & ov].sum() for u in uniq],
                      dtype=np.int64)
    at_t = np.array([cv[tv == u].sum() for u in uniq], dtype=np.int64)
    n_risk = total - np.concatenate(([0], np.cumsum(at_t)[:-1]))
    keep = deaths > 0
    surv = np.cumprod(1.0 - deaths[keep] / n_risk[keep])
    return pa.table({"t": pa.array(uniq[keep], pa.int64()),
                     "n_risk": pa.array(n_risk[keep], pa.int64()),
                     "n_events": pa.array(deaths[keep], pa.int64()),
                     "survival": pa.array(surv, pa.float64())})


def interarrival_stats(ds, key: str, ts_col: str, *,
                       tie_cols: list[str] | None = None,
                       num_buckets: int | None = None,
                       max_group_rows: int | None = 4_000_000):
    """Per-key inter-arrival-gap moments and the Goh-Barabási burstiness
    coefficient B = (σ − μ)/(σ + μ) (Goh & Barabási 2008, EPL 81):
    B → −1 for a regular (periodic) stream, ≈ 0 for Poisson, → 1 for
    extreme bursts — the behavioral signal separating schedulers and
    bots (regular) from humans (bursty).  Output per key with ≥ 1 gap:
    (key, n_gaps, mean_gap, std_gap, burstiness) in the timestamp's µs
    units; σ is the population stddev (SQL stddev_pop), keys with a
    single event have no gap and are dropped, σ + μ = 0 (all gaps zero)
    yields a null burstiness.

    Scale shape: combiner-less co-bucketed exchange on ``key`` → one
    sort + segmented diff per bucket, per-key moments via bincount over
    key run-codes — no per-row python.
    """
    import numpy as np

    from webval.exchange import bucketed_group_apply

    tie_cols = list(tie_cols or [])
    cols = [key, ts_col] + tie_cols

    def proj(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        return t.filter(pc.and_(
            pc.is_valid(t.column(key).combine_chunks()),
            pc.is_valid(t.column(ts_col).combine_chunks())))

    def final(g: pa.Table) -> pa.Table:
        key_type = g.schema.field(key).type
        empty = pa.table({key: pa.array([], key_type),
                          "n_gaps": pa.array([], pa.int64()),
                          "mean_gap": pa.array([], pa.float64()),
                          "std_gap": pa.array([], pa.float64()),
                          "burstiness": pa.array([], pa.float64())})
        if g.num_rows < 2:
            return empty
        g = g.sort_by([(key, "ascending"), (ts_col, "ascending")]
                      + [(c, "ascending") for c in tie_cols])
        kk = g.column(key).combine_chunks()
        kv = kk.to_numpy(zero_copy_only=False)
        tsv = pc.cast(g.column(ts_col).combine_chunks(), pa.int64()) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        same = kv[1:] == kv[:-1]
        if not same.any():
            return empty
        gaps = (tsv[1:] - tsv[:-1])[same]
        # run-code per row, then per-gap owner code
        starts = np.r_[True, ~same]
        code = np.cumsum(starts) - 1
        owner = code[1:][same]
        nk = code[-1] + 1
        n = np.bincount(owner, minlength=nk)
        s1 = np.bincount(owner, weights=gaps, minlength=nk)
        keep = np.flatnonzero(n > 0)
        mu = s1[keep] / n[keep]
        # two-pass variance: the one-pass power-sum form cancels
        # catastrophically at µs magnitudes (~1e10), diverging from the
        # SQL twin's stddev_pop far above any rounding rescue
        mu_full = np.zeros(nk)
        mu_full[keep] = mu
        dev = gaps - mu_full[owner]
        s2 = np.bincount(owner, weights=dev * dev, minlength=nk)
        var = np.maximum(s2[keep] / n[keep], 0.0)
        sd = np.sqrt(var)
        den = sd + mu
        with np.errstate(divide="ignore", invalid="ignore"):
            b = np.where(den > 0, (sd - mu) / den, np.nan)
        first_rows = np.flatnonzero(starts)[keep]
        out = pa.table({
            key: kk.take(pa.array(first_rows, pa.int64())),
            "n_gaps": pa.array(n[keep], pa.int64()),
            "mean_gap": pa.array(mu, pa.float64()),
            "std_gap": pa.array(sd, pa.float64()),
            "burstiness": pa.array(b, pa.float64(), from_pandas=True)})
        return out

    return bucketed_group_apply(
        ds.map_batches(proj, batch_format="pyarrow"), [key], final,
        num_buckets=num_buckets, max_group_rows=max_group_rows)


def sequence_nll(ds, key: str, ts_col: str, state_col: str,
                 trans: pa.Table, *, n_states: int,
                 tie_cols: list[str] | None = None,
                 num_buckets: int | None = None,
                 max_group_rows: int | None = 4_000_000):
    """Per-key mean negative log-likelihood of its time-ordered state
    sequence under a first-order Markov model — the behavioral anomaly
    score (a key whose transitions are rare under the corpus-wide model
    scores high).  ``trans`` is the (prev_state, state, cnt) table from
    :func:`transition_counts` (driver-small: ≤ states²); transition
    probabilities are add-one smoothed over ``n_states``:
    P(s|p) = (c(p,s)+1)/(c(p)+n_states+1), unseen contexts degrade to
    1/(n_states+1).  Output per key with ≥ 1 transition:
    (key, n_trans, nll).

    Scale shape: the per-pair logp and per-context fallback tables are
    precomputed driver-side (bounded by distinct states) and broadcast
    ONCE via ``ray.put``; scoring is the same combiner-less co-bucketed
    exchange as transition_counts with an index_in join per bucket.
    """
    import numpy as np
    import ray

    from webval.exchange import bucketed_group_apply

    tie_cols = list(tie_cols or [])
    cols = [key, ts_col, state_col] + tie_cols

    sep = "\x00"
    pv = pc.cast(trans.column("prev_state").combine_chunks(), pa.string())
    sv = pc.cast(trans.column("state").combine_chunks(), pa.string())
    cv = trans.column("cnt").to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    ctx_tab = trans.group_by("prev_state").aggregate([("cnt", "sum")])
    ctx_names = pc.cast(ctx_tab.column("prev_state").combine_chunks(),
                        pa.string())
    ctx_cnt = ctx_tab.column("cnt_sum").to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    # per observed pair: ln((c2+1)/(cp+S+1)); per context: the unseen-pair
    # fallback ln(1/(cp+S+1)); global fallback ln(1/(S+1))
    ctx_of_pair = pc.index_in(pv, value_set=ctx_names) \
        .to_numpy(zero_copy_only=False)
    pair_lp = np.log((cv + 1.0) / (ctx_cnt[ctx_of_pair]
                                   + n_states + 1.0))
    ctx_lp = np.log(1.0 / (ctx_cnt + n_states + 1.0))
    oov_lp = float(np.log(1.0 / (n_states + 1.0)))
    pair_keys = pc.binary_join_element_wise(pv, sv, sep)
    model_ref = ray.put((pair_keys, pa.array(pair_lp, pa.float64()),
                         ctx_names, pa.array(ctx_lp, pa.float64())))

    def proj(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        m = pc.is_valid(t.column(key).combine_chunks())
        for c in (ts_col, state_col):
            m = pc.and_(m, pc.is_valid(t.column(c).combine_chunks()))
        return t.filter(m)

    def final(g: pa.Table) -> pa.Table:
        key_type = g.schema.field(key).type
        empty = pa.table({key: pa.array([], key_type),
                          "n_trans": pa.array([], pa.int64()),
                          "nll": pa.array([], pa.float64())})
        if g.num_rows < 2:
            return empty
        pk, plp, cn, clp = ray.get(model_ref)
        g = g.sort_by([(key, "ascending"), (ts_col, "ascending")]
                      + [(c, "ascending") for c in tie_cols])
        kk = g.column(key).combine_chunks()
        kv = kk.to_numpy(zero_copy_only=False)
        same = kv[1:] == kv[:-1]
        if not same.any():
            return empty
        idx = np.flatnonzero(same) + 1
        states = pc.cast(g.column(state_col).combine_chunks(), pa.string())
        prev = states.take(pa.array(idx - 1, pa.int64()))
        cur = states.take(pa.array(idx, pa.int64()))
        keys2 = pc.binary_join_element_wise(prev, cur, sep)
        pos = pc.index_in(keys2, value_set=pk)
        lp = pc.take(plp, pos).to_numpy(zero_copy_only=False)
        miss = np.isnan(lp) | pc.is_null(pos).to_numpy(zero_copy_only=False)
        if miss.any():
            cpos = pc.index_in(prev.filter(pa.array(miss)), value_set=cn)
            fallback = pc.fill_null(pc.take(clp, cpos), oov_lp) \
                .to_numpy(zero_copy_only=False)
            lp = lp.copy()
            lp[miss] = fallback
        starts = np.r_[True, ~same]
        code = np.cumsum(starts) - 1
        owner = code[idx]
        nk = code[-1] + 1
        n = np.bincount(owner, minlength=nk)
        s = np.bincount(owner, weights=lp, minlength=nk)
        keep = np.flatnonzero(n > 0)
        first_rows = np.flatnonzero(starts)[keep]
        return pa.table({
            key: kk.take(pa.array(first_rows, pa.int64())),
            "n_trans": pa.array(n[keep], pa.int64()),
            "nll": pa.array(-s[keep] / n[keep], pa.float64())})

    return bucketed_group_apply(
        ds.map_batches(proj, batch_format="pyarrow"), [key], final,
        num_buckets=num_buckets, max_group_rows=max_group_rows)


def longest_streak(ds, key: str, ts_col: str, *,
                   num_buckets: int | None = None,
                   max_group_rows: int | None = 4_000_000):
    """Per-key longest run of CONSECUTIVE CALENDAR DAYS with at least
    one event — the gaps-and-islands engagement signal (sessionize
    groups by intra-day gaps; this asks "how many days in a row was
    the key alive").  Null key/ts rows are dropped.
    Dataset[{key, longest_streak, n_active_days}].

    Scale shape: the per-batch partial dedups to distinct (key, day)
    pairs so the exchange is bounded by active key-days, never events;
    the island scan (sort by key/day, break where the day gap exceeds
    1, per-island bincount) is one vectorized pass per bucket."""
    import numpy as np

    from webval.exchange import bucketed_group_apply

    def partial(t: pa.Table) -> pa.Table:
        k = t.column(key).combine_chunks()
        ts = t.column(ts_col).combine_chunks()
        m = pc.and_(pc.is_valid(k), pc.is_valid(ts))
        day = pc.cast(pc.cast(ts.filter(m), pa.date32()), pa.int32())
        pairs = pa.table({key: k.filter(m), "day": day})
        return pairs.group_by([key, "day"]).aggregate([]) \
                    .select([key, "day"])

    def final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({
                key: pa.array([], g.schema.field(key).type),
                "longest_streak": pa.array([], pa.int64()),
                "n_active_days": pa.array([], pa.int64())})
        g = g.group_by([key, "day"]).aggregate([]).select([key, "day"]) \
             .sort_by([(key, "ascending"), ("day", "ascending")])
        kk = g.column(key).to_numpy(zero_copy_only=False)
        dd = g.column("day").to_numpy(zero_copy_only=False) \
              .astype(np.int64)
        new_key = np.r_[True, kk[1:] != kk[:-1]]
        brk = new_key | np.r_[False, dd[1:] != dd[:-1] + 1]
        island = np.cumsum(brk) - 1
        ilen = np.bincount(island)
        kcode = np.cumsum(new_key) - 1
        nk = kcode[-1] + 1
        firsts = np.flatnonzero(new_key)
        longest = np.zeros(nk, np.int64)
        np.maximum.at(longest, kcode[np.flatnonzero(brk)],
                      ilen)
        active = np.bincount(kcode, minlength=nk)
        return pa.table({
            key: g.column(key).take(pa.array(firsts, pa.int64())),
            "longest_streak": pa.array(longest, pa.int64()),
            "n_active_days": pa.array(active.astype(np.int64))})

    return bucketed_group_apply(
        ds.select_columns([key, ts_col]), [key], final,
        num_buckets=num_buckets, partial_fn=partial,
        max_group_rows=max_group_rows)


def max_concurrency(ds, key: str, start_col: str, end_col: str, *,
                    num_buckets: int | None = None,
                    max_group_rows: int | None = 4_000_000):
    """Per-key PEAK number of simultaneously-open intervals
    ([start, end) half-open) — the "how many fetchers / sessions /
    users were live at once" load signal that interval_coverage's
    union length cannot see.  Intervals with end <= start contribute
    nothing; null rows are dropped.
    Dataset[{key, max_concurrent, n_intervals}].

    Scale shape: each interval explodes to two (key, t, ±1) boundary
    rows and the partial SUM-COMBINES deltas per (key, t) — valid
    because half-open semantics only ever evaluates concurrency on
    the segments BETWEEN distinct timestamps, so same-instant starts
    and ends net out exactly like end-before-start ordering; the
    exchange is bounded by distinct (key, timestamp) pairs and the
    finalize is one segmented cumsum/max sweep per bucket."""
    import numpy as np

    from webval.exchange import bucketed_group_apply

    def partial(t: pa.Table) -> pa.Table:
        k = t.column(key).combine_chunks()
        s = t.column(start_col).combine_chunks()
        e = t.column(end_col).combine_chunks()
        m = pc.and_(pc.and_(pc.is_valid(k), pc.is_valid(s)),
                    pc.and_(pc.is_valid(e),
                            pc.greater(e, s)))
        k, s, e = k.filter(m), s.filter(m), e.filter(m)
        n = len(k)
        starts = pa.table({key: k, "t": pc.cast(s, pa.int64()),
                           "delta": pa.array(np.ones(n, np.int64)),
                           "opens": pa.array(np.ones(n, np.int64))})
        ends = pa.table({key: k, "t": pc.cast(e, pa.int64()),
                         "delta": pa.array(-np.ones(n, np.int64)),
                         "opens": pa.array(np.zeros(n, np.int64))})
        b = pa.concat_tables([starts, ends])
        agg = b.group_by([key, "t"]).aggregate(
            [("delta", "sum"), ("opens", "sum")])
        return agg.rename_columns([key, "t", "delta", "opens"])

    def final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({
                key: pa.array([], g.schema.field(key).type),
                "max_concurrent": pa.array([], pa.int64()),
                "n_intervals": pa.array([], pa.int64())})
        agg = g.group_by([key, "t"]).aggregate(
            [("delta", "sum"), ("opens", "sum")]) \
            .rename_columns([key, "t", "delta", "opens"]) \
            .sort_by([(key, "ascending"), ("t", "ascending")])
        kk = agg.column(key).to_numpy(zero_copy_only=False)
        dd = agg.column("delta").to_numpy(zero_copy_only=False)
        oo = agg.column("opens").to_numpy(zero_copy_only=False)
        new_key = np.r_[True, kk[1:] != kk[:-1]]
        kcode = np.cumsum(new_key) - 1
        nk = kcode[-1] + 1
        cum = np.cumsum(dd)
        firsts = np.flatnonzero(new_key)
        base = np.zeros(nk, np.int64)
        base[1:] = cum[firsts[1:] - 1]
        run = cum - base[kcode]
        peak = np.zeros(nk, np.int64)
        np.maximum.at(peak, kcode, run)
        n_iv = np.bincount(kcode, weights=oo, minlength=nk) \
            .astype(np.int64)
        return pa.table({
            key: agg.column(key).take(pa.array(firsts, pa.int64())),
            "max_concurrent": pa.array(peak, pa.int64()),
            "n_intervals": pa.array(n_iv)})

    return bucketed_group_apply(
        ds.select_columns([key, start_col, end_col]), [key], final,
        num_buckets=num_buckets, partial_fn=partial,
        max_group_rows=max_group_rows)


def period_movers(ds, key: str, ts_col: str, split_ts, k: int = 20, *,
                  num_buckets: int | None = None):
    """Top-k period-over-period movers: per-key event counts BEFORE vs
    FROM ``split_ts``, ranked by absolute change — "which hosts/users
    surged or collapsed between the two crawl windows", the first
    question after any drift alarm.  Ties at the k boundary break on
    ascending key, so output is deterministic.
    Dataset[{key, before_n, after_n, delta}] (k rows, |delta| desc).

    Scale shape: one (key) sum-combiner exchange of two counters; the
    rank is Dataset.sort + limit over the KEY-sized delta table (never
    raw rows).  split_ts must be comparable to ``ts_col`` values
    (pa.scalar timestamp for timestamp columns)."""
    import numpy as np

    from webval.exchange import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        kcol = t.column(key).combine_chunks()
        ts = t.column(ts_col).combine_chunks()
        m = pc.and_(pc.is_valid(kcol), pc.is_valid(ts))
        kcol, ts = kcol.filter(m), ts.filter(m)
        before = pc.cast(pc.less(ts, split_ts), pa.int64())
        after = pc.cast(pc.greater_equal(ts, split_ts), pa.int64())
        b = pa.table({key: kcol, "before_n": before, "after_n": after})
        agg = b.group_by([key]).aggregate(
            [("before_n", "sum"), ("after_n", "sum")])
        return agg.rename_columns([key, "before_n", "after_n"])

    counts = grouped_agg(
        ds.select_columns([key, ts_col])
          .map_batches(partial, batch_format="pyarrow"),
        [key], [("before_n", "sum"), ("after_n", "sum")],
        rename={"before_n_sum": "before_n", "after_n_sum": "after_n"},
        num_buckets=num_buckets)

    def widen(t: pa.Table) -> pa.Table:
        d = pc.subtract(t.column("after_n"), t.column("before_n"))
        return t.append_column("delta", d) \
                .append_column("abs_delta", pc.abs(d))

    ranked = counts.map_batches(widen, batch_format="pyarrow") \
        .sort(["abs_delta", key], descending=[True, False]).limit(k)
    return ranked.map_batches(
        lambda t: t.drop_columns(["abs_delta"]), batch_format="pyarrow")


def hour_of_day_entropy(ds, key: str, ts_col: str, *,
                        num_buckets: int | None = None):
    """Per-key Shannon entropy (bits) of the hour-of-day histogram plus
    the peak hour's share — the bot/scraper radar: organic users spread
    activity over a waking-hours band (entropy ~3-4 bits), cron-driven
    crawlers pin one hour (entropy ~0, peak_share ~1) or spread
    perfectly uniformly (entropy ~log2(24) = 4.58).
    Dataset[{key, n_events, n_hours, entropy, peak_share}].

    Scale shape: one (key, hour) count-combiner exchange (≤24 rows per
    key survive it), then a key-bucketed final that computes entropy
    vectorized with reduceat — no per-row Python, no driver state."""
    import numpy as np

    from webval.exchange import bucketed_group_apply, grouped_agg

    def proj(t: pa.Table) -> pa.Table:
        k = t.column(key).combine_chunks()
        ts = t.column(ts_col).combine_chunks()
        m = pc.and_(pc.is_valid(k), pc.is_valid(ts))
        return pa.table({key: k.filter(m),
                         "hour": pc.cast(pc.hour(ts.filter(m)),
                                         pa.int32())})

    counts = grouped_agg(
        ds.select_columns([key, ts_col])
          .map_batches(proj, batch_format="pyarrow"),
        [key, "hour"], [("hour", "count")], rename={"hour_count": "cnt"},
        num_buckets=num_buckets)

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({key: pa.array([], t.schema.field(key).type),
                             "n_events": pa.array([], pa.int64()),
                             "n_hours": pa.array([], pa.int64()),
                             "entropy": pa.array([], pa.float64()),
                             "peak_share": pa.array([], pa.float64())})
        k = t.column(key).to_numpy(zero_copy_only=False)
        c = t.column("cnt").to_numpy(zero_copy_only=False) \
             .astype(np.float64)
        order = np.argsort(k, kind="stable")
        k, c = k[order], c[order]
        uk, start = np.unique(k, return_index=True)
        tot = np.add.reduceat(c, start)
        plogp = np.add.reduceat(c * np.log2(c), start)
        return pa.table({
            key: pa.array(uk, t.schema.field(key).type),
            "n_events": pa.array(tot.astype(np.int64)),
            "n_hours": pa.array(
                np.add.reduceat(np.ones_like(c), start).astype(np.int64)),
            "entropy": pa.array(np.log2(tot) - plogp / tot),
            "peak_share": pa.array(np.maximum.reduceat(c, start) / tot),
        })

    return bucketed_group_apply(counts, [key], final,
                                num_buckets=num_buckets)


def correlated_keys(ds, key_col: str, ts_col: str, *,
                    top_n: int = 10, freq_us: int = 3_600_000_000,
                    num_buckets: int | None = None,
                    max_cells: int = 50_000_000):
    """Pairwise Pearson correlation of per-key activity time series —
    the synchronized-traffic radar: keys (hosts, users, API tokens)
    whose zero-filled per-``freq_us``-bucket event counts move together
    are mirrors, scraper fleets, or coordinated bots; anti-correlated
    pairs are failover/load-shifted capacity.

    Considers only the ``top_n`` keys by total volume (pairs over the
    full key set are quadratic and meaningless for cold keys); series
    are zero-filled over the GLOBAL activity window [min bucket, max
    bucket] so absence is signal, not a dropped join row.

    Scale shape: one (key, bucket) count exchange over the raw rows; a
    second key-totals exchange whose blocks each surrender only their
    local top-``top_n`` rows to the driver merge; bounds are per-block
    min/max scalars.  Only the top keys' series rows reach the driver —
    a ``top_n × spine`` matrix, guarded by ``max_cells`` (named
    diagnostic, not OOM).  Returns a driver-small pyarrow Table
    [{key_a, key_b, buckets, corr}] over all top-key pairs with
    key_a < key_b; ``corr`` is NULL when either series is constant
    (matching SQL ``corr()``).
    """
    import numpy as np

    def proj(t: pa.Table) -> pa.Table:
        k = t.column(key_col).combine_chunks()
        ts = t.column(ts_col).combine_chunks()
        m = pc.and_(pc.is_valid(k), pc.is_valid(ts))
        t = t.filter(m)
        h = pc.cast(t.column(ts_col).combine_chunks(), pa.int64())
        h = pc.multiply(pc.divide(h, freq_us), pa.scalar(freq_us, pa.int64()))
        return pa.table({"k": t.column(key_col), "h_us": h})

    counts = grouped_agg(
        ds.select_columns([key_col, ts_col])
          .map_batches(proj, batch_format="pyarrow"),
        ["k", "h_us"], [("h_us", "count")], rename={"h_us_count": "cnt"},
        num_buckets=num_buckets).materialize()

    totals = grouped_agg(counts, ["k"], [("cnt", "sum")],
                         rename={"cnt_sum": "tot"}, num_buckets=num_buckets)

    def local_top(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("tot", "descending"),
                                            ("k", "ascending")])
        return t.take(idx.slice(0, top_n))

    tops = [b for b in totals.map_batches(
        local_top, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=65536)]

    def bounds(t: pa.Table) -> pa.Table:
        h = t.column("h_us")
        return pa.table({"lo": pa.array([pc.min(h).as_py()], pa.int64()),
                         "hi": pa.array([pc.max(h).as_py()], pa.int64())})

    bnd = [b for b in counts.map_batches(
        bounds, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=65536)]
    empty = pa.table({"key_a": pa.array([], pa.string()),
                      "key_b": pa.array([], pa.string()),
                      "buckets": pa.array([], pa.int64()),
                      "corr": pa.array([], pa.float64())})
    los = [b.column("lo").to_pylist()[0] for b in bnd
           if b.column("lo").to_pylist()[0] is not None]
    if not tops or not los:
        return empty
    merged = pa.concat_tables(tops)
    merged = merged.take(pc.sort_indices(
        merged, sort_keys=[("tot", "descending"),
                           ("k", "ascending")]).slice(0, top_n))
    keys = sorted(merged.column("k").to_pylist())
    if len(keys) < 2:
        return empty
    lo = min(los)
    hi = max(b.column("hi").to_pylist()[0] for b in bnd
             if b.column("hi").to_pylist()[0] is not None)
    spine_len = (hi - lo) // freq_us + 1
    if len(keys) * spine_len > max_cells:
        raise ValueError(
            f"correlated_keys: top_n={len(keys)} keys x {spine_len} "
            f"buckets = {len(keys) * spine_len} cells exceeds max_cells="
            f"{max_cells}; coarsen freq_us or lower top_n")

    key_set = set(keys)
    series = counts.map_batches(
        lambda t: t.filter(pc.is_in(t.column("k").combine_chunks(),
                                    pa.array(sorted(key_set)))),
        batch_format="pyarrow")
    mat = np.zeros((len(keys), int(spine_len)), dtype=np.float64)
    pos = {k: i for i, k in enumerate(keys)}
    for b in series.iter_batches(batch_format="pyarrow", batch_size=65536):
        ki = np.array([pos[k] for k in b.column("k").to_pylist()], np.int64)
        hj = (b.column("h_us").to_numpy(zero_copy_only=False) - lo) // freq_us
        mat[ki, hj] = b.column("cnt").to_numpy(zero_copy_only=False)

    sd = mat.std(axis=1)
    cen = mat - mat.mean(axis=1, keepdims=True)
    ka, kb, cors = [], [], []
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            ka.append(keys[i])
            kb.append(keys[j])
            if sd[i] == 0 or sd[j] == 0:
                cors.append(None)
            else:
                cors.append(float((cen[i] * cen[j]).mean()
                                  / (sd[i] * sd[j])))
    return pa.table({
        "key_a": pa.array(ka), "key_b": pa.array(kb),
        "buckets": pa.array([int(spine_len)] * len(ka), pa.int64()),
        "corr": pa.array(cors, pa.float64())})


def first_seen_counts(ds, key_col: str, ts_col: str, *,
                      freq_us: int = 86_400_000_000,
                      num_buckets: int | None = None):
    """Discovery/novelty curve: how many DISTINCT keys (hosts, users,
    vocab terms) are seen for the FIRST time in each ``freq_us`` bucket
    — flat means the crawl frontier is stalling on known ground,
    a spike means a new shard/sitemap opened up.  The per-bucket "new
    keys" series is also the increment form of the cumulative-distinct
    curve.

    Scale shape: one (key → min bucket) combiner exchange (min is
    mergeable, so raw rows pre-combine per batch), then a tiny
    (bucket → count) exchange over one row per key.  Returns a Dataset
    of (bucket_us: int64, new_keys: int64) — driver never sees the key
    table."""
    from webval.exchange import grouped_agg

    def proj(t: pa.Table) -> pa.Table:
        k = t.column(key_col).combine_chunks()
        ts = t.column(ts_col).combine_chunks()
        t = t.filter(pc.and_(pc.is_valid(k), pc.is_valid(ts)))
        h = pc.cast(t.column(ts_col).combine_chunks(), pa.int64())
        h = pc.multiply(pc.divide(h, freq_us), pa.scalar(freq_us, pa.int64()))
        return pa.table({"k": t.column(key_col), "b": h})

    first = grouped_agg(
        ds.select_columns([key_col, ts_col])
          .map_batches(proj, batch_format="pyarrow"),
        ["k"], [("b", "min")], rename={"b_min": "b"},
        num_buckets=num_buckets)
    return grouped_agg(first, ["b"], [("b", "count")],
                       rename={"b_count": "new_keys"},
                       num_buckets=num_buckets).map_batches(
        lambda t: t.rename_columns(["bucket_us", "new_keys"]),
        batch_format="pyarrow")


def cusum_scores(ds, key: str, ts_col: str, val_col: str, *,
                 target: float = 0.0, target_col: str | None = None,
                 slack: float = 0.0, threshold: float | None = None,
                 out_col: str = "cusum",
                 num_buckets: int | None = None,
                 max_group_rows: int | None = None):
    """One-sided upper CUSUM (Page 1954) along each key's time-ordered
    series: s_i = max(0, s_{i-1} + x_i − target − slack) — the classic
    sequential change-point score that accumulates small persistent
    upward shifts a per-point z-score never flags.  ``target`` is the
    in-control reference level (or per-row via ``target_col``, e.g. a
    per-key baseline mean attached upstream); ``slack`` is Page's k
    (shifts smaller than k are ignored).  With ``threshold`` (Page's
    h), appends a boolean ``alarm`` column — compared on
    round(s, 6) so the decision is reproducible across engines.
    Null keys/timestamps/values are dropped.

    Scale shape: combiner-less key exchange (a series is consumed
    whole; oversized keys raise the named diagnostic); per bucket one
    lexsort, then the reflected-walk closed form s = S − min(0,
    running-min S) over segmented cython cumsum/cummin kernels — no
    per-row Python (the recurrence form and this closed form are
    mathematically equal; emit round(6) when comparing to a
    recurrence-evaluated twin)."""
    import numpy as np
    import pandas as pd

    from webval.exchange import DEFAULT_MAX_GROUP_ROWS, bucketed_group_apply

    if max_group_rows is None:
        max_group_rows = DEFAULT_MAX_GROUP_ROWS
    cols = [key, ts_col, val_col] + ([target_col] if target_col else [])

    def proj(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        m = pc.is_valid(t.column(key).combine_chunks())
        for c in cols[1:]:
            v = t.column(c).combine_chunks()
            ok = pc.is_valid(v)
            if pa.types.is_floating(v.type):
                ok = pc.and_(ok, pc.invert(pc.is_nan(v)))
            m = pc.and_(m, ok)
        return t.filter(m)

    def scan(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            out = g.append_column(out_col, pa.array([], pa.float64()))
            if threshold is not None:
                out = out.append_column("alarm", pa.array([], pa.bool_()))
            return out
        g = g.sort_by([(key, "ascending"), (ts_col, "ascending")])
        kv = g.column(key).to_numpy(zero_copy_only=False)
        x = g.column(val_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        base = (g.column(target_col).to_numpy(zero_copy_only=False)
                .astype(np.float64) if target_col else float(target))
        d = x - base - float(slack)
        seg = np.cumsum(np.r_[False, kv[1:] != kv[:-1]])
        s_ser = pd.Series(d).groupby(seg, sort=False).cumsum()
        m_ser = s_ser.groupby(seg, sort=False).cummin()
        s = (s_ser - np.minimum(m_ser, 0.0)).to_numpy()
        out = g.append_column(out_col, pa.array(s, pa.float64()))
        if threshold is not None:
            out = out.append_column(
                "alarm", pa.array(np.round(s, 6) > float(threshold)))
        return out

    return bucketed_group_apply(
        ds.map_batches(proj, batch_format="pyarrow"), [key], scan,
        num_buckets=num_buckets, max_group_rows=max_group_rows)


def decayed_counts(ds, key: str, ts_col: str, *, half_life_days: float,
                   as_of, num_buckets: int | None = None):
    """Exponentially time-decayed activity score per key:

        freshness = Σ_events 2^(−(as_of − ts) / half_life)

    — the recency-weighted volume ("is this host still alive or a
    graveyard of 2019 pages") that a plain count can't see.  An event
    ``half_life_days`` old counts half an event; events after ``as_of``
    weigh > 1 (pass the crawl cutoff as ``as_of`` — it must be an
    explicit timestamp so reruns are reproducible, never "now").
    Null keys/timestamps are dropped.  Returns
    Dataset[{key, n_events, freshness}].

    Scale shape: the decay weight is a vectorized elementwise kernel
    and each batch collapses to per-key (count, Σweight) partials
    before ONE exchange — identical movement to a grouped count."""
    import datetime as _dt

    import numpy as np

    from webval.exchange import grouped_agg

    if half_life_days <= 0:
        raise ValueError(f"decayed_counts: half_life_days must be > 0, "
                         f"got {half_life_days}")
    if isinstance(as_of, str):
        as_of = _dt.datetime.fromisoformat(as_of)
    as_of_us = int(pa.scalar(as_of, pa.timestamp("us")).value)
    hl_us = float(half_life_days) * 86400.0 * 1e6

    def partial(t: pa.Table) -> pa.Table:
        k = t.column(key).combine_chunks()
        ts = t.column(ts_col).combine_chunks()
        m = pc.and_(pc.is_valid(k), pc.is_valid(ts))
        k, ts = k.filter(m), ts.filter(m)
        age = as_of_us - pc.cast(ts, pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = np.exp2(-age / hl_us)
        tab = pa.table({key: k, "w": pa.array(w),
                        "n": pa.nulls(len(k), pa.int64()).fill_null(1)})
        agg = tab.group_by([key]).aggregate([("n", "sum"), ("w", "sum")])
        return agg.rename_columns([key, "n_events", "freshness"])

    return grouped_agg(
        ds.select_columns([key, ts_col]).map_batches(
            partial, batch_format="pyarrow"),
        [key], [("n_events", "sum"), ("freshness", "sum")],
        rename={"n_events_sum": "n_events", "freshness_sum": "freshness"},
        num_buckets=num_buckets)


def peak_rate(ds, key: str, ts_col: str, *, window_seconds: float,
              num_buckets: int | None = None,
              max_group_rows: int | None = None):
    """Burst detection: per key, the MAXIMUM number of events inside any
    sliding ``window_seconds`` window — the rate-limit / scraper-burst
    audit that hourly buckets smear away.  Window semantics match SQL's
    ``RANGE BETWEEN <w> PRECEDING AND CURRENT ROW``: for each event,
    events with ts in [t − w, t] count, timestamp peers included, and
    the per-key peak is the max over events.  Null keys/timestamps are
    dropped.  Returns Dataset[{key, n_events, peak_rate}].

    Scale shape: combiner-less key exchange (a key's event series is
    scanned whole; oversized keys raise the named diagnostic); per
    bucket one lexsort, then per key two vectorized searchsorted
    sweeps — Python loops only over KEYS, never rows."""
    import numpy as np

    from webval.exchange import DEFAULT_MAX_GROUP_ROWS, bucketed_group_apply

    if window_seconds <= 0:
        raise ValueError(f"peak_rate: window_seconds must be > 0, "
                         f"got {window_seconds}")
    w_us = int(round(float(window_seconds) * 1e6))

    def proj(t: pa.Table) -> pa.Table:
        k = t.column(key).combine_chunks()
        ts = t.column(ts_col).combine_chunks()
        m = pc.and_(pc.is_valid(k), pc.is_valid(ts))
        return pa.table({key: k.filter(m),
                         "ts_us": pc.cast(pc.cast(ts.filter(m),
                                                  pa.timestamp("us")),
                                          pa.int64())})

    def scan(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({
                key: pa.array([], g.schema.field(key).type),
                "n_events": pa.array([], pa.int64()),
                "peak_rate": pa.array([], pa.int64())})
        g = g.sort_by([(key, "ascending"), ("ts_us", "ascending")])
        kv = g.column(key).combine_chunks()
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        n = len(ts)
        change = np.ones(n, dtype=bool)
        change[1:] = ~pc.equal(kv.slice(1), kv.slice(0, n - 1)) \
            .to_numpy(zero_copy_only=False)
        starts = np.where(change)[0]
        ends = np.append(starts[1:], n)
        keys_out, n_out, peak_out = [], [], []
        for s, e in zip(starts, ends):
            seg = ts[s:e]
            lo = np.searchsorted(seg, seg - w_us, side="left")
            hi = np.searchsorted(seg, seg, side="right")
            keys_out.append(kv[int(s)])
            n_out.append(int(e - s))
            peak_out.append(int((hi - lo).max()))
        return pa.table({
            key: pa.array([x.as_py() for x in keys_out],
                          g.schema.field(key).type),
            "n_events": pa.array(n_out, pa.int64()),
            "peak_rate": pa.array(peak_out, pa.int64())})

    if max_group_rows is None:
        max_group_rows = DEFAULT_MAX_GROUP_ROWS
    return bucketed_group_apply(
        ds.select_columns([key, ts_col]).map_batches(
            proj, batch_format="pyarrow"),
        [key], scan, num_buckets=num_buckets,
        max_group_rows=max_group_rows)


def rolling_zscore(ds, key: str, ts_col: str, val_col: str, *,
                   window: int, min_periods: int = 2,
                   out_col: str = "zscore",
                   num_buckets: int | None = None,
                   max_group_rows: int | None = None):
    """Trailing-window anomaly score along each key's time-ordered
    series: z = (x_t − mean(x_{t−w..t−1})) / std(x_{t−w..t−1}) — the
    current value judged against the PREVIOUS ``window`` observations
    only (never itself, so a spike can't mask itself), sample std.
    Rows with fewer than ``min_periods`` predecessors in the window, or
    zero predecessor variance, get a null score.  Null
    keys/timestamps/values are dropped.  Appends ``out_col``.

    Scale shape: combiner-less key exchange; per bucket one lexsort +
    pandas' cython grouped shift/rolling kernels — no per-row Python."""
    import numpy as np
    import pandas as pd

    from webval.exchange import DEFAULT_MAX_GROUP_ROWS, bucketed_group_apply

    if window < 1:
        raise ValueError(f"rolling_zscore: window must be >= 1, "
                         f"got {window}")
    if max_group_rows is None:
        max_group_rows = DEFAULT_MAX_GROUP_ROWS

    def proj(t: pa.Table) -> pa.Table:
        t = t.select([key, ts_col, val_col])
        m = pc.is_valid(t.column(key).combine_chunks())
        for c in (ts_col, val_col):
            v = t.column(c).combine_chunks()
            ok = pc.is_valid(v)
            if pa.types.is_floating(v.type):
                ok = pc.and_(ok, pc.invert(pc.is_nan(v)))
            m = pc.and_(m, ok)
        return t.filter(m)

    def scan(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.append_column(out_col, pa.array([], pa.float64()))
        g = g.sort_by([(key, "ascending"), (ts_col, "ascending")])
        kv = g.column(key).to_numpy(zero_copy_only=False)
        x = pd.Series(g.column(val_col).to_numpy(zero_copy_only=False)
                      .astype(np.float64))
        seg = np.cumsum(np.r_[False, kv[1:] != kv[:-1]])
        grp = x.groupby(seg, sort=False)
        roll = grp.rolling(window, min_periods=min_periods)
        mean_prev = roll.mean().droplevel(0).sort_index() \
            .groupby(seg, sort=False).shift(1)
        std_prev = roll.std(ddof=1).droplevel(0).sort_index() \
            .groupby(seg, sort=False).shift(1)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (x - mean_prev) / std_prev
        z = z.mask(~np.isfinite(z)).to_numpy()
        return g.append_column(out_col,
                               pa.array(z, pa.float64(),
                                        from_pandas=True))

    return bucketed_group_apply(
        ds.map_batches(proj, batch_format="pyarrow"), [key], scan,
        num_buckets=num_buckets, max_group_rows=max_group_rows)


def lag_autocorr(ds, key: str, ts_col: str, val_col: str, *,
                 lag: int = 1, num_buckets: int | None = None,
                 max_group_rows: int | None = None):
    """Per-key lag-``lag`` autocorrelation along the time-ordered value
    series: Pearson corr(x_t, x_{t+lag}) over CONSECUTIVE positions in
    each key's sorted series — near +1 means yesterday predicts today
    (trend/persistence), near 0 white noise, negative oscillation; the
    seasonality-persistence audit for per-key volume series.  Null
    keys/timestamps/values are dropped; keys with < lag+2 observations
    yield a null.  Returns Dataset[{key, n, corr}] with n the PAIR
    count.

    Scale shape: combiner-less key exchange builds (x_t, x_{t+lag})
    pairs per key with one lexsort + a slice (no per-row Python); the
    correlation itself rides :func:`webval.aggregates.grouped_corr`'s
    co-moment exchange."""
    import numpy as np

    from webval.aggregates import grouped_corr
    from webval.exchange import DEFAULT_MAX_GROUP_ROWS, bucketed_group_apply

    if lag < 1:
        raise ValueError(f"lag_autocorr: lag must be >= 1, got {lag}")
    if max_group_rows is None:
        max_group_rows = DEFAULT_MAX_GROUP_ROWS

    def proj(t: pa.Table) -> pa.Table:
        t = t.select([key, ts_col, val_col])
        m = pc.is_valid(t.column(key).combine_chunks())
        for c in (ts_col, val_col):
            v = t.column(c).combine_chunks()
            ok = pc.is_valid(v)
            if pa.types.is_floating(v.type):
                ok = pc.and_(ok, pc.invert(pc.is_nan(v)))
            m = pc.and_(m, ok)
        return t.filter(m)

    def pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({key: pa.array([], g.schema.field(key).type),
                             "x": pa.array([], pa.float64()),
                             "y": pa.array([], pa.float64())})
        g = g.sort_by([(key, "ascending"), (ts_col, "ascending")])
        kv = g.column(key).combine_chunks()
        x = g.column(val_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = len(x)
        if n <= lag:
            return pa.table({key: pa.array([], kv.type),
                             "x": pa.array([], pa.float64()),
                             "y": pa.array([], pa.float64())})
        same = pc.equal(kv.slice(lag), kv.slice(0, n - lag)) \
            .to_numpy(zero_copy_only=False)
        keep = pa.array(same)
        return pa.table({key: kv.slice(0, n - lag).filter(keep),
                         "x": pa.array(x[:n - lag][same]),
                         "y": pa.array(x[lag:][same])})

    paired = bucketed_group_apply(
        ds.map_batches(proj, batch_format="pyarrow"), [key], pairs,
        num_buckets=num_buckets, max_group_rows=max_group_rows)
    return grouped_corr(paired, key, "x", "y", num_buckets=num_buckets)

