"""The fused Schema.build stats pass (SURVEY.md §2-E, §3.2 P1).

rdv builds all component stats in one pass over an in-memory frame
[rdv:Schema.build → Stats.build, UNVERIFIED].  Here the same semantics run as:

    read_parquet → map_batches(partial per block, batch_format="pyarrow")
                 → tree-reduce merge of KB-sized pickled accumulators
                 → driver finalize → SchemaSpec

One accumulator row (~tens of KB: moments + t-digest + HLL + freq map per
column) is emitted per batch; merges are associative/commutative (property
tests in tests/test_sketches.py), so the tree shape is free.  At 10^12 docs
the partials dataset is ~1e6 tiny rows — the tree reduce collapses it with
fan-in 64 per level without ever concentrating data on the driver.

Also provides AggregateFnV2 wrappers so the same sketches slot into
``ds.groupby(key).aggregate(...)`` for per-lang / per-domain stats slices
(ray/data/aggregate.py:107 AggregateFnV2).
"""

from __future__ import annotations

import math
import pickle

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webval.schema import ColumnProfile, SchemaSpec
from webval.sketches import (
    CategoricalFreq,
    HyperLogLog,
    Moments,
    NumericHistogram,
    TDigest,
    hash64,
)

DEFAULT_HISTOGRAM_BINS = 32

_NUMERIC_KINDS = ("numeric", "timestamp")


def _kind_of_arrow(t: pa.DataType) -> str:
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        return "numeric"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "timestamp"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "categorical"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    return "skip"  # nested types profiled only via extensions


def infer_kinds(schema, overrides: dict[str, str] | None = None) -> dict[str, str]:
    """Map dtype → profile kind.  Accepts a pyarrow.Schema or Ray's Schema
    wrapper (whose per-column types are Arrow DataTypes for arrow-backed
    datasets and numpy dtypes for pandas-backed ones).  Strings default to
    categorical (the CategoricalFreq top-K guard bounds memory even at high
    cardinality); pass ``overrides={"text": "text"}`` for free-text columns
    so they get the length-distribution path instead.
    """
    import numpy as np

    kinds: dict[str, str] = {}
    if isinstance(schema, pa.Schema):
        items = [(f.name, f.type) for f in schema]
    else:  # ray.data Schema wrapper
        items = list(zip(schema.names, schema.types))
    for name, t in items:
        if isinstance(t, pa.DataType):
            kinds[name] = _kind_of_arrow(t)
        elif isinstance(t, np.dtype) or isinstance(t, type):
            dt = np.dtype(t) if not isinstance(t, np.dtype) else t
            if dt.kind in ("i", "u", "f"):
                kinds[name] = "numeric"
            elif dt.kind == "M":
                kinds[name] = "timestamp"
            elif dt.kind in ("U", "S", "O"):
                kinds[name] = "categorical"
            else:
                kinds[name] = "skip"
        else:
            kinds[name] = "skip"
    if overrides:
        kinds.update(overrides)
    return kinds


class ColumnAccumulator:
    """All sketches for one column; picklable; merge-safe."""

    __slots__ = ("name", "kind", "moments", "tdigest", "hll", "freq", "hist")

    def __init__(self, name: str, kind: str, delta: int = 300, hll_p: int = 14,
                 max_keys: int = 1024, edges=None):
        self.name = name
        self.kind = kind
        self.moments = Moments()
        self.tdigest = TDigest(delta=delta)
        self.hll = HyperLogLog(p=hll_p)
        self.freq = CategoricalFreq(max_keys=max_keys) if kind == "categorical" else None
        self.hist = NumericHistogram(edges) if edges is not None else None

    # -- update ------------------------------------------------------------
    def update(self, col: pa.ChunkedArray | pa.Array):
        n = len(col)
        if self.kind in ("numeric", "timestamp"):
            if self.kind == "timestamp":
                col = pc.cast(col, pa.int64())
            v = col.to_numpy(zero_copy_only=False).astype(np.float64)
            self.moments.add(v, n_total=n)
            self.tdigest.add(v)
            if self.hist is not None:
                self.hist.add(v)
            valid = v[~np.isnan(v)]
            if len(valid):
                self.hll.add_hashes(hash64(valid))
        elif self.kind == "categorical":
            # arrow-native: value_counts gives (distinct value, count) pairs
            # directly — no pandas hop in the hot profile pass
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            vc = col.value_counts()
            vals_f, cnts_f = vc.field("values"), vc.field("counts")
            valid = pc.is_valid(vals_f)
            self.freq.add_counts(
                [str(v) for v in vals_f.filter(valid).to_pylist()],
                cnts_f.filter(valid).to_numpy(zero_copy_only=False),
                col.null_count)
            nn = col.drop_null()
            if len(nn):
                self.hll.add_hashes(hash64(nn.to_numpy(zero_copy_only=False)))
            # length stats ride along on the numeric path
            ln = pc.utf8_length(col)
            lv = ln.to_numpy(zero_copy_only=False).astype(np.float64)
            self.moments.add(lv, n_total=n)
            self.tdigest.add(lv)
        elif self.kind == "text":
            ln = pc.utf8_length(col)
            lv = ln.to_numpy(zero_copy_only=False).astype(np.float64)
            self.moments.add(lv, n_total=n)
            self.tdigest.add(lv)
            if self.hist is not None:
                self.hist.add(lv)
            vals = col.drop_null()
            if len(vals):
                self.hll.add_hashes(hash64(vals.to_numpy(zero_copy_only=False)))
        elif self.kind == "binary":
            ln = pc.binary_length(col)
            lv = ln.to_numpy(zero_copy_only=False).astype(np.float64)
            self.moments.add(lv, n_total=n)
            self.tdigest.add(lv)
            vals = col.drop_null()
            if len(vals):
                h = hash64(np.asarray(vals.to_pylist(), dtype=object))
                self.hll.add_hashes(h)

    def merge(self, other: "ColumnAccumulator"):
        self.moments.merge(other.moments)
        self.tdigest.merge(other.tdigest)
        self.hll.merge(other.hll)
        if self.freq is not None and other.freq is not None:
            self.freq.merge(other.freq)
        if self.hist is not None and other.hist is not None:
            self.hist.merge(other.hist)
        return self

    def finalize(self) -> ColumnProfile:
        m = self.moments
        return ColumnProfile(
            name=self.name,
            kind=self.kind,
            count=m.total,
            null_count=m.null_count,
            distinct_est=float(self.hll.estimate()),
            moments=m.to_dict(),
            tdigest=self.tdigest.to_dict(),
            histogram=self.hist.to_dict() if self.hist is not None else None,
            frequencies=self.freq.to_dict() if self.freq is not None else None,
            hll=self.hll.to_dict(),
        )


def _partial_fn(kinds: dict[str, str], delta: int, hll_p: int, max_keys: int,
                edges: dict[str, list[float]] | None):
    def fn(batch: pa.Table) -> pa.Table:
        accs = {}
        for name, kind in kinds.items():
            if kind == "skip" or name not in batch.column_names:
                continue
            acc = ColumnAccumulator(
                name, kind, delta=delta, hll_p=hll_p, max_keys=max_keys,
                edges=(edges or {}).get(name))
            acc.update(batch.column(name))
            acc.tdigest._compress()
            accs[name] = acc
        return pa.table({"acc": pa.array([pickle.dumps(accs)], type=pa.large_binary())})
    return fn


def _merge_rows(batch: pa.Table) -> pa.Table:
    merged: dict[str, ColumnAccumulator] | None = None
    for b in batch.column("acc").to_pylist():
        accs = pickle.loads(b)
        if merged is None:
            merged = accs
        else:
            for k, a in accs.items():
                if k in merged:
                    merged[k].merge(a)
                else:
                    merged[k] = a
    return pa.table({"acc": pa.array([pickle.dumps(merged or {})], type=pa.large_binary())})


def tree_reduce_accumulators(partials, fan: int = 64) -> dict[str, ColumnAccumulator]:
    """Collapse a Dataset of pickled-accumulator rows with fan-in ``fan`` per
    level; the driver only ever unpickles ≤ fan rows.  Partials are tiny, so
    materialize() between levels is cheap and keeps the loop from re-executing
    the upstream pipeline (Datasets are lazy).
    """
    mat = partials.materialize()
    n = mat.count()
    while n > fan:
        mat = (mat.repartition(max(1, math.ceil(n / fan)))
                  .map_batches(_merge_rows, batch_format="pyarrow", batch_size=None)
                  .materialize())
        n = mat.count()
    merged: dict[str, ColumnAccumulator] = {}
    for row in mat.take_all():
        accs = pickle.loads(row["acc"])
        for k, a in accs.items():
            if k in merged:
                merged[k].merge(a)
            else:
                merged[k] = a
    return merged


def profile_dataset(ds, kinds: dict[str, str] | None = None, *,
                    name: str = "schema", delta: int = 300, hll_p: int = 14,
                    max_keys: int = 1024,
                    edges: dict[str, list[float]] | None = None,
                    batch_size: int | None = 8192) -> SchemaSpec:
    """P1 Schema.build: one fused stats pass + tree reduce → SchemaSpec.

    ``edges`` (col → histogram bin edges) enables the drift-histogram sketch
    in the same pass when baseline edges are already known; otherwise
    pipelines.build_schema runs a second cheap pass with edges derived from
    this pass's min/max.
    """
    if kinds is None:
        kinds = infer_kinds(ds.schema())
    used = [c for c, k in kinds.items() if k != "skip"]
    ds = ds.select_columns(used)
    partials = ds.map_batches(
        _partial_fn(kinds, delta, hll_p, max_keys, edges),
        batch_format="pyarrow", batch_size=batch_size)
    merged = tree_reduce_accumulators(partials)
    for c in used:
        # empty input → zero-count profiles rather than silently dropped columns
        if c not in merged:
            merged[c] = ColumnAccumulator(c, kinds[c], delta=delta, hll_p=hll_p,
                                          max_keys=max_keys, edges=(edges or {}).get(c))
    spec = SchemaSpec(name=name, built=True)
    spec.columns = [merged[c].finalize() for c in used]
    spec.infer_default_checks()
    return spec


def histogram_edges_from_profile(p: ColumnProfile, bins: int = DEFAULT_HISTOGRAM_BINS) -> list[float] | None:
    if p.moments is None:
        return None
    m = Moments.from_dict(p.moments)
    if not m.count or m.min == m.max:
        return None
    return list(np.linspace(m.min, m.max, bins + 1))


# ---------------------------------------------------------------------------
# AggregateFnV2 wrappers: sketches inside ds.groupby(key).aggregate(...)
# ---------------------------------------------------------------------------

try:
    from ray.data.aggregate import AggregateFnV2
    from ray.data.block import BlockAccessor

    class _SketchAgg(AggregateFnV2):
        """Base: accumulator = pickled sketch bytes (arrow-storable)."""

        def __init__(self, on: str, name: str):
            super().__init__(name, zero_factory=lambda: None, on=on, ignore_nulls=True)

        def _new(self):
            raise NotImplementedError

        def _update(self, sketch, values: np.ndarray):
            raise NotImplementedError

        def _final(self, sketch):
            raise NotImplementedError

        def aggregate_block(self, block) -> bytes:
            acc = BlockAccessor.for_block(block)
            col = acc.to_arrow().column(self._target_col_name)
            v = col.to_numpy(zero_copy_only=False)
            s = self._new()
            self._update(s, v)
            return pickle.dumps(s)

        def combine(self, cur, new):
            if cur is None:
                return new
            if new is None:
                return cur
            a, b = pickle.loads(cur), pickle.loads(new)
            a.merge(b)
            return pickle.dumps(a)

        def finalize(self, acc):
            if acc is None:
                return None
            return self._final(pickle.loads(acc))

    class TDigestQuantile(_SketchAgg):
        """groupby(...).aggregate(TDigestQuantile("col", q=0.5)) — mergeable
        quantile; contrast with Ray's built-in Quantile which accumulates raw
        value lists (O(n) memory, ray/data/aggregate.py zero_factory=list).
        """

        def __init__(self, on: str, q: float = 0.5, delta: int = 300,
                     alias_name: str | None = None):
            self._q = q
            self._delta = delta
            super().__init__(on, alias_name or f"p{int(q*100)}({on})")

        def _new(self):
            return TDigest(delta=self._delta)

        def _update(self, s, v):
            s.add(np.asarray(v, dtype=np.float64))

        def _final(self, s):
            return s.quantile(self._q)

    class ApproxDistinct(_SketchAgg):
        """groupby(...).aggregate(ApproxDistinct("col")) — HLL distinct."""

        def __init__(self, on: str, p: int = 14, alias_name: str | None = None):
            self._p = p
            super().__init__(on, alias_name or f"approx_distinct({on})")

        def _new(self):
            return HyperLogLog(p=self._p)

        def _update(self, s, v):
            vals = np.asarray(v)
            if vals.dtype.kind == "f":          # arrow nulls surface as NaN
                vals = vals[~np.isnan(vals)]
            elif vals.dtype.kind in "mM":       # datetime/timedelta: NaT
                vals = vals[~np.isnat(vals)]
            elif vals.dtype == object:          # strings: nulls are None
                import pandas as pd
                vals = vals[~pd.isna(vals)]     # C-loop mask, no Series hop
            if len(vals):
                s.add_hashes(hash64(vals))

        def _final(self, s):
            return float(s.estimate())

    class HeavyHitters(_SketchAgg):
        """groupby(...).aggregate(HeavyHitters("col", k=...)) — mergeable
        Misra-Gries worst-offenders summary.  Finalizes to a list of
        {value, lo, hi} dicts (lo = certified lower bound, hi = lo + err
        upper bound), heaviest first; exact (lo == hi == true count) when
        k ≥ the column's distinct count."""

        def __init__(self, on: str, k: int = 64, min_count: int = 1,
                     alias_name: str | None = None):
            self._k = k
            self._min_count = min_count
            super().__init__(on, alias_name or f"heavy_hitters({on})")

        def _new(self):
            from webval.sketches import MisraGries

            return MisraGries(k=self._k)

        def _update(self, s, v):
            s.add(np.asarray(v))

        def _final(self, s):
            return [{"value": v, "lo": int(lo), "hi": int(hi)}
                    for v, lo, hi in s.heavy_hitters(self._min_count)]

except ImportError:  # pragma: no cover - ray always present in sandbox
    TDigestQuantile = ApproxDistinct = HeavyHitters = None


# ---------------------------------------------------------------------------
# Co-moments: mergeable covariance / Pearson correlation (SURVEY.md §2-E
# extension — rdv has per-column stats only; cross-column linear dependence
# is the standard drift/quality companion)
# ---------------------------------------------------------------------------


def _co_moment_partial(x: str, y: str):
    """Per-batch (n, Σx, Σy, Σxx, Σyy, Σxy) over rows where BOTH are
    non-null — plain sums merge by addition (the corr formula is scale
    invariant, so sample-vs-population cancels at finalize)."""

    def fn(t: pa.Table) -> pa.Table:
        xa = t.column(x).to_numpy(zero_copy_only=False).astype(np.float64)
        ya = t.column(y).to_numpy(zero_copy_only=False).astype(np.float64)
        m = ~(np.isnan(xa) | np.isnan(ya))
        xa, ya = xa[m], ya[m]
        return pa.table({
            "n": pa.array([len(xa)], pa.int64()),
            "sx": [float(xa.sum())], "sy": [float(ya.sum())],
            "sxx": [float((xa * xa).sum())],
            "syy": [float((ya * ya).sum())],
            "sxy": [float((xa * ya).sum())],
        })

    return fn


def _corr_from_sums(n, sx, sy, sxx, syy, sxy) -> float | None:
    if n < 2:
        return None
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    if vx <= 0 or vy <= 0:
        return None  # zero variance -> corr undefined (SQL returns NULL)
    return (n * sxy - sx * sy) / math.sqrt(vx * vy)


def corr_of(ds, x: str, y: str) -> float | None:
    """Global Pearson correlation of two numeric columns: one streaming
    map pass emitting a 6-number partial per batch, merged on the driver
    (KB-sized — the big-map-tiny-rollup shape, never an AllToAll)."""
    parts = ds.map_batches(_co_moment_partial(x, y),
                           batch_format="pyarrow").materialize()
    tot = {k: 0.0 for k in ("n", "sx", "sy", "sxx", "syy", "sxy")}
    for b in parts.iter_batches(batch_format="pyarrow"):
        for k in tot:
            tot[k] += pc.sum(b.column(k)).as_py() or 0
    return _corr_from_sums(tot["n"], tot["sx"], tot["sy"],
                           tot["sxx"], tot["syy"], tot["sxy"])


def grouped_corr(ds, key: str, x: str, y: str, *,
                 num_buckets: int | None = None, out_col: str = "corr"):
    """Exact per-group Pearson correlation at any key cardinality: the
    co-moment sums ride the hash-bucket exchange (per-batch group_by
    combiner → bucketed sum), finalized vectorized per bucket.  Output:
    (key, n, corr) with corr null when n < 2 or a variance is zero."""
    from webval.exchange import bucketed_group_apply

    def partial(t: pa.Table) -> pa.Table:
        xa = t.column(x).to_numpy(zero_copy_only=False).astype(np.float64)
        ya = t.column(y).to_numpy(zero_copy_only=False).astype(np.float64)
        m = ~(np.isnan(xa) | np.isnan(ya))
        base = pa.table({
            key: t.column(key),
            "n": pa.array(m.astype(np.int64)),
            "sx": pa.array(np.where(m, xa, 0.0)),
            "sy": pa.array(np.where(m, ya, 0.0)),
            "sxx": pa.array(np.where(m, xa * xa, 0.0)),
            "syy": pa.array(np.where(m, ya * ya, 0.0)),
            "sxy": pa.array(np.where(m, xa * ya, 0.0)),
        })
        sums = ("n", "sx", "sy", "sxx", "syy", "sxy")
        out = base.group_by([key]).aggregate([(c, "sum") for c in sums])
        return out.select([key] + [f"{c}_sum" for c in sums]) \
                  .rename_columns([key, *sums])

    def final(g: pa.Table) -> pa.Table:
        sums = ("n", "sx", "sy", "sxx", "syy", "sxy")
        agg = g.group_by([key]).aggregate([(c, "sum") for c in sums])
        agg = agg.select([key] + [f"{c}_sum" for c in sums]) \
                 .rename_columns([key, *sums])
        n = agg.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        sx = agg.column("sx").to_numpy(zero_copy_only=False)
        sy = agg.column("sy").to_numpy(zero_copy_only=False)
        sxx = agg.column("sxx").to_numpy(zero_copy_only=False)
        syy = agg.column("syy").to_numpy(zero_copy_only=False)
        sxy = agg.column("sxy").to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            vx = n * sxx - sx * sx
            vy = n * syy - sy * sy
            r = (n * sxy - sx * sy) / np.sqrt(vx * vy)
        bad = (n < 2) | (vx <= 0) | (vy <= 0)
        return pa.table({
            key: agg.column(key),
            "n": pa.array(n.astype(np.int64)),
            out_col: pa.array(np.where(bad, np.nan, r), pa.float64(),
                              mask=bad),
        })

    return bucketed_group_apply(ds.select_columns([key, x, y]), [key],
                                final, num_buckets=num_buckets,
                                partial_fn=partial)


# ---------------------------------------------------------------------------
# Merging built schemas: build per shard (or per day), merge into the
# global spec — every profile sketch is associative, so shard-level P1
# outputs compose without touching raw data again.
# ---------------------------------------------------------------------------


def _profile_to_acc(p: ColumnProfile) -> ColumnAccumulator:
    from webval.sketches import CategoricalFreq, HyperLogLog

    acc = ColumnAccumulator(p.name, p.kind)
    if p.moments:
        acc.moments = Moments.from_dict(p.moments)
    if p.tdigest:
        acc.tdigest = TDigest.from_dict(p.tdigest)
    if p.hll:
        acc.hll = HyperLogLog.from_dict(p.hll)
    acc.freq = (CategoricalFreq.from_dict(p.frequencies)
                if p.frequencies else None)
    acc.hist = (NumericHistogram.from_dict(p.histogram)
                if p.histogram else None)
    return acc


def merge_specs(a: SchemaSpec, b: SchemaSpec, *,
                name: str | None = None) -> SchemaSpec:
    """Merge two BUILT schemas into the schema of the concatenated data —
    exact for moments/null-counts/frequencies/same-edge histograms, sketch-
    accurate for t-digest/HLL (the same merges the tree reduce applies, so
    merge_specs(build(A), build(B)) ≡ build(A ∪ B) up to sketch tolerance).

    Columns present in only one spec are carried through unchanged (their
    stats describe only the rows that had the column).  Histograms with
    differing bin edges cannot be merged exactly and are dropped from the
    merged profile (contrast falls back to its t-digest rebinning path).
    Default checks are re-inferred from the merged stats.
    """
    bmap = {p.name: p for p in b.columns}
    out: list[ColumnProfile] = []
    for p in a.columns:
        q = bmap.pop(p.name, None)
        if q is None:
            out.append(p)
            continue
        if q.kind != p.kind:
            raise ValueError(f"merge_specs: column {p.name!r} kind differs "
                             f"({p.kind} vs {q.kind})")
        acc = _profile_to_acc(p)
        qacc = _profile_to_acc(q)
        if (acc.hist is None) != (qacc.hist is None) or (
                acc.hist is not None
                and list(acc.hist.edges) != list(qacc.hist.edges)):
            acc.hist = qacc.hist = None
        if (acc.freq is None) != (qacc.freq is None):
            acc.freq = qacc.freq = None
        acc.merge(qacc)
        out.append(acc.finalize())
    out.extend(p for p in b.columns if p.name in bmap)
    spec = SchemaSpec(name=name or f"{a.name}+{b.name}", built=True)
    spec.columns = out
    spec.pre_stages = list(getattr(a, "pre_stages", []) or [])
    spec.infer_default_checks()
    return spec


def grouped_entropy(ds, key: str, val: str, *,
                    num_buckets: int | None = None,
                    max_group_rows: int | None = 4_000_000):
    """Shannon entropy (nats) of ``val``'s distribution within each
    ``key`` group — the class-balance diagnostic of a categorical column
    (0 = single value, ln(k) = uniform over k values).  Exact: one
    (key, val) count exchange, then a per-key −Σ p·ln p finalize; null
    vals are excluded like SQL GROUP BY drops them from counts... they
    are COUNTED as their own class by Arrow group_by, so both sides must
    agree — null keys AND null values are dropped explicitly to match the
    SQL twin's ``WHERE key IS NOT NULL AND val IS NOT NULL``.
    Output: (key, entropy float64).
    """
    from webval.exchange import bucketed_group_apply, grouped_agg

    proj = ds.map_batches(
        lambda t: t.select([key, val]).filter(
            pc.and_(pc.is_valid(t.column(key).combine_chunks()),
                    pc.is_valid(t.column(val).combine_chunks()))),
        batch_format="pyarrow")
    counts = grouped_agg(proj, [key, val], [(val, "count")],
                         num_buckets=num_buckets,
                         rename={f"{val}_count": "cnt"})

    def final(g: pa.Table) -> pa.Table:
        agg = g.group_by(key).aggregate([("cnt", "sum")])
        pos = pc.index_in(g.column(key).combine_chunks(),
                          value_set=agg.column(key).combine_chunks())
        n = pc.take(agg.column("cnt_sum"), pos) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        cnt = g.column("cnt").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        p = cnt / n
        term = p * np.log(p)
        out = pa.table({key: g.column(key), "__t__": pa.array(term)})
        ent = out.group_by(key).aggregate([("__t__", "sum")])
        return pa.table({key: ent.column(key),
                         "entropy": pc.negate(ent.column("__t___sum"))})

    # combiner-less second phase (a key's (key,val) count rows must all
    # land in one bucket): oversized keys get the named diagnostic
    return bucketed_group_apply(counts, [key], final,
                                num_buckets=num_buckets,
                                max_group_rows=max_group_rows)


def grouped_mode(ds, key: str, val: str, *,
                 num_buckets: int | None = None,
                 max_group_rows: int | None = 4_000_000):
    """Exact modal category of ``val`` within each ``key`` group — the
    profiling "most frequent value" column.  Ties broken by the SMALLEST
    value (deterministic; the SQL twin is row_number() OVER (ORDER BY cnt
    DESC, val) = 1).  Null keys and null values are dropped on both sides.

    Shape: one (key, val) count exchange (per-batch Arrow combiner), then a
    vectorized per-key argmax inside each bucket — a key's count rows are
    co-bucketed, so the winner is the first row per key after one sort.
    Output: (key, mode_<val>, n) with n the winner's count.
    """
    from webval.exchange import bucketed_group_apply, grouped_agg

    proj = ds.map_batches(
        lambda t: t.select([key, val]).filter(
            pc.and_(pc.is_valid(t.column(key).combine_chunks()),
                    pc.is_valid(t.column(val).combine_chunks()))),
        batch_format="pyarrow")
    counts = grouped_agg(proj, [key, val], [(val, "count")],
                         num_buckets=num_buckets,
                         rename={f"{val}_count": "cnt"})

    def final(g: pa.Table) -> pa.Table:
        empty = pa.table({key: pa.array([], g.schema.field(key).type),
                          f"mode_{val}": pa.array([], g.schema.field(val).type),
                          "n": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        g = g.sort_by([(key, "ascending"), ("cnt", "descending"),
                       (val, "ascending")])
        kk = g.column(key).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, kk[1:] != kk[:-1]])
        idx = pa.array(starts, pa.int64())
        return pa.table({key: g.column(key).take(idx),
                         f"mode_{val}": g.column(val).take(idx),
                         "n": pc.cast(g.column("cnt").take(idx), pa.int64())})

    return bucketed_group_apply(counts, [key], final,
                                num_buckets=num_buckets,
                                max_group_rows=max_group_rows)


def pairwise_corr(ds, cols: list[tuple[str, str]]):
    """Pearson correlation for each (x, y) column pair in ONE streaming
    pass: per-batch partial moment rows (n, Σx, Σy, Σx², Σy², Σxy per
    pair, rows where either side is null excluded pair-wise — SQL corr()
    semantics), finalized on the driver.  Returns a small pyarrow Table
    (col_x, col_y, n, corr); corr is None for degenerate pairs (n < 2 or
    zero variance).
    """
    pairs = [(x, y) for x, y in cols]
    need = sorted({c for p in pairs for c in p})

    def partial(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {}
        for i, (xc, yc) in enumerate(pairs):
            x = t.column(xc).combine_chunks().to_numpy(zero_copy_only=False)
            y = t.column(yc).combine_chunks().to_numpy(zero_copy_only=False)
            x = x.astype(np.float64, copy=False)
            y = y.astype(np.float64, copy=False)
            m = ~(np.isnan(x) | np.isnan(y))
            xm, ym = x[m], y[m]
            out[f"n_{i}"] = [int(m.sum())]
            out[f"sx_{i}"] = [float(xm.sum())]
            out[f"sy_{i}"] = [float(ym.sum())]
            out[f"sxx_{i}"] = [float((xm * xm).sum())]
            out[f"syy_{i}"] = [float((ym * ym).sum())]
            out[f"sxy_{i}"] = [float((xm * ym).sum())]
        return pa.table(out)

    parts = ds.map_batches(
        lambda t: partial(t.select(need)), batch_format="pyarrow")
    import math

    rows = {"col_x": [], "col_y": [], "n": [], "corr": []}
    # permissive concat: zero-row input blocks BYPASS the partial UDF and
    # keep the INPUT schema (r3s4 finding) — union their (absent) partial
    # columns as nulls, which the null-skipping sums below ignore
    batches = list(parts.iter_batches(batch_format="pyarrow",
                                      batch_size=None))
    agg = (pa.concat_tables(batches, promote_options="permissive")
           if batches else None)
    for i, (xc, yc) in enumerate(pairs):
        if agg is None or f"n_{i}" not in agg.column_names:
            n = 0
            sx = sy = sxx = syy = sxy = 0.0
        else:
            n = int(pc.sum(agg.column(f"n_{i}")).as_py() or 0)
            sx = float(pc.sum(agg.column(f"sx_{i}")).as_py() or 0.0)
            sy = float(pc.sum(agg.column(f"sy_{i}")).as_py() or 0.0)
            sxx = float(pc.sum(agg.column(f"sxx_{i}")).as_py() or 0.0)
            syy = float(pc.sum(agg.column(f"syy_{i}")).as_py() or 0.0)
            sxy = float(pc.sum(agg.column(f"sxy_{i}")).as_py() or 0.0)
        rows["col_x"].append(xc)
        rows["col_y"].append(yc)
        rows["n"].append(n)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        if n < 2 or vx <= 0 or vy <= 0:
            rows["corr"].append(None)
        else:
            rows["corr"].append((n * sxy - sx * sy) / math.sqrt(vx * vy))
    return pa.table({"col_x": pa.array(rows["col_x"]),
                     "col_y": pa.array(rows["col_y"]),
                     "n": pa.array(rows["n"], pa.int64()),
                     "corr": pa.array(rows["corr"], pa.float64())})


def grouped_higher_moments(ds, key: str, val: str, *,
                           num_buckets: int | None = None):
    """Per-group sample skewness and excess kurtosis (the distribution-
    shape diagnostics that complete the moments family above E1-E3):
    bias-corrected G1 / G2 with the same small-n and zero-variance NULL
    semantics as SQL ``skewness()`` / ``kurtosis()`` (NULL when n < 3 /
    n < 4 or the variance is 0).

    Shape: raw power sums (n, Σx, Σx², Σx³, Σx⁴) ride the hash-bucket
    exchange as per-batch Arrow combiner partials — mergeable by addition
    at any key cardinality — finalized vectorized per bucket.  Output:
    (key, n, skewness, kurtosis).
    """
    from webval.exchange import bucketed_group_apply

    sums = ("n", "s1", "s2", "s3", "s4")

    def partial(t: pa.Table) -> pa.Table:
        x = t.column(val).to_numpy(zero_copy_only=False).astype(np.float64)
        m = ~np.isnan(x)
        x = np.where(m, x, 0.0)
        x2 = x * x
        base = pa.table({
            key: t.column(key),
            "n": pa.array(m.astype(np.int64)),
            "s1": pa.array(x),
            "s2": pa.array(x2),
            "s3": pa.array(x2 * x),
            "s4": pa.array(x2 * x2),
        })
        out = base.group_by([key]).aggregate([(c, "sum") for c in sums])
        return out.select([key] + [f"{c}_sum" for c in sums]) \
                  .rename_columns([key, *sums])

    def final(g: pa.Table) -> pa.Table:
        agg = g.group_by([key]).aggregate([(c, "sum") for c in sums])
        agg = agg.select([key] + [f"{c}_sum" for c in sums]) \
                 .rename_columns([key, *sums])
        n = agg.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s1 = agg.column("s1").to_numpy(zero_copy_only=False)
        s2 = agg.column("s2").to_numpy(zero_copy_only=False)
        s3 = agg.column("s3").to_numpy(zero_copy_only=False)
        s4 = agg.column("s4").to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            mu = s1 / n
            m2 = s2 - n * mu * mu                       # Σ(x-µ)²
            m3 = s3 - 3 * mu * s2 + 2 * n * mu ** 3     # Σ(x-µ)³
            m4 = s4 - 4 * mu * s3 + 6 * mu * mu * s2 - 3 * n * mu ** 4
            g1 = (m3 / n) / (m2 / n) ** 1.5
            skew = g1 * np.sqrt(n * (n - 1)) / (n - 2)
            g2 = n * m4 / (m2 * m2) - 3.0
            kurt = ((n - 1.0) / ((n - 2) * (n - 3))) * ((n + 1) * g2 + 6.0)
        bad_sk = (n < 3) | (m2 <= 0)
        bad_ku = (n < 4) | (m2 <= 0)
        return pa.table({
            key: agg.column(key),
            "n": pa.array(n.astype(np.int64)),
            "skewness": pa.array(np.where(bad_sk, np.nan, skew),
                                 pa.float64(), mask=bad_sk),
            "kurtosis": pa.array(np.where(bad_ku, np.nan, kurt),
                                 pa.float64(), mask=bad_ku),
        })

    return bucketed_group_apply(ds.select_columns([key, val]), [key],
                                final, num_buckets=num_buckets,
                                partial_fn=partial)


def simpson_slopes(ds, stratum_col: str, x_col: str, y_col: str, *,
                   num_buckets: int | None = None,
                   all_label: str = "__all__") -> pa.Table:
    """Simpson's-paradox audit: the OLS slope of ``y ~ x`` inside each
    stratum AND pooled over all rows, from ONE pass of moment sums —
    flags strata whose slope sign CONTRADICTS the pooled slope (the
    aggregation-reversal trap that makes per-source conclusions flip
    when sources are mixed).  Null rows (any of the three columns)
    are dropped.  Returns a driver-small pa.Table
    ``(stratum, n, slope, sign_reversed)`` stratum-sorted, with the
    pooled row labeled ``all_label`` last (``sign_reversed`` false);
    slope is null when n < 2 or x has zero variance in the stratum.

    Scale shape: the per-batch projection emits (stratum, n, Σx, Σy,
    Σxx, Σxy) rows and the exchange sum-combines them — the shuffle
    moves one 6-number row per stratum per batch, never data rows; the
    pooled sums are the column sums of the stratum table (strata are
    audit-small by definition)."""
    import ray

    from webval.exchange import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        s = t.column(stratum_col).combine_chunks()
        xa = pc.cast(t.column(x_col).combine_chunks(), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        ya = pc.cast(t.column(y_col).combine_chunks(), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        m = pc.and_(pc.is_valid(s),
                    pa.array(~(np.isnan(xa) | np.isnan(ya))))
        keep = m.to_numpy(zero_copy_only=False)
        xa, ya = xa[keep], ya[keep]
        base = pa.table({
            "stratum": pc.cast(s.filter(m), pa.string()),
            "n": pa.array(np.ones(len(xa), np.int64)),
            "sx": pa.array(xa), "sy": pa.array(ya),
            "sxx": pa.array(xa * xa), "sxy": pa.array(xa * ya)})
        sums = ("n", "sx", "sy", "sxx", "sxy")
        agg = base.group_by(["stratum"]) \
                  .aggregate([(c, "sum") for c in sums])
        return agg.select(["stratum"] + [f"{c}_sum" for c in sums]) \
                  .rename_columns(["stratum", *sums])

    sums = ("n", "sx", "sy", "sxx", "sxy")
    agg = grouped_agg(
        ds.select_columns([stratum_col, x_col, y_col])
          .map_batches(partial, batch_format="pyarrow"),
        ["stratum"], [(c, "sum") for c in sums],
        rename={f"{c}_sum": c for c in sums}, num_buckets=num_buckets)
    blocks = [ray.get(r) for r in agg.materialize().to_arrow_refs()]
    blocks = [b for b in blocks if b.num_rows]
    if not blocks:
        return pa.table({"stratum": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "slope": pa.array([], pa.float64()),
                         "sign_reversed": pa.array([], pa.bool_())})
    t = pa.concat_tables(blocks).combine_chunks() \
        .sort_by([("stratum", "ascending")])

    def slope_of(n, sx, sy, sxx, sxy):
        den = n * sxx - sx * sx
        if n < 2 or den <= 0:
            return None
        return (n * sxy - sx * sy) / den

    cols = {c: t.column(c).to_numpy(zero_copy_only=False) for c in sums}
    slopes = [slope_of(cols["n"][i], cols["sx"][i], cols["sy"][i],
                       cols["sxx"][i], cols["sxy"][i])
              for i in range(t.num_rows)]
    pooled = slope_of(*(float(cols[c].sum()) for c in sums))
    rev = [s is not None and pooled is not None
           and (s > 0) != (pooled > 0) and s != 0 and pooled != 0
           for s in slopes]
    return pa.table({
        "stratum": pa.concat_arrays(
            [t.column("stratum").combine_chunks(),
             pa.array([all_label], pa.string())]),
        "n": pa.array(list(cols["n"].astype(np.int64))
                      + [int(cols["n"].sum())], pa.int64()),
        "slope": pa.array(slopes + [pooled], pa.float64()),
        "sign_reversed": pa.array(rev + [False], pa.bool_())})


def shrunk_group_means(ds, key: str, val: str, *,
                       prior_strength: float = 20.0,
                       num_buckets: int | None = None):
    """Empirical-Bayes (James-Stein-style) shrunk per-group means:

        shrunk = (Σx + k · global_mean) / (n + k)

    — the per-host quality score that does not let a host with 3
    sampled pages outrank one with 30,000 on noise.  ``prior_strength``
    k is the pseudo-count weight of the corpus-wide mean (the Dirichlet
    / beta-binomial smoothing constant); n → ∞ recovers the raw mean,
    n → 0 collapses to the prior.  Null keys/values are skipped.
    Returns Dataset[{key, n, mean, shrunk_mean}].

    Scale shape: ONE (count, sum) combiner exchange per key; the global
    mean comes off the same materialized exchange as two per-block
    scalar partials (no second input pass, no driver group table)."""
    from webval.exchange import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        k = t.column(key).combine_chunks()
        v = pc.cast(t.column(val).combine_chunks(), pa.float64())
        keep = pc.and_(pc.is_valid(k), pc.is_valid(v))
        t2 = pa.table({key: k.filter(keep), "s": v.filter(keep)})
        ones = pa.nulls(t2.num_rows, pa.int64()).fill_null(1)
        t2 = t2.append_column("n", ones)
        agg = t2.group_by([key]).aggregate([("s", "sum"), ("n", "sum")])
        return agg.rename_columns([key, "s", "n"])

    groups = grouped_agg(
        ds.select_columns([key, val]).map_batches(partial,
                                                  batch_format="pyarrow"),
        [key], [("s", "sum"), ("n", "sum")],
        rename={"s_sum": "s", "n_sum": "n"},
        num_buckets=num_buckets).materialize()

    def scal(t: pa.Table) -> pa.Table:
        return pa.table({
            "gs": pa.array([pc.sum(t.column("s")).as_py() or 0.0],
                           pa.float64()),
            "gn": pa.array([pc.sum(t.column("n")).as_py() or 0],
                           pa.int64())})

    import ray
    gs, gn = 0.0, 0
    for ref in groups.map_batches(scal, batch_format="pyarrow") \
            .materialize().to_arrow_refs():
        b = ray.get(ref)
        if b.num_rows:
            gs += b.column("gs").to_pylist()[0]
            gn += b.column("gn").to_pylist()[0]
    if gn == 0:
        import ray.data as rd

        return rd.from_arrow(pa.schema(
            [(key, pa.large_string()), ("n", pa.int64()),
             ("mean", pa.float64()),
             ("shrunk_mean", pa.float64())]).empty_table())
    gmean = gs / gn
    k = float(prior_strength)

    def finalize(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({key: t.column(key),
                         "n": t.column("n"),
                         "mean": pa.array(s / n),
                         "shrunk_mean": pa.array((s + k * gmean)
                                                 / (n + k))})

    return groups.map_batches(finalize, batch_format="pyarrow")


def grouped_pythagorean_means(ds, key: str, val: str, *,
                              num_buckets: int | None = None):
    """Arithmetic, geometric and harmonic means per group over the
    STRICTLY POSITIVE values of ``val`` (ln and 1/x demand it; zeros,
    negatives and nulls are excluded and counted) — the
    rate-vs-ratio-vs-level triple: harmonic for averaging rates
    (docs/sec across shards), geometric for multiplicative factors
    (compression ratios), arithmetic for levels.  AM ≥ GM ≥ HM always;
    a wide spread between them is itself a skew signal.  Returns
    Dataset[{key, n, n_excluded, arith_mean, geo_mean, harm_mean}].

    Scale shape: ONE (n, Σx, Σln x, Σ1/x) combiner exchange per key;
    the means are vectorized divisions over the group table."""
    from webval.exchange import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        k = t.column(key).combine_chunks()
        v = pc.cast(t.column(val).combine_chunks(), pa.float64())
        base = pc.and_(pc.is_valid(k), pc.is_valid(v))
        k, v = k.filter(base), v.filter(base)
        pos = pc.greater(v, pa.scalar(0.0)) \
            .to_numpy(zero_copy_only=False)
        vn = v.to_numpy(zero_copy_only=False)
        vp = np.where(pos, vn, 1.0)         # neutral fill for ln / 1/x
        tab = pa.table({
            key: k,
            "n": pa.array(pos.astype(np.int64)),
            "nx": pa.array((~pos).astype(np.int64)),
            "s": pa.array(np.where(pos, vn, 0.0)),
            "sl": pa.array(np.where(pos, np.log(vp), 0.0)),
            "si": pa.array(np.where(pos, 1.0 / vp, 0.0))})
        agg = tab.group_by([key]).aggregate(
            [("n", "sum"), ("nx", "sum"), ("s", "sum"), ("sl", "sum"),
             ("si", "sum")])
        return agg.rename_columns([key, "n", "nx", "s", "sl", "si"])

    groups = grouped_agg(
        ds.select_columns([key, val]).map_batches(partial,
                                                  batch_format="pyarrow"),
        [key], [("n", "sum"), ("nx", "sum"), ("s", "sum"),
                ("sl", "sum"), ("si", "sum")],
        rename={"n_sum": "n", "nx_sum": "nx", "s_sum": "s",
                "sl_sum": "sl", "si_sum": "si"},
        num_buckets=num_buckets)

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        s = t.column("s").to_numpy(zero_copy_only=False)
        sl = t.column("sl").to_numpy(zero_copy_only=False)
        si = t.column("si").to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            am = np.where(n > 0, s / n, np.nan)
            gm = np.where(n > 0, np.exp(sl / np.where(n > 0, n, 1.0)),
                          np.nan)
            hm = np.where(n > 0, n / si, np.nan)
        out = pa.table({key: t.column(key), "n": t.column("n"),
                        "n_excluded": t.column("nx"),
                        "arith_mean": pa.array(am),
                        "geo_mean": pa.array(gm),
                        "harm_mean": pa.array(hm)})
        for c in ("arith_mean", "geo_mean", "harm_mean"):
            col = out.column(c)
            out = out.set_column(
                out.column_names.index(c), c,
                pc.if_else(pc.greater(t.column("n"),
                                      pa.scalar(0, pa.int64())),
                           col, pa.scalar(None, pa.float64())))
        return out

    return groups.map_batches(finalize, batch_format="pyarrow")
