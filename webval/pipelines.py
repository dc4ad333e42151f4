"""End-to-end lifecycles (SURVEY.md §3.2): P1 build_schema, P2 check,
P3 contrast, plus the web-scale sibling pipelines — uniqueness (G2, combiner
+ shuffle), referential (D1, broadcast or hash-join), per-partition reports.

Everything is a lazy ray.data.Dataset pipeline; nothing materializes the
main input.  Only KB-sized accumulators, per-partition report rows, and
violation subsets ever concentrate.
"""

from __future__ import annotations

import math
import pickle

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webval.aggregates import (
    ColumnAccumulator,
    histogram_edges_from_profile,
    infer_kinds,
    profile_dataset,
)
from webval.checks import check_dataset, violations_of
from webval.drift import chi2_test, freq_vectors, js_divergence, ks_statistic, psi
from webval.schema import SchemaSpec
from webval.sketches import NumericHistogram

# ---------------------------------------------------------------------------
# P1: Schema.build
# ---------------------------------------------------------------------------


def build_schema(ds, kinds: dict[str, str] | None = None, *, name: str = "schema",
                 histogram: bool | str = "tdigest", bins: int = 32,
                 batch_size: int | None = 8192,
                 sample_fraction: float | None = None,
                 seed: int = 42,
                 sample_id_col: str | None = None) -> SchemaSpec:
    """P1: fused stats pass → SchemaSpec with binned distributions for
    drift (P3).

    ``histogram`` modes:
    - ``"tdigest"`` (default): derive histogram counts from the t-digest CDF
      at finalize — SINGLE pass over the data.  At 10^12 docs a second read
      is the single biggest avoidable cost; digest-derived bins are accurate
      to the digest's rank error, ample for JS/chi-square drift.
    - ``"exact"`` / True: second cheap pass with edges from the first pass's
      min/max — exact counts (the small-scale parity oracle).
    - False: no histograms.

    ``sample_fraction`` builds the schema on a sample (F3) — the standard
    move when exact counts aren't needed and the input is huge;
    counts/null-counts then describe the sample, sketches approximate the
    population.  With ``sample_id_col`` the sample is the membership-exact
    :func:`deterministic_sample` over that integer id (reproducible across
    runs/engines, SQL-expressible); otherwise a seeded ``random_sample``.
    """
    from webval.sketches import TDigest

    if kinds is None:
        kinds = infer_kinds(ds.schema())
    if sample_fraction is not None and sample_fraction < 1.0:
        if sample_id_col is not None:
            ds = deterministic_sample(ds, sample_id_col, sample_fraction)
        else:
            ds = ds.random_sample(sample_fraction, seed=seed)
    spec = profile_dataset(ds, kinds, name=name, batch_size=batch_size)
    if histogram is True:
        histogram = "exact"
    if histogram == "exact":
        edges: dict[str, list[float]] = {}
        for p in spec.columns:
            if p.kind in ("numeric", "timestamp", "text") and p.histogram is None:
                e = histogram_edges_from_profile(p, bins)
                if e is not None:
                    edges[p.name] = e
        if edges:
            hists = _histogram_pass(ds, kinds, edges, batch_size=batch_size)
            for p in spec.columns:
                if p.name in hists:
                    p.histogram = hists[p.name].to_dict()
    elif histogram == "tdigest":
        for p in spec.columns:
            if p.kind not in ("numeric", "timestamp", "text") or p.histogram:
                continue
            e = histogram_edges_from_profile(p, bins)
            if e is None or p.tdigest is None:
                continue
            td = TDigest.from_dict(p.tdigest)
            if not len(td.means):
                continue
            n = p.count - p.null_count
            cdf = td.cdf(np.asarray(e))
            h = NumericHistogram(e)
            h.counts = np.maximum(
                np.round(np.diff(cdf) * n).astype(np.int64), 0)
            p.histogram = h.to_dict()
    return spec


def _hist_values(batch: pa.Table, col: str, kind: str) -> np.ndarray:
    c = batch.column(col)
    if kind == "text" or pa.types.is_string(c.type) or pa.types.is_large_string(c.type):
        c = pc.utf8_length(c)
    elif pa.types.is_timestamp(c.type):
        c = pc.cast(c, pa.int64())
    return c.to_numpy(zero_copy_only=False).astype(np.float64)


def _histogram_pass(ds, kinds, edges: dict[str, list[float]],
                    batch_size: int | None = 8192) -> dict[str, NumericHistogram]:
    def partial(batch: pa.Table) -> pa.Table:
        hs = {c: NumericHistogram(e).add(_hist_values(batch, c, kinds.get(c, "numeric")))
              for c, e in edges.items() if c in batch.column_names}
        return pa.table({"acc": pa.array([pickle.dumps(hs)], type=pa.large_binary())})

    def merge_rows(batch: pa.Table) -> pa.Table:
        merged = None
        for b in batch.column("acc").to_pylist():
            hs = pickle.loads(b)
            if merged is None:
                merged = hs
            else:
                for k, h in hs.items():
                    merged[k].merge(h)
        return pa.table({"acc": pa.array([pickle.dumps(merged or {})], type=pa.large_binary())})

    partials = (ds.select_columns(list(edges))
                  .map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
                  .materialize())
    n = partials.count()
    while n > 64:
        partials = (partials.repartition(max(1, math.ceil(n / 64)))
                    .map_batches(merge_rows, batch_format="pyarrow", batch_size=None)
                    .materialize())
        n = partials.count()
    out: dict[str, NumericHistogram] = {}
    for row in partials.take_all():
        for k, h in pickle.loads(row["acc"]).items():
            out[k] = out[k].merge(h) if k in out else h
    return out


# ---------------------------------------------------------------------------
# P2: check
# ---------------------------------------------------------------------------


def check_pipeline(ds, schema: SchemaSpec, keep_cols: list[str] | None = None):
    """P2 core: returns {"verdicts": Dataset, "violations": Dataset} — both
    lazy; consume with write_parquet / aggregates.  Uniqueness and
    referential run as sibling pipelines (below) over the same input.
    """
    verdicts = check_dataset(ds, schema, keep_cols=keep_cols)
    return {"verdicts": verdicts, "violations": violations_of(verdicts)}


# ---------------------------------------------------------------------------
# G2: uniqueness with combiner pre-aggregation (skew-proof)
# ---------------------------------------------------------------------------


def uniqueness_violations(ds, col: str = "url", batch_size: int | None = 65536,
                          num_buckets: int | None = None):
    """Duplicate values of ``col`` → Dataset[{col, cnt}] with cnt > 1.

    Two-phase (SURVEY.md §2-G G2): phase 1 is a per-batch ``value_counts``
    combiner — a key occurring k times in a batch becomes ONE partial row, so
    the shuffle moves at most (#distinct-per-batch) rows and a hot key's
    reducer load is bounded by #batches, not #rows.  Phase 2 is a
    hash-bucket exchange (exchange.grouped_count) whose Arrow-native
    per-bucket group_by handles any key cardinality — Ray's own groupby
    walks group boundaries in Python and collapses at ~10k groups/s.
    """
    from webval.exchange import grouped_count

    return grouped_count(ds, col, min_count=2, num_buckets=num_buckets,
                         batch_size=batch_size)


# ---------------------------------------------------------------------------
# D1: referential integrity (orphan detection)
# ---------------------------------------------------------------------------


def referential_orphans(child, parent, child_key: str, parent_key: str,
                        mode: str = "auto", broadcast_limit: int = 2_000_000,
                        num_partitions: int = 32):
    """Child rows whose key has no match in the parent key set (anti-join).

    - broadcast (small parent): distinct parent keys built DISTRIBUTED
      (per-block pc.unique partials + fan-in merge tree,
      broadcast.distinct_array_from_dataset) → ray.put once → every map
      task filters with pc.is_in against the shared object (no shuffle).
    - bloom (huge parent): a Bloom filter of the parent keys (~1.2 B/key at
      1% fp) is broadcast instead of the raw key set — built distributed
      (per-block partial filters + tree OR-merge; the driver holds only the
      final sketch).  APPROXIMATE: a false positive marks an actual orphan
      as matched, so up to fp_rate of orphans are missed; rows emitted are
      guaranteed true orphans.  The scale path when even the distinct key
      set won't broadcast.
    - shuffle (large parent, exact): hash left-outer Dataset.join on the
      key, keep probe-null rows (ray/data/dataset.py Dataset.join).
    - auto: broadcast iff parent row count ≤ broadcast_limit, else shuffle.

    Null child keys are orphans in EVERY mode (a null never matches any
    parent key — same convention as the SQL left-join oracle).
    """
    import ray

    if mode == "auto":
        mode = "broadcast" if parent.count() <= broadcast_limit else "shuffle"
    if mode == "bloom":
        from webval.broadcast import bloom_from_dataset
        from webval.sketches import hash64

        cap = max(1024, parent.count())
        bloom = bloom_from_dataset(parent, parent_key, cap, fp_rate=0.01)
        bloom_ref = ray.put(bloom)

        def drop_probable_matches(batch: pa.Table) -> pa.Table:
            bf = ray.get(bloom_ref)
            col = batch.column(child_key).combine_chunks()
            vals = col.to_numpy(zero_copy_only=False)
            hit = bf.contains_hashes(hash64(vals))
            isnull = np.asarray(pc.is_null(col), dtype=bool)
            keep = ~hit | isnull  # null keys are orphans (all modes agree)
            return batch.filter(pa.array(keep))

        return child.map_batches(drop_probable_matches, batch_format="pyarrow",
                                 batch_size=None)
    if mode == "broadcast":
        from webval.broadcast import distinct_array_from_dataset

        keys = distinct_array_from_dataset(parent, parent_key)
        key_ref = ray.put(keys)

        def drop_matches(batch: pa.Table) -> pa.Table:
            key_arr = ray.get(key_ref)
            m = pc.is_in(batch.column(child_key), value_set=key_arr)
            return batch.filter(pc.invert(pc.fill_null(m, False)))

        # batch_size=None → whole blocks: pc.is_in builds a hash index over
        # the parent keys on every call, so fewer+bigger batches matter
        return child.map_batches(drop_matches, batch_format="pyarrow",
                                 batch_size=None)

    marker = "__parent_marker__"
    parent_keys = (parent.select_columns([parent_key])
                   .map_batches(lambda t: pa.table({
                       parent_key: t.column(parent_key).combine_chunks().unique(),
                   }), batch_format="pyarrow")
                   .map_batches(lambda t: t.append_column(
                       marker, pa.array(np.ones(t.num_rows, dtype=np.int8))),
                       batch_format="pyarrow"))
    joined = child.join(parent_keys, join_type="left_outer",
                        num_partitions=num_partitions,
                        on=(child_key,), right_on=(parent_key,))
    return (joined.map_batches(
                lambda t: t.filter(pc.is_null(t.column(marker))),
                batch_format="pyarrow")
                  .drop_columns([marker]))


# ---------------------------------------------------------------------------
# Per-partition profiles → partition report (pass/fail + drift)
# ---------------------------------------------------------------------------


def partition_profiles(ds, part_col: str, kinds: dict[str, str] | None = None,
                       edges: dict[str, list[float]] | None = None,
                       batch_size: int | None = 8192):
    """One {col: ColumnAccumulator} per value of ``part_col``.

    map_batches splits each batch by partition locally and emits one pickled
    accumulator row per (batch, part) — then a groupby(part).map_groups
    merges.  Shuffle volume = #batches × #parts-touched-per-batch tiny rows.
    """
    if kinds is None:
        kinds = {c: k for c, k in infer_kinds(ds.schema()).items()
                 if c != part_col}

    def partial(batch: pa.Table) -> pa.Table:
        parts, accs = [], []
        pcol = batch.column(part_col).to_numpy(zero_copy_only=False)
        for pv in np.unique(pcol):
            sub = batch.filter(pc.equal(batch.column(part_col), pa.scalar(pv)))
            d = {}
            for c, kind in kinds.items():
                if kind == "skip" or c not in sub.column_names:
                    continue
                a = ColumnAccumulator(c, kind, edges=(edges or {}).get(c))
                a.update(sub.column(c))
                a.tdigest._compress()
                d[c] = a
            parts.append(pv)
            accs.append(pickle.dumps(d))
        return pa.table({part_col: pa.array(parts),
                         "acc": pa.array(accs, type=pa.large_binary())})

    def merge_group(g: pa.Table) -> pa.Table:
        merged: dict[str, ColumnAccumulator] = {}
        for b in g.column("acc").to_pylist():
            for k, a in pickle.loads(b).items():
                if k in merged:
                    merged[k].merge(a)
                else:
                    merged[k] = a
        return pa.table({part_col: g.column(part_col).slice(0, 1),
                         "acc": pa.array([pickle.dumps(merged)], type=pa.large_binary())})

    def merge_bucket(g: pa.Table) -> pa.Table:
        # one hash bucket may hold several partitions' partials — merge each
        # partition's accumulators separately (scale-robust at 1e5+ parts,
        # where Ray's own groupby boundary walk would dominate)
        out_parts, out_accs = [], []
        pcol = g.column(part_col).to_numpy(zero_copy_only=False)
        for pv in np.unique(pcol):
            sub = g.filter(pc.equal(g.column(part_col), pa.scalar(pv)))
            merged = merge_group(sub)
            out_parts.append(merged.column(part_col)[0].as_py())
            out_accs.append(merged.column("acc")[0].as_py())
        return pa.table({part_col: pa.array(out_parts),
                         "acc": pa.array(out_accs, type=pa.large_binary())})

    from webval.exchange import bucketed_group_apply

    cols = [part_col] + [c for c, k in kinds.items() if k != "skip"]
    partials = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size)
    return bucketed_group_apply(partials, [part_col], merge_bucket)


def partition_report_dataset(ds, schema: SchemaSpec, part_col: str = "part_id",
                             *, max_js: float = 0.1, min_chi2_p: float = 0.001,
                             drift_cols: list[str] | None = None):
    """Per-partition pass/fail rows (BASELINE.json north_rule: "matching
    the reference's per-partition pass/fail") as a DATASET: null-rate
    checks evaluated per partition, drift (JS + chi-square) of each
    histogrammed column vs the baseline schema.

    The per-partition evaluation runs INSIDE map_batches over the profile
    accumulators (baseline schema broadcast via closure — it is KBs), so
    the driver never touches the partition rows; at 10^6+ partitions
    consume with ``.write_parquet`` instead of collecting.

    ``drift_cols`` selects which columns are drift-checked (default: every
    histogrammed/categorical column).  Columns that legitimately correlate
    with the partition key (ingestion timestamps, sequential ids) should be
    excluded — they always "drift" per partition by construction.
    """
    kinds = {p.name: p.kind for p in schema.columns}
    edges = {p.name: p.histogram["edges"] for p in schema.columns
             if p.histogram is not None
             and (drift_cols is None or p.name in drift_cols)}
    prof = partition_profiles(ds, part_col, kinds, edges)
    null_checks = {c.column: c.params["max_rate"]
                   for c in schema.checks if c.kind == "null_rate"}
    base_cols = {p.name: p for p in schema.columns}

    def evaluate(batch: pa.Table) -> pa.Table:
        rows = []
        for pv, blob in zip(batch.column(part_col).to_pylist(),
                            batch.column("acc").to_pylist()):
            accs: dict[str, ColumnAccumulator] = pickle.loads(blob)
            rec: dict = {part_col: pv}
            any_col = next(iter(accs.values()))
            rec["rows"] = any_col.moments.total
            ok = True
            worst_js = 0.0
            for name, acc in accs.items():
                nr = acc.moments.null_rate
                if name in null_checks:
                    rec[f"null_rate_{name}"] = nr
                    if nr > null_checks[name]:
                        ok = False
                base = base_cols[name]
                if acc.hist is not None and base.histogram is not None:
                    bh = NumericHistogram.from_dict(base.histogram)
                    js = js_divergence(acc.hist.probs(), bh.probs())
                    _, p = chi2_test(
                        np.concatenate([[acc.hist.underflow], acc.hist.counts,
                                        [acc.hist.overflow]]),
                        bh.probs())
                    rec[f"js_{name}"] = js
                    rec[f"chi2_p_{name}"] = p
                    worst_js = max(worst_js, js)
                    if js > max_js or p < min_chi2_p:
                        ok = False
                if (acc.freq is not None and base.frequencies is not None
                        and (drift_cols is None or name in drift_cols)):
                    a, b = freq_vectors(acc.freq.counts,
                                        base.frequencies["counts"])
                    rec[f"js_{name}"] = js_divergence(a, b)
                    worst_js = max(worst_js, rec[f"js_{name}"])
                    if rec[f"js_{name}"] > max_js:
                        ok = False
            rec["drifted"] = worst_js > max_js
            rec["pass"] = ok
            rows.append(rec)
        import pandas as pd

        return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)

    return prof.map_batches(evaluate, batch_format="pyarrow")


def partition_report(ds, schema: SchemaSpec, part_col: str = "part_id",
                     *, max_js: float = 0.1, min_chi2_p: float = 0.001,
                     drift_cols: list[str] | None = None):
    """partition_report_dataset collected to one sorted pandas DataFrame —
    the small-scale convenience form (one tiny row per partition)."""
    out = partition_report_dataset(ds, schema, part_col, max_js=max_js,
                                   min_chi2_p=min_chi2_p,
                                   drift_cols=drift_cols)
    df = out.to_pandas()
    return df.sort_values(part_col).reset_index(drop=True)


# ---------------------------------------------------------------------------
# P3: contrast of two built schemas (pure driver-side, mirrors rdv)
# ---------------------------------------------------------------------------


def contrast(a: SchemaSpec, b: SchemaSpec, *, max_js: float = 0.1,
             min_chi2_p: float = 0.001, max_psi: float = 0.25,
             max_ks: float = 0.2) -> dict:
    """rdv Schema.contrast: pairwise per-column distance between two built
    schemas + thresholds → report dict (JSON-serializable).  No raw data
    touched — only stats objects."""
    report: dict = {"schema_a": a.name, "schema_b": b.name, "columns": {}, "drifted": False}
    names_b = {p.name for p in b.columns}
    for p in a.columns:
        if p.name not in names_b:
            continue
        q = b.column(p.name)
        col: dict = {}
        if p.histogram and q.histogram and p.histogram["edges"] == q.histogram["edges"]:
            ha, hb = NumericHistogram.from_dict(p.histogram), NumericHistogram.from_dict(q.histogram)
            col["js"] = js_divergence(ha.probs(), hb.probs())
            col["psi"] = psi(ha.probs(), hb.probs())
            col["ks"] = ks_statistic(ha.probs(), hb.probs())
            stat, pv = chi2_test(
                np.concatenate([[hb.underflow], hb.counts, [hb.overflow]]), ha.probs())
            col["chi2_stat"], col["chi2_p"] = stat, pv
        elif p.tdigest and q.tdigest and p.kind in ("numeric", "timestamp", "text"):
            # independently built schemas rarely share bin edges — rebin both
            # digests onto the baseline's edges via the t-digest CDF
            from webval.sketches import TDigest
            ta, tb = TDigest.from_dict(p.tdigest), TDigest.from_dict(q.tdigest)
            if len(ta.means) and len(tb.means):
                edges = (np.asarray(p.histogram["edges"]) if p.histogram
                         else np.linspace(min(ta.min, tb.min), max(ta.max, tb.max), 33))
                edges = np.concatenate([[-np.inf], edges, [np.inf]])
                pa_, pb_ = np.diff(ta.cdf(edges[1:-1])), np.diff(tb.cdf(edges[1:-1]))
                pa_ = np.concatenate([[ta.cdf(edges[1:2])[0]], pa_,
                                      [1.0 - ta.cdf(edges[-2:-1])[0]]])
                pb_ = np.concatenate([[tb.cdf(edges[1:2])[0]], pb_,
                                      [1.0 - tb.cdf(edges[-2:-1])[0]]])
                col["js"] = js_divergence(pa_, pb_)
                col["psi"] = psi(pa_, pb_)
                col["ks"] = ks_statistic(pa_, pb_)
                n_b = q.count - q.null_count
                stat, pv = chi2_test(pb_ * n_b, pa_)
                col["chi2_stat"], col["chi2_p"] = stat, pv
        if p.frequencies and q.frequencies:
            va, vb = freq_vectors(p.frequencies["counts"], q.frequencies["counts"])
            col["js"] = js_divergence(va, vb)
            col["psi"] = psi(va, vb)
            stat, pv = chi2_test(vb, va)
            col["chi2_stat"], col["chi2_p"] = stat, pv
        col["null_rate_a"] = p.null_rate
        col["null_rate_b"] = q.null_rate
        col["mean_shift"] = (
            None if not (p.moments and q.moments and p.moments["count"] and q.moments["count"])
            else (q.moments["sum"] / q.moments["count"]) - (p.moments["sum"] / p.moments["count"]))
        col["drifted"] = bool(col.get("js", 0.0) > max_js
                              or col.get("chi2_p", 1.0) < min_chi2_p
                              or col.get("psi", 0.0) > max_psi
                              or col.get("ks", 0.0) > max_ks)
        report["columns"][p.name] = col
        report["drifted"] = report["drifted"] or col["drifted"]
    return report


# ---------------------------------------------------------------------------
# Flagship LLM-data-curation composite (r3): the operators composed the way
# a training-data pipeline actually runs them.  Everything stays one lazy
# Dataset — filter and dedup prune before the token pass does its work.
# ---------------------------------------------------------------------------


def curation_pipeline(ds, id_col: str, text_col: str = "text"):
    """C4-style quality filter → exact dedup (min-id keeper per normalized
    text) → token counting, as one streaming pipeline.  Returns the lazy
    curated Dataset with ``word_count``/``mean_word_len``/``symbol_ratio``
    (from the filter) and ``ws_tokens``/``bpeish_tokens`` appended.

    Every stage is individually oracle-checked (c4_quality,
    exact_dup_groups, token_totals); the curation_e2e query checks the
    COMPOSITION against a single SQL twin."""
    from webval.dedup import exact_dedup
    from webval.textstats import add_token_counts, c4_quality_filter

    kept = c4_quality_filter(ds, text_col)
    deduped = exact_dedup(kept, id_col, text_col)
    return add_token_counts(deduped, text_col)


def deterministic_sample(ds, id_col: str, fraction: float, *,
                         modulus: int = 2**32, multiplier: int = 2654435761):
    """Reproducible hash-based row sample: keep rows where the Knuth
    multiplicative hash of the integer ``id_col`` lands under
    ``fraction * modulus``.  Unlike ``ds.random_sample`` this is a pure
    function of the data — identical membership across runs, parallelism
    levels, cluster sizes, and even engines (the same predicate is
    ANSI-SQL-expressible: ``(id * 2654435761) % 4294967296 < threshold``),
    which is what makes training-data subsamples auditable.  A plain map
    filter: no shuffle, no driver state, applies per-stratum when composed
    after a group key (proportional stratified sampling)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"deterministic_sample: fraction={fraction}")
    threshold = np.uint64(int(fraction * modulus))
    mult = np.uint64(multiplier)
    mod = np.uint64(modulus)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        ids = ids.astype(np.uint64, copy=False)
        with np.errstate(over="ignore"):
            h = (ids * mult) % mod
        return batch.filter(pa.array(h < threshold))

    return ds.map_batches(keep, batch_format="pyarrow")


def assign_split(ds, id_col: str, *,
                 fractions: tuple = (0.9, 0.05, 0.05),
                 names: tuple = ("train", "val", "test"),
                 out_col: str = "split",
                 modulus: int = 2**32, multiplier: int = 2654435761):
    """Deterministic train/val/test split assignment by the same Knuth
    multiplicative hash as :func:`deterministic_sample`: the hash of
    ``id_col`` is cut at the cumulative ``fractions`` boundaries.  A pure
    per-row function — membership is stable across runs, parallelism and
    engines (the identical CASE predicate is ANSI-SQL), disjoint and
    exhaustive by construction, so a 100-TB corpus can be re-split
    identically forever.  Appends ``out_col``; no shuffle.

    ``id_col`` must be non-null, non-negative AND below
    ``2**63 // multiplier`` (~3.47e9 at the default multiplier) — all
    enforced with named errors: a null id has no hash, a negative one
    wraps differently in uint64 arithmetic than in SQL's signed modulo,
    and an id at or above the bound overflows SQL BIGINT in
    ``id * multiplier`` (DuckDB errors loudly; wrapping engines like Spark
    diverge SILENTLY via signed modulo — ADVICE r3), so the cross-engine
    membership claim only holds under the bound.  Corpora with wider ids
    should pre-fold them (e.g. ``id % 2**32``) on BOTH engines first."""
    if len(fractions) != len(names) or abs(sum(fractions) - 1.0) > 1e-9:
        raise ValueError(f"assign_split: fractions {fractions} must match "
                         f"names {names} and sum to 1")
    cuts = np.cumsum([0.0] + list(fractions)) * modulus
    bounds = [np.uint64(int(c)) for c in cuts]
    bounds[-1] = np.uint64(modulus)          # guard fp short-fall at 1.0
    mult = np.uint64(multiplier)
    mod = np.uint64(modulus)

    def tag(batch: pa.Table) -> pa.Table:
        col = batch.column(id_col)
        if col.null_count > 0:
            raise ValueError(f"assign_split: {id_col} contains nulls — a "
                             "null id has no deterministic split")
        ids = col.to_numpy(zero_copy_only=False)
        if np.issubdtype(ids.dtype, np.signedinteger) and (ids < 0).any():
            raise ValueError(f"assign_split: {id_col} contains negative "
                             "ids — uint64 wrap diverges from SQL's "
                             "signed modulo")
        sql_bound = (1 << 63) // int(mult)
        if (ids.astype(np.uint64, copy=False) >= np.uint64(sql_bound)).any():
            raise ValueError(
                f"assign_split: {id_col} contains ids >= {sql_bound} "
                f"(2**63 // {int(mult)}), where id * multiplier overflows "
                "SQL BIGINT — numpy wraps mod 2**64 while SQL engines "
                "error or silently diverge; fold ids (e.g. id % 2**32) "
                "on both engines first")
        with np.errstate(over="ignore"):
            h = (ids * mult) % mod
        conds = [(h >= bounds[i]) & (h < bounds[i + 1])
                 for i in range(len(names))]
        lab = np.select(conds, list(names))
        return batch.append_column(out_col, pa.array(lab.astype(object)))

    return ds.map_batches(tag, batch_format="pyarrow")


def assign_split_grouped(ds, id_col: str, key_col: str, *,
                         canon_col: str = "canon_id",
                         num_buckets: int | None = None,
                         max_group_rows: int | None = 1_000_000,
                         **split_kwargs):
    """Leakage-safe train/val/test split: the assignment UNIT is the
    ``key_col`` GROUP (e.g. normalized text — an exact-dup cluster), not
    the row, so duplicate documents can never straddle the train/test
    boundary (the split-contamination failure mode the C4/Pile dedup
    papers fix).  Each group's rows are co-located through ONE hash
    exchange, the minimum ``id_col`` becomes the group's canonical id,
    and :func:`assign_split`'s Knuth-hash CASE predicate runs on that
    canonical id — split membership stays a pure, engine-portable
    function of (group min-id, fractions).

    Appends ``canon_col`` and the split column; no second shuffle (the
    split tag is a stateless map over the exchanged output)."""
    from webval.exchange import bucketed_group_apply

    def canon_of(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.append_column(canon_col, pa.array([], pa.int64()))
        m = g.group_by([key_col]).aggregate([(id_col, "min")])
        canon = m.column(f"{id_col}_min").combine_chunks().take(
            pc.index_in(g.column(key_col),
                        value_set=m.column(key_col).combine_chunks()))
        return g.append_column(canon_col,
                               pc.cast(canon, pa.int64()))

    keyed = bucketed_group_apply(ds, [key_col], canon_of,
                                 num_buckets=num_buckets,
                                 max_group_rows=max_group_rows)
    return assign_split(keyed, canon_col, **split_kwargs)


def stratified_sample(ds, id_col: str, group_col: str,
                      fractions: dict, *, default: float = 0.0,
                      modulus: int = 2**32, multiplier: int = 2654435761):
    """Per-stratum deterministic hash sample: each ``group_col`` value
    gets its own keep-fraction (e.g. downsample boilerplate-heavy 'en'
    to 10% while keeping all 'nl').  Same Knuth multiplicative hash and
    auditability properties as ``deterministic_sample`` — membership is a
    pure function of (id, group fraction), identical at any parallelism
    and expressible in ANSI SQL as a CASE over the same predicate.  A
    stateless map filter: the per-group thresholds ride the closure
    (tiny), no shuffle."""
    for g, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"stratified_sample: fraction {f} for {g!r}")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"stratified_sample: default={default}")
    mult = np.uint64(multiplier)
    mod = np.uint64(modulus)
    groups = list(fractions)
    thresholds = np.array([int(fractions[g] * modulus) for g in groups],
                          dtype=np.uint64)
    default_thr = np.uint64(int(default * modulus))

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        ids = ids.astype(np.uint64, copy=False)
        with np.errstate(over="ignore"):
            h = (ids * mult) % mod
        idx = pc.fill_null(pc.index_in(batch.column(group_col),
                                       value_set=pa.array(groups)), -1)
        idx = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        known = idx >= 0
        thr = np.full(batch.num_rows, default_thr, dtype=np.uint64)
        thr[known] = thresholds[idx[known]]
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def fixed_size_sample(ds, id_col: str, n: int, *, fan: int = 64,
                      modulus: int = 2**32, multiplier: int = 2654435761):
    """Exactly-n uniform deterministic sample: the n rows with the
    smallest Knuth multiplicative hash of ``id_col`` (ties broken by id).
    Unlike fraction sampling the output size is exact, and membership is
    still a pure function of the ids — reproducible across runs,
    parallelism, and engines (SQL twin: ORDER BY hash, id LIMIT n).

    Scale shape: each batch pre-reduces to its local top-n (combiner),
    then a fan-in-``fan`` tree of top-n reductions collapses the partials
    — no global sort, driver never holds more than the final n rows'
    blocks.  Returns a Dataset of whole input rows (plus nothing else).
    """
    if n <= 0:
        raise ValueError(f"fixed_size_sample: n={n}")
    mult, mod = np.uint64(multiplier), np.uint64(modulus)

    def topn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.uint64, copy=False)
        with np.errstate(over="ignore"):
            h = (ids * mult) % mod
        # full (h, id) lexsort per batch keeps hash-collision tie-breaks
        # identical to the SQL twin's ORDER BY hash, id
        order = np.lexsort((ids, h))[:min(n, len(h))]
        return batch.take(pa.array(order, pa.int64()))

    parts = ds.map_batches(topn, batch_format="pyarrow").materialize()
    while parts.num_blocks() > 1:
        import math as _math
        parts = (parts.repartition(
            max(1, _math.ceil(parts.num_blocks() / fan)))
            .map_batches(topn, batch_format="pyarrow", batch_size=None)
            .materialize())
    return parts


def iqr_outliers(ds, key: str, value_col: str, *, k_num: int = 3,
                 k_den: int = 2, num_buckets: int | None = None):
    """Per-group statistical outlier rows by the Tukey IQR fence:
    x is an outlier of its ``key`` group iff

        x < Q1 - (k_num/k_den)·IQR   or   x > Q3 + (k_num/k_den)·IQR

    with Q1/Q3 the EXACT discrete quartiles (quantile_disc semantics).
    The comparison is evaluated multiplied through by ``k_den`` so integer
    columns stay in exact int64 arithmetic — bit-identical to a SQL twin
    regardless of float rounding (k=3/2 default: 2x < 2·Q1 − 3·IQR).

    Validation-tier shape (an rdv-style anomaly surface the reference
    lacks): the quartile table is one row per group — computed through the
    (key, value)-only quantile exchange, then broadcast ONCE via ray.put;
    flagging is a stateless map over the full rows.  Null values and keys
    absent from the quartile table (all-null groups) are never outliers.
    """
    import ray

    from webval.rank import grouped_exact_quantiles

    bounds_ds = grouped_exact_quantiles(
        ds, key, value_col, {"q1": 0.25, "q3": 0.75},
        num_buckets=num_buckets)
    blocks = [ray.get(r) for r in bounds_ds.materialize().to_arrow_refs()]
    blocks = [b for b in blocks if b.num_rows]
    if not blocks:
        return ds.limit(0)
    bounds_ref = ray.put(pa.concat_tables(blocks).combine_chunks())

    def flag(batch: pa.Table) -> pa.Table:
        b = ray.get(bounds_ref)
        pos = pc.index_in(batch.column(key).combine_chunks(),
                          value_set=b.column(key))
        q1 = pc.take(b.column("q1"), pos)
        q3 = pc.take(b.column("q3"), pos)
        iqr = pc.subtract(q3, q1)
        lo = pc.subtract(pc.multiply(q1, k_den), pc.multiply(iqr, k_num))
        hi = pc.add(pc.multiply(q3, k_den), pc.multiply(iqr, k_num))
        xs = pc.multiply(batch.column(value_col).combine_chunks(), k_den)
        m = pc.or_(pc.less(xs, lo), pc.greater(xs, hi))
        return batch.filter(pc.fill_null(m, False))

    return ds.map_batches(flag, batch_format="pyarrow")


def check_pass_rates(ds, schema: SchemaSpec, *,
                     batch_size: int | None = 8192) -> pa.Table:
    """Expectation-suite summary (the aggregate face of rdv's Schema.check
    tags): one row per row-level check with its failure count and rate over
    the whole dataset.

    Scale shape: each batch reduces to ONE partial-counts row (k+1 int64s),
    the partials materialize, and the driver sums per-block scalars — the
    big-map-then-tiny-rollup pattern (a trailing .sum() would cap the map
    stage via the AllToAll resource reservation, see BENCH/BASELINE.md
    finding 2).  Null semantics are the check kinds' own (nulls pass unless
    the kind is about nulls)."""
    from webval.checks import check_mask, row_checks_of

    checks = row_checks_of(schema)
    if not checks:
        raise ValueError("check_pass_rates: schema has no row-level checks")

    def partial(batch: pa.Table) -> pa.Table:
        cols = {"n": pa.array([batch.num_rows], pa.int64())}
        for c in checks:
            failed = int(batch.num_rows - check_mask(batch, c).sum())
            cols[f"f_{c.name}"] = pa.array([failed], pa.int64())
        return pa.table(cols)

    from webval.exchange import sum_block_scalars

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=batch_size).materialize()
    totals = sum_block_scalars(parts,
                               ["n"] + [f"f_{c.name}" for c in checks])
    n = totals["n"]
    return pa.table({
        "check_name": pa.array([c.name for c in checks], pa.string()),
        "n_failed": pa.array([totals[f"f_{c.name}"] for c in checks],
                             pa.int64()),
        "n_rows": pa.array([n] * len(checks), pa.int64()),
        # exact IEEE int/int division — bit-identical to SQL's
        # CAST(n_failed AS DOUBLE)/n_rows, no rounding needed
        "fail_rate": pa.array(
            [totals[f"f_{c.name}"] / n if n else None
             for c in checks], pa.float64()),
    })


def reconcile_aggregate(parent, child, parent_key: str, child_key: str,
                        parent_col: str, child_col: str, *,
                        tol: float = 0.01,
                        num_buckets: int | None = None) -> pa.Table:
    """Cross-table aggregate reconciliation — the accounting-style
    validation "does the parent's recorded total equal the sum of its
    child rows": child aggregates through the exchange, left-joins onto
    the parent stream, and the comparison reduces to one summary row:

      (n_parents, n_missing_child, n_mismatched, n_matched)

    where mismatched means |parent_col − Σ child_col| > ``tol`` (an
    absolute tolerance — exact float equality across independently-ordered
    sums is meaningless).  Count-shaped output keeps the result engine-
    comparable; per-key drill-down is ``equi_join`` + a filter away.
    """
    import ray

    from webval.exchange import grouped_agg
    from webval.joins import equi_join

    sums = grouped_agg(
        child.map_batches(lambda t: t.select([child_key, child_col]),
                          batch_format="pyarrow"),
        [child_key], [(child_col, "sum")],
        num_buckets=num_buckets,
        rename={f"{child_col}_sum": "__child_sum__", child_key: parent_key})
    sums = sums.materialize()
    proj = parent.map_batches(lambda t: t.select([parent_key, parent_col]),
                              batch_format="pyarrow")
    if sums.count() == 0:
        # no child rows at all (schema-less empty exchange output): every
        # parent is missing its child aggregate
        joined = proj.map_batches(
            lambda t: t.append_column(
                "__child_sum__", pa.nulls(t.num_rows, pa.float64())),
            batch_format="pyarrow")
    else:
        joined = equi_join(proj, sums, on=parent_key, how="left",
                           num_buckets=num_buckets)

    def partial(t: pa.Table) -> pa.Table:
        s = t.column("__child_sum__").combine_chunks()
        p = pc.cast(t.column(parent_col), pa.float64())
        missing = pc.is_null(s).to_numpy(zero_copy_only=False).astype(bool)
        gap = np.abs(p.to_numpy(zero_copy_only=False)
                     - pc.fill_null(pc.cast(s, pa.float64()), 0.0)
                     .to_numpy(zero_copy_only=False))
        mism = (~missing) & (gap > tol)
        return pa.table({
            "n_parents": pa.array([t.num_rows], pa.int64()),
            "n_missing_child": pa.array([int(missing.sum())], pa.int64()),
            "n_mismatched": pa.array([int(mism.sum())], pa.int64()),
        })

    from webval.exchange import sum_block_scalars

    parts = joined.map_batches(partial, batch_format="pyarrow").materialize()
    totals = sum_block_scalars(
        parts, ["n_parents", "n_missing_child", "n_mismatched"])
    totals["n_matched"] = (totals["n_parents"] - totals["n_missing_child"]
                           - totals["n_mismatched"])
    return pa.table({k: pa.array([v], pa.int64()) for k, v in totals.items()})


def weighted_sample(ds, id_col: str, prob_col: str, *,
                    modulus: int = 2**32, multiplier: int = 2654435761):
    """Per-row weighted deterministic sampling: keep a row iff the Knuth
    hash of its id lands under ``floor(prob * modulus)``, where ``prob_col``
    is a precomputed keep-probability in [0, 1] (the FineWeb-style
    soft-dedup shape: e.g. prob = 1/dup_count keeps each duplicate cluster
    in expectation once).  Pure map filter, engine-reproducible: the same
    predicate is ANSI-SQL (``(id*K)%M < floor(p*M)``) with bit-identical
    floats.  Null/NaN probabilities drop the row; probs clip to [0, 1]."""
    mult, mod = np.uint64(multiplier), np.uint64(modulus)

    def keep(batch: pa.Table) -> pa.Table:
        # null ids can't hash deterministically; negative ids would wrap
        # differently than SQL's % — reject both loudly (review r3s4)
        idc = batch.column(id_col).combine_chunks()
        if idc.null_count:
            raise ValueError(f"weighted_sample: null {id_col} values")
        ids = idc.to_numpy(zero_copy_only=False)
        if len(ids) and ids.min() < 0:
            raise ValueError(f"weighted_sample: negative {id_col} values "
                             "hash differently than the SQL % operator")
        ids = ids.astype(np.uint64, copy=False)
        p = batch.column(prob_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        with np.errstate(over="ignore", invalid="ignore"):
            h = (ids * mult) % mod
            thr = np.floor(np.clip(p, 0.0, 1.0) * float(modulus))
        m = np.where(np.isnan(p), False, h.astype(np.float64) < thr)
        return batch.filter(pa.array(m))

    return ds.map_batches(keep, batch_format="pyarrow")


def grouped_fixed_size_sample(ds, id_col: str, group_col: str, n: int, *,
                              modulus: int = 2**32,
                              multiplier: int = 2654435761):
    """Exactly-n-per-group deterministic sample: the n rows of each group
    whose Knuth multiplicative hash of ``id_col`` is smallest (ties broken
    by the id itself) — the per-stratum quota sampler for training-data
    mixes where proportional sampling (:func:`stratified_sample`) would
    starve small groups.  Membership is a pure function of the data, equal
    to SQL's ``row_number() OVER (PARTITION BY group ORDER BY hash, id)
    <= n`` on any engine, and stable under re-runs / parallelism / cluster
    size.  Scale shape: rides ``rank.top_k_per_group``'s combiner — at most
    n rows per group per input batch reach the shuffle."""
    from webval.rank import top_k_per_group

    if n < 1:
        raise ValueError(f"grouped_fixed_size_sample: n={n}")
    mult, mod = np.uint64(multiplier), np.uint64(modulus)
    sql_bound = (1 << 63) // multiplier

    def add_hash(batch: pa.Table) -> pa.Table:
        col = batch.column(id_col)
        if col.null_count > 0:
            raise ValueError(f"grouped_fixed_size_sample: {id_col} "
                             "contains nulls — a null id has no hash")
        ids = col.to_numpy(zero_copy_only=False)
        if np.issubdtype(ids.dtype, np.signedinteger) and (ids < 0).any():
            raise ValueError(f"grouped_fixed_size_sample: {id_col} has "
                             "negative ids (uint64 wrap diverges from SQL)")
        u = ids.astype(np.uint64, copy=False)
        if (u >= np.uint64(sql_bound)).any():
            raise ValueError(
                f"grouped_fixed_size_sample: {id_col} has ids >= "
                f"{sql_bound}, where id * multiplier overflows SQL BIGINT "
                "— fold ids on both engines first")
        with np.errstate(over="ignore"):
            h = (u * mult) % mod
        return batch.append_column("__h", pa.array(h.astype(np.int64)))

    sampled = top_k_per_group(
        ds.map_batches(add_hash, batch_format="pyarrow"),
        group_col, "__h", n, descending=False, tie_cols=[id_col])
    return sampled.map_batches(lambda t: t.drop_columns(["__h"]),
                               batch_format="pyarrow")


def impute_mode(ds, col: str, *, num_buckets: int | None = None):
    """Mode imputation for a categorical column: fill nulls of ``col``
    with the corpus-wide modal value (ties to the smallest value, matching
    ``aggregates.grouped_mode`` / the SQL ``row_number()`` idiom).  Returns
    ``(filled_ds, mode_value)``.  The mode comes from the count exchange
    (bounded by category cardinality); the fill is a stateless
    ``pc.fill_null`` map — no shuffle of the data itself."""
    from webval.exchange import grouped_agg

    proj = ds.map_batches(
        lambda t: pa.table({col: t.column(col).combine_chunks().filter(
            pc.is_valid(t.column(col).combine_chunks()))}),
        batch_format="pyarrow")
    counts = grouped_agg(proj, [col], [(col, "count")],
                         rename={f"{col}_count": "cnt"},
                         num_buckets=num_buckets)
    # streamed, batch-vectorized argmax: per batch take max(cnt), min value
    # at that count (tie rule), then fold the ≤#batches candidates — no
    # per-group Python zip even at high category cardinality
    best_val, best_cnt = None, -1
    for b in counts.iter_batches(batch_format="pyarrow", batch_size=65536):
        if b.num_rows == 0:
            continue
        cnt = b.column("cnt").combine_chunks()
        m = pc.max(cnt).as_py()
        v = pc.min(b.column(col).filter(pc.equal(cnt, m))).as_py()
        if m > best_cnt or (m == best_cnt and v < best_val):
            best_val, best_cnt = v, m
    if best_val is None:
        return ds, None

    def fill(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index(col)
        return batch.set_column(
            i, col, pc.fill_null(batch.column(col), best_val))

    return ds.map_batches(fill, batch_format="pyarrow"), best_val


def k_anonymity_audit(ds, qi_cols: list[str], *, k: int = 5,
                      sensitive: str | None = None, l_div: int = 2,
                      num_buckets: int | None = None):
    """Privacy audit over quasi-identifier columns (k-anonymity, and
    l-diversity when ``sensitive`` is given): returns the equivalence
    classes that violate either bar — fewer than ``k`` rows, or fewer
    than ``l_div`` distinct sensitive values (Sweeney's k-anonymity /
    Machanavajjhala's l-diversity, both public).

    Scale shape: class sizes ride a count-combiner exchange; the
    l-diversity side dedups (qi…, sensitive) tuples through a second
    exchange (per-batch dedup combiner bounds the shuffle) and counts the
    survivors per class — no raw class materializes anywhere.  The two
    grouped tables (≤ #classes rows each) meet in a multi-key left
    equi-join; classes whose sensitive column is entirely null count as
    l-diversity 0 (SQL count(DISTINCT) semantics).  Rows with a null
    quasi-identifier are dropped (filter upstream to audit them as their
    own class).

    Output: (qi…, class_size, n_sensitive when requested) — only the
    violating classes.
    """
    from webval.exchange import distinct_rows, grouped_agg
    from webval.joins import equi_join

    qi = list(qi_cols)

    def keep_qi(t: pa.Table) -> pa.Table:
        t = t.select(qi + ([sensitive] if sensitive else []))
        m = None
        for c in qi:
            v = pc.is_valid(t.column(c).combine_chunks())
            m = v if m is None else pc.and_(m, v)
        return t.filter(m)

    base = ds.map_batches(keep_qi, batch_format="pyarrow")
    sizes = grouped_agg(base, qi, [(qi[0], "count")],
                        rename={f"{qi[0]}_count": "class_size"},
                        num_buckets=num_buckets)
    if sensitive is None:
        return sizes.map_batches(
            lambda t: t.filter(pc.less(t.column("class_size"),
                                       pa.scalar(k, pa.int64()))),
            batch_format="pyarrow")

    pairs = distinct_rows(
        base.map_batches(lambda t: t.filter(
            pc.is_valid(t.column(sensitive).combine_chunks())),
            batch_format="pyarrow"),
        qi + [sensitive], num_buckets=num_buckets)
    ldiv = grouped_agg(pairs, qi, [(sensitive, "count")],
                       rename={f"{sensitive}_count": "n_sensitive"},
                       num_buckets=num_buckets)
    joined = equi_join(sizes, ldiv, on=qi, how="left",
                       num_buckets=num_buckets)

    def finalize(t: pa.Table) -> pa.Table:
        ns = pc.fill_null(t.column("n_sensitive"),
                          pa.scalar(0, pa.int64()))
        t = t.set_column(t.column_names.index("n_sensitive"),
                         "n_sensitive", ns)
        bad = pc.or_(pc.less(t.column("class_size"),
                             pa.scalar(k, pa.int64())),
                     pc.less(ns, pa.scalar(l_div, pa.int64())))
        return t.filter(bad)

    return joined.map_batches(finalize, batch_format="pyarrow")


def allocate_budget(ds, key: str, total: int, *, weight_col: str | None = None,
                    num_buckets: int | None = None) -> pa.Table:
    """Largest-remainder (Hamilton) apportionment of an integer budget
    across the values of ``key``: each key's quota is
    ``total · w_k / W`` (weights = row counts, or ``weight_col`` sums);
    every key gets ``floor(quota)`` and the leftover units go to the
    largest fractional remainders (ties broken by key ascending — fully
    deterministic, budgets sum to exactly ``total``).  The
    sampling-budget step a data-mixing pipeline runs after choosing
    mixture weights (e.g. temperature-scaled source weights): "turn these
    shares into integer per-source token/doc budgets".

    Scale shape: one count/sum-combiner exchange; only the key-sized
    weight table reaches the driver, where the apportionment is a couple
    of vectorized passes.  Returns a pa.Table
    (key, weight, quota, budget) sorted by key.  Null keys (and null
    weights) are excluded; total must be ≥ 0.
    """
    import numpy as np

    from webval.exchange import grouped_agg

    if total < 0:
        raise ValueError(f"allocate_budget: total={total}")
    if weight_col is None:
        proj = ds.map_batches(
            lambda t: pa.table(
                {key: t.column(key).combine_chunks().drop_null()}),
            batch_format="pyarrow")
        agg = grouped_agg(proj, [key], [(key, "count")],
                          rename={f"{key}_count": "weight"},
                          num_buckets=num_buckets)
    else:
        proj = ds.map_batches(
            lambda t: t.select([key, weight_col]).drop_null(),
            batch_format="pyarrow")
        agg = grouped_agg(proj, [key], [(weight_col, "sum")],
                          rename={f"{weight_col}_sum": "weight"},
                          num_buckets=num_buckets)
    parts = [b for b in agg.iter_batches(batch_format="pyarrow",
                                         batch_size=65536) if b.num_rows]
    if not parts:
        return pa.table({key: pa.array([], pa.string()),
                         "weight": pa.array([], pa.int64()),
                         "quota": pa.array([], pa.float64()),
                         "budget": pa.array([], pa.int64())})
    t = pa.concat_tables(parts).sort_by([(key, "ascending")])
    w = t.column("weight").to_numpy(zero_copy_only=False) \
         .astype(np.float64)
    W = float(w.sum())
    quota = total * w / W
    fl = np.floor(quota)
    rem = quota - fl
    leftover = int(total - fl.sum())
    # rank remainders desc, ties by key asc (= current position asc)
    order = np.lexsort((np.arange(len(rem)), -rem))
    bonus = np.zeros(len(rem), np.int64)
    bonus[order[:leftover]] = 1
    budget = fl.astype(np.int64) + bonus
    return pa.table({key: t.column(key),
                     "weight": t.column("weight"),
                     "quota": pa.array(quota, pa.float64()),
                     "budget": pa.array(budget, pa.int64())})


def concat_packing(ds, id_col: str, token_col: str, context_len: int, *,
                   batch_size: int | None = 65536):
    """GPT-style concatenation packing plan: documents are laid end to
    end in ``id_col`` order and cut into fixed ``context_len``-token
    training sequences; each doc gets its global token offset, the
    sequence (bin) its first token lands in, and whether it straddles a
    sequence boundary (is split across training examples — the
    attention-contamination / truncation-loss signal packing-efficiency
    studies track).  Null/negative token counts are treated as 0-length
    (they occupy no tokens but keep their position).  Returns
    Dataset[{id_col, token_col, offset, bin, straddles}] in pack order.

    Scale shape: ONE global sort by id (the pack order must be total),
    then a two-pass scan — per-block token sums (block-count-sized, a
    few thousand scalars at any corpus size) come to the driver to form
    exclusive block offsets, and a second vectorized pass cumsums
    inside each block against its offset.  The blocks never leave the
    object store; this is the documented raw-task escape hatch for the
    one semantics Dataset ops can't express (a global ordered scan).
    """
    import ray
    import ray.data as rd

    if context_len <= 0:
        raise ValueError(f"concat_packing: context_len must be > 0, "
                         f"got {context_len}")

    mat = ds.select_columns([id_col, token_col]) \
        .sort(id_col).materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def block_sum(b: pa.Table) -> tuple[int, int]:
        # zero-row blocks bypass upstream map UDFs and may carry a stale
        # or empty schema (r3s4 finding) — report rows so they're skipped
        if b.num_rows == 0:
            return 0, 0
        v = pc.cast(b.column(token_col), pa.int64())
        v = pc.max_element_wise(pc.fill_null(v, 0), pa.scalar(0, pa.int64()))
        return b.num_rows, int(pc.sum(v).as_py() or 0)

    stats = ray.get([block_sum.remote(r) for r in refs])
    refs = [r for r, (rows, _) in zip(refs, stats) if rows > 0]
    sums = [s for rows, s in stats if rows > 0]
    if not refs:
        return rd.from_arrow(pa.schema(
            [(id_col, pa.int64()), (token_col, pa.int64()),
             ("offset", pa.int64()), ("bin", pa.int64()),
             ("straddles", pa.bool_())]).empty_table())
    offsets = np.zeros(len(sums), dtype=np.int64)
    if len(sums) > 1:
        offsets[1:] = np.cumsum(sums[:-1])

    @ray.remote
    def pack(b: pa.Table, base: int) -> pa.Table:
        ids = b.column(id_col)
        v = pc.cast(b.column(token_col), pa.int64())
        tok = pc.max_element_wise(pc.fill_null(v, 0),
                                  pa.scalar(0, pa.int64())) \
            .combine_chunks().to_numpy(zero_copy_only=False)
        end = base + np.cumsum(tok)
        off = end - tok
        bins = off // context_len
        straddles = (end - 1) // context_len > bins
        straddles &= tok > 0
        return pa.table({id_col: ids, token_col: b.column(token_col),
                         "offset": pa.array(off),
                         "bin": pa.array(bins),
                         "straddles": pa.array(straddles)})

    out = [pack.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return rd.from_arrow_refs(out)


def plan_shards(ds, key_col: str, weight_col: str, n_shards: int, *,
                top_n: int | None = None, num_buckets: int | None = None):
    """Shard-balance planner: greedy LPT (longest-processing-time) bin
    packing of per-key total weights onto ``n_shards`` shards — the
    "which hosts go to which output partition so no shard is hot"
    layout decision ahead of a partitioned write.  Keys are taken in
    (weight desc, key asc) order and each goes to the currently
    lightest shard (ties to the lowest shard id) — LPT's makespan is ≤
    4/3·OPT (Graham 1969).  Returns Dataset[{key_col, weight, shard}].

    Scale shape: per-key weights come from ONE count/sum exchange;
    the greedy scan is inherently sequential, so it runs driver-side
    over the KEY table — bounded by ``top_n`` (sort + limit, the
    heaviest keys — the only ones load balancing can get wrong; the
    unplanned tail should be hash-assigned by the caller, e.g.
    ``assign_split``).  ``top_n=None`` plans every key: only for
    key-bounded domains (hosts, languages), not open ones (urls)."""
    import heapq

    import ray.data as rd

    from webval.exchange import grouped_agg

    if n_shards < 1:
        raise ValueError(f"plan_shards: n_shards must be >= 1, "
                         f"got {n_shards}")
    weights = grouped_agg(
        ds.select_columns([key_col, weight_col]).map_batches(
            lambda t: t.drop_null(), batch_format="pyarrow"),
        [key_col], [(weight_col, "sum")],
        rename={f"{weight_col}_sum": "weight"}, num_buckets=num_buckets)
    ranked = weights.sort(["weight", key_col], descending=[True, False])
    if top_n is not None:
        ranked = ranked.limit(top_n)
    # this read is the planner input, not the compute path: ≤ top_n rows
    import ray

    # zero-row blocks bypass map UDFs and keep the INPUT schema (r3s4
    # finding) — drop them before concat
    blocks = [b for b in (ray.get(r) for r in ranked.to_arrow_refs())
              if b.num_rows > 0]
    if not blocks:
        return rd.from_arrow(pa.schema(
            [(key_col, pa.large_string()), ("weight", pa.float64()),
             ("shard", pa.int64())]).empty_table())
    t = pa.concat_tables(blocks, promote_options="default")
    keys = t.column(key_col).to_pylist()
    wts = pc.cast(t.column("weight"), pa.float64()) \
        .to_numpy(zero_copy_only=False)
    heap = [(0.0, s) for s in range(n_shards)]
    heapq.heapify(heap)
    shards = np.empty(len(keys), dtype=np.int64)
    for i, w in enumerate(wts):
        load, s = heapq.heappop(heap)
        shards[i] = s
        heapq.heappush(heap, (load + float(w), s))
    out = pa.table({key_col: pa.array(keys, t.schema.field(key_col).type),
                    "weight": pa.array(wts),
                    "shard": pa.array(shards)})
    return rd.from_arrow(out)


def match_distribution_sample(ds, key_col: str, id_col: str,
                              target: dict[str, float], *,
                              modulus: int = 2**32,
                              multiplier: int = 2654435761,
                              num_buckets: int | None = None):
    """Distribution-matching downsampler: keep a deterministic subset
    whose ``key_col`` composition matches the ``target`` shares (e.g.
    rebalance a 70%-English crawl to uniform across languages) at the
    LARGEST achievable size — no key can be oversampled, so the total
    is min_k(n_k / share_k) and the binding key keeps everything.
    Keys absent from ``target`` (or with share 0) are dropped.
    Membership is the same Knuth-hash predicate as
    :func:`deterministic_sample`, per-key thresholded — identical
    membership across runs, engines and cluster sizes (expected counts
    are hit only in expectation: the hash is uniform, not exact-k).
    Rows with null key/id are dropped.  Returns the sampled rows.

    Scale shape: ONE per-key count exchange (key domain is
    policy-sized: languages, sources); thresholds broadcast in the
    closure; the sample itself is a stateless vectorized hash filter —
    no shuffle of the data."""
    import ray

    from webval.exchange import grouped_agg

    if not target or any(s < 0 for s in target.values()):
        raise ValueError("match_distribution_sample: target must be "
                         "non-empty with nonnegative shares")
    keys = [k for k, s in target.items() if s > 0]
    key_set = pa.array(keys)
    counts_ds = grouped_agg(
        ds.select_columns([key_col]).map_batches(
            lambda t: t.filter(pc.is_in(
                t.column(key_col).combine_chunks().cast(key_set.type),
                value_set=key_set)),
            batch_format="pyarrow"),
        [key_col], [(key_col, "count")],
        rename={f"{key_col}_count": "n"}, num_buckets=num_buckets)
    # the count table is target-key-sized — this read is the planner
    blocks = [b for b in (ray.get(r)
                          for r in counts_ds.materialize().to_arrow_refs())
              if b.num_rows > 0]
    n_of = {}
    for b in blocks:
        for k, n in zip(b.column(key_col).to_pylist(),
                        b.column("n").to_pylist()):
            n_of[k] = n
    missing = [k for k in keys if not n_of.get(k)]
    if missing:
        raise ValueError(f"match_distribution_sample: target keys with "
                         f"no rows: {missing}")
    n_total = min(n_of[k] / target[k] for k in keys)
    thr = {k: int(np.floor(target[k] * n_total / n_of[k] * modulus))
           for k in keys}
    key_arr = pa.array(keys)
    thr_np = np.array([thr[k] for k in keys] + [0], dtype=np.uint64)
    mult = np.uint64(multiplier)
    mod = np.uint64(modulus)

    def keep(t: pa.Table) -> pa.Table:
        kc = t.column(key_col).combine_chunks()
        ic = t.column(id_col).combine_chunks()
        m = pc.and_(pc.is_valid(kc), pc.is_valid(ic))
        t = t.filter(m)
        kc, ic = kc.filter(m), ic.filter(m)
        idx = pc.fill_null(pc.index_in(kc, value_set=key_arr),
                           len(keys)).to_numpy(zero_copy_only=False)
        ids = ic.to_numpy(zero_copy_only=False).astype(np.uint64,
                                                       copy=False)
        with np.errstate(over="ignore"):
            h = (ids * mult) % mod
        return t.filter(pa.array(h < thr_np[idx]))

    return ds.map_batches(keep, batch_format="pyarrow")


def cap_per_group(ds, key_col: str, id_col: str, cap: int, *,
                  modulus: int = 2**32, multiplier: int = 2654435761,
                  num_buckets: int | None = None):
    """Frequency-capped sampling: keep at most ``cap`` rows per key —
    "no more than N pages per domain", the crawl-balancing rule that
    stops megahosts from dominating a training mix without touching
    small hosts at all.  WHICH rows survive is deterministic: each
    key's rows are ranked by (Knuth hash of ``id_col``, id) and the
    first ``cap`` win — identical membership across runs, engines and
    cluster sizes, so the capped corpus is auditable (same property as
    :func:`deterministic_sample`).  Null keys/ids are dropped.

    Scale shape: the per-batch combiner already keeps ≤ cap rows per
    key per batch, so the exchange moves at most cap · #batches rows
    per key — a hot host never concentrates anywhere (the
    top_k_per_group contract)."""
    from webval.rank import top_k_per_group

    if cap < 1:
        raise ValueError(f"cap_per_group: cap must be >= 1, got {cap}")
    mult, mod = np.uint64(multiplier), np.uint64(modulus)

    def add_hash(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.is_valid(t.column(key_col).combine_chunks()),
            pc.is_valid(t.column(id_col).combine_chunks())))
        ids = t.column(id_col).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        with np.errstate(over="ignore"):
            h = (ids * mult) % mod
        return t.append_column("__h__", pa.array(h.astype(np.int64)))

    capped = top_k_per_group(
        ds.map_batches(add_hash, batch_format="pyarrow"),
        key_col, "__h__", cap, descending=False, tie_cols=[id_col],
        num_buckets=num_buckets)
    return capped.map_batches(lambda t: t.drop_columns(["__h__"]),
                              batch_format="pyarrow")


def gumbel_topk_sample(ds, id_col: str, logit_col: str, k: int, *,
                       modulus: int = 2**32, multiplier: int = 2246822519,
                       min_gap: float | None = None) -> "pa.Table":
    """Deterministic Gumbel-top-k sampling WITHOUT replacement,
    P(select) ∝ exp(logit) — the selection step of importance resampling
    (DSIR) made engine-portable: the uniform is a multiplicative hash of
    ``id_col`` (u = ((id·2246822519) mod 2³² + 0.5) / 2³²), the key is
    g = logit − ln(−ln u), and the sample is the global top-k by g
    (per-batch argpartition combiner + driver merge — no sort shuffle,
    see rank.global_top_k).  The same arithmetic is one ANSI-SQL
    expression, so membership is reproducible across engines and runs.

    The multiplier deliberately DIFFERS from ``assign_split``'s
    2654435761: with the same hash, u ≥ 0.9 ⟺ the id lands in val/test,
    and −ln(−ln u) is increasing in u — the sampler would systematically
    prefer exactly the ids the splitter routes to val/test (measured:
    44/100 winners in val+test at 5%+5% fractions before the salt
    changed).  Two multiplicative hashes with different odd multipliers
    decorrelate the draws.

    ``min_gap``: loud precondition for cross-engine membership — raise
    unless the gap between the k-th and (k+1)-th key exceeds it (a tie
    within float noise would make the boundary engine-dependent)."""
    from webval.rank import global_top_k

    mult, mod = np.uint64(multiplier), np.uint64(modulus)

    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) and (ids < 0).any():
            raise ValueError("gumbel_topk_sample: negative ids")
        u = (((ids.astype(np.uint64) * mult) % mod).astype(np.float64)
             + 0.5) / float(mod)
        g = batch.column(logit_col).to_numpy(zero_copy_only=False) \
            - np.log(-np.log(u))
        return batch.append_column("__gumbel__", pa.array(g, pa.float64()))

    top = global_top_k(ds.map_batches(add_key, batch_format="pyarrow"),
                       "__gumbel__", k + 1)
    if "__gumbel__" not in top.column_names:
        # entirely-empty input: zero blocks reach the driver and even the
        # post-map schema is unknown — rebuild from the INPUT schema
        sch = ds.schema()
        if sch is None or sch.names is None:
            return pa.table({id_col: pa.array([], pa.int64())})
        return pa.table({n: pa.array([], type=t)
                         for n, t in zip(sch.names, sch.types)})
    top = top.sort_by([("__gumbel__", "descending")])
    if min_gap is not None and top.num_rows > k:
        gap = (top.column("__gumbel__")[k - 1].as_py()
               - top.column("__gumbel__")[k].as_py())
        if gap < min_gap:
            raise ValueError(
                f"gumbel_topk_sample: k-boundary gap {gap} < {min_gap} — "
                "membership would be engine/float-order dependent")
    return top.slice(0, k).drop_columns(["__gumbel__"])
