"""SchemaSpec / ColumnProfile / CheckSpec — the engine's data model
(SURVEY.md §1.1 table; rdv analogs: Schema / Component / Stats + tags,
[rdv:rdv/schema.py, rdv/component.py, UNVERIFIED — reference checkout empty]).

Lifecycle mirrors rdv: ``build`` infers per-column profiles from data and
freezes them into a versioned, JSON-serializable SchemaSpec (rdv's
``to_jcr``/``from_jcr``); ``check`` validates strictly against the frozen
spec; ``contrast`` compares two built specs.  The JSON file IS the baseline
schema for drift checks.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from webval.sketches import CategoricalFreq, Moments, TDigest

QUANTILE_POINTS = [i / 100.0 for i in range(101)]  # rdv percentiles[0..100]


@dataclass
class ColumnProfile:
    """Per-column stats block — rdv's Component(stats) equivalent.

    kind: "numeric" | "categorical" | "text" | "binary" | "timestamp".
    Numeric columns carry moments + t-digest + fixed-bin histogram;
    categorical carry a frequency map; text/binary profile the value length
    (numeric path over utf8_length / binary_length); every kind carries
    null stats and an HLL distinct sketch.
    """

    name: str
    kind: str
    count: int = 0
    null_count: int = 0
    distinct_est: float = 0.0
    moments: dict | None = None          # Moments.to_dict()
    tdigest: dict | None = None          # TDigest.to_dict()
    histogram: dict | None = None        # NumericHistogram.to_dict()
    frequencies: dict | None = None      # CategoricalFreq.to_dict()
    hll: dict | None = None              # HyperLogLog.to_dict()

    @property
    def null_rate(self) -> float:
        return self.null_count / self.count if self.count else 0.0

    def quantile(self, q: float) -> float | None:
        if self.tdigest is None:
            return None
        return TDigest.from_dict(self.tdigest).quantile(q)

    def domain(self) -> list[str] | None:
        if self.frequencies is None:
            return None
        return CategoricalFreq.from_dict(self.frequencies).domain()

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "kind": self.kind,
            "count": self.count,
            "null_count": self.null_count,
            "distinct_est": self.distinct_est,
            "moments": self.moments,
            "tdigest": self.tdigest,
            "histogram": self.histogram,
            "frequencies": self.frequencies,
            "hll": self.hll,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ColumnProfile":
        return cls(**d)


@dataclass
class CheckSpec:
    """One constraint — rdv's per-component check semantics plus the
    web-scale kinds BASELINE.json adds.  ``kind`` ∈:

    - ``range``       params: {min, max}              (B2)
    - ``null_rate``   params: {max_rate}              (B3)
    - ``domain``      params: {values: [...]}         (B4)
    - ``regex``       params: {pattern} (RE2)         (B5)
    - ``unique``      params: {}                      (G2, pipeline-level)
    - ``referential`` params: {parent_table, parent_key} (D1, pipeline-level)
    - ``drift``       params: {max_js, max_chi2_p}    (P3, pipeline-level)

    Row-level kinds (range/domain/regex + per-row null) evaluate inside one
    map_batches; ``null_rate`` is a dataset/partition-level threshold;
    unique/referential/drift run as sibling pipelines.
    """

    name: str
    column: str
    kind: str
    params: dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {"name": self.name, "column": self.column, "kind": self.kind, "params": self.params}

    @classmethod
    def from_dict(cls, d: dict) -> "CheckSpec":
        return cls(**d)


@dataclass
class SchemaSpec:
    """Versioned, JSON-serializable collection of ColumnProfiles + CheckSpecs
    — rdv's Schema ⇄ jcr.  ``built`` flips after a successful build pass.
    """

    name: str = "schema"
    version: str = "0.0.1"
    built: bool = False
    columns: list[ColumnProfile] = field(default_factory=list)
    checks: list[CheckSpec] = field(default_factory=list)
    # ordered pre-stage specs ({"kind", "params"} dicts, stages.py) recorded
    # at build time and replayed by check — rdv's extractor to_jcr analog:
    # a loaded schema reconstructs its full pipeline, extraction included
    pre_stages: list[dict] = field(default_factory=list)

    def column(self, name: str) -> ColumnProfile:
        for c in self.columns:
            if c.name == name:
                return c
        raise KeyError(name)

    def infer_default_checks(self) -> "SchemaSpec":
        """rdv semantics: after build, each component checks new values
        against its built stats — numeric range from [min, max], categorical
        domain from observed frequencies, nan-rate from observed pinv
        (with slack so the training data itself passes).
        """
        checks: list[CheckSpec] = []
        for p in self.columns:
            if p.kind == "numeric" and p.moments:
                m = Moments.from_dict(p.moments)
                if m.count:
                    checks.append(CheckSpec(f"{p.name}-range", p.name, "range",
                                            {"min": m.min, "max": m.max}))
            if p.kind == "categorical" and p.frequencies:
                checks.append(CheckSpec(f"{p.name}-domain", p.name, "domain",
                                        {"values": p.domain()}))
            rate = min(1.0, p.null_rate * 1.5 + 1e-6) if p.null_count else 0.0
            checks.append(CheckSpec(f"{p.name}-nullrate", p.name, "null_rate",
                                    {"max_rate": rate}))
        self.checks = checks
        return self

    def to_json(self, path: str | None = None) -> str:
        d = {
            "name": self.name,
            "version": self.version,
            "built": self.built,
            "columns": [c.to_dict() for c in self.columns],
            "checks": [c.to_dict() for c in self.checks],
            "pre_stages": self.pre_stages,
        }
        s = json.dumps(d, indent=1, sort_keys=True)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s

    @classmethod
    def from_json(cls, s_or_path: str) -> "SchemaSpec":
        if s_or_path.lstrip().startswith("{"):
            d = json.loads(s_or_path)
        else:
            with open(s_or_path) as f:
                d = json.load(f)
        return cls(
            name=d["name"],
            version=d["version"],
            built=d["built"],
            columns=[ColumnProfile.from_dict(c) for c in d["columns"]],
            checks=[CheckSpec.from_dict(c) for c in d["checks"]],
            pre_stages=d.get("pre_stages", []),  # pre-r3 files lack the key
        )


def diff_specs(old: SchemaSpec, new: SchemaSpec, *,
               max_null_rate_delta: float = 0.05,
               max_distinct_ratio: float = 2.0) -> dict:
    """Schema-evolution report between two BUILT specs (the structural
    companion of contrast(): contrast compares distributions, this compares
    the schemas themselves — what a validation run should flag before any
    data is scanned).

    Returns a JSON-able dict:
    - ``added`` / ``removed``: column names present in only one spec
    - ``kind_changed``: [{column, old, new}] profile-kind changes
    - ``null_rate_shifts``: [{column, old, new}] where |Δ null_rate| >
      ``max_null_rate_delta``
    - ``distinct_shifts``: [{column, old, new}] where the HLL distinct
      estimate grew/shrank by more than ``max_distinct_ratio``×
    - ``checks_added`` / ``checks_removed``: check names in only one spec
    - ``compatible``: True iff nothing above fired (adding checks is
      allowed — new constraints don't break existing consumers)
    """
    o = {c.name: c for c in old.columns}
    n = {c.name: c for c in new.columns}
    added = sorted(n.keys() - o.keys())
    removed = sorted(o.keys() - n.keys())
    kind_changed, null_shifts, distinct_shifts = [], [], []
    for name in sorted(o.keys() & n.keys()):
        a, b = o[name], n[name]
        if a.kind != b.kind:
            kind_changed.append({"column": name, "old": a.kind,
                                 "new": b.kind})
        if abs(a.null_rate - b.null_rate) > max_null_rate_delta:
            null_shifts.append({"column": name,
                                "old": round(a.null_rate, 6),
                                "new": round(b.null_rate, 6)})
        lo, hi = sorted([max(a.distinct_est, 1.0), max(b.distinct_est, 1.0)])
        if hi / lo > max_distinct_ratio:
            distinct_shifts.append({"column": name,
                                    "old": round(a.distinct_est, 1),
                                    "new": round(b.distinct_est, 1)})
    oc = {c.name for c in old.checks}
    nc = {c.name for c in new.checks}
    report = {
        "added": added,
        "removed": removed,
        "kind_changed": kind_changed,
        "null_rate_shifts": null_shifts,
        "distinct_shifts": distinct_shifts,
        "checks_added": sorted(nc - oc),
        "checks_removed": sorted(oc - nc),
    }
    report["compatible"] = not (removed or kind_changed or null_shifts
                                or distinct_shifts or report["checks_removed"])
    return report


def key_candidate_audit(ds, cols: list[str], *,
                        num_buckets: int | None = None):
    """Primary-key candidate audit: for each column, its exact distinct
    count, null count, row count, the uniqueness ratio
    distinct/non-null, and an ``is_key`` verdict (every non-null value
    unique AND no nulls) — the "which column can I join/dedup on"
    profile a validation run answers before any constraint is written.
    Returns Dataset[{column, n_rows, n_nulls, n_distinct, uniqueness,
    is_key}] sorted by column name.

    Scale shape: per column, ONE value-count exchange bounded by that
    column's distinct cardinality (the same substrate as exact
    uniqueness checks); null/row totals ride per-block partials.  A
    near-unique 100-TB column makes its exchange row-sized — the same
    cost every exact-distinct engine pays; use the HLL profile
    (schema_build) when approximate answers suffice."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from webval.exchange import grouped_agg, sum_block_scalars

    if not cols:
        raise ValueError("key_candidate_audit: empty column list")
    rows = []
    for c in cols:
        # ONE pass per column: the null count rides the value-count
        # exchange as a null-key row (Arrow group_by groups nulls), so
        # non-null total = Σ counts over non-null keys, distinct = row
        # count minus the null row, and n_rows = non-null + nulls
        def vals(t: pa.Table, _c=c) -> pa.Table:
            v = t.column(_c).combine_chunks()
            vc = v.filter(pc.is_valid(v)).value_counts()
            tab = pa.table({"v": vc.field("values"),
                            "n": pc.cast(vc.field("counts"), pa.int64())})
            if v.null_count:
                tab = pa.concat_tables([tab, pa.table({
                    "v": pa.array([None], vc.field("values").type),
                    "n": pa.array([v.null_count], pa.int64())})])
            return tab

        per_val = grouped_agg(
            ds.select_columns([c]).map_batches(vals,
                                               batch_format="pyarrow"),
            ["v"], [("n", "sum")], rename={"n_sum": "n"},
            num_buckets=num_buckets).materialize()

        def reduce_block(t: pa.Table) -> pa.Table:
            isnull = pc.is_null(t.column("v"))
            n = t.column("n")
            return pa.table({
                "nn": pa.array([pc.sum(pc.if_else(
                    isnull, pa.scalar(0, pa.int64()), n)).as_py() or 0],
                    pa.int64()),
                "nulls": pa.array([pc.sum(pc.if_else(
                    isnull, n, pa.scalar(0, pa.int64()))).as_py() or 0],
                    pa.int64()),
                "dist": pa.array([int(pc.sum(pc.cast(pc.invert(isnull),
                                                     pa.int64()))
                                      .as_py() or 0)], pa.int64())})

        tot = sum_block_scalars(
            per_val.map_batches(reduce_block,
                                batch_format="pyarrow").materialize(),
            ["nn", "nulls", "dist"])
        nn, nulls, dist = tot["nn"], tot["nulls"], tot["dist"]
        rows.append({
            "column": c, "n_rows": nn + nulls,
            "n_nulls": nulls, "n_distinct": dist,
            "uniqueness": (dist / nn) if nn else None,
            "is_key": bool(nulls == 0 and dist == nn and nn > 0)})
    rows.sort(key=lambda r: r["column"])
    return rd.from_arrow(pa.table({
        "column": pa.array([r["column"] for r in rows], pa.string()),
        "n_rows": pa.array([r["n_rows"] for r in rows], pa.int64()),
        "n_nulls": pa.array([r["n_nulls"] for r in rows], pa.int64()),
        "n_distinct": pa.array([r["n_distinct"] for r in rows],
                               pa.int64()),
        "uniqueness": pa.array([r["uniqueness"] for r in rows],
                               pa.float64()),
        "is_key": pa.array([r["is_key"] for r in rows], pa.bool_())}))


#: anchored RE2 patterns for format inference — DuckDB's regexp_full_match
#: is also RE2-backed, so twins match byte-for-byte.
FORMAT_PATTERNS: dict[str, str] = {
    "int": r"[+-]?[0-9]+",
    "float": r"[+-]?([0-9]+\.[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?",
    "iso_date": r"[0-9]{4}-[0-9]{2}-[0-9]{2}",
    "iso_timestamp": r"[0-9]{4}-[0-9]{2}-[0-9]{2}[T ][0-9]{2}:[0-9]{2}"
                     r":[0-9]{2}(\.[0-9]+)?",
    "uuid": r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
            r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "bool": r"(?i)(true|false)",
}


def format_inference(ds, col: str, *,
                     patterns: dict[str, str] | None = None,
                     num_buckets: int | None = None):
    """String-format inference over a text column: for each candidate
    format (anchored RE2 full-match; default :data:`FORMAT_PATTERNS` —
    int/float/iso date & timestamp/uuid/email/url/bool), how many
    non-null values match and the share — the "this VARCHAR column is
    actually 99.4% integers" signal that drives type-normalization
    decisions (B8) and catches the 0.6% of rows that would break the
    cast.  Formats overlap by design (every int also matches float's
    sibling domain): report, don't arbitrate.  Returns
    Dataset[{format, n_match, share}] sorted by format name; formats
    matching nothing still appear with 0.

    Scale shape: one vectorized anchored-regex kernel per format per
    batch, collapsed to ≤ len(patterns)+1 partial rows before ONE tiny
    exchange (the non-null total rides as a sentinel row)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from webval.exchange import grouped_agg

    pats = dict(patterns if patterns is not None else FORMAT_PATTERNS)
    if not pats:
        raise ValueError("format_inference: empty pattern dict")

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).combine_chunks()
        v = v.filter(pc.is_valid(v)).cast(pa.large_string())
        names, counts = [], []
        for name, p in pats.items():
            m = pc.match_substring_regex(v, f"^(?:{p})$")
            names.append(name)
            counts.append(pc.sum(m).as_py() or 0)
        names.append("")
        counts.append(len(v))
        return pa.table({"format": pa.array(names, pa.large_string()),
                         "n_match": pa.array(counts, pa.int64())})

    agg = grouped_agg(
        ds.select_columns([col]).map_batches(partial,
                                             batch_format="pyarrow"),
        ["format"], [("n_match", "sum")], rename={"n_match_sum":
                                                  "n_match"},
        num_buckets=num_buckets).materialize()
    sent = agg.filter(expr="format == ''").take_all()
    total = sent[0]["n_match"] if sent else 0
    if total == 0:
        return rd.from_arrow(pa.schema(
            [("format", pa.large_string()), ("n_match", pa.int64()),
             ("share", pa.float64())]).empty_table())

    def finalize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t.column("format"), "")))
        share = pc.divide(pc.cast(t.column("n_match"), pa.float64()),
                          pa.scalar(float(total)))
        return pa.table({"format": t.column("format"),
                         "n_match": t.column("n_match"), "share": share})

    return agg.map_batches(finalize, batch_format="pyarrow") \
        .sort("format")


def value_pattern_profile(ds, col: str, *, top_k: int = 20,
                          num_buckets: int | None = None):
    """Value-shape profiling: every value is masked to its character
    pattern (digits→9, lowercase→a, uppercase→A, other characters kept
    verbatim, runs NOT collapsed) and the ``top_k`` patterns are
    counted — the "this column is 97% `999-999-9999` and 3% junk"
    profile classic data-prep tools lead with; the shape complement of
    :func:`format_inference` (which tests known formats, while this
    DISCOVERS the shapes present).  Nulls are skipped; share is over
    non-null rows.  Rank is (n desc, pattern asc).  Returns
    Dataset[{pattern, n, share}].

    Scale shape: three vectorized regex replaces per batch + a local
    count combiner; ONE exchange bounded by the distinct-pattern count
    (pattern space is tiny next to the value space — that is the point
    of masking); the non-null total rides as a sentinel row."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from webval.exchange import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).combine_chunks()
        v = v.filter(pc.is_valid(v)).cast(pa.large_string())
        p = pc.replace_substring_regex(v, "[0-9]", "9")
        p = pc.replace_substring_regex(p, "[a-z]", "a")
        p = pc.replace_substring_regex(p, "[A-Z]", "A")
        vc = p.value_counts()
        pats = vc.field("values")
        ns = pc.cast(vc.field("counts"), pa.int64())
        return pa.table({
            "pattern": pa.concat_arrays([
                pats.combine_chunks() if isinstance(pats, pa.ChunkedArray)
                else pats,
                pa.array([None], pa.large_string())]),
            "n": pa.concat_arrays([
                ns.combine_chunks() if isinstance(ns, pa.ChunkedArray)
                else ns,
                pa.array([len(v)], pa.int64())])})

    agg = grouped_agg(
        ds.select_columns([col]).map_batches(partial,
                                             batch_format="pyarrow"),
        ["pattern"], [("n", "sum")], rename={"n_sum": "n"},
        num_buckets=num_buckets).materialize()
    sent = agg.map_batches(
        lambda t: t.filter(pc.is_null(t.column("pattern")
                                      .combine_chunks())),
        batch_format="pyarrow").take_all()
    total = sent[0]["n"] if sent else 0
    if total == 0:
        return rd.from_arrow(pa.schema(
            [("pattern", pa.large_string()), ("n", pa.int64()),
             ("share", pa.float64())]).empty_table())

    def finalize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("pattern").combine_chunks()))
        share = pc.divide(pc.cast(t.column("n"), pa.float64()),
                          pa.scalar(float(total)))
        return pa.table({"pattern": t.column("pattern"),
                         "n": t.column("n"), "share": share})

    return agg.map_batches(finalize, batch_format="pyarrow") \
        .sort(["n", "pattern"], descending=[True, False]).limit(top_k)


def truncation_audit(ds, col: str, *, top_k: int = 5,
                     num_buckets: int | None = None):
    """VARCHAR-truncation detection: the length distribution's tail —
    when a suspicious share of values piles up at EXACTLY the maximum
    observed length, an upstream system was almost certainly cutting at
    a fixed column width (the classic silent-corruption smell; a
    natural length distribution decays toward its max).  Reports the
    ``top_k`` longest observed lengths with counts and share, plus an
    ``at_max`` flag on the maximal row.  Nulls are skipped.  Returns
    Dataset[{length, n, share, at_max}] sorted by length desc.

    Scale shape: per-batch length value_counts combiner → ONE
    length-keyed exchange (bounded by the distinct-length count);
    the top-k cut is a sort+limit over that tiny table."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from webval.exchange import grouped_agg, sum_block_scalars

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).combine_chunks()
        v = v.filter(pc.is_valid(v)).cast(pa.large_string())
        vc = pc.utf8_length(v).value_counts()
        return pa.table({
            "length": pc.cast(vc.field("values"), pa.int64()),
            "n": pc.cast(vc.field("counts"), pa.int64())})

    counts = grouped_agg(
        ds.select_columns([col]).map_batches(partial,
                                             batch_format="pyarrow"),
        ["length"], [("n", "sum")], rename={"n_sum": "n"},
        num_buckets=num_buckets).materialize()
    total = sum_block_scalars(counts, ["n"])["n"]
    if total == 0:
        return rd.from_arrow(pa.schema(
            [("length", pa.int64()), ("n", pa.int64()),
             ("share", pa.float64()),
             ("at_max", pa.bool_())]).empty_table())
    top = counts.sort("length", descending=True).limit(top_k)

    def finalize(t: pa.Table) -> pa.Table:
        share = pc.divide(pc.cast(t.column("n"), pa.float64()),
                          pa.scalar(float(total)))
        return pa.table({"length": t.column("length"),
                         "n": t.column("n"), "share": share})

    shaped = top.map_batches(finalize,
                             batch_format="pyarrow").materialize()
    mx = max(r["length"] for r in shaped.take_all())  # ≤ top_k rows
    return shaped.map_batches(
        lambda t: t.append_column(
            "at_max", pc.equal(t.column("length"),
                               pa.scalar(mx, pa.int64()))),
        batch_format="pyarrow").sort("length", descending=True)


#: profile kind → ANSI column type for DDL export
_DDL_TYPES = {"numeric": "DOUBLE", "timestamp": "TIMESTAMP",
              "categorical": "VARCHAR", "text": "VARCHAR",
              "binary": "BLOB"}


def schema_to_sql_ddl(spec, *, table: str = "validated") -> str:
    """Export a BUILT SchemaSpec as portable ANSI DDL: a CREATE TABLE
    with one column per profile and the row-level CheckSpecs rendered
    as named CHECK constraints (range, domain, and NOT-NULL for
    null_rate 0) — the "hand the data contract to a warehouse" bridge;
    a row that passes the engine's row-level checks inserts cleanly
    into the exported table and a violating row is rejected by the
    database itself.  Dataset-level kinds (null_rate > 0, unique,
    referential, drift, regex — RE2 is not portable SQL) are emitted
    as ``-- unenforced:`` comments so the contract stays visible.
    """
    cols: list[str] = []
    checks: list[str] = []
    notes: list[str] = []

    def q(v) -> str:
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return repr(float(v)) if isinstance(v, float) else str(v)

    by_col = {}
    for c in spec.checks:
        by_col.setdefault(c.column, []).append(c)
    for p in spec.columns:
        t = _DDL_TYPES.get(p.kind, "VARCHAR")
        not_null = any(c.kind == "null_rate"
                       and c.params.get("max_rate", 1.0) == 0.0
                       for c in by_col.get(p.name, []))
        cols.append(f'  "{p.name}" {t}'
                    + (" NOT NULL" if not_null else ""))
        for c in by_col.get(p.name, []):
            if c.kind == "range":
                lo, hi = c.params.get("min"), c.params.get("max")
                if lo is not None and hi is not None:
                    checks.append(
                        f'  CONSTRAINT "{c.name}" CHECK ("{p.name}" '
                        f'BETWEEN {q(lo)} AND {q(hi)})')
            elif c.kind == "domain":
                vals = c.params.get("values") or []
                if vals:
                    inlist = ", ".join(q(v) for v in vals)
                    checks.append(
                        f'  CONSTRAINT "{c.name}" CHECK ("{p.name}" '
                        f'IN ({inlist}))')
            elif c.kind == "null_rate":
                if c.params.get("max_rate", 1.0) > 0.0:
                    notes.append(f"-- unenforced: {c.name} "
                                 f"(max_rate={c.params['max_rate']})")
            else:
                notes.append(f"-- unenforced: {c.name} ({c.kind})")
    body = ",\n".join(cols + checks)
    ddl = f'CREATE TABLE "{table}" (\n{body}\n);'
    if notes:
        ddl += "\n" + "\n".join(sorted(set(notes)))
    return ddl


def null_block_scan(ds, id_col: str, col: str, *, block: int = 10_000,
                    min_rate: float = 0.5, min_rows: int = 10,
                    num_buckets: int | None = None):
    """Null-burst localization: bucket rows into contiguous ``id_col``
    blocks of ``block`` ids and flag blocks whose null rate of ``col``
    is ≥ ``min_rate`` — a uniform sprinkle of nulls is organic, but
    nulls CONCENTRATED in one id range mean a broken export window /
    upstream outage, and this names the range to re-fetch.  Blocks with
    fewer than ``min_rows`` rows are ignored (noise).  Returns
    Dataset[{block_start, n_rows, n_nulls, null_rate}] for the flagged
    blocks, sorted by block_start.

    Scale shape: stateless block tagging + per-batch (block, n, nulls)
    combiner → ONE block-keyed exchange (id-span/block bounded);
    thresholding is vectorized on the block table."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from webval.exchange import grouped_agg

    if block < 1:
        raise ValueError(f"null_block_scan: block must be >= 1, "
                         f"got {block}")

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).combine_chunks()
        ok = pc.is_valid(ids)
        t = t.filter(ok)
        ids = ids.filter(ok)
        blk = pc.multiply(pc.divide(ids, pa.scalar(block, pa.int64())),
                          pa.scalar(block, pa.int64()))
        isnull = pc.cast(pc.is_null(t.column(col).combine_chunks()),
                         pa.int64())
        tab = pa.table({"block_start": pc.cast(blk, pa.int64()),
                        "n": pa.nulls(t.num_rows,
                                      pa.int64()).fill_null(1),
                        "nulls": isnull})
        agg = tab.group_by(["block_start"]).aggregate(
            [("n", "sum"), ("nulls", "sum")])
        return agg.rename_columns(["block_start", "n", "nulls"])

    blocks = grouped_agg(
        ds.select_columns([id_col, col]).map_batches(
            partial, batch_format="pyarrow"),
        ["block_start"], [("n", "sum"), ("nulls", "sum")],
        rename={"n_sum": "n", "nulls_sum": "nulls"},
        num_buckets=num_buckets)

    def flag(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column("n"), pa.float64())
        rate = pc.divide(pc.cast(t.column("nulls"), pa.float64()), n)
        keep = pc.and_(pc.greater_equal(t.column("n"),
                                        pa.scalar(min_rows, pa.int64())),
                       pc.greater_equal(rate, pa.scalar(float(min_rate))))
        t = t.filter(keep)
        rate = pc.divide(pc.cast(t.column("nulls"), pa.float64()),
                         pc.cast(t.column("n"), pa.float64()))
        return pa.table({"block_start": t.column("block_start"),
                         "n_rows": t.column("n"),
                         "n_nulls": t.column("nulls"),
                         "null_rate": rate})

    return blocks.map_batches(flag, batch_format="pyarrow") \
        .sort("block_start")
