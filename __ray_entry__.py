"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).  Implementations live in webval/queries.py; see
SURVEY.md §2 for the operator inventory each entry covers.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in webval) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: build a schema over the
    documents table, check it against its own inferred constraints, and
    return the per-check violation summary (≥0 rows, stable schema)."""
    import pandas as pd
    import ray.data as rd

    from webval.checks import check_dataset, violations_of
    from webval.pipelines import build_schema, uniqueness_violations

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/documents.parquet")
    kinds = {"doc_id": "numeric", "text": "text", "lang": "categorical",
             "source": "categorical", "n_chars": "numeric"}
    spec = build_schema(ds, kinds, name="documents")
    verdicts = check_dataset(ds, spec, keep_cols=["doc_id"])
    n_viol = violations_of(verdicts).count()
    n_rows = verdicts.count()
    n_dup = uniqueness_violations(ds, "doc_id").count()
    return pd.DataFrame({
        "metric": ["rows_checked", "violation_rows", "dup_doc_ids",
                   "columns_profiled", "checks_inferred"],
        "value": [n_rows, n_viol, n_dup, len(spec.columns), len(spec.checks)],
    })


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from webval.queries import QUERIES, ensure_synth

    # the synthetic webpages fixture backs several queries AND their SQL
    # oracles — materialize for the driver's sf up front (idempotent)
    ensure_synth("/root/testdata/sf0.01")
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query (views pre-registered:
    region nation customer supplier part orders lineitem events documents
    embeddings; synthetic web tables referenced by absolute parquet path).
    Sketch-based / model-backed / report-shaped entries are omitted →
    rows-only driver check."""
    from webval.queries import QUERIES, ensure_synth

    ensure_synth("/root/testdata/sf0.01")
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
