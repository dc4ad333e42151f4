"""Checkpoint manifest + resumable check runs (SURVEY.md §2-A A5, §4
'Checkpoint/resume'; BASELINE.json north_rule: "resumable from checkpoint
with per-partition lineage + metrics").

Unit of work = a group of input parquet fragments.  Each unit runs the P2
check pipeline (itself fully Ray-parallel — at 100 TB a unit is hundreds of
files, so intra-unit parallelism saturates the cluster), writes its outputs
under ``out_dir/{verdicts,violations}/unit=<id>/`` via write-to-temp +
atomic rename, THEN appends one manifest line::

    {"unit": id, "fragments": [...], "rows": n, "violations": m,
     "wall_ms": t, "status": "done", "stats_digest": sha}

On restart, units already ``done`` in the manifest are skipped; output files
are named by unit id so a re-run of an interrupted unit idempotently
overwrites its partial output.  The manifest line is written only after the
rename — output durable before lineage, so a crash between the two merely
recomputes one unit.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass


def _stub_fsspec_http():
    """Make Ray's fsspec-HTTP probe import deterministic under threads.

    ray.data path resolution does ``from fsspec.implementations.http import
    HTTPFileSystem`` on EVERY read/write path resolution, handling only
    ModuleNotFoundError.  Without aiohttp that import fails and the
    half-initialized module is evicted, so two concurrent driver threads
    race the re-import and one can see ImportError ('cannot import name
    HTTPFileSystem') instead — crashing a resumable unit.  Pre-install a
    stub module exposing a marker HTTPFileSystem class so the probe always
    succeeds; local filesystems are unaffected (Ray only isinstance-checks
    against it, which returns False)."""
    import sys
    import types

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
        return
    except ImportError:
        pass

    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # pragma: no cover - marker for isinstance only
        def __init__(self, *a, **k):
            raise ModuleNotFoundError("aiohttp not available (webval stub)")

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


@dataclass
class UnitResult:
    unit: int
    rows: int
    violations: int
    wall_ms: float
    skipped: bool


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest.jsonl")


def read_manifest(out_dir: str) -> dict[int, dict]:
    done: dict[int, dict] = {}
    p = _manifest_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if rec.get("status") == "done":
                    done[rec["unit"]] = rec
    return done


def append_manifest(out_dir: str, rec: dict):
    with open(_manifest_path(out_dir), "a") as f:
        f.write(json.dumps(rec, sort_keys=True) + "\n")
        f.flush()
        os.fsync(f.fileno())


def list_fragments(input_dir: str) -> list[str]:
    if os.path.isfile(input_dir):  # single-file input = one fragment
        return [input_dir]
    frags = []
    for root, _, files in os.walk(input_dir):
        for fn in files:
            if fn.endswith(".parquet"):
                frags.append(os.path.join(root, fn))
    return sorted(frags)


def _atomic_write_parquet(ds, final_dir: str):
    tmp = final_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp)
    if not os.path.exists(tmp):
        # zero-row dataset: Ray writes no files at all — materialize an
        # empty parquet with the schema so the rename succeeds and readers
        # of the output tree see the columns
        os.makedirs(tmp)
        sch = ds.schema()
        if sch is not None and sch.names:
            import pyarrow as pa
            import pyarrow.parquet as pq
            empty = pa.table({n: pa.array([], type=t)
                              for n, t in zip(sch.names, sch.types)})
            pq.write_table(empty, os.path.join(tmp, "empty-0.parquet"))
    shutil.rmtree(final_dir, ignore_errors=True)
    os.rename(tmp, final_dir)


def full_check_run(input_dir: str, schema, out_dir: str, *,
                   unit_size: int = 16, keep_cols: list[str] | None = None,
                   pre_stages=None, unique_col: str | None = "url",
                   links_dir: str | None = None,
                   link_child_key: str = "dst_url",
                   link_parent_key: str = "url", overlap: int = 2) -> dict:
    """The complete P2 lifecycle in one call (BASELINE.md 'full check() run'):
    resumable per-unit extract+verdict+violation writes, then the sibling
    pipelines — uniqueness on ``unique_col`` and (when ``links_dir`` given)
    referential orphans — each written under ``out_dir`` and summarized.
    """
    import ray.data as rd

    from webval.pipelines import referential_orphans, uniqueness_violations

    units = run_check_with_manifest(input_dir, schema, out_dir,
                                    unit_size=unit_size, keep_cols=keep_cols,
                                    pre_stages=pre_stages, overlap=overlap)
    summary = {
        "rows": sum(u.rows for u in units),
        "violation_rows": sum(u.violations for u in units),
        "units": len(units),
        "units_skipped": sum(u.skipped for u in units),
    }
    if unique_col is not None:
        dups = uniqueness_violations(rd.read_parquet(input_dir), unique_col)
        _atomic_write_parquet(dups, os.path.join(out_dir, "dup_keys"))
        summary["dup_keys"] = rd.read_parquet(
            os.path.join(out_dir, "dup_keys")).count()
    if links_dir is not None:
        orphans = referential_orphans(
            rd.read_parquet(links_dir), rd.read_parquet(input_dir),
            link_child_key, link_parent_key, mode="auto")
        _atomic_write_parquet(orphans, os.path.join(out_dir, "orphans"))
        summary["orphans"] = rd.read_parquet(
            os.path.join(out_dir, "orphans")).count()
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, sort_keys=True, indent=1)
    return summary


def _parquet_num_rows(d: str) -> int:
    """Row count from parquet FOOTER metadata only — no data read (replaces
    the r1 re-read-to-count, VERDICT r1 wrong-3)."""
    import pyarrow.parquet as pq

    total = 0
    for root, _, files in os.walk(d):
        for fn in files:
            if fn.endswith(".parquet"):
                total += pq.ParquetFile(
                    os.path.join(root, fn)).metadata.num_rows
    return total


def run_check_with_manifest(input_dir: str, schema, out_dir: str, *,
                            unit_size: int = 16,
                            keep_cols: list[str] | None = None,
                            pre_stages=None, overlap: int = 2) -> list[UnitResult]:
    """Resumable P2: fragments grouped into units; completed units (per the
    manifest) are skipped.  ``pre_stages(ds) -> ds`` optionally applies the
    C1/C2 extraction stages before checking.

    A unit is skipped only when the manifest record's ``fragments`` list is
    IDENTICAL to the unit's current fragment list — if files were added or
    removed under ``input_dir`` between runs, the sorted-fragment grouping
    shifts and positional ids map to different data, so those units
    recompute (per-partition-lineage contract; ADVICE r1).

    ``overlap`` units execute concurrently from driver threads so one
    unit's write/metadata tail overlaps the next unit's read ramp-up; each
    unit is itself fully Ray-parallel, so overlap=2 suffices to keep the
    cluster busy.  Row/violation counts come from the written files'
    parquet footers (metadata-only), not data re-reads.
    """
    import threading
    from concurrent.futures import ThreadPoolExecutor

    import ray.data as rd

    from webval.checks import check_dataset, violations_of

    _stub_fsspec_http()
    os.makedirs(out_dir, exist_ok=True)
    frags = list_fragments(input_dir)
    units = [frags[i: i + unit_size] for i in range(0, len(frags), unit_size)]
    done = read_manifest(out_dir)
    mlock = threading.Lock()

    def run_unit(uid: int, unit_frags: list[str]) -> UnitResult:
        rec = done.get(uid)
        if rec is not None and rec.get("fragments") == unit_frags:
            return UnitResult(uid, rec["rows"], rec["violations"],
                              rec["wall_ms"], skipped=True)
        t0 = time.perf_counter()
        ds = rd.read_parquet(unit_frags)
        if pre_stages is not None:
            ds = pre_stages(ds)
        verdicts = check_dataset(ds, schema, keep_cols=keep_cols)
        vdir = os.path.join(out_dir, "verdicts", f"unit={uid}")
        _atomic_write_parquet(verdicts, vdir)
        # violations re-read the just-written verdicts (cheap, avoids
        # recomputing the check pass twice)
        viol = violations_of(rd.read_parquet(vdir))
        odir = os.path.join(out_dir, "violations", f"unit={uid}")
        _atomic_write_parquet(viol, odir)
        n_rows = _parquet_num_rows(vdir)
        n_viol = _parquet_num_rows(odir)
        wall_ms = (time.perf_counter() - t0) * 1000
        digest = hashlib.sha256(
            json.dumps([n_rows, n_viol, unit_frags]).encode()).hexdigest()[:16]
        with mlock:
            append_manifest(out_dir, {
                "unit": uid, "fragments": unit_frags, "rows": n_rows,
                "violations": n_viol, "wall_ms": round(wall_ms, 1),
                "status": "done", "stats_digest": digest})
        return UnitResult(uid, n_rows, n_viol, wall_ms, skipped=False)

    with ThreadPoolExecutor(max_workers=max(1, overlap)) as ex:
        return list(ex.map(run_unit, range(len(units)), units))
