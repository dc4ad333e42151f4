"""Cluster job entry point for the P3 drift-monitoring loop: build a
schema from the CURRENT data, contrast it against a saved BASELINE
schema (rdv's Schema.contrast), and write the drift report JSON — the
third job surface alongside run_full_check (P2) and run_curation.

    ray job submit --address http://<head>:8265 \
        --working-dir /path/to/repo -- \
        python jobs/run_contrast.py --input /data/webpages_today \
            --baseline /data/check_out/schema.json \
            --out /data/drift/2026-08-18.json

Exit code 0 = no drift past thresholds, 2 = drift detected (report
written either way) — cron-able as a data-quality gate.  With
``--per-partition`` the report also contains one row per ``part_id``
partition (partition_report), flagging WHICH shard drifted, and a
localized drift in any single shard fails the gate even when the global
distributions dilute it below the thresholds.  A baseline whose schema
records pre-stages (extraction etc.) has them replayed on the current
side automatically.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--input", required=True,
                    help="current webpages parquet file/dir")
    ap.add_argument("--baseline", required=True,
                    help="baseline SchemaSpec JSON (e.g. run_full_check's "
                         "schema.json)")
    ap.add_argument("--out", required=True, help="drift report JSON path")
    ap.add_argument("--html", default=None,
                    help="also render the report as a self-contained "
                         "static HTML file (rdv report-viewer analog)")
    ap.add_argument("--sample-fraction", type=float, default=1.0,
                    help="current-side build sample")
    ap.add_argument("--max-js", type=float, default=0.1)
    ap.add_argument("--max-psi", type=float, default=0.25)
    ap.add_argument("--min-chi2-p", type=float, default=0.001)
    ap.add_argument("--per-partition", action="store_true",
                    help="also emit a per-part_id partition report")
    ap.add_argument("--drift-cols", default=None,
                    help="comma-separated columns for the per-partition "
                         "drift flags (default: all profiled columns; "
                         "restrict to content columns — id-like or "
                         "time-ordered columns drift in EVERY partition "
                         "against a global baseline by construction)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(ignore_reinit_error=True)
    import ray.data as rd

    from webval.api import Schema
    from webval.pipelines import build_schema, contrast, partition_report
    from webval.stages import apply_pre_stages

    base = Schema.load(args.baseline).spec
    kinds = {p.name: p.kind for p in base.columns}
    cols = [c for c in kinds]
    # a baseline built with pre-stages (e.g. html->text extraction) records
    # them in its JSON; the current side must replay the SAME stages or we
    # would contrast raw vs extracted distributions (or fail to find the
    # post-stage column in the parquet at all)
    pre = list(getattr(base, "pre_stages", None) or [])
    read_cols = None if pre else cols

    def load(extra: list[str] | None = None):
        # dedup: a baseline that profiles part_id itself would otherwise
        # duplicate the column in read_parquet (ADVICE r3)
        rc = read_cols if extra is None or read_cols is None \
            else read_cols + [c for c in extra if c not in read_cols]
        ds = rd.read_parquet(args.input, columns=rc)
        return apply_pre_stages(ds, pre)

    cur = build_schema(load(), kinds, name="current",
                       sample_fraction=args.sample_fraction)

    report = contrast(base, cur, max_js=args.max_js, max_psi=args.max_psi,
                      min_chi2_p=args.min_chi2_p)
    drifted = bool(report["drifted"])
    if args.per_partition:
        dcols = (args.drift_cols.split(",") if args.drift_cols else None)
        pr = partition_report(load(["part_id"]), base, "part_id",
                              max_js=args.max_js,
                              min_chi2_p=args.min_chi2_p,
                              drift_cols=dcols)
        report["partitions"] = json.loads(pr.to_json(orient="records"))
        # the exit-code gate must catch LOCALIZED drift too: one bad shard
        # diluted below the global thresholds still fails the cron gate
        drifted = drifted or any(p.get("drifted") for p in
                                 report["partitions"])

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    tmp = f"{args.out}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(report, f, sort_keys=True, default=float)
    os.replace(tmp, args.out)
    if args.html:
        from webval.report_html import render_contrast_html

        os.makedirs(os.path.dirname(os.path.abspath(args.html)),
                    exist_ok=True)
        htmp = f"{args.html}.tmp.{os.getpid()}"
        with open(htmp, "w") as f:
            f.write(render_contrast_html(report))
        os.replace(htmp, args.html)
    print(json.dumps({"job": "run_contrast", "out": args.out,
                      "html": args.html, "drifted": drifted},
                     sort_keys=True))
    return 2 if drifted else 0


if __name__ == "__main__":
    raise SystemExit(main())
