"""Cluster job entry point for the full resumable validation run (P2).

This is the ``ray job submit`` surface the north_rule names: the same code
path runs unchanged on a laptop, a single node, or an N-node cluster —
Ray Data's streaming executor handles placement; the job owns (and is the
ONLY webval surface that owns) its Ray session.

Launch on a cluster (head node address from ``ray start --head``):

    ray job submit --address http://<head>:8265 \
        --working-dir /path/to/repo -- \
        python jobs/run_full_check.py --input /data/webpages \
            --out /data/check_out --links /data/links --extract

Or locally / on an existing cluster (RAY_ADDRESS respected):

    python jobs/run_full_check.py --input ... --out ...

Resumability: re-submitting the same job with the same --out skips every
completed unit recorded in the manifest (delete --out for a fresh run).
The schema is built once from a seeded sample when --schema is not given,
then saved under --out so resumed runs validate against the identical
spec instead of re-inferring from (possibly grown) data.
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
                    help="webpages parquet file/dir (url, warc_ts, html, "
                         "text, lang)")
    ap.add_argument("--out", required=True, help="output + manifest dir")
    ap.add_argument("--links", default=None,
                    help="optional links parquet for the referential check")
    ap.add_argument("--schema", default=None,
                    help="existing SchemaSpec JSON; default: build from a "
                         "sample of the input and save under --out")
    ap.add_argument("--sample-fraction", type=float, default=0.1,
                    help="schema-build sample (ignored with --schema)")
    ap.add_argument("--unit-size", type=int, default=16,
                    help="input fragments per resumable unit")
    ap.add_argument("--extract", action="store_true",
                    help="run HTML->text extraction as a pre-stage")
    ap.add_argument("--unique-col", default="url")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # under `ray job submit` / RAY_ADDRESS this attaches to the cluster;
        # standalone it starts a local session
        ray.init(ignore_reinit_error=True)
    import ray.data as rd

    from webval.api import Schema
    from webval.manifest import full_check_run

    os.makedirs(args.out, exist_ok=True)
    schema_path = args.schema or os.path.join(args.out, "schema.json")
    if args.schema or os.path.exists(schema_path):
        spec = Schema.load(schema_path).spec
    else:
        kinds = {"url": "text", "text": "text", "lang": "categorical"}
        sch = Schema(name="job_schema").build(
            rd.read_parquet(args.input, columns=list(kinds)),
            kinds, sample_fraction=args.sample_fraction)
        sch.save(schema_path)
        spec = sch.spec

    pre_stages = None
    if args.extract:
        from webval.extract import HtmlTextExtractor

        ext = HtmlTextExtractor()

        def pre_stages(ds):  # noqa: F811 - stage callable, name is the API
            return ds.map_batches(lambda b: ext(b), batch_format="pyarrow",
                                  batch_size=None)

    summary = full_check_run(
        args.input, spec, args.out, unit_size=args.unit_size,
        keep_cols=["url"], pre_stages=pre_stages,
        unique_col=args.unique_col, links_dir=args.links,
        link_child_key="dst_url", link_parent_key="url")
    print(json.dumps({"job": "run_full_check", "out": args.out, **summary},
                     sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
