"""Cluster job entry point for continuous-crawl deduplication against a
persisted fingerprint index (the operational face of
``dedup.build_dedup_index`` / ``dedup.incremental_dedup``).

Same contract as the other jobs/ entries (the north_rule's ``ray job
submit`` surface): identical code on a laptop or an N-node cluster; the
job owns its Ray session.

    # once: build the index from the existing corpus
    ray job submit --address http://<head>:8265 --working-dir /repo -- \
        python jobs/run_dedup.py init --input /data/corpus \
            --index /data/fpindex

    # per crawl increment (cron): keep only never-seen content, append
    # the survivors' fingerprints to the index (two-phase: a retried run
    # never sees its own writes)
    ray job submit ... -- \
        python jobs/run_dedup.py increment --input /data/crawl_0421 \
            --index /data/fpindex --out /data/crawl_0421_unique

The index is bucket-partitioned parquet: increment tasks read exactly the
partitions their fingerprints hash to (pruned reads), so index size grows
the corpus without growing any single task's input.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_init = sub.add_parser("init", help="build the fingerprint index")
    p_init.add_argument("--input", required=True)
    p_init.add_argument("--index", required=True)
    p_init.add_argument("--text-col", default="text")
    p_init.add_argument("--raw", action="store_true",
                        help="fingerprint raw text (default: normalized — "
                             "lower + whitespace collapse)")
    p_inc = sub.add_parser("increment",
                           help="dedup a shard against the index")
    p_inc.add_argument("--input", required=True)
    p_inc.add_argument("--index", required=True)
    p_inc.add_argument("--out", required=True,
                       help="directory for the surviving (new-content) rows")
    p_inc.add_argument("--id-col", default="doc_id")
    p_inc.add_argument("--text-col", default="text")
    p_inc.add_argument("--no-append", action="store_true",
                       help="decide only; do not commit survivors' "
                            "fingerprints to the index")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(ignore_reinit_error=True)
    import ray.data as rd

    from webval.dedup import build_dedup_index, incremental_dedup

    if args.cmd == "init":
        if os.path.isdir(args.index) and os.listdir(args.index):
            raise SystemExit(
                f"run_dedup init: --index {args.index!r} exists and is "
                "non-empty; use `increment` to add to an existing index")
        ds = rd.read_parquet(args.input, columns=[args.text_col])
        meta = build_dedup_index(ds, args.index, text_col=args.text_col,
                                 normalize=not args.raw)
        print(json.dumps({"job": "run_dedup", "cmd": "init",
                          "index": args.index,
                          "fingerprints": sum(meta["buckets"].values())},
                         sort_keys=True))
        return 0

    # increment
    if os.path.isdir(args.out) and os.listdir(args.out):
        raise SystemExit(
            f"run_dedup increment: --out {args.out!r} exists and is "
            "non-empty; delete it (or point at a fresh directory) to re-run")
    ds = rd.read_parquet(args.input)
    n_in = ds.count()
    survivors = incremental_dedup(ds, args.id_col, args.index,
                                  text_col=args.text_col,
                                  append=not args.no_append)
    os.makedirs(args.out, exist_ok=True)
    survivors.write_parquet(args.out)
    n_new = rd.read_parquet(args.out).count()   # footer metadata only
    print(json.dumps({"job": "run_dedup", "cmd": "increment",
                      "out": args.out, "rows_in": n_in, "rows_new": n_new,
                      "appended": not args.no_append}, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
