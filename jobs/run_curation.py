"""Cluster job entry point for the web-text curation pipeline: optional
exact dedup → corpus boilerplate-line removal → repetition filter →
sliding-window chunking → partitioned parquet.

Same contract as jobs/run_full_check.py (the north_rule's ``ray job
submit`` surface): the identical code path runs on a laptop, a single
node, or an N-node cluster, and the job owns its Ray session.

    ray job submit --address http://<head>:8265 \
        --working-dir /path/to/repo -- \
        python jobs/run_curation.py --input /data/docs \
            --out /data/curated --dedup exact

Output is a directory of parquet part files (one per output block) with
``(id, chunk_id, chunk_text, n_tokens)`` — delete --out to re-run; the
chunk count is re-read from the written footers (metadata only, no second
data pass).
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
                    help="documents parquet file/dir")
    ap.add_argument("--out", required=True, help="curated-chunk output dir")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--dedup", choices=("none", "exact"), default="exact",
                    help="exact: keep one doc (min id) per distinct text "
                         "before curation")
    ap.add_argument("--min-docs", type=int, default=300,
                    help="boilerplate-line threshold (appears in >= this "
                         "many docs)")
    ap.add_argument("--window", type=int, default=32,
                    help="chunk window in tokens")
    ap.add_argument("--overlap", type=int, default=8,
                    help="chunk overlap in tokens")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(ignore_reinit_error=True)
    import ray.data as rd

    from webval.dedup import exact_dedup
    from webval.textclean import curate_web_text

    ds = rd.read_parquet(args.input, columns=[args.id_col, args.text_col])
    n_in = ds.count()
    if args.dedup == "exact":
        ds = exact_dedup(ds, args.id_col, args.text_col)
    chunks = curate_web_text(ds, args.id_col, args.text_col,
                             min_docs=args.min_docs, window=args.window,
                             overlap=args.overlap, delimiter=" ")
    # fail fast on a dirty --out: write_parquet APPENDS part files, so a
    # re-run over leftovers would silently double-count chunks (ADVICE r3)
    if os.path.isdir(args.out) and os.listdir(args.out):
        raise SystemExit(
            f"run_curation: --out {args.out!r} exists and is non-empty; "
            "delete it (or point at a fresh directory) to re-run")
    os.makedirs(args.out, exist_ok=True)
    chunks.write_parquet(args.out)
    n_chunks = rd.read_parquet(args.out).count()   # footer metadata only
    print(json.dumps({"job": "run_curation", "out": args.out,
                      "rows_in": n_in, "chunks": n_chunks,
                      "dedup": args.dedup}, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
