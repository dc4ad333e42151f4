"""Cluster job entry point for the training-data prep pipeline:
blocklist filter → near-dedup keep-BEST (minhash clusters, longest doc
wins) → deterministic train/val/test split → concatenation-packing plan
per split → partitioned parquet.

Same contract as jobs/run_full_check.py (the north_rule's ``ray job
submit`` surface): the identical code path runs on a laptop, a single
node, or an N-node cluster, and the job owns its Ray session.

    ray job submit --address http://<head>:8265 \
        --working-dir /path/to/repo -- \
        python jobs/run_training_prep.py --input /data/docs \
            --out /data/prepped --context-len 2048 \
            --block cheap --block pills

Output: one subdirectory per split (``split=train`` …) of parquet part
files carrying (id, n_tokens, offset, bin, straddles) — the pack plan a
trainer's loader consumes — plus a JSON summary line on stdout.  Delete
--out to re-run (write_parquet appends part files otherwise).
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
    ap.add_argument("--out", required=True, help="pack-plan output dir")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--block", action="append", default=[],
                    help="blocklist phrase (repeatable); matching docs "
                         "are dropped before dedup")
    ap.add_argument("--jaccard", type=float, default=0.8,
                    help="minhash near-dup threshold")
    ap.add_argument("--context-len", type=int, default=2048,
                    help="training sequence length in tokens")
    ap.add_argument("--val-frac", type=float, default=0.05)
    ap.add_argument("--test-frac", type=float, default=0.05)
    ap.add_argument("--dsir-target-lang", default=None,
                    help="enable DSIR selection: target slice = rows "
                         "whose --lang-col equals this value")
    ap.add_argument("--lang-col", default="lang")
    ap.add_argument("--dsir-keep", type=int, default=0,
                    help="docs to keep via Gumbel-top-k ∝ exp(w/τ) "
                         "(required with --dsir-target-lang)")
    ap.add_argument("--dsir-tau", type=float, default=0.05)
    args = ap.parse_args(argv)
    if bool(args.dsir_target_lang) != bool(args.dsir_keep):
        ap.error("--dsir-target-lang and --dsir-keep go together")

    import ray

    if not ray.is_initialized():
        ray.init(ignore_reinit_error=True)
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from webval.dedup import drop_near_duplicates, minhash_dedup
    from webval.pipelines import assign_split, concat_packing
    from webval.textclean import tag_blocklist
    from webval.textstats import add_token_counts

    if os.path.isdir(args.out) and os.listdir(args.out):
        raise SystemExit(
            f"run_training_prep: --out {args.out!r} exists and is "
            "non-empty; delete it (or point at a fresh directory) to "
            "re-run")

    cols = [args.id_col, args.text_col]
    if args.dsir_target_lang:
        cols.append(args.lang_col)
    ds = rd.read_parquet(args.input, columns=cols)
    n_in = ds.count()

    if args.block:
        ds = tag_blocklist(ds, args.text_col, args.block)
        ds = ds.map_batches(
            lambda t: t.filter(pc.invert(t.column("blocked")))
            .drop_columns(["blocked"]),
            batch_format="pyarrow")
    n_clean = ds.count()

    # near-dedup, keeping the LONGEST member of every cluster (quality
    # proxy; swap score_col for a model score when one is attached)
    scored = add_token_counts(ds.select_columns([args.id_col,
                                                 args.text_col]))
    scored = scored.map_batches(
        lambda t: pa.table({args.id_col: t.column(args.id_col),
                            "n_tokens": t.column("ws_tokens")}),
        batch_format="pyarrow")
    clusters = minhash_dedup(ds, args.id_col, args.text_col,
                             jaccard_threshold=args.jaccard)
    with_score = ds.map_batches(
        lambda t: t.append_column(
            "q", pc.cast(pc.utf8_length(
                t.column(args.text_col).combine_chunks()
                .cast(pa.large_string())), pa.int64())),
        batch_format="pyarrow")
    kept = drop_near_duplicates(with_score, clusters, args.id_col,
                                score_col="q")
    kept = kept.map_batches(lambda t: t.drop_columns(["q"]),
                            batch_format="pyarrow")
    n_kept = kept.count()

    # optional DSIR selection over the DEDUPED corpus: score vs the
    # target-lang slice, keep --dsir-keep docs by deterministic
    # Gumbel-top-k ∝ exp(w/τ) (engine-portable membership; the Knuth
    # hash of the id is the uniform) — the data-mixing step between
    # dedup and split
    n_selected = None
    if args.dsir_target_lang:
        import numpy as np

        from webval.pipelines import gumbel_topk_sample
        from webval.textstats import dsir_importance

        tgt = args.dsir_target_lang
        lang_col = args.lang_col

        def tgt_mask(t: pa.Table):
            return np.asarray(
                pc.fill_null(pc.equal(
                    t.column(lang_col).combine_chunks(), tgt),
                    False).to_numpy(zero_copy_only=False), bool)

        scored_w = dsir_importance(kept, args.id_col, args.text_col,
                                   tgt_mask, n_buckets=4096)
        keyed = scored_w.map_batches(
            lambda t: t.append_column(
                "logit", pc.divide(t.column("dsir_w"), args.dsir_tau)),
            batch_format="pyarrow")
        top = gumbel_topk_sample(keyed, args.id_col, "logit",
                                 args.dsir_keep)
        winner_ref = ray.put(top.column(args.id_col).combine_chunks())

        def keep_winners(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t.column(args.id_col),
                                     value_set=ray.get(winner_ref)))

        kept = kept.map_batches(keep_winners, batch_format="pyarrow")
        n_selected = top.num_rows

    split = assign_split(
        kept.select_columns([args.id_col]), args.id_col,
        fractions=(1.0 - args.val_frac - args.test_frac,
                   args.val_frac, args.test_frac))
    counts = {}
    os.makedirs(args.out, exist_ok=True)
    from webval.joins import equi_join

    tokens = equi_join(scored, split, on=[args.id_col])
    for name in ("train", "val", "test"):
        part = tokens.filter(expr=f"split == '{name}'") \
            .select_columns([args.id_col, "n_tokens"])
        plan = concat_packing(part, args.id_col, "n_tokens",
                              args.context_len)
        out_dir = os.path.join(args.out, f"split={name}")
        os.makedirs(out_dir, exist_ok=True)
        plan.write_parquet(out_dir)
        counts[name] = rd.read_parquet(out_dir).count()  # footer-only

    print(json.dumps({"job": "run_training_prep", "out": args.out,
                      "rows_in": n_in, "rows_clean": n_clean,
                      "rows_kept": n_kept, "rows_selected": n_selected,
                      "splits": counts,
                      "context_len": args.context_len}, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
