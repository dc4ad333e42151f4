"""Benchmark harness (BASELINE.md measurement protocol).

Runs the headline pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1)
plus the synthetic webpages table at bench scale, inside
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32), and
prints ONE JSON line::

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling`` runs the headline pipeline twice in fresh processes
(num_cpus=8 and 32 — the sandbox proxy for N vs 4N nodes, BASELINE.json:14)
on the same input and reports both throughputs plus
efficiency = (t8/t32)/4, gated at ≥ 0.8.

Design note (measured, see BENCH/BASELINE.md): the C1 extraction fast path
is a pure function with no per-actor state, so the headline runs it as a
STATELESS TASK stage fused with the verdict map — at 4M rows this is 2.2×
faster at 32 cpus than the actor-pool form and scales near-linearly, while
Ray 2.49's actor-pool dispatch tops out at ~40% utilization here.  Actor
pools remain the shape for genuinely stateful stages (model-backed tagging,
media decode) and are measured separately as ``extract_actor_pool``.
"""

from __future__ import annotations

import json
import os
import sys
import time

# v4: versioned with the synth fixture content (entity/attribute-rich html,
# fetch_ms column) so stale caches from earlier rounds never get measured
BENCH_PAGES_ROOT = "/tmp/webval_bench/v4"
DEFAULT_HEADLINE_ROWS = 16_000_000
DEFAULT_OPS_ROWS = 400_000
MINHASH_ROWS = 1_000_000


def ensure_bench_pages(n_rows: int) -> str:
    """Ray-parallel one-time generation of the bench webpages table (cached
    across runs/processes — generation is not part of the measurement)."""
    from webval.synth import write_webpages

    out = os.path.join(BENCH_PAGES_ROOT, f"pages_{n_rows}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    import shutil
    shutil.rmtree(out, ignore_errors=True)
    write_webpages(out, n_rows, block_rows=20_000)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def _check_schema():
    from webval.schema import CheckSpec, SchemaSpec

    return SchemaSpec(name="webpages", built=True, checks=[
        CheckSpec("url-regex", "url", "regex", {"pattern": r"^https?://[^ ]+$"}),
        CheckSpec("lang-domain", "lang", "domain",
                  {"values": ["en", "de", "fr", "es", "nl", "ru", "zh"]}),
    ])


def run_headline(pages_dir: str, ncpu: int) -> dict:
    """html-bearing flagship: read → extract (fast path, fused with verdict
    map, stateless tasks) → violation rollup."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from webval.checks import make_verdict_fn
    from webval.extract import HtmlTextExtractor

    ext = HtmlTextExtractor()
    vf = make_verdict_fn(_check_schema(), keep_cols=["page_id"])

    def extract_check(batch: pa.Table) -> pa.Table:
        return vf(ext(batch))

    t0 = time.perf_counter()
    ds = rd.read_parquet(pages_dir, columns=["page_id", "url", "html", "lang"])
    # rollup via materialize + driver sum of the per-block scalars: a
    # trailing .sum() adds an AllToAllOperator whose resource reservation
    # caps the map stage at ~73% CPU in Ray 2.49 (measured: 32.5s -> 24.8s
    # at 32 cpus, utilization 23/32 -> 31/32); the materialized result is
    # one 8-byte row per block, so the driver-side add is free
    mat = (ds.map_batches(extract_check, batch_format="pyarrow", batch_size=8192)
             .map_batches(lambda t: pa.table(
                 {"f": [t.num_rows - pc.sum(t.column("pass")).as_py()]}),
                 batch_format="pyarrow")
             .materialize())
    n_fail = sum(r["f"] for r in mat.take_all())
    wall = time.perf_counter() - t0
    return {"wall": round(wall, 3), "violations": int(n_fail)}


def run_ops(sf_dir: str, ncpu: int, pages_dir: str) -> dict[str, float]:
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from webval.aggregates import profile_dataset
    from webval.checks import check_dataset
    from webval.extract import HtmlTextExtractor
    from webval.pipelines import build_schema, referential_orphans, uniqueness_violations
    from webval.synth import write_links
    from webval.textstats import add_fingerprints, add_token_counts

    timings: dict[str, float] = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *a):
                timings[name] = round(time.perf_counter() - self.t0, 3)
        return _T()

    links_dir = os.path.join(BENCH_PAGES_ROOT, "links_100000")
    if not os.path.exists(os.path.join(links_dir, "_DONE")):
        write_links(links_dir, 100_000, DEFAULT_OPS_ROWS)
        open(os.path.join(links_dir, "_DONE"), "w").write("ok")

    # actor-pool extraction (the stateful-stage shape), measured honestly
    with timed("extract_actor_pool"):
        ds = rd.read_parquet(pages_dir, columns=["page_id", "html"])
        (ds.map_batches(HtmlTextExtractor, batch_format="pyarrow",
                        batch_size=8192, concurrency=(4, max(4, ncpu - 2)),
                        num_cpus=1, max_concurrency=2)
           .map_batches(lambda t: pa.table({"n": [t.num_rows]}),
                        batch_format="pyarrow").sum("n"))

    with timed("schema_build"):
        kinds = {"url": "text", "warc_ts": "timestamp", "text": "text",
                 "lang": "categorical"}
        build_schema(rd.read_parquet(
            pages_dir, columns=["url", "warc_ts", "text", "lang"]),
            kinds, name="bench")

    with timed("uniqueness"):
        uniqueness_violations(
            rd.read_parquet(pages_dir, columns=["url"]), "url").count()

    with timed("referential"):
        referential_orphans(rd.read_parquet(links_dir),
                            rd.read_parquet(pages_dir, columns=["url"]),
                            "dst_url", "url", mode="broadcast").count()

    with timed("grouped_stats_lineitem"):
        from ray.data.aggregate import Count, Max, Mean, Min, Sum
        (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity", "l_extendedprice"])
           .groupby("l_returnflag")
           .aggregate(Count(alias_name="n"), Sum("l_quantity", alias_name="s"),
                      Min("l_quantity", alias_name="mn"),
                      Max("l_quantity", alias_name="mx"),
                      Mean("l_extendedprice", alias_name="avg"))
           .to_pandas())

    with timed("profile_lineitem"):
        profile_dataset(
            rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_quantity", "l_extendedprice", "l_discount"]),
            {"l_quantity": "numeric", "l_extendedprice": "numeric",
             "l_discount": "numeric"})

    with timed("full_check_e2e"):
        # the complete resumable P2: extract -> verdicts+violations written
        # per unit with manifest lines, then uniqueness + referential writes
        import shutil

        from webval.manifest import full_check_run

        out_dir = os.path.join(BENCH_PAGES_ROOT, "full_check_out")
        shutil.rmtree(out_dir, ignore_errors=True)
        ext = HtmlTextExtractor()

        def extract_stage(ds):
            return ds.map_batches(lambda b: ext(b), batch_format="pyarrow",
                                  batch_size=None)

        full_check_run(pages_dir, _check_schema(), out_dir, unit_size=10,
                       keep_cols=["page_id", "url"], pre_stages=extract_stage,
                       unique_col="url", links_dir=links_dir,
                       link_child_key="dst_url", link_parent_key="url")

    with timed("fingerprint_tokens"):
        ds = rd.read_parquet(pages_dir, columns=["page_id", "text"])
        add_token_counts(add_fingerprints(ds)).map_batches(
            lambda t: pa.table({"n": [t.num_rows]}),
            batch_format="pyarrow").sum("n")

    with timed("model_score_actor_pool"):
        # the model-backed stateful-stage shape: weights loaded from file
        # once per actor, scored per batch (VERDICT r1 next-10)
        from webval.multimodal import (
            LinearMediaScorer,
            MediaFeatureExtractor,
            write_linear_scorer_weights,
        )
        wpath = os.path.join(BENCH_PAGES_ROOT, "scorer_weights.npz")
        if not os.path.exists(wpath):
            write_linear_scorer_weights(wpath)
        ds = rd.read_parquet(pages_dir, columns=["page_id", "html"])
        (ds.map_batches(lambda t: t.filter(pc.is_valid(t.column("html"))),
                        batch_format="pyarrow")
           .map_batches(MediaFeatureExtractor, batch_format="pyarrow",
                        batch_size=4096, concurrency=(4, max(4, ncpu // 2)),
                        num_cpus=1, max_concurrency=2,
                        fn_constructor_kwargs={"media_col": "html"})
           .map_batches(LinearMediaScorer, batch_format="pyarrow",
                        batch_size=4096, concurrency=(2, max(2, ncpu // 4)),
                        num_cpus=1, max_concurrency=2,
                        fn_constructor_kwargs={"weights_path": wpath})
           .map_batches(lambda t: pa.table({"n": [t.num_rows]}),
                        batch_format="pyarrow").sum("n"))

    # WARC container source: shard the ops pages once (cached), then time
    # the parallel chunked-gzip read back into Dataset rows
    from webval.sources import read_warc, write_warc

    warc_dir = os.path.join(BENCH_PAGES_ROOT, f"warc_{DEFAULT_OPS_ROWS}")
    if not os.path.exists(os.path.join(warc_dir, "_DONE")):
        import pyarrow.parquet as pq

        tables = [pq.read_table(os.path.join(pages_dir, f))
                  for f in sorted(os.listdir(pages_dir))
                  if f.endswith(".parquet")]
        write_warc(pa.concat_tables(tables).select(
            ["url", "warc_ts", "html"]), warc_dir, shard_rows=25_000)
        open(os.path.join(warc_dir, "_DONE"), "w").write("ok")
    import glob

    with timed("warc_read"):
        # materialize + driver sum per the AllToAll-reservation rule
        # (CLAUDE.md / finding 2): a trailing .sum() caps the map stage CPU
        mat = read_warc(sorted(glob.glob(os.path.join(warc_dir,
                                                      "*.warc.gz")))
                        ).map_batches(
            lambda t: pa.table({"n": [t.num_rows]}),
            batch_format="pyarrow").materialize()
        assert sum(r["n"] for r in mat.take_all()) > 0

    # r3s3 curation ops at 400k pages (words as 'lines' — the fixture text
    # is single-line); all end in a tiny rollup + materialize/driver-sum
    # per the AllToAll-reservation rule (finding 2)
    from webval.textclean import (
        chunk_text,
        contamination_check,
        remove_boilerplate_lines,
    )

    with timed("line_dedup_400k"):
        ds = rd.read_parquet(pages_dir, columns=["page_id", "text"])
        mat = remove_boilerplate_lines(
            ds, "page_id", "text", min_docs=DEFAULT_OPS_ROWS // 2,
            delimiter=" ").map_batches(
            lambda t: pa.table({"n": [t.num_rows],
                                "rm": [pc.sum(t.column("n_removed")).as_py()
                                       or 0]}),
            batch_format="pyarrow").materialize()
        rows = sum(r["n"] for r in mat.take_all())
        assert rows == DEFAULT_OPS_ROWS

    with timed("chunk_text_400k"):
        ds = rd.read_parquet(pages_dir, columns=["page_id", "text"])
        mat = chunk_text(ds, "page_id", "text", window=8,
                         overlap=2).map_batches(
            lambda t: pa.table({"n": [t.num_rows]}),
            batch_format="pyarrow").materialize()
        assert sum(r["n"] for r in mat.take_all()) >= DEFAULT_OPS_ROWS

    with timed("contamination_400k"):
        ds = rd.read_parquet(pages_dir, columns=["page_id", "text"])
        evals = [r["text"] for r in ds.limit(50).take_all()]
        mat = contamination_check(ds, "page_id", "text",
                                  eval_texts=evals).map_batches(
            lambda t: pa.table(
                {"n": [t.num_rows],
                 "c": [pc.sum(pc.cast(t.column("contaminated"),
                                      pa.int64())).as_py() or 0]}),
            batch_format="pyarrow").materialize()
        recs = mat.take_all()
        assert sum(r["n"] for r in recs) == DEFAULT_OPS_ROWS
        assert sum(r["c"] for r in recs) >= 50  # the leaked docs themselves

    with timed("lm_fit_score_400k"):
        # CCNet-shape LM quality: fit the unigram LM on the corpus
        # (term-count exchange), broadcast the vocab, score every page
        from webval.lm import fit_unigram_lm, score_unigram_lm

        ds = rd.read_parquet(pages_dir, columns=["page_id", "text"])
        lm_model = fit_unigram_lm(ds, "text")
        mat = score_unigram_lm(ds, lm_model).map_batches(
            lambda t: pa.table({"n": [t.num_rows]}),
            batch_format="pyarrow").materialize()
        assert sum(r["n"] for r in mat.take_all()) == DEFAULT_OPS_ROWS

    with timed("lm_fit_capped_vocab_400k"):
        # r4: the distributed top-k vocabulary selection (fit_unigram_lm
        # above the driver_vocab_max gate) measured, not asserted —
        # driver_vocab_max=1000 forces the prune/fan-in path at bench scale
        ds = rd.read_parquet(pages_dir, columns=["text"])
        lm_capped = fit_unigram_lm(ds, "text", vocab_size=50_000,
                                   driver_vocab_max=1000)
        assert 0 < lm_capped.vocab.num_rows <= 50_000
        assert lm_capped.total_tokens == lm_model.total_tokens  # same corpus

    with timed("nfc_normalize_400k"):
        # r4: unicode normalization over 400k NON-ASCII-heavy docs — the
        # realistic multilingual class VERDICT r3 wrong-1 cited.  Every doc
        # is made non-ASCII ('e'→'é', already-NFC: the vectorized
        # suspect-gate skip must carry it); every 16th doc is decomposed
        # ('é'→'e'+U+0301) so the Python normalize path stays exercised.
        from webval.textclean import normalize_unicode

        ds = rd.read_parquet(pages_dir, columns=["page_id", "text"])

        def make_nonascii(t: pa.Table) -> pa.Table:
            txt = pc.replace_substring(t.column("text"), "e", "\u00e9")
            dec = pc.replace_substring(txt, "\u00e9", "e\u0301")
            m = pc.equal(pc.bit_wise_and(t.column("page_id"),
                                         pa.scalar(15, pa.int64())), 0)
            return pa.table({"page_id": t.column("page_id"),
                             "text": pc.if_else(m, dec, txt)})

        nds = ds.map_batches(make_nonascii, batch_format="pyarrow")
        mat = normalize_unicode(nds, "text").map_batches(
            lambda t: pa.table({
                "n": [t.num_rows],
                "dec": [pc.sum(pc.cast(pc.match_substring(
                    t.column("text"), "\u0301"), pa.int64())).as_py() or 0]}),
            batch_format="pyarrow").materialize()
        recs = mat.take_all()
        assert sum(r["n"] for r in recs) == DEFAULT_OPS_ROWS
        # NFC recomposes every planted e+COMBINING ACUTE: none survive
        assert sum(r["dec"] for r in recs) == 0

    with timed("bm25_search_400k"):
        from webval.search import bm25_search

        ds = rd.read_parquet(pages_dir, columns=["page_id", "text"])
        # query terms must come from the bench fixture's vocabulary — the
        # original "fast vector scan" (sf-testdata vocabulary) matched zero
        # docs, and the failed assert crashed EVERY full bench run since
        # the entry landed (found r3s5)
        assert bm25_search(ds, "page_id", "text",
                           "market world game", k=10).count() == 10

    with timed("frequent_bigrams_400k"):
        from webval.textclean import frequent_ngrams

        ds = rd.read_parquet(pages_dir, columns=["text"])
        mat = frequent_ngrams(ds, "text", n=2,
                              min_count=DEFAULT_OPS_ROWS // 100) \
            .map_batches(lambda t: pa.table({"n": [t.num_rows]}),
                         batch_format="pyarrow").materialize()
        assert sum(r["n"] for r in mat.take_all()) > 0

    # fully distributed near-dedup at >=1M docs (VERDICT r1 next-1):
    # LSH candidates -> distributed Jaccard verify -> label propagation
    from webval.dedup import minhash_dedup

    mh_pages = ensure_bench_pages(MINHASH_ROWS)
    rd.read_parquet(mh_pages).count()  # warm page cache (untimed, same as headline)
    with timed("minhash_dedup_1m"):
        ds = rd.read_parquet(mh_pages, columns=["page_id", "text"])
        minhash_dedup(ds, "page_id",
                      components="distributed").map_batches(
            lambda t: pa.table({"n": [t.num_rows]}),
            batch_format="pyarrow").sum("n")

    # vocabulary drift over the 400k-page raw html: token explode →
    # distinct (side, token) exchange → presence-flag rollup
    with timed("vocab_drift_400k"):
        from webval.textstats import vocab_overlap

        nb, na, _ = vocab_overlap(
            rd.read_parquet(pages_dir, columns=["page_id", "html"]),
            "page_id", "html")
        assert nb > 0 and na > 0

    # 1M-row synthetic activity table for the event-time distinct ops
    # (cached; generation is untimed, 16 files for read parallelism)
    events_dir = os.path.join(BENCH_PAGES_ROOT, "events_1m")
    ev_marker = os.path.join(events_dir, "_DONE")
    if not os.path.exists(ev_marker):
        import numpy as np
        import pyarrow.parquet as pq
        rng = np.random.default_rng(42)
        os.makedirs(events_dir, exist_ok=True)
        shard = 1_000_000 // 16
        for i in range(16):
            t = pa.table({
                "user_id": pa.array(rng.integers(0, 200_000, shard)),
                "ts": pa.array(rng.integers(0, 60 * 86_400_000_000, shard))
                        .cast(pa.timestamp("us")),
            })
            pq.write_table(t, os.path.join(events_dir, f"ev_{i:02d}.parquet"))
        open(ev_marker, "w").write("ok")
    ev_paths = [os.path.join(events_dir, f"ev_{i:02d}.parquet")
                for i in range(16)]

    with timed("retention_1m"):
        from webval.windows import retention_cells

        retention_cells(rd.read_parquet(ev_paths),
                        key="user_id", ts_col="ts").count()

    with timed("rolling_active_7d_1m"):
        from webval.windows import rolling_distinct_count

        rolling_distinct_count(rd.read_parquet(ev_paths),
                               key="user_id", ts_col="ts",
                               window=7).count()

    with timed("pmi_collocations_400k"):
        from webval.textstats import pmi_collocations

        top = pmi_collocations(
            rd.read_parquet(pages_dir, columns=["text"]),
            "text", min_count=50, top_k=20).take_all()
        # asserts against the bench fixture itself: synth vocabulary
        # repeats heavily, so pairs above min_count=50 must exist and
        # every returned pair must satisfy the cut
        assert 1 <= len(top) <= 20
        assert all(r["c12"] >= 50 for r in top)

    with timed("cusum_1m"):
        import pyarrow.compute as _pc

        from webval.exchange import grouped_agg
        from webval.windows import cusum_scores

        daily = grouped_agg(
            rd.read_parquet(ev_paths).map_batches(
                lambda t: pa.table({
                    "user_id": t.column("user_id"),
                    "day": _pc.floor_temporal(t.column("ts"),
                                              unit="day")}),
                batch_format="pyarrow"),
            ["user_id", "day"], [("day", "count")],
            rename={"day_count": "n"})
        daily = daily.map_batches(
            lambda t: t.set_column(
                t.column_names.index("n"), "n",
                _pc.cast(t.column("n"), pa.float64())),
            batch_format="pyarrow")
        n_out = cusum_scores(daily, "user_id", "day", "n",
                             target=1.0, slack=0.1).count()
        # one score per (user, active-day): 1M events over 200k users ×
        # 60 days -> between 0.9M (collisions) and 1M pairs
        assert 800_000 <= n_out <= 1_000_000

    # r5 (VERDICT r4 next-2): per-key quantiles at 1M keys through the
    # t-digest exchange — the key cardinality Ray's sort-based groupby
    # cannot touch (~10k groups/s).  Dedicated numeric fixture: 8M rows,
    # exactly 1M keys × 8 values, cached + untimed like every fixture.
    tdg_dir = os.path.join(BENCH_PAGES_ROOT, "tdigest_8m")
    tdg_marker = os.path.join(tdg_dir, "_DONE")
    if not os.path.exists(tdg_marker):
        import numpy as np
        import pyarrow.parquet as pq
        os.makedirs(tdg_dir, exist_ok=True)
        shard = 8_000_000 // 16
        for i in range(16):
            rng = np.random.default_rng(100 + i)
            idx = np.arange(i * shard, (i + 1) * shard, dtype=np.int64)
            t = pa.table({
                "k": pa.array(idx % 1_000_000),
                "x": pa.array(rng.lognormal(6.0, 1.0, shard)),
            })
            pq.write_table(t, os.path.join(tdg_dir, f"td_{i:02d}.parquet"))
        open(tdg_marker, "w").write("ok")

    with timed("grouped_tdigest_1m_keys"):
        from webval.exchange import grouped_tdigest

        out = grouped_tdigest(
            rd.read_parquet(tdg_dir), "k", "x", [0.5, 0.95],
            num_buckets=4 * ncpu).materialize()
        # asserts phrased against the fixture's own shape: exactly 1M keys
        # out, and quantile monotonicity (p95 >= p50) on every row
        recs = out.map_batches(
            lambda t: pa.table({
                "n": [t.num_rows],
                "bad": [pc.sum(pc.cast(pc.less(t.column("p95"),
                                               t.column("p50")),
                                       pa.int64())).as_py() or 0]}),
            batch_format="pyarrow").take_all()
        assert sum(r["n"] for r in recs) == 1_000_000
        assert sum(r["bad"] for r in recs) == 0

    # r5 (VERDICT r4 next-6): ANN recall/latency at 1M vectors.  Fixture:
    # 1M × 64-dim float32, 1024 planted unit-norm centers + sigma 0.15
    # noise — clustered like real embedding corpora, so recall is a
    # meaningful number (uniform-random vectors have no neighbors to
    # recall).  Queries are 32 fixture points; ground truth is the
    # DISTRIBUTED brute-force scan, also timed.
    import numpy as np

    vec_dir = os.path.join(BENCH_PAGES_ROOT, "vecs_1m")
    vec_marker = os.path.join(vec_dir, "_DONE")
    dim, n_vec, n_centers = 64, 1_000_000, 1024
    if not os.path.exists(vec_marker):
        import pyarrow.parquet as pq
        os.makedirs(vec_dir, exist_ok=True)
        cg = np.random.default_rng(7)
        centers = cg.standard_normal((n_centers, dim)).astype(np.float32)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        shard = n_vec // 16
        for i in range(16):
            rng = np.random.default_rng(200 + i)
            idx = np.arange(i * shard, (i + 1) * shard, dtype=np.int64)
            m = centers[idx % n_centers] + \
                0.15 * rng.standard_normal((shard, dim)).astype(np.float32)
            t = pa.table({
                "vec_id": pa.array(idx),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(m.ravel(), pa.float32()), dim)})
            pq.write_table(t, os.path.join(vec_dir, f"v_{i:02d}.parquet"))
        open(vec_marker, "w").write("ok")

    from webval.similarity import brute_force_topk, build_ivf_index, ivf_index_topk

    # query vectors: positional reads of just the owning shards (vec_id is
    # the global row index by construction) — fixture setup, untimed
    import pyarrow.parquet as pq

    qg = np.random.default_rng(33)
    q_ids = sorted(set(int(i) for i in qg.integers(0, n_vec, 32)))
    shard_rows = n_vec // 16
    qmat = np.empty((len(q_ids), dim), np.float32)
    for qi, vid in enumerate(q_ids):
        t = pq.read_table(os.path.join(vec_dir, f"v_{vid // shard_rows:02d}.parquet"),
                          columns=["embedding"])
        qmat[qi] = np.asarray(
            t.column("embedding").chunk(0)[vid % shard_rows].as_py(),
            np.float32)

    ann_idx_dir = os.path.join(BENCH_PAGES_ROOT, "ivf_idx_1m")
    with timed("ann_ivf_build_1m"):
        build_ivf_index(rd.read_parquet(vec_dir), ann_idx_dir,
                        n_centroids=256, sample_size=50_000,
                        rows_per_file=200_000, num_buckets=2 * ncpu)

    with timed("ann_brute_1m"):
        exact = {}
        for r in brute_force_topk(rd.read_parquet(vec_dir), qmat,
                                  k=10).take_all():
            exact.setdefault(r["query_id"], []).append(r["vec_id"])

    with timed("ann_ivf_query_1m"):
        approx = {}
        # n_probe=48 of 256 cells: the 1024 planted clusters split ~4 per
        # IVF cell, and boundary queries need dozens of cells for their
        # home cluster.  History: recall 0.884 at n_probe=8 (crashed the
        # first full r5 bench pass), 0.956 at 24 on THAT session's index —
        # but the quantizer sample was arrival-order .take(), so recall at
        # fixed n_probe varied build to build (a later fresh build read
        # 0.872 at 24 and crashed another full pass).  The build is now
        # deterministic (hash-selected sorted sample, similarity.py) and
        # the pinned index reads 0.922 @ 32, 0.947 @ 48 — probe 48 for
        # margin; the number is now a constant of the fixture, not a roll.
        for r in ivf_index_topk(ann_idx_dir, qmat, k=10,
                                n_probe=48).take_all():
            approx.setdefault(r["query_id"], []).append(r["vec_id"])

    recalls = [len(set(approx.get(j, [])) & set(exact[j])) / 10
               for j in exact]
    timings["ann_ivf_recall_at_10"] = round(float(np.mean(recalls)), 3)
    assert np.mean(recalls) >= 0.9, recalls

    with timed("cocitation_1m"):
        from webval.graph import cocitation_pairs

        pairs = cocitation_pairs(
            rd.read_parquet(ev_paths).map_batches(
                lambda t: pa.table({
                    "src": t.column("user_id"),
                    "dst": _pc.cast(_pc.floor_temporal(t.column("ts"),
                                                       unit="day"),
                                    pa.int64())}),
                batch_format="pyarrow"),
            "src", "dst", max_out=8, min_cocite=2, top_k=20).take_all()
        # 200k users × ≤C(8,2) day pairs over only 60 distinct days:
        # the hottest day pairs are co-cited by thousands of users
        assert len(pairs) == 20
        assert all(p["n"] >= 1000 for p in pairs)

    # ----- r5 session: curation-operator family at bench scale ------------
    # DSIR / logreg / CDC run on the ASCII slice of the pages fixture
    # (their SQL-portable position hash is defined on ASCII; the slice is
    # ~56% of rows and each lang has its own synth vocabulary — the
    # asserts below are properties of THIS fixture, not of sf-testdata).
    from webval.dedup import cdc_chunk_stats, semdedup_prune
    from webval.textstats import dsir_importance, logreg_fit_hashed

    def ascii_slice(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        m = pc.and_(pc.is_valid(txt),
                    pc.equal(pc.binary_length(txt), pc.utf8_length(txt)))
        m = pc.and_(m, pc.not_equal(pc.fill_null(txt, ""), ""))
        t = t.filter(m)
        return t.set_column(t.column_names.index("lang"), "lang",
                            pc.fill_null(t.column("lang"), "unk"))

    def en_mask(t: pa.Table):
        import numpy as np
        return np.asarray(
            pc.equal(t.column("lang").combine_chunks(), "en")
            .to_numpy(zero_copy_only=False), bool)

    asc = rd.read_parquet(pages_dir,
                          columns=["page_id", "lang", "text"]) \
        .map_batches(ascii_slice, batch_format="pyarrow")

    with timed("dsir_400k"):
        import numpy as np
        out = dsir_importance(asc, "page_id", "text", en_mask,
                              n_buckets=4096,
                              keep_cols=("lang",)).materialize()
        s_en = s_fr = 0.0
        n_en = n_fr = 0
        for b in out.iter_batches(batch_format="pyarrow",
                                  batch_size=None):
            lg = b.column("lang").to_numpy(zero_copy_only=False)
            w = b.column("dsir_w").to_numpy(zero_copy_only=False)
            men, mfr = lg == "en", lg == "fr"
            s_en += float(w[men].sum())
            n_en += int(men.sum())
            s_fr += float(w[mfr].sum())
            n_fr += int(mfr.sum())
        # en is the TARGET slice and fr has a disjoint synth function
        # vocabulary, so the mean importance weight must separate
        assert n_en > 0 and n_fr > 0
        assert s_en / n_en > s_fr / n_fr, (s_en / n_en, s_fr / n_fr)

    with timed("logreg_400k"):
        import numpy as np
        w = logreg_fit_hashed(asc, "text", en_mask, n_buckets=4096,
                              n_iter=2, lr=0.5)
        assert np.isfinite(w).all() and float(np.abs(w).max()) > 0.0

    with timed("cdc_chunks_400k"):
        st = pa.concat_tables(
            cdc_chunk_stats(asc, "lang", "text",
                            num_buckets=2 * ncpu)
            .iter_batches(batch_format="pyarrow", batch_size=None))
        tot = int(pc.sum(st.column("n_chunks")).as_py())
        dis = int(pc.sum(st.column("n_distinct")).as_py())
        # the pages fixture plants exact-copy dup pages, and every copy
        # shares ALL its chunks -> distinct strictly below total
        assert tot > dis > 0, (tot, dis)

    with timed("semdedup_1m"):
        import numpy as np
        from webval.clustering import kmeans_fit

        vds = rd.read_parquet(vec_dir)
        # 4096-row batches BEAT 64k here (A/B'd): the 512-col score
        # matrix stays cache-sized (16 MB vs 268 MB) — the fit cost was
        # never the matmul but the driver's to_pylist partial reduce,
        # now flatten()-based in kmeans_fit
        cents = kmeans_fit(vds, "embedding", 512, n_iter=2, seed=0,
                           init_sample=8192)
        n_rows = n_pruned = 0
        for b in semdedup_prune(vds, "vec_id", "embedding", cents,
                                eps=0.6, num_buckets=2 * ncpu) \
                .iter_batches(batch_format="pyarrow", batch_size=None):
            n_rows += b.num_rows
            n_pruned += int(pc.sum(pc.cast(b.column("pruned"),
                                           pa.int64())).as_py() or 0)
        assert n_rows == n_vec
        # 1024 planted centers at noise 0.15: ~1.5% of same-center pair
        # cosines clear 0.6 (measured on the generator), and each point
        # has ~1000 same-center peers -> a nonzero but partial prune
        frac = n_pruned / n_rows
        timings["semdedup_1m_pruned_frac"] = round(frac, 4)
        assert 0.01 < frac < 0.995, frac

    return timings


def host_speed_probe() -> float:
    """Single-thread GFLOPS of one 2000³ matmul — recorded alongside every
    measurement because this box's hypervisor neighbors can slow a vCPU
    2-5× with ZERO visible steal time (observed r3s3: probe 6.5 → 1.3
    GFLOPS while /proc/stat read 99.7% idle).  Compare probes before
    comparing wall times across runs/rounds."""
    import numpy as np

    a = np.random.default_rng(0).standard_normal((2000, 2000))
    t0 = time.perf_counter()
    a @ a
    return round(2 * 2000**3 / (time.perf_counter() - t0) / 1e9, 2)


def main_once(headline_only: bool) -> dict:
    import ray

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_headline = int(os.environ.get("WEBVAL_BENCH_ROWS", str(DEFAULT_HEADLINE_ROWS)))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    try:
        big = ensure_bench_pages(n_headline)
        rd.read_parquet(big).count()  # warm page cache (untimed)
        head = run_headline(big, ncpu)
        timings = {"extract_check": head["wall"]}
        extras = {"extract_check_violations": head["violations"]}
        if not headline_only:
            small = ensure_bench_pages(DEFAULT_OPS_ROWS)
            rd.read_parquet(small).count()
            timings.update(run_ops(sf_dir, ncpu, small))
    finally:
        ray.shutdown()
    return {
        "metric": "webpages_extract_check_wall_sec",
        "value": head["wall"],
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": ncpu,
        "headline_rows": n_headline,
        "ops_rows": DEFAULT_OPS_ROWS,
        "docs_per_sec": round(n_headline / head["wall"], 1),
        "host_gflops_probe": host_speed_probe(),
        **extras,
    }


_BURN_CODE = ("import numpy as np\n"
              "x = np.random.default_rng(0).standard_normal(2_000_000)\n"
              "while True:\n"
              "    (x * 1.0000001).sum()\n")


def run_scaling() -> dict:
    """Fresh process per parallelism level; best-of-2 per level with a
    settle pause between runs (consecutive Ray sessions on one box disturb
    each other's page cache / lingering workers — observed 30%+ wall-time
    noise on back-to-back runs).

    EQUAL-AMBIENT-LOAD protocol (measured r2): on this box a core runs
    ~40% faster when its 24 neighbors are idle (DVFS/turbo ≈16% on an
    L1-resident probe, the rest shared cache + DRAM bandwidth), so a naive
    8-of-32-core run models a 4×-overclocked small cluster, not N nodes —
    real N and 4N clusters keep EVERY node fully busy at both sizes, so
    per-core conditions are identical and only the engine's coordination/
    shuffle/straggler overhead differs.  The proxy therefore occupies the
    unused cores with pure-compute burner processes during the smaller
    level's measurement, equalizing ambient load; with the burners removed
    the same job measures ~0.70 "efficiency" from host physics alone
    (BENCH/BASELINE.md documents both numbers).
    """
    import subprocess

    total_cores = os.cpu_count() or 32

    def one(ncpu: int, burn: bool) -> dict:
        # ADVICE r2: leave headroom for driver + raylet + Ray system procs
        # (gcs/log monitors) so the burners never oversubscribe the level
        # under measurement — an over-corrected (>1.0) reading is a
        # protocol error, not a margin
        n_burn = max(0, total_cores - ncpu - 4) if burn else 0
        burners = [subprocess.Popen([sys.executable, "-c", _BURN_CODE])
                   for _ in range(n_burn)]
        try:
            if burners:
                time.sleep(2)
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--headline-only"],
                env=env, capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)))
        finally:
            for p in burners:
                p.kill()
        return json.loads(out.stdout.strip().splitlines()[-1])

    results: dict = {}
    one(32, False)  # untimed warm-up: generates/caches input, warms page cache
    # INTERLEAVE the levels rather than phase them: host noise on this box
    # drifts over minutes, and phased runs let the drift land entirely on
    # one level, flipping the gate (observed ±20% session-level swings with
    # steady per-session medians).  "8n" = naive 8-cpu run (no burners),
    # reported alongside per ADVICE r2.  Best-of-3 on the two gate levels:
    # with best-of-2 a single noisy 32-cpu sample (17.8 vs 20.5 s observed
    # across back-to-back gate runs) swings the ratio through the gate.
    # r5 (VERDICT r4 next-7): a THIRD level (16 cpus, same burner protocol,
    # best-of-2) turns the single ratio into an efficiency curve; the gate
    # stays on the 8->32 pair.
    for key, ncpu, burn in (("8", 8, True), ("32", 32, False),
                            ("8n", 8, False), ("16", 16, True),
                            ("8", 8, True), ("32", 32, False),
                            ("8n", 8, False), ("16", 16, True),
                            ("8", 8, True), ("32", 32, False)):
        time.sleep(8)
        r = one(ncpu, burn)
        if key not in results or r["value"] < results[key]["value"]:
            results[key] = r
    t8, t32 = results["8"]["value"], results["32"]["value"]
    t8n, t16 = results["8n"]["value"], results["16"]["value"]
    eff = (t8 / t32) / (32 / 8)
    naive_eff = (t8n / t32) / (32 / 8)
    eff_8_16 = (t8 / t16) / (16 / 8)
    eff_16_32 = (t16 / t32) / (32 / 16)
    # the honest reading lies between the naive (ambient-biased fast small
    # level, a LOWER bound) and the protocol number; >1.0 means the burners
    # over-corrected and the protocol measurement is invalid — then only a
    # naive reading already above the gate may pass (never the clamp)
    protocol_ok = eff <= 1.0
    gate_pass = (0.8 <= eff <= 1.0) or naive_eff >= 0.8
    return {
        "metric": "scaling_efficiency_8_to_32_cpus",
        "value": round(min(eff, 1.0), 3),
        "unit": "efficiency",
        "efficiency_raw": round(eff, 3),
        "naive_efficiency": round(naive_eff, 3),
        "efficiency_8_16": round(eff_8_16, 3),
        "efficiency_16_32": round(eff_16_32, 3),
        "host_gflops_probe": host_speed_probe(),
        "sec_8": t8, "sec_8_naive": t8n, "sec_16": t16, "sec_32": t32,
        "docs_per_sec_8": results["8"]["docs_per_sec"],
        "docs_per_sec_16": results["16"]["docs_per_sec"],
        "docs_per_sec_32": results["32"]["docs_per_sec"],
        "headline_rows": results["32"]["headline_rows"],
        "protocol": "equal-ambient-load (burners on unused cores at the "
                    "smaller level, sized cores-ncpu-4; naive number "
                    "reported alongside; see BENCH/BASELINE.md)",
        "protocol_ok": protocol_ok,
        "gate": 0.8,
        "pass": gate_pass,
    }


def main():
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
        return
    print(json.dumps(main_once(headline_only="--headline-only" in sys.argv)))


if __name__ == "__main__":
    main()
