"""Benchmark harness (BASELINE.md measurement protocol).

Runs the headline pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1)
plus the synthetic webpages table at bench scale, inside
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32), and
prints ONE JSON line::

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling`` runs the same job in two fresh processes (num_cpus=8 and 32,
the sandbox proxy for N vs 4N nodes — BASELINE.json:14) and reports both
throughputs plus efficiency = (t8/t32)/4.
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_PAGES_ROOT = "/tmp/webval_bench"
DEFAULT_BENCH_ROWS = 400_000


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


def run_benchmarks(sf_dir: str, ncpu: int, n_pages: int) -> dict:
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from webval.aggregates import profile_dataset
    from webval.checks import check_dataset
    from webval.extract import HtmlTextExtractor
    from webval.pipelines import build_schema, referential_orphans, uniqueness_violations
    from webval.schema import CheckSpec, SchemaSpec
    from webval.textstats import add_fingerprints, add_token_counts

    pages_dir = ensure_bench_pages(n_pages)

    # warm the OS page cache (untimed) so we measure compute+shuffle
    rd.read_parquet(pages_dir).count()
    rd.read_parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    extras: dict = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *a):
                timings[name] = round(time.perf_counter() - self.t0, 3)
        return _T()

    check_schema = SchemaSpec(name="webpages", built=True, checks=[
        CheckSpec("url-regex", "url", "regex", {"pattern": r"^https?://[^ ]+$"}),
        CheckSpec("lang-domain", "lang", "domain",
                  {"values": ["en", "de", "fr", "es", "nl", "ru", "zh"]}),
    ])

    # headline: html-bearing pipeline — extract (actor pool) + verdicts
    with timed("extract_check"):
        ds = rd.read_parquet(pages_dir, columns=["page_id", "url", "html", "lang"])
        ex = ds.map_batches(HtmlTextExtractor, batch_format="pyarrow",
                            batch_size=1024, concurrency=(4, max(4, ncpu - 2)),
                            num_cpus=1)
        v = check_dataset(ex, check_schema, keep_cols=["page_id"])
        n_fail = v.map_batches(
            lambda t: pa.table({"f": [t.num_rows -
                                      pc.sum(t.column("pass")).as_py()]}),
            batch_format="pyarrow").sum("f")
        extras["extract_check_violations"] = int(n_fail)

    # text-only stats pass: schema build over text/lang/url (no html decode)
    with timed("schema_build"):
        kinds = {"page_id": "skip", "url": "text", "warc_ts": "timestamp",
                 "html": "skip", "text": "text", "lang": "categorical",
                 "part_id": "skip"}
        build_schema(rd.read_parquet(
            pages_dir, columns=["url", "warc_ts", "text", "lang"]),
            kinds, name="bench")

    with timed("uniqueness"):
        n_dup = uniqueness_violations(
            rd.read_parquet(pages_dir, columns=["url"]), "url").count()
        extras["dup_urls"] = int(n_dup)

    with timed("referential"):
        # self-referential smoke at bench scale: links table derived on the
        # fly is small; reuse pages as both sides via broadcast key set
        child = rd.read_parquet(pages_dir, columns=["url"])
        parent = rd.read_parquet(pages_dir, columns=["url"])
        referential_orphans(child, parent, "url", "url", mode="broadcast").count()

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

    with timed("fingerprint_tokens"):
        ds = rd.read_parquet(pages_dir, columns=["page_id", "text"])
        add_token_counts(add_fingerprints(ds)).map_batches(
            lambda t: pa.table({"n": [t.num_rows]}), batch_format="pyarrow").sum("n")

    html_bytes = int(rd.read_parquet(pages_dir, columns=["html"]).map_batches(
        lambda t: pa.table({"b": [pc.sum(pc.binary_length(
            pc.fill_null(t.column("html"), b""))).as_py() or 0]}),
        batch_format="pyarrow").sum("b"))

    headline = timings["extract_check"]
    return {
        "metric": "webpages_extract_check_wall_sec",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": ncpu,
        "bench_pages": n_pages,
        "docs_per_sec": round(n_pages / headline, 1),
        "html_mb_per_sec": round(html_bytes / 1e6 / headline, 1),
        **extras,
    }


def run_scaling(n_pages: int) -> dict:
    import subprocess

    results = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True, check=True,
                             cwd=os.path.dirname(os.path.abspath(__file__)))
        results[ncpu] = json.loads(out.stdout.strip().splitlines()[-1])
    t8, t32 = results[8]["value"], results[32]["value"]
    eff = (t8 / t32) / (32 / 8)
    return {
        "metric": "scaling_efficiency_8_to_32_cpus",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sec_8": t8, "sec_32": t32,
        "docs_per_sec_8": results[8]["docs_per_sec"],
        "docs_per_sec_32": results[32]["docs_per_sec"],
        "bench_pages": n_pages,
        "gate": 0.8,
        "pass": eff >= 0.8,
    }


def main():
    n_pages = int(os.environ.get("WEBVAL_BENCH_ROWS", str(DEFAULT_BENCH_ROWS)))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(n_pages)))
        return
    import ray

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    try:
        result = run_benchmarks(sf_dir, ncpu, n_pages)
    finally:
        ray.shutdown()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
