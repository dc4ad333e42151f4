"""10x streaming rehearsal (VERDICT r3 next-4): generate a fixture ~10x
larger than the headline bench input (default 160M docs, ~30 GB parquet),
stream the headline extract+check pipeline and the MinHash near-dedup
pipeline through it at full parallelism, and report wall, throughput, PEAK
object-store usage and spill volume — the first direct evidence that the
pipelines stream data >> memory budget instead of materializing it.

    python tools/streaming_rehearsal.py [--rows 160000000] [--cpus 32] \
        [--minhash-rows 0] [--skip-headline]

Results are recorded in BENCH/BASELINE.md.  The fixture is cached under
/tmp/webval_rehearsal and reused; it is generation-identical to the bench
fixture (same gen_webpages_table), only bigger.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REHEARSAL_ROOT = "/tmp/webval_rehearsal"


class PlasmaPoller(threading.Thread):
    """Samples object-store usage every ``interval`` s.

    Plasma usage comes from the ``object_store_memory`` resource (total −
    available); spill volume from the size of the session's spilled-objects
    directory (``memory_summary`` needs grpcio, absent in this sandbox).
    Spill files are deleted when their objects are freed, so we track both
    the PEAK resident spill-dir size and a cumulative created-bytes counter
    keyed by filename."""

    def __init__(self, interval: float = 2.0):
        super().__init__(daemon=True)
        self.interval = interval
        self.peak_plasma_mib = 0.0
        self.peak_spill_mib = 0.0
        self._spill_seen: dict[str, int] = {}
        self._stop = threading.Event()

    @staticmethod
    def _spill_dir() -> str | None:
        import ray

        try:
            sess = ray._private.worker._global_node.get_session_dir_path()
        except Exception:
            return None
        d = os.path.join(sess, "ray_spilled_objects")
        return d if os.path.isdir(d) else None

    def sample(self):
        import ray

        try:
            total = ray.cluster_resources().get("object_store_memory", 0.0)
            avail = ray.available_resources().get("object_store_memory", 0.0)
            self.peak_plasma_mib = max(self.peak_plasma_mib,
                                       (total - avail) / 2**20)
        except Exception:
            pass
        d = self._spill_dir()
        if d:
            resident = 0
            try:
                for f in os.listdir(d):
                    try:
                        sz = os.path.getsize(os.path.join(d, f))
                    except OSError:
                        continue
                    resident += sz
                    prev = self._spill_seen.get(f, 0)
                    if sz > prev:
                        self._spill_seen[f] = sz
            except OSError:
                pass
            self.peak_spill_mib = max(self.peak_spill_mib, resident / 2**20)

    def run(self):
        while not self._stop.is_set():
            self.sample()
            self._stop.wait(self.interval)

    def stop(self) -> dict:
        self._stop.set()
        self.sample()
        return {"peak_plasma_mib": round(self.peak_plasma_mib, 1),
                "peak_spill_mib": round(self.peak_spill_mib, 1),
                "spilled_total_mib": round(
                    sum(self._spill_seen.values()) / 2**20, 1)}


def ensure_pages(n_rows: int) -> str:
    from webval.synth import write_webpages

    out = os.path.join(REHEARSAL_ROOT, f"pages_{n_rows}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    write_webpages(out, n_rows, block_rows=20_000)
    print(f"generated {n_rows} rows in "
          f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)
    open(marker, "w").write("ok")
    return out


def dir_gib(path: str) -> float:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return round(total / 2**30, 2)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=160_000_000)
    ap.add_argument("--minhash-rows", type=int, default=0,
                    help="0 = run minhash over the full --rows fixture")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--object-store-gib", type=float, default=0,
                    help="cap the plasma store (0 = Ray default ~30%% RAM); "
                    "a small cap forces the data >> memory regime on inputs "
                    "that would otherwise fit the default 37.6 GiB store")
    ap.add_argument("--num-buckets", type=int, default=0,
                    help="exchange bucket count for the minhash leg "
                    "(0 = derived 2xCPUs); raise when per-bucket blocks "
                    "overflow the store/fallback")
    ap.add_argument("--bands-per-pass", type=int, default=0,
                    help="0 = all 16 bands in one LSH exchange; e.g. 4 runs "
                    "four sequential band-group passes, cutting inflight "
                    "shuffle volume 4x (the fix for the r4 56 GB spill-budget "
                    "overrun at 160M docs)")
    ap.add_argument("--verify-k", type=int, default=0,
                    help="0 = exact full-shingle-set verify; e.g. 64 caps "
                    "the verify payload at 512 B/doc via bottom-k minwise "
                    "sketches (the fix for the r5 verify-leg disk overrun "
                    "at 160M docs: full blobs attached per pair side "
                    "spilled past the 56 GB budget)")
    ap.add_argument("--verify-chunks", type=int, default=0,
                    help="0 = one verify pass; e.g. 8 splits the verify "
                    "pair set into 8 sequential hash-chunk passes, "
                    "bounding inflight blob volume 8x (the fix for the "
                    "r5 residual-verify disk overrun at 160M: borderline "
                    "template-similar pairs x 2x512B sketches through two "
                    "exchanges at once)")
    ap.add_argument("--fp-accept", action="store_true",
                    help="two-tier verify: 8-byte full-signature "
                    "fingerprint auto-accept + shingle verify on the "
                    "anti-joined residual only (the fix for the r5 "
                    "dense-bucket endpoint volume: even 512 B bottom-k "
                    "sketches spilled past the disk budget at 160M)")
    ap.add_argument("--skip-headline", action="store_true")
    ap.add_argument("--skip-minhash", action="store_true")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kw = {}
        if args.object_store_gib:
            kw["object_store_memory"] = int(args.object_store_gib * 2**30)
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR", **kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import ray.data as rd

    from bench import host_speed_probe, run_headline

    pages = ensure_pages(args.rows)
    result: dict = {"metric": "streaming_rehearsal", "rows": args.rows,
                    "fixture_gib": dir_gib(pages), "num_cpus": args.cpus,
                    "host_gflops_probe": host_speed_probe()}

    if not args.skip_headline:
        poll = PlasmaPoller()
        poll.start()
        t0 = time.perf_counter()
        h = run_headline(pages, args.cpus)
        result["headline"] = {
            "wall_sec": round(time.perf_counter() - t0, 1),
            "docs_per_sec": round(args.rows / h["wall"], 0),
            "violations": h["violations"], **poll.stop()}

    if not args.skip_minhash:
        from webval.dedup import minhash_dedup

        mh_rows = args.minhash_rows or args.rows
        mh_pages = pages if mh_rows == args.rows else ensure_pages(mh_rows)
        poll = PlasmaPoller()
        poll.start()
        t0 = time.perf_counter()
        ds = rd.read_parquet(mh_pages, columns=["page_id", "text"])
        stage_counts: dict = {}
        n = (minhash_dedup(ds, "page_id", components="distributed",
                           num_buckets=args.num_buckets or None,
                           bands_per_pass=args.bands_per_pass or None,
                           verify_k=args.verify_k or None,
                           fp_accept=args.fp_accept,
                           verify_chunks=args.verify_chunks or None,
                           stage_counts=stage_counts)
             .map_batches(lambda t: pa.table({"n": [t.num_rows]}),
                          batch_format="pyarrow").sum("n"))
        result["minhash"] = {
            "rows": mh_rows, "bands_per_pass": args.bands_per_pass or 16,
            "verify_k": args.verify_k or None,
            "fp_accept": args.fp_accept,
            "verify_chunks": args.verify_chunks or None,
            "stage_counts": stage_counts,
            "wall_sec": round(time.perf_counter() - t0, 1),
            "docs_per_sec": round(mh_rows / (time.perf_counter() - t0), 0),
            "dup_cluster_rows": int(n), **poll.stop()}

    print(json.dumps(result, sort_keys=True))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
