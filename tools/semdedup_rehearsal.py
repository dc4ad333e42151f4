"""SemDeDup scale rehearsal: 10x the bench fixture (10M x 64 vectors,
8192 planted centers) through kmeans_fit(k=2048) + semdedup_prune, with
wall per stage, pruned fraction, peak object-store usage and spill volume
— evidence that the cluster-bounded pairwise prune holds its memory shape
an order of magnitude past the bench key.

    python tools/semdedup_rehearsal.py [--rows 10000000] [--k 2048] \
        [--cpus 32] [--eps 0.6]

Results are recorded in BENCH/BASELINE.md.  The fixture caches under
/tmp/webval_rehearsal/vecs_<rows> (float32 FixedSizeList, ~2.5 GB at
10M); generation matches the bench vecs_1m recipe (unit centers, 0.15
noise), only bigger and with 8x the centers so per-center occupancy stays
~1.2k.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.streaming_rehearsal import REHEARSAL_ROOT, PlasmaPoller  # noqa: E402

DIM = 64
N_CENTERS = 8192
SHARDS = 32


def ensure_vectors(n_rows: int) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(REHEARSAL_ROOT, f"vecs_{n_rows}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    cg = np.random.default_rng(7)
    centers = cg.standard_normal((N_CENTERS, DIM)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    shard = n_rows // SHARDS
    for i in range(SHARDS):
        rng = np.random.default_rng(300 + i)
        idx = np.arange(i * shard, (i + 1) * shard, dtype=np.int64)
        m = centers[idx % N_CENTERS] + \
            0.15 * rng.standard_normal((shard, DIM)).astype(np.float32)
        t = pa.table({
            "vec_id": pa.array(idx),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.ravel(), pa.float32()), DIM)})
        pq.write_table(t, os.path.join(out, f"v_{i:02d}.parquet"))
    open(marker, "w").write("ok")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--k", type=int, default=2048)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--eps", type=float, default=0.6)
    args = ap.parse_args()

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    ray.init(address="local", num_cpus=args.cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from bench import host_speed_probe
    from webval.clustering import kmeans_fit
    from webval.dedup import semdedup_prune

    t0 = time.perf_counter()
    vec_dir = ensure_vectors(args.rows)
    t_fix = time.perf_counter() - t0

    poller = PlasmaPoller()
    poller.start()
    probe = host_speed_probe()

    t0 = time.perf_counter()
    vds = rd.read_parquet(vec_dir)
    cents = kmeans_fit(vds, "embedding", args.k, n_iter=2, seed=0,
                       init_sample=16384)
    t_fit = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_rows = n_pruned = 0
    for b in semdedup_prune(vds, "vec_id", "embedding", cents,
                            eps=args.eps, num_buckets=2 * args.cpus) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        n_rows += b.num_rows
        n_pruned += int(pc.sum(pc.cast(b.column("pruned"),
                                       pa.int64())).as_py() or 0)
    t_prune = time.perf_counter() - t0

    mem = poller.stop()
    assert n_rows == args.rows, (n_rows, args.rows)
    out = {"rows": args.rows, "k": args.k, "eps": args.eps,
           "cpus": args.cpus, "fixture_sec": round(t_fix, 1),
           "kmeans_fit_sec": round(t_fit, 1),
           "prune_sec": round(t_prune, 1),
           "pruned_frac": round(n_pruned / n_rows, 4),
           "host_gflops_probe": round(probe, 2), **mem}
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
