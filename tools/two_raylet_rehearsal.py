"""Two-raylet rehearsal (VERDICT r4 next-8): the closest this sandbox gets
to a real multi-node run.  Starts a head node (16 cpus) plus a SECOND
raylet (16 cpus) via ``ray.cluster_utils.Cluster`` — each node has its OWN
plasma object store, so blocks produced on one node and consumed on the
other travel through the object manager's transfer path (loopback TCP),
exactly the cross-node hop a 256-node cluster takes — then drives the
16M-doc headline extract+check against the cluster address and records
wall, per-node data-task split and the host probe.

    python tools/two_raylet_rehearsal.py [--rows 16000000]

Why cluster_utils and not ``ray start``: daemonized raylets (``ray start
--head`` + ``ray start --address``) are SIGKILLed by this sandbox within
seconds of a driver connecting (measured twice, r5 — both raylets die
simultaneously, no OOM, no fatal in their logs); cluster_utils raylets are
ordinary child processes of the driver, the process shape every local run
here uses, and survive.  Results go to BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16_000_000)
    ap.add_argument("--cpus-per-node", type=int, default=16)
    ap.add_argument("--store-gib-per-node", type=float, default=12.0,
                    help="plasma store per raylet; two default-sized stores "
                    "would each claim ~30%% of RAM and exhaust /dev/shm")
    args = ap.parse_args()

    # cluster_utils must not inherit RAY_ADDRESS=local
    os.environ.pop("RAY_ADDRESS", None)
    store = int(args.store_gib_per_node * 2**30)

    import ray
    from ray.cluster_utils import Cluster

    cluster = Cluster(
        initialize_head=True,
        head_node_args={"num_cpus": args.cpus_per_node,
                        "object_store_memory": store,
                        "include_dashboard": False})
    try:
        cluster.add_node(num_cpus=args.cpus_per_node,
                         object_store_memory=store)

        ray.init(address=cluster.address, include_dashboard=False,
                 logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

        nodes = [n for n in ray.nodes() if n["Alive"]]
        total_cpus = int(ray.cluster_resources().get("CPU", 0))
        assert len(nodes) == 2, f"expected 2 raylets, got {len(nodes)}"
        assert total_cpus == 2 * args.cpus_per_node, total_cpus

        # prove tasks actually land on BOTH raylets: each probe HOLDS its
        # cpu for 2 s, so 2×cpus concurrent probes cannot fit one node
        # (instant tasks all finish on the driver's raylet before the
        # scheduler ever spills — measured: 64 quick probes, one node)
        @ray.remote(num_cpus=1)
        def node_id() -> str:
            time.sleep(2)
            return ray.get_runtime_context().get_node_id()

        seen = set(ray.get([node_id.remote()
                            for _ in range(2 * args.cpus_per_node)]))
        assert len(seen) == 2, "scheduler never used the second raylet"

        from bench import ensure_bench_pages, host_speed_probe, run_headline

        pages = ensure_bench_pages(args.rows)
        import ray.data as rd

        rd.read_parquet(pages).count()  # warm page cache, untimed
        t0 = time.perf_counter()
        h = run_headline(pages, total_cpus)
        wall = round(time.perf_counter() - t0, 1)

        # Per-node split of actual Ray DATA tasks: map over the corpus
        # recording which raylet executed each batch.  Blocks produced by
        # the read on one node and consumed on the other cross the object
        # manager — the transfer path a real cluster exercises.
        import pyarrow as pa

        def tag_node(t: pa.Table) -> pa.Table:
            nid = ray.get_runtime_context().get_node_id()
            return pa.table({"node": [nid], "rows": [t.num_rows]})

        split = (rd.read_parquet(pages, columns=["page_id"])
                 .map_batches(tag_node, batch_format="pyarrow")
                 .to_pandas().groupby("node")["rows"].sum())
        node_split = {k[:8]: int(v) for k, v in split.items()}

        result = {
            "metric": "two_raylet_headline",
            "rows": args.rows,
            "nodes": 2,
            "cpus_per_node": args.cpus_per_node,
            "wall_sec": wall,
            "docs_per_sec": round(args.rows / h["wall"], 0),
            "violations": h["violations"],
            "data_task_rows_per_node": node_split,
            "host_gflops_probe": host_speed_probe(),
        }
        print(json.dumps(result, sort_keys=True))
    finally:
        ray.shutdown()  # disconnect BEFORE removing nodes
        cluster.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
