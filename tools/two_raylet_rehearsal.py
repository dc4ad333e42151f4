"""Two-raylet rehearsal (VERDICT r4 next-8): the closest this sandbox gets
to a real multi-node run.  Starts a GCS head raylet (16 cpus) plus a SECOND
raylet process joined via ``ray start --address`` (16 cpus) — each node has
its OWN plasma object store, so blocks produced on one node and consumed on
the other travel through the object manager's transfer path (loopback TCP),
exactly the cross-node hop a 256-node cluster takes — then drives the 16M-doc
headline extract+check through ``ray.init(address=...)`` and records wall,
per-node task split and the host probe.

    python tools/two_raylet_rehearsal.py [--rows 16000000]

Stops both raylets (``ray stop``) on exit.  Results go to BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAD_PORT = 6380  # off the 6379 default: never collide with a stray session


def sh(cmd: list[str], env: dict) -> None:
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"{' '.join(cmd)} failed:\n{r.stdout}\n{r.stderr}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16_000_000)
    ap.add_argument("--cpus-per-node", type=int, default=16)
    ap.add_argument("--store-gib-per-node", type=float, default=12.0,
                    help="plasma store per raylet; two default-sized stores "
                    "would each claim ~30%% of RAM and exhaust /dev/shm")
    args = ap.parse_args()

    # ray start must not inherit RAY_ADDRESS=local
    env = {k: v for k, v in os.environ.items() if k != "RAY_ADDRESS"}
    addr = f"127.0.0.1:{HEAD_PORT}"
    store = str(int(args.store_gib_per_node * 2**30))
    # NOTE: `ray stop --force` kills EVERY local raylet, including any
    # unrelated in-flight `ray.init(address="local")` job — run this tool
    # only when the box is otherwise idle.
    sh(["ray", "stop", "--force"], env)
    sh(["ray", "start", "--head", f"--port={HEAD_PORT}",
        f"--num-cpus={args.cpus_per_node}", "--include-dashboard=false",
        f"--object-store-memory={store}", "--disable-usage-stats"], env)
    try:
        sh(["ray", "start", f"--address={addr}",
            f"--num-cpus={args.cpus_per_node}",
            f"--object-store-memory={store}", "--disable-usage-stats"],
           env)

        import ray

        ray.init(address=addr, include_dashboard=False,
                 logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

        nodes = [n for n in ray.nodes() if n["Alive"]]
        total_cpus = int(ray.cluster_resources().get("CPU", 0))
        assert len(nodes) == 2, f"expected 2 raylets, got {len(nodes)}"
        assert total_cpus == 2 * args.cpus_per_node, total_cpus

        # prove tasks actually land on BOTH raylets (one node-id per task)
        @ray.remote(num_cpus=1)
        def node_id() -> str:
            return ray.get_runtime_context().get_node_id()

        seen = set(ray.get([node_id.remote() for _ in range(64)]))
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
        ray.shutdown()
    finally:
        subprocess.run(["ray", "stop", "--force"], env=env,
                       capture_output=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
