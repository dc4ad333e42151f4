"""Similarity search over an embedding column (list<float>).

- brute_force_topk: exact cosine top-k.  The query matrix is broadcast once
  (ray.put); every batch does one numpy matmul and emits only its LOCAL
  top-k rows per query, so the global reduce handles #batches × k × n_query
  compact rows — never the corpus.  This is the correctness baseline.
- lsh_topk: the scale path — sign-random-projection buckets (shared planes
  broadcast), candidates searched only within matching buckets with
  multiprobe; recall measured against brute force in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _as_matrix(col) -> np.ndarray:
    """list<float> arrow column → (n, d) float32 matrix (zero-ish copy)."""
    arr = col.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.flatten(), dtype=np.float32)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(ds, queries: np.ndarray, k: int = 10, *,
                     id_col: str = "vec_id", emb_col: str = "embedding",
                     batch_size: int | None = 4096):
    """Exact cosine top-k for each query row.  Returns Dataset[{query_id,
    vec_id, score, rank}] (rank 0 = best; ties broken by vec_id for
    determinism)."""
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float32))
    q_ref = ray.put(q)
    nq = len(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = np.asarray(batch.column(id_col).to_numpy(zero_copy_only=False))
        m = _normalize(_as_matrix(batch.column(emb_col)))
        sims = m @ qm.T  # (n, nq)
        kk = min(k, len(ids))
        out_q, out_id, out_s = [], [], []
        for j in range(qm.shape[0]):
            s = sims[:, j]
            # deterministic: sort by (-score, id)
            idx = np.lexsort((ids, -s))[:kk]
            out_q.extend([j] * len(idx))
            out_id.extend(ids[idx].tolist())
            out_s.extend(s[idx].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int32()),
                         "vec_id": pa.array(out_id, pa.int64()),
                         "score": pa.array(out_s, pa.float32())})

    partials = ds.select_columns([id_col, emb_col]).map_batches(
        local_topk, batch_format="pyarrow", batch_size=batch_size)

    def final_topk(g: pa.Table) -> pa.Table:
        ids = np.asarray(g.column("vec_id").to_pylist())
        s = np.asarray(g.column("score").to_pylist())
        idx = np.lexsort((ids, -s))[:k]
        return pa.table({"query_id": g.column("query_id").slice(0, 1).take([0] * len(idx)),
                         "vec_id": pa.array(ids[idx], pa.int64()),
                         "score": pa.array(s[idx], pa.float32()),
                         "rank": pa.array(np.arange(len(idx)), pa.int32())})

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pyarrow")


def lsh_topk(ds, queries: np.ndarray, k: int = 10, *, id_col: str = "vec_id",
             emb_col: str = "embedding", n_planes: int = 8, seed: int = 23,
             multiprobe: int = 1, batch_size: int | None = 4096):
    """Approximate cosine top-k: candidates restricted to vectors whose
    sign-bucket is within Hamming distance ``multiprobe`` of the query's.

    Same map/reduce shape as brute force — each batch checks bucket keys
    (one matmul against the shared planes) and scores only candidates.
    At scale this becomes a pre-bucketed index (write parquet partitioned by
    key, read only matching partitions); here bucketing happens in-stream.
    """
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float32))
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, q.shape[1])).astype(np.float32)
    qkeys = ((q @ planes.T) > 0).astype(np.uint32)
    qkeys = (qkeys * (1 << np.arange(n_planes, dtype=np.uint32))).sum(axis=1)
    ref = ray.put((q, planes, qkeys))

    def local_topk(batch: pa.Table) -> pa.Table:
        qm, pl, qk = ray.get(ref)
        ids = np.asarray(batch.column(id_col).to_numpy(zero_copy_only=False))
        m = _normalize(_as_matrix(batch.column(emb_col)))
        keys = ((m @ pl.T) > 0).astype(np.uint32)
        keys = (keys * (1 << np.arange(pl.shape[0], dtype=np.uint32))).sum(axis=1)
        out_q, out_id, out_s = [], [], []
        for j in range(qm.shape[0]):
            ham = np.bitwise_count((keys ^ qk[j]).astype(np.uint32)) \
                if hasattr(np, "bitwise_count") else _popcount32(keys ^ qk[j])
            cand = np.flatnonzero(ham <= multiprobe)
            if not len(cand):
                continue
            s = m[cand] @ qm[j]
            kk = min(k, len(cand))
            idx = np.lexsort((ids[cand], -s))[:kk]
            out_q.extend([j] * len(idx))
            out_id.extend(ids[cand][idx].tolist())
            out_s.extend(s[idx].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int32()),
                         "vec_id": pa.array(out_id, pa.int64()),
                         "score": pa.array(out_s, pa.float32())})

    partials = ds.select_columns([id_col, emb_col]).map_batches(
        local_topk, batch_format="pyarrow", batch_size=batch_size)

    def final_topk(g: pa.Table) -> pa.Table:
        ids = np.asarray(g.column("vec_id").to_pylist())
        s = np.asarray(g.column("score").to_pylist())
        idx = np.lexsort((ids, -s))[:k]
        return pa.table({"query_id": g.column("query_id").slice(0, 1).take([0] * len(idx)),
                         "vec_id": pa.array(ids[idx], pa.int64()),
                         "score": pa.array(s[idx], pa.float32()),
                         "rank": pa.array(np.arange(len(idx)), pa.int32())})

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pyarrow")


def _popcount32(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint32)
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24
