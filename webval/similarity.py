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


# ---------------------------------------------------------------------------
# persisted LSH index (VERDICT r1 next-7): build once, query many times
# touching only matching bucket partitions
# ---------------------------------------------------------------------------


def build_ann_index(ds, index_dir: str, *, id_col: str = "vec_id",
                    emb_col: str = "embedding", n_planes: int = 8,
                    n_tables: int = 4, seed: int = 23,
                    rows_per_file: int = 1_000_000,
                    num_buckets: int | None = None) -> dict:
    """Write a bucketed ANN index under ``index_dir``: unit vectors stored
    once per LSH table, partitioned into ``tab=<t>/bucket=<sign-key>/``
    parquet directories, plus a ``meta.json`` holding the projection
    planes.  Query-time work then reads ONLY the partitions inside the
    queries' multiprobe Hamming balls — the repeated-query scale path the
    in-stream lsh_topk cannot offer.  ``n_tables`` independent tables trade
    index size (n_tables× vector copies, the standard LSH tradeoff) for
    recall.

    Bucket files are written INSIDE the bucketed exchange's group tasks
    (≤ rows_per_file rows per file), so the build is fully distributed;
    ``index_dir`` must be on storage all workers share (true for any real
    cluster deployment; local disk in this sandbox).  Returns the meta
    dict (also persisted)."""
    import os
    import shutil

    import ray

    from webval.exchange import bucketed_group_apply

    rng = np.random.default_rng(seed)
    first = ds.take(1)
    dim = len(first[0][emb_col])
    planes = rng.standard_normal((n_tables, n_planes, dim)).astype(np.float32)
    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir)
    planes_ref = ray.put(planes)

    manifest = bucketed_group_apply(
        ds.select_columns([id_col, emb_col]).map_batches(
            _keyed_fn(planes_ref, id_col, emb_col, n_tables, n_planes),
            batch_format="pyarrow", batch_size=4096),
        ["tab", "bucket"], _write_group_fn(index_dir, rows_per_file),
        num_buckets=num_buckets).take_all()
    meta = {"n_planes": n_planes, "n_tables": n_tables, "dim": dim,
            "seed": seed, "id_col": id_col, "emb_col": emb_col,
            "planes": [[[float(x) for x in row] for row in tbl]
                       for tbl in planes],
            "buckets": {f"{r['tab']}/{r['bucket']}": int(r["rows"])
                        for r in manifest}}
    _write_meta(index_dir, meta)
    return meta


def _keyed_fn(planes_ref, id_col: str, emb_col: str,
              n_tables: int, n_planes: int):
    """Map stage factory: vector rows → one (tab, bucket, id, unit) row per
    LSH table (shared by build and append so keys always agree)."""
    import ray

    weights = (1 << np.arange(n_planes, dtype=np.int64))

    def keyed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0:
            return pa.table({"tab": pa.array([], pa.int32()),
                             "bucket": pa.array([], pa.int32()),
                             id_col: pa.array([], pa.int64()),
                             "unit": pa.array([], pa.list_(pa.float32()))})
        pl = ray.get(planes_ref)
        ids = pc.cast(batch.column(id_col).combine_chunks(), pa.int64()) \
                .to_numpy(zero_copy_only=False)
        m = _normalize(_as_matrix(batch.column(emb_col)))
        n = len(ids)
        keys = np.empty((n_tables, n), dtype=np.int32)
        for t in range(n_tables):
            keys[t] = (((m @ pl[t].T) > 0) @ weights).astype(np.int32)
        unit = pa.FixedSizeListArray.from_arrays(
            pa.array(np.tile(m, (n_tables, 1)).ravel(), pa.float32()),
            m.shape[1])
        return pa.table({
            "tab": pa.array(np.repeat(np.arange(n_tables, dtype=np.int32), n),
                            pa.int32()),
            "bucket": pa.array(keys.ravel(), pa.int32()),
            id_col: pa.array(np.tile(ids, n_tables), pa.int64()),
            "unit": unit})

    return keyed


def _write_group_fn(index_dir: str, rows_per_file: int):
    """Bucket-task factory: write each (tab, bucket) slice as new uuid-named
    part files (append-safe — never touches existing parts)."""
    import os
    import uuid

    import pyarrow.parquet as pq

    def write_group(g: pa.Table) -> pa.Table:
        out_t, out_b, out_r = [], [], []
        tabs = g.column("tab").to_numpy(zero_copy_only=False)
        buckets = g.column("bucket").to_numpy(zero_copy_only=False)
        combo = tabs.astype(np.int64) * (1 << 32) + buckets
        for cb in np.unique(combo):
            t, b = int(cb >> 32), int(cb & 0xFFFFFFFF)
            sub = g.filter(pa.array(combo == cb))
            d = os.path.join(index_dir, f"tab={t}", f"bucket={b}")
            os.makedirs(d, exist_ok=True)
            for i in range(0, sub.num_rows, rows_per_file):
                pq.write_table(sub.slice(i, rows_per_file),
                               os.path.join(d, f"part-{uuid.uuid4().hex}.parquet"))
            out_t.append(t)
            out_b.append(b)
            out_r.append(sub.num_rows)
        return pa.table({"tab": pa.array(out_t, pa.int32()),
                         "bucket": pa.array(out_b, pa.int32()),
                         "rows": pa.array(out_r, pa.int64())})

    return write_group


def _write_meta(index_dir: str, meta: dict) -> None:
    import json
    import os

    tmp = os.path.join(index_dir, f"meta.json.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, "meta.json"))


def append_to_index(ds, index_dir: str, *, rows_per_file: int = 1_000_000,
                    num_buckets: int | None = None) -> dict:
    """Incrementally add vectors to an existing index (VERDICT r2 next-9):
    new rows are keyed with the index's OWN planes (meta.json) and written
    as fresh uuid part files inside the existing ``tab=/bucket=``
    directories — existing parts are never rewritten, so an append is
    naturally resumable and concurrent-reader-safe.  Bucket row counts in
    meta.json are updated last (write-then-rename)."""
    import json
    import os

    import ray

    from webval.exchange import bucketed_group_apply

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    planes = np.asarray(meta["planes"], dtype=np.float32)
    id_col = meta["id_col"]
    emb_col = meta.get("emb_col", "embedding")
    planes_ref = ray.put(planes)
    manifest = bucketed_group_apply(
        ds.select_columns([id_col, emb_col]).map_batches(
            _keyed_fn(planes_ref, id_col, emb_col,
                      meta["n_tables"], meta["n_planes"]),
            batch_format="pyarrow", batch_size=4096),
        ["tab", "bucket"], _write_group_fn(index_dir, rows_per_file),
        num_buckets=num_buckets).take_all()
    for r in manifest:
        key = f"{r['tab']}/{r['bucket']}"
        meta["buckets"][key] = meta["buckets"].get(key, 0) + int(r["rows"])
    _write_meta(index_dir, meta)
    return meta


def _probe_keys(key: int, n_planes: int, max_flips: int) -> set[int]:
    """All sign keys within Hamming distance ``max_flips`` of ``key``."""
    from itertools import combinations

    out = {int(key)}
    for r in range(1, max_flips + 1):
        for bits in combinations(range(n_planes), r):
            flipped = int(key)
            for b in bits:
                flipped ^= 1 << b
            out.add(flipped)
    return out


def pruned_index_files(index_dir: str, queries: np.ndarray, *,
                       meta: dict | None = None, multiprobe: int = 1
                       ) -> tuple[list, list]:
    """Partition pruning for a query batch: the UNION of every query's
    multiprobe Hamming balls is computed once, and only those ``tab=/
    bucket=`` directories' parquet files are listed (one shared scan for
    the whole batch).  Returns (files, probes) where probes[j] is query
    j's set of (tab << 32 | bucket) combo keys — the per-query candidate
    filter applied inside the shared scan."""
    import json
    import os

    if meta is None:
        with open(os.path.join(index_dir, "meta.json")) as f:
            meta = json.load(f)
    n_planes, n_tables = meta["n_planes"], meta["n_tables"]
    planes = np.asarray(meta["planes"], dtype=np.float32)  # (T, P, D)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    weights = (1 << np.arange(n_planes, dtype=np.int64))
    probes: list[set[int]] = [set() for _ in range(len(q))]
    wanted_dirs: set[tuple[int, int]] = set()
    for t in range(n_tables):
        qkeys = (((q @ planes[t].T) > 0) @ weights).astype(np.int64)
        for j, kk in enumerate(qkeys):
            for b in _probe_keys(int(kk), n_planes, multiprobe):
                probes[j].add((t << 32) | b)
                wanted_dirs.add((t, b))
    return _bucket_files(index_dir, sorted(wanted_dirs)), probes


def _bucket_files(index_dir: str, dirs) -> list:
    """(tab, bucket) pairs → their parquet part files — the ONE place that
    knows the on-disk index layout (read_parquet wants file paths when
    given a list)."""
    import os

    files = []
    for t, b in dirs:
        d = os.path.join(index_dir, f"tab={t}", f"bucket={b}")
        if os.path.isdir(d):
            files.extend(os.path.join(d, fn) for fn in sorted(os.listdir(d))
                         if fn.endswith(".parquet"))
    return files


def ann_index_topk(index_dir: str, queries: np.ndarray, k: int = 10, *,
                   multiprobe: int = 1, batch_size: int | None = 4096):
    """Approximate cosine top-k against a persisted index: only the
    ``bucket=`` partitions inside the queries' multiprobe Hamming balls are
    read (partition pruning at the READ — the other buckets never leave
    storage).  Returns Dataset[{query_id, vec_id, score, rank}]."""
    import json
    import os

    import ray
    import ray.data as rd

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    files, probes = pruned_index_files(index_dir, queries, meta=meta,
                                       multiprobe=multiprobe)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    return _scan_topk(files, probes, q, meta["id_col"], k, batch_size)


def _scan_topk(files: list, probes: list, q: np.ndarray, id_col: str,
               k: int, batch_size: int | None):
    """Shared pruned-scan top-k over bucket part files (LSH and IVF
    indexes store the identical (tab, bucket, id, unit) layout): one
    parallel read over the pruned file union, per-batch candidate filter
    by each query's combo-key set, local top-k, per-query reduce."""
    import ray
    import ray.data as rd

    if not files:
        return rd.from_arrow(pa.table({
            "query_id": pa.array([], pa.int32()),
            "vec_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float32()),
            "rank": pa.array([], pa.int32())}))
    ref = ray.put((q, [np.fromiter(p, dtype=np.int64) for p in probes]))

    def local_topk(batch: pa.Table) -> pa.Table:
        qm, prb = ray.get(ref)
        ids = np.asarray(batch.column(id_col).to_numpy(zero_copy_only=False))
        tabs = batch.column("tab").to_numpy(zero_copy_only=False).astype(np.int64)
        buckets = batch.column("bucket").to_numpy(zero_copy_only=False)
        combo = (tabs << 32) | buckets.astype(np.int64)
        m = _as_matrix(batch.column("unit"))  # stored pre-normalized
        out_q, out_id, out_s = [], [], []
        for j in range(qm.shape[0]):
            cand = np.flatnonzero(np.isin(combo, prb[j]))
            if not len(cand):
                continue
            # same vec may appear via several tables — dedupe before topk
            cids = ids[cand]
            uniq, first = np.unique(cids, return_index=True)
            cand = cand[first]
            s = m[cand] @ qm[j]
            kk = min(k, len(cand))
            idx = np.lexsort((uniq, -s))[:kk]
            out_q.extend([j] * len(idx))
            out_id.extend(uniq[idx].tolist())
            out_s.extend(s[idx].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int32()),
                         "vec_id": pa.array(out_id, pa.int64()),
                         "score": pa.array(out_s, pa.float32())})

    partials = rd.read_parquet(files).map_batches(
        local_topk, batch_format="pyarrow", batch_size=batch_size)

    def final_topk(g: pa.Table) -> pa.Table:
        ids = np.asarray(g.column("vec_id").to_pylist())
        s = np.asarray(g.column("score").to_pylist())
        # dedupe across partials (several blocks may hold the same vec via
        # different tables), keep best score per vec
        order = np.lexsort((ids, -s))
        ids_o, s_o = ids[order], s[order]
        _, first = np.unique(ids_o, return_index=True)
        sel = np.sort(first)
        ids_o, s_o = ids_o[sel], s_o[sel]
        idx = np.lexsort((ids_o, -s_o))[:k]
        return pa.table({"query_id": g.column("query_id").slice(0, 1).take([0] * len(idx)),
                         "vec_id": pa.array(ids_o[idx], pa.int64()),
                         "score": pa.array(s_o[idx], pa.float32()),
                         "rank": pa.array(np.arange(len(idx)), pa.int32())})

    return partials.groupby("query_id").map_groups(final_topk,
                                                   batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF index: k-means coarse quantizer instead of hyperplane signs — the
# other standard ANN partitioning (the brief's "IVF or LSH-bucketed"
# alternative).  Same on-disk layout as the LSH index (tab=0/bucket=<cid>),
# so build, append-style writes and the pruned scan machinery are shared.
# ---------------------------------------------------------------------------


def _kmeans(sample: np.ndarray, n_centroids: int, *, n_iter: int = 12,
            seed: int = 29) -> np.ndarray:
    """Plain deterministic Lloyd iterations on UNIT vectors (cosine ≡
    euclidean after normalization).  Runs on a driver-side sample — the
    coarse quantizer needs thousands of points, not the corpus."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    cent = sample[rng.choice(n, size=min(n_centroids, n), replace=False)]
    for _ in range(n_iter):
        assign = (sample @ cent.T).argmax(axis=1)
        new = np.zeros_like(cent)
        np.add.at(new, assign, sample)
        sizes = np.bincount(assign, minlength=len(cent))
        empty = sizes == 0
        if empty.any():  # re-seed dead centroids deterministically
            new[empty] = sample[rng.choice(n, size=int(empty.sum()))]
            sizes[empty] = 1
        cent = _normalize(new / sizes[:, None])
    return cent.astype(np.float32)


def build_ivf_index(ds, index_dir: str, *, id_col: str = "vec_id",
                    emb_col: str = "embedding", n_centroids: int = 64,
                    sample_size: int = 20_000, seed: int = 29,
                    rows_per_file: int = 1_000_000,
                    num_buckets: int | None = None) -> dict:
    """IVF index build: sample → driver k-means → centroids broadcast →
    every unit vector written into its nearest centroid's bucket dir.
    Query-time reads touch only the ``n_probe`` nearest buckets."""
    import json
    import os
    import shutil

    import ray

    from webval.exchange import bucketed_group_apply

    # Deterministic quantizer sample (r5s finding): a bare .take(n) returns
    # whichever blocks COMPLETE first, so the k-means sample — and with it
    # the centroids and the recall at a fixed n_probe — varied build to
    # build on identical data (0.956 vs 0.872 recall@10 on the 1M bench
    # fixture).  Hash-select ~sample_size ids instead (pure function of
    # the id column, any parallelism/block order) and sort by id so the
    # seeded init picks the same rows every build.
    from webval.sketches import hash64

    n_rows = ds.count()
    if n_rows == 0:
        raise ValueError(
            "build_ivf_index: no non-null embedding rows to sample — "
            "cannot fit a coarse quantizer on an empty dataset")
    frac = min(1.0, sample_size / n_rows)
    thresh = np.uint64(min(int(frac * 2.0**64), 2**64 - 1))

    def pick_sample(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = pc.cast(batch.column(id_col).combine_chunks(), pa.int64())
        valid = pc.is_valid(batch.column(emb_col)) \
            .to_numpy(zero_copy_only=False)
        keep = valid & (hash64(ids.to_numpy(zero_copy_only=False))
                        <= thresh)
        return batch.select([id_col, emb_col]) \
                    .take(pa.array(np.flatnonzero(keep), pa.int64()))

    picked = ds.map_batches(pick_sample, batch_format="pyarrow").take_all()
    if not picked:  # degenerate: every sampled id hashed above threshold
        picked = [r for r in ds.take(sample_size)
                  if r[emb_col] is not None]
    if not picked:
        raise ValueError(
            "build_ivf_index: no non-null embedding rows to sample — "
            "cannot fit a coarse quantizer on an empty dataset")
    picked.sort(key=lambda r: r[id_col])
    sample = _normalize(np.asarray(
        [r[emb_col] for r in picked[:2 * sample_size]], dtype=np.float32))
    centroids = _kmeans(sample, n_centroids, seed=seed)
    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir)
    cent_ref = ray.put(centroids)

    def keyed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0:
            return pa.table({"tab": pa.array([], pa.int32()),
                             "bucket": pa.array([], pa.int32()),
                             id_col: pa.array([], pa.int64()),
                             "unit": pa.array([], pa.list_(pa.float32()))})
        cent = ray.get(cent_ref)
        ids = pc.cast(batch.column(id_col).combine_chunks(), pa.int64()) \
                .to_numpy(zero_copy_only=False)
        m = _normalize(_as_matrix(batch.column(emb_col)))
        assign = (m @ cent.T).argmax(axis=1).astype(np.int32)
        unit = pa.FixedSizeListArray.from_arrays(
            pa.array(m.ravel(), pa.float32()), m.shape[1])
        return pa.table({
            "tab": pa.array(np.zeros(len(ids), np.int32), pa.int32()),
            "bucket": pa.array(assign, pa.int32()),
            id_col: pa.array(ids, pa.int64()),
            "unit": unit})

    manifest = bucketed_group_apply(
        ds.select_columns([id_col, emb_col]).map_batches(
            keyed, batch_format="pyarrow", batch_size=4096),
        ["tab", "bucket"], _write_group_fn(index_dir, rows_per_file),
        num_buckets=num_buckets).take_all()
    meta = {"kind": "ivf", "n_centroids": int(len(centroids)),
            "dim": int(centroids.shape[1]), "seed": seed,
            "id_col": id_col, "emb_col": emb_col,
            "centroids": [[float(x) for x in c] for c in centroids],
            "buckets": {f"{r['tab']}/{r['bucket']}": int(r["rows"])
                        for r in manifest}}
    _write_meta(index_dir, meta)
    return meta


def ivf_index_topk(index_dir: str, queries: np.ndarray, k: int = 10, *,
                   n_probe: int = 4, batch_size: int | None = 4096):
    """Approximate cosine top-k against an IVF index: each query probes
    its ``n_probe`` nearest centroids; the file scan covers the UNION of
    all queries' probe buckets once (shared _scan_topk machinery)."""
    import json
    import os

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    cent = np.asarray(meta["centroids"], dtype=np.float32)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    sims = q @ cent.T                       # (nq, C)
    order = np.argsort(-sims, axis=1)[:, :n_probe]
    probes = [set(int(c) for c in row) for row in order]  # tab 0 → combo=cid
    wanted = sorted({c for p in probes for c in p})
    files = _bucket_files(index_dir, [(0, c) for c in wanted])
    return _scan_topk(files, probes, q, meta["id_col"], k, batch_size)


def quantization_error(ds, vec_col: str = "embedding", *,
                       levels: int = 255,
                       num_buckets: int | None = None) -> pa.Table:
    """Per-dimension audit of affine int8-style embedding quantization:
    with per-dimension range [mn, mx] split into ``levels`` steps, code
    q = floor((x − mn)·levels/(mx − mn) + 0.5) reconstructs to
    mn + q·(mx − mn)/levels; the output row per dimension is
    (dim 1-based, mn, mx, max_err, bound, within_bound) where bound is
    the half-step (mx − mn)/(2·levels) the scheme guarantees (up to one
    float ulp, folded into the check) — the storage-planning question
    "can this corpus ship int8 embeddings?" answered with exact extrema
    and worst-case reconstruction error, not a sample.

    Scale shape: two stateless passes.  Pass 1: per-batch per-dim
    min/max partial rows → min/max-combiner exchange bounded by the
    dimensionality.  Pass 2: the (mn, scale) table broadcasts once via
    ``ray.put``; per-batch vectorized quantize/reconstruct emits per-dim
    max-error partials → max-combiner exchange, same bound.  Constant
    dimensions (mx == mn) quantize to code 0 with zero error.
    """
    import ray

    from webval.exchange import grouped_agg

    def minmax(t: pa.Table) -> pa.Table:
        m = _as_matrix(t.column(vec_col)).astype(np.float64)
        if m.size == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        d = m.shape[1]
        return pa.table({"dim": pa.array(np.arange(1, d + 1), pa.int64()),
                         "mn": pa.array(m.min(axis=0), pa.float64()),
                         "mx": pa.array(m.max(axis=0), pa.float64())})

    ranges = grouped_agg(ds.map_batches(minmax, batch_format="pyarrow"),
                         ["dim"], [("mn", "min"), ("mx", "max")],
                         rename={"mn_min": "mn", "mx_max": "mx"},
                         num_buckets=num_buckets)
    blocks = [ray.get(r) for r in ranges.materialize().to_arrow_refs()]
    blocks = [b for b in blocks if b.num_rows]
    if not blocks:
        return pa.table({"dim": pa.array([], pa.int64()),
                         "mn": pa.array([], pa.float64()),
                         "mx": pa.array([], pa.float64()),
                         "max_err": pa.array([], pa.float64()),
                         "bound": pa.array([], pa.float64()),
                         "within_bound": pa.array([], pa.bool_())})
    rt = pa.concat_tables(blocks).combine_chunks() \
        .sort_by([("dim", "ascending")])
    mn = rt.column("mn").to_numpy(zero_copy_only=False)
    mx = rt.column("mx").to_numpy(zero_copy_only=False)
    rng_ref = ray.put((mn, mx))

    def maxerr(t: pa.Table) -> pa.Table:
        lo, hi = ray.get(rng_ref)
        m = _as_matrix(t.column(vec_col)).astype(np.float64)
        if m.size == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "max_err": pa.array([], pa.float64())})
        span = hi - lo
        safe = np.where(span > 0, span, 1.0)
        q = np.floor((m - lo) * float(levels) / safe + 0.5)
        recon = lo + q * span / float(levels)
        err = np.abs(m - np.where(span > 0, recon, lo))
        d = m.shape[1]
        return pa.table({"dim": pa.array(np.arange(1, d + 1), pa.int64()),
                         "max_err": pa.array(err.max(axis=0), pa.float64())})

    errs = grouped_agg(ds.map_batches(maxerr, batch_format="pyarrow"),
                       ["dim"], [("max_err", "max")],
                       rename={"max_err_max": "max_err"},
                       num_buckets=num_buckets)
    eb = [ray.get(r) for r in errs.materialize().to_arrow_refs()]
    eb = [b for b in eb if b.num_rows]
    et = pa.concat_tables(eb).combine_chunks().sort_by([("dim", "ascending")])
    me = et.column("max_err").to_numpy(zero_copy_only=False)
    bound = (mx - mn) / (2.0 * levels)
    within = me <= bound * (1.0 + 1e-12) + 1e-15
    return pa.table({"dim": rt.column("dim"),
                     "mn": pa.array(mn, pa.float64()),
                     "mx": pa.array(mx, pa.float64()),
                     "max_err": pa.array(me, pa.float64()),
                     "bound": pa.array(bound, pa.float64()),
                     "within_bound": pa.array(within)})


def jl_sign_matrix(dim_in: int, dim_out: int) -> np.ndarray:
    """Deterministic ±1 Johnson-Lindenstrauss projection matrix
    (Achlioptas 2003, database-friendly random projections): the sign of
    entry (j, k) is the parity of a xorshift-multiply integer hash of
    idx = j·dim_out + k — NONLINEAR mixing matters: a plain LCG parity
    is linear in idx, which makes adjacent output columns near-exact
    negations of each other (rank collapse — caught empirically when the
    first cut produced y₂ = −y₁).  The hash (Knuth multiplier, two
    xor-shift rounds, all mod 2³²) is replayable cell-by-cell in ANY
    int64 engine — xor()/>>/% only, no overflow below idx ≈ 7e9 — so a
    SQL twin rebuilds the SAME matrix.  Columns are scaled by 1/√dim_out
    so squared norms are preserved in expectation."""
    idx = (np.arange(dim_in, dtype=np.int64)[:, None] * dim_out
           + np.arange(dim_out, dtype=np.int64)[None, :])
    h = (idx * 2654435761) % 4294967296
    h = h ^ (h >> 16)
    h = (h * 40503) % 4294967296
    h = h ^ (h >> 13)
    return np.where(h % 2 == 0, 1.0, -1.0) / np.sqrt(float(dim_out))


def jl_project(ds, vec_col: str = "embedding", *, dim_out: int = 8,
               id_col: str = "vec_id"):
    """Random-projection dimensionality reduction: project each
    embedding onto the deterministic ±1/√k JL matrix — the cheap
    scale path that shrinks ANN/dedup index footprints dim_in/dim_out×
    while approximately preserving pairwise geometry (the JL lemma's
    guarantee; sign matrices per Achlioptas 2003).  Output row per
    vector: (id, y — the projected list<double>, norm_in, norm_out).

    Scale shape: stateless vectorized map — the (dim_in × dim_out)
    matrix is built once per task from the closure constants (KB-sized,
    cheaper than shipping it), each batch is ONE numpy matmul; no
    shuffle, no driver state."""

    def proj(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        m = _as_matrix(t.column(vec_col)).astype(np.float64)
        r = jl_sign_matrix(m.shape[1], dim_out)
        y = m @ r
        offs = pa.array(np.arange(0, (len(y) + 1) * dim_out, dim_out,
                                  dtype=np.int32))
        ylist = pa.ListArray.from_arrays(
            offs, pa.array(y.ravel(), pa.float64()))
        return pa.table({
            id_col: ids,
            "y": ylist,
            "norm_in": pa.array(np.sqrt((m * m).sum(axis=1)),
                                pa.float64()),
            "norm_out": pa.array(np.sqrt((y * y).sum(axis=1)),
                                 pa.float64())})

    return ds.map_batches(proj, batch_format="pyarrow")
