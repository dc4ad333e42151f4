"""Deduplication operators for training-data pipelines.

Ray-Data-native shapes:

- exact:     fingerprint in map_batches → groupby(hash) → keep min-id row
             (hash-partition + per-group first; deterministic keeper)
- MinHash:   shingle → minhash signature per doc (vectorized per batch) →
             explode to (band, band_hash, doc) rows → groupby(band bucket) →
             candidate pairs → Jaccard verify → union-find on the (small)
             verified pair set → keep cluster minimum
- SimHash:   64-bit simhash per doc → Hamming-ball candidates via 4×16-bit
             band buckets → verify Hamming distance
- embedding: random-hyperplane LSH buckets → within-bucket cosine → clusters

Scale notes are on each function; the all-to-all steps shuffle only compact
(hash, id) rows — never text — and candidate verification is bounded by
bucket size caps (hot-bucket guard).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webval.sketches import hash64
from webval.textstats import rolling_hashes

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, id_col: str, text_col: str = "text", *, normalize: bool = True,
                keep_cols: list[str] | None = None, num_buckets: int = 64):
    """Keep exactly one row (the minimum ``id_col``) per distinct text.

    fingerprint (map_batches, vectorized hash) → hash-bucket exchange →
    per-bucket Arrow group_by(min id) + join-back filter.  Shuffle key is the
    64-bit hash → uniform partitioning regardless of content skew; any key
    cardinality (exchange.bucketed_group_apply).  Null texts are all kept.
    """
    from webval.exchange import bucketed_group_apply
    from webval.textstats import add_fingerprints

    fp = add_fingerprints(ds, text_col, normalize=normalize)
    cols = keep_cols or list(ds.schema().names)

    def keep_min(g: pa.Table) -> pa.Table:
        nulls = g.filter(pc.is_null(g.column("fingerprint")))
        vals = g.filter(pc.is_valid(g.column("fingerprint")))
        if vals.num_rows:
            mins = (vals.select(["fingerprint", id_col])
                        .group_by("fingerprint").aggregate([(id_col, "min")]))
            vals = vals.join(mins, keys=["fingerprint"])
            vals = vals.filter(pc.equal(vals.column(id_col),
                                        vals.column(f"{id_col}_min")))
        return pa.concat_tables([vals.select(cols), nulls.select(cols)])

    return bucketed_group_apply(fp, ["fingerprint"], keep_min,
                                num_buckets=num_buckets)


def exact_dup_groups(ds, id_col: str, text_col: str = "text", *,
                     normalize: bool = True, num_buckets: int = 64):
    """The duplicate groups (keeper_id, n_copies) with n > 1 — per-batch
    Arrow group_by combiner, then a hash-bucket exchange (any cardinality)."""
    from webval.exchange import grouped_agg
    from webval.textstats import add_fingerprints

    fp = add_fingerprints(ds, text_col, normalize=normalize)
    fp = fp.map_batches(
        lambda t: t.select(["fingerprint", id_col]).drop_null(),
        batch_format="pyarrow")
    out = grouped_agg(fp, ["fingerprint"],
                      [(id_col, "count"), (id_col, "min")],
                      num_buckets=num_buckets,
                      rename={f"{id_col}_count": "n_copies",
                              f"{id_col}_min": "keeper_id"})
    return out.map_batches(
        lambda t: pa.table({
            "keeper_id": pc.cast(t.column("keeper_id"), pa.int64()),
            "n_copies": pc.cast(t.column("n_copies"), pa.int64()),
        }).filter(pc.greater(pc.cast(t.column("n_copies"), pa.int64()), 1)),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dedup
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _minhash_params(k: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=k, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=k, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """k-permutation MinHash of a shingle-hash set: sig_j = min_i (a_j*h_i+b_j
    mod M61).  Vectorized (n_shingles × k) per doc."""
    if len(shingles) == 0:
        return np.zeros(len(a), dtype=np.uint64)
    h = shingles.astype(np.uint64)
    with np.errstate(over="ignore"):
        prod = h[:, None] * a[None, :] + b[None, :]
        prod = (prod & _MERSENNE) + (prod >> np.uint64(61))
        prod = np.where(prod >= _MERSENNE, prod - _MERSENNE, prod)
    return prod.min(axis=0)


class MinHasher:
    """Actor-pool stage: text → (band_id, band_hash) rows for LSH bucketing.

    k = bands*rows_per_band hashes; docs agreeing on all rows of any band
    become candidates (standard LSH S-curve: P(candidate) = 1-(1-s^r)^b).
    Emits one output row per (doc, band): compact (ints only) — the ONLY
    data that shuffles.
    """

    def __init__(self, id_col: str, text_col: str = "text", *, bands: int = 16,
                 rows_per_band: int = 8, shingle_window: int = 8):
        self.id_col = id_col
        self.text_col = text_col
        self.bands = bands
        self.r = rows_per_band
        self.window = shingle_window
        self.a, self.b = _minhash_params(bands * rows_per_band)

    def signature(self, text: str) -> np.ndarray:
        return minhash_signature(
            np.unique(rolling_hashes(text, self.window)), self.a, self.b)

    # shingle×perm elements per product chunk: ~1MB keeps the permutation
    # product in L2 (measured: 8M-element chunks are 4x slower — memory-bound)
    _CHUNK_ELEMS = 131_072

    def _signatures_batch(self, texts: list) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized signatures for a whole batch: concatenate every doc's
        shingle set, one (shingles × k) permutation product per memory-bounded
        chunk, then segmented min (np.minimum.reduceat) by doc offsets."""
        sh_per_doc = []
        keep = []
        for i, t in enumerate(texts):
            if t is None or len(t) < self.window:
                continue
            sh = np.unique(rolling_hashes(t, self.window))
            if len(sh) == 0:
                continue
            keep.append(i)
            sh_per_doc.append(sh)
        if not keep:
            return np.empty(0, dtype=np.int64), np.empty((0, 0), dtype=np.uint64)
        k = len(self.a)
        sigs = np.empty((len(keep), k), dtype=np.uint64)
        counts = np.array([len(s) for s in sh_per_doc])
        # chunk docs so n_shingles*k stays bounded
        start = 0
        while start < len(keep):
            end = start
            tot = 0
            while end < len(keep) and (tot == 0 or
                                       (tot + counts[end]) * k <= self._CHUNK_ELEMS):
                tot += counts[end]
                end += 1
            h = np.concatenate(sh_per_doc[start:end]).astype(np.uint64)
            with np.errstate(over="ignore"):
                prod = h[:, None] * self.a[None, :] + self.b[None, :]
                prod = (prod & _MERSENNE) + (prod >> np.uint64(61))
                prod = np.where(prod >= _MERSENNE, prod - _MERSENNE, prod)
            offsets = np.concatenate([[0], np.cumsum(counts[start:end])[:-1]])
            sigs[start:end] = np.minimum.reduceat(prod, offsets, axis=0)
            start = end
        return np.asarray(keep, dtype=np.int64), sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        keep, sigs = self._signatures_batch(batch.column(self.text_col).to_pylist())
        n = len(keep)
        if n == 0:
            return pa.table({self.id_col: pa.array([], pa.int64()),
                             "band_id": pa.array([], pa.int32()),
                             "band_hash": pa.array([], pa.int64())})
        with np.errstate(over="ignore"):
            band_sums = (sigs.reshape(n, self.bands, self.r).sum(axis=2)
                         + np.arange(self.bands, dtype=np.uint64)[None, :])
        bh = hash64(band_sums.ravel()).astype(np.int64)
        out_ids = np.repeat(ids[keep].astype(np.int64), self.bands)
        out_band = np.tile(np.arange(self.bands, dtype=np.int32), n)
        return pa.table({
            self.id_col: pa.array(out_ids, type=pa.int64()),
            "band_id": pa.array(out_band, type=pa.int32()),
            "band_hash": pa.array(bh, type=pa.int64()),
        })


def _pairs_from_buckets(bucket_ds, id_col: str, max_bucket: int = 256):
    """(band_id, band_hash) LSH buckets → unordered candidate pairs, via the
    hash-bucket exchange (band hashes are high-cardinality).  Buckets larger
    than ``max_bucket`` are truncated (hot-bucket guard: a degenerate shingle
    — boilerplate — would otherwise produce O(n²) pairs); truncation only
    weakens recall inside one band, other bands still cover the docs."""
    from webval.exchange import bucketed_group_apply

    def pairs(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        lo, hi = [], []
        for _, grp in df.groupby(["band_id", "band_hash"], sort=False):
            ids = sorted(set(grp[id_col]))[:max_bucket]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    lo.append(ids[i])
                    hi.append(ids[j])
        return pa.table({"id_a": pa.array(lo, type=pa.int64()),
                         "id_b": pa.array(hi, type=pa.int64())})

    return bucketed_group_apply(bucket_ds, ["band_id", "band_hash"], pairs)


def connected_components_distributed(pairs, *, id_a: str = "id_a",
                                     id_b: str = "id_b", max_iter: int = 20,
                                     num_buckets: int = 64):
    """Min-label propagation over an edge Dataset — the scale path when the
    verified near-dup pair set is too large for driver union-find.

    Each round: every node takes the min label among itself and its
    neighbors (one bucketed exchange over (node, label) messages); stops
    when a round changes no labels (checked via a cheap count).  Rounds ≈
    graph diameter; near-dup clusters are tiny cliques → 2-3 rounds.
    Returns Dataset[{id, cluster_id}] restricted to nodes in some pair.
    """
    from webval.exchange import bucketed_group_apply

    null64 = pa.scalar(None, pa.int64())

    def seed(batch: pa.Table) -> pa.Table:
        a = pc.cast(batch.column(id_a), pa.int64()).combine_chunks()
        b = pc.cast(batch.column(id_b), pa.int64()).combine_chunks()
        m = pc.min_element_wise(a, b).combine_chunks() \
            if isinstance(pc.min_element_wise(a, b), pa.ChunkedArray) \
            else pc.min_element_wise(a, b)
        return pa.table({"id": pa.concat_arrays([a, b]),
                         "label": pa.concat_arrays([m, m])})

    def min_label(t: pa.Table) -> pa.Table:
        g = t.group_by("id").aggregate([("label", "min")])
        return g.select(["id", "label_min"]).rename_columns(["id", "label"])

    labels = bucketed_group_apply(
        pairs.map_batches(seed, batch_format="pyarrow"), ["id"],
        min_label, num_buckets=num_buckets).materialize()

    # doubled edge stream keyed by each endpoint: (key, other, label=null)
    def doubled(batch: pa.Table) -> pa.Table:
        a = pc.cast(batch.column(id_a), pa.int64()).combine_chunks()
        b = pc.cast(batch.column(id_b), pa.int64()).combine_chunks()
        n = len(a) + len(b)
        return pa.table({"key": pa.concat_arrays([a, b]),
                         "other": pa.concat_arrays([b, a]),
                         "label": pa.nulls(n, pa.int64())})

    edge_stream = pairs.map_batches(doubled, batch_format="pyarrow").materialize()

    for _ in range(max_iter):
        lbl_stream = labels.map_batches(
            lambda t: pa.table({"key": t.column("id"),
                                "other": pa.nulls(t.num_rows, pa.int64()),
                                "label": t.column("label")}),
            batch_format="pyarrow")

        def local_join(t: pa.Table) -> pa.Table:
            # co-bucketed by key: label rows carry the key's label; edge rows
            # forward it to their other endpoint — a join without Dataset.join
            is_lbl = pc.is_valid(t.column("label"))
            lbl = t.filter(is_lbl)
            edg = t.filter(pc.invert(is_lbl))
            d = dict(zip(lbl.column("key").to_pylist(),
                         lbl.column("label").to_pylist()))
            out_id = lbl.column("key").to_pylist()
            out_lb = lbl.column("label").to_pylist()
            for k, o in zip(edg.column("key").to_pylist(),
                            edg.column("other").to_pylist()):
                if k in d:
                    out_id.append(o)
                    out_lb.append(d[k])
            return pa.table({"id": pa.array(out_id, pa.int64()),
                             "label": pa.array(out_lb, pa.int64())})

        msgs = bucketed_group_apply(edge_stream.union(lbl_stream), ["key"],
                                    local_join, num_buckets=num_buckets)
        new_labels = bucketed_group_apply(msgs, ["id"], min_label,
                                          num_buckets=num_buckets).materialize()
        old_sum, new_sum = labels.sum("label"), new_labels.sum("label")
        labels = new_labels
        if old_sum == new_sum:  # labels only ever decrease → fixpoint
            break
    return labels.map_batches(
        lambda t: t.rename_columns(["id", "cluster_id"]),
        batch_format="pyarrow")


class _UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != self.parent[p]:
            self.parent[p] = self.parent[self.parent[p]]
            p = self.parent[p]
        self.parent[x] = p
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def minhash_dedup(ds, id_col: str, text_col: str = "text", *, bands: int = 16,
                  rows_per_band: int = 8, shingle_window: int = 8,
                  jaccard_threshold: float = 0.8, concurrency=(1, 8),
                  verify: bool = True, max_bucket: int = 256,
                  components: str = "driver"):
    """Near-duplicate clusters via MinHash-LSH.

    Returns a Dataset[{id, cluster_id}] for every doc in a near-dup cluster
    (cluster_id = min id in cluster).  Pipeline: MinHasher actor pool →
    bucket groupby → candidate pairs → (optional) exact-Jaccard verify on the
    pair set via a broadcast signature join → connected components.

    ``components="driver"`` runs union-find on the driver over VERIFIED
    pairs — in web corpora the near-dup pair set is O(dups), orders smaller
    than the corpus.  ``components="distributed"`` runs
    connected_components_distributed (min-label propagation, all exchanges)
    for pair sets too large to collect.
    """
    hasher_cls = MinHasher
    buckets = ds.map_batches(
        hasher_cls, batch_format="pyarrow", batch_size=1024,
        concurrency=concurrency,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col,
                               "bands": bands, "rows_per_band": rows_per_band,
                               "shingle_window": shingle_window})
    pairs_ds = _pairs_from_buckets(buckets, id_col, max_bucket=max_bucket)
    if components == "distributed":
        # verification happens per-pair inside the distributed path too, but
        # the pair stream itself never concentrates on the driver
        import ray.data as rd
        if verify:
            pair_rows = {(r["id_a"], r["id_b"]) for r in pairs_ds.take_all()}
            pair_rows = _verify_jaccard(ds, id_col, text_col, pair_rows,
                                        shingle_window, jaccard_threshold)
            if not pair_rows:
                return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64()),
                                               "cluster_id": pa.array([], pa.int64())}))
            items = sorted(pair_rows)
            pairs_ds = rd.from_arrow(pa.table({
                "id_a": pa.array([a for a, _ in items], pa.int64()),
                "id_b": pa.array([b for _, b in items], pa.int64())}))
        out = connected_components_distributed(pairs_ds)
        return out.map_batches(
            lambda t: t.rename_columns([id_col, "cluster_id"]),
            batch_format="pyarrow")
    pair_rows = pairs_ds.take_all()
    pairs = {(r["id_a"], r["id_b"]) for r in pair_rows}
    if verify and pairs:
        pairs = _verify_jaccard(ds, id_col, text_col, pairs, shingle_window,
                                jaccard_threshold)
    uf = _UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    rows = sorted((x, uf.find(x)) for x in uf.parent)
    import ray.data as rd
    if not rows:
        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64()),
                                       "cluster_id": pa.array([], pa.int64())}))
    return rd.from_arrow(pa.table({
        id_col: pa.array([r[0] for r in rows], type=pa.int64()),
        "cluster_id": pa.array([r[1] for r in rows], type=pa.int64())}))


def _verify_jaccard(ds, id_col, text_col, pairs: set, window: int,
                    threshold: float) -> set:
    """Exact shingle-set Jaccard for candidate pairs.  The candidate id set
    is broadcast (ray.put) and each map task emits shingle sets only for its
    own candidate rows; sets are gathered driver-side (bounded by the
    candidate count, not the corpus)."""
    import ray

    cand_ids = set()
    for a, b in pairs:
        cand_ids.add(a)
        cand_ids.add(b)
    ref = ray.put(cand_ids)

    def shingle_rows(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ref)
        ids, blobs = [], []
        for doc_id, text in zip(batch.column(id_col).to_pylist(),
                                batch.column(text_col).to_pylist()):
            if doc_id in wanted and text is not None:
                ids.append(doc_id)
                blobs.append(np.unique(rolling_hashes(text, window)).tobytes())
        return pa.table({"id": pa.array(ids, pa.int64()),
                         "sh": pa.array(blobs, pa.large_binary())})

    sh = {r["id"]: np.frombuffer(r["sh"], dtype=np.uint64)
          for r in ds.map_batches(shingle_rows, batch_format="pyarrow").take_all()}
    out = set()
    for a, b in pairs:
        sa, sb = sh.get(a), sh.get(b)
        if sa is None or sb is None or len(sa) == 0 or len(sb) == 0:
            continue
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        jac = inter / (len(sa) + len(sb) - inter)
        if jac >= threshold:
            out.add((a, b))
    return out


# ---------------------------------------------------------------------------
# SimHash near-dedup
# ---------------------------------------------------------------------------


def simhash64(token_hashes: np.ndarray) -> np.uint64:
    """Charikar simhash: sign of per-bit vote sums over token hashes."""
    if len(token_hashes) == 0:
        return np.uint64(0)
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return out


class SimHasher:
    """Actor-pool stage: text → simhash + 4×16-bit band keys (docs within
    Hamming distance 3 share at least one identical band — pigeonhole)."""

    def __init__(self, id_col: str, text_col: str = "text", window: int = 8):
        self.id_col = id_col
        self.text_col = text_col
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, bands, keys, hashes = [], [], [], []
        for doc_id, text in zip(batch.column(self.id_col).to_pylist(),
                                batch.column(self.text_col).to_pylist()):
            if text is None or len(text) < self.window:
                continue
            sh = simhash64(np.unique(rolling_hashes(text, self.window)))
            for b_i in range(4):
                ids_out.append(doc_id)
                bands.append(b_i)
                keys.append(int((sh >> np.uint64(16 * b_i)) & np.uint64(0xFFFF)))
                hashes.append(int(sh.astype(np.int64)))
        return pa.table({self.id_col: pa.array(ids_out, pa.int64()),
                         "band_id": pa.array(bands, pa.int32()),
                         "band_key": pa.array(keys, pa.int32()),
                         "simhash": pa.array(hashes, pa.int64())})


def simhash_dup_pairs(ds, id_col: str, text_col: str = "text", *,
                      max_hamming: int = 3, window: int = 8,
                      concurrency=(1, 8), max_bucket: int = 512):
    """Near-dup pairs by simhash Hamming distance ≤ max_hamming.  Bucket by
    16-bit bands (groupby), verify distance inside each bucket, dedupe pairs
    across bands with a final groupby."""

    sh = ds.map_batches(SimHasher, batch_format="pyarrow", batch_size=1024,
                        concurrency=concurrency,
                        fn_constructor_kwargs={"id_col": id_col,
                                               "text_col": text_col,
                                               "window": window})

    def pairs(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        lo, hi, dist = [], [], []
        for _, grp in df.groupby(["band_id", "band_key"], sort=False):
            items = sorted(dict(zip(grp[id_col], grp["simhash"])).items())[:max_bucket]
            for x in range(len(items)):
                for y in range(x + 1, len(items)):
                    d = bin(items[x][1] ^ items[y][1]).count("1")
                    if d <= max_hamming:
                        lo.append(items[x][0])
                        hi.append(items[y][0])
                        dist.append(d)
        return pa.table({"id_a": pa.array(lo, pa.int64()),
                         "id_b": pa.array(hi, pa.int64()),
                         "hamming": pa.array(dist, pa.int32())})

    from webval.exchange import bucketed_group_apply, grouped_agg

    raw = bucketed_group_apply(sh, ["band_id", "band_key"], pairs)
    # same pair can surface from several bands → keep one (min distance)
    out = grouped_agg(raw, ["id_a", "id_b"], [("hamming", "min")],
                      rename={"hamming_min": "hamming"})
    return out


# ---------------------------------------------------------------------------
# n-gram Jaccard (direct pairwise verify / small-set dedup)
# ---------------------------------------------------------------------------


def ngram_jaccard(text_a: str, text_b: str, window: int = 8) -> float:
    sa = np.unique(rolling_hashes(text_a, window))
    sb = np.unique(rolling_hashes(text_b, window))
    if len(sa) == 0 or len(sb) == 0:
        return 0.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    return inter / (len(sa) + len(sb) - inter)


# ---------------------------------------------------------------------------
# embedding near-dedup (cosine LSH)
# ---------------------------------------------------------------------------


def embedding_dup_pairs(ds, id_col: str, emb_col: str = "embedding", *,
                        cosine_threshold: float = 0.95, n_planes: int = 12,
                        n_tables: int = 4, seed: int = 11, max_bucket: int = 1024):
    """Near-dup pairs by embedding cosine ≥ threshold.

    Random-hyperplane LSH: ``n_tables`` independent sign-bucket keys per
    vector (sgn(R·v) packed to int); groupby(table, key) co-locates likely
    neighbors; exact cosine verifies within the bucket.  Only (id, key,
    vector) rows shuffle.  Probability two vectors at angle θ share a key:
    (1-θ/π)^n_planes per table.
    """
    first = ds.take(1)
    dim = len(first[0][emb_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim)).astype(np.float32)

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        vecs = np.asarray(batch.column(emb_col).to_pylist(), dtype=np.float32)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        out_ids, out_tab, out_key, out_vec = [], [], [], []
        for t in range(n_tables):
            signs = (unit @ planes[t].T) > 0
            keys = (signs * (1 << np.arange(n_planes))).sum(axis=1)
            out_ids.extend(ids)
            out_tab.extend([t] * len(ids))
            out_key.extend(keys.tolist())
            out_vec.extend([v.tobytes() for v in unit])
        return pa.table({"id": pa.array(out_ids, pa.int64()),
                         "tab": pa.array(out_tab, pa.int32()),
                         "key": pa.array(out_key, pa.int64()),
                         "vec": pa.array(out_vec, pa.large_binary())})

    def pairs(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        lo, hi, cs = [], [], []
        for _, grp in df.groupby(["tab", "key"], sort=False):
            items = sorted(zip(grp["id"], grp["vec"]))[:max_bucket]
            if len(items) < 2:
                continue
            m = np.stack([np.frombuffer(b, dtype=np.float32) for _, b in items])
            sims = m @ m.T
            for x in range(len(items)):
                for y in range(x + 1, len(items)):
                    if sims[x, y] >= cosine_threshold:
                        lo.append(items[x][0])
                        hi.append(items[y][0])
                        cs.append(float(sims[x, y]))
        return pa.table({"id_a": pa.array(lo, pa.int64()),
                         "id_b": pa.array(hi, pa.int64()),
                         "cosine": pa.array(cs, pa.float64())})

    from webval.exchange import bucketed_group_apply, grouped_agg

    raw = bucketed_group_apply(
        ds.map_batches(keyed, batch_format="pyarrow", batch_size=4096),
        ["tab", "key"], pairs)
    return grouped_agg(raw, ["id_a", "id_b"], [("cosine", "max")],
                       rename={"cosine_max": "cosine"})
