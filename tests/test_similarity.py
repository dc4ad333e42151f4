"""ANN similarity search: brute-force exact baseline + LSH recall."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from webval.similarity import brute_force_topk, lsh_topk

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(t.column("vec_id").to_pylist())
    m = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    return ids, m


def _exact_topk(ids, m, q, k):
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = mn @ qn.T
    out = []
    for j in range(q.shape[0]):
        idx = np.lexsort((ids, -sims[:, j]))[:k]
        out.append(ids[idx].tolist())
    return out


@pytest.mark.usefixtures("ray_session")
def test_brute_force_matches_numpy(emb):
    import ray.data as rd

    ids, m = emb
    queries = m[[3, 77, 200]]
    ds = rd.read_parquet(f"{SF}/embeddings.parquet").repartition(5)
    got = brute_force_topk(ds, queries, k=10).take_all()
    expect = _exact_topk(ids, m, queries, 10)
    for j in range(3):
        rows = sorted((r for r in got if r["query_id"] == j), key=lambda r: r["rank"])
        assert [r["vec_id"] for r in rows] == expect[j]
        assert rows[0]["vec_id"] == ids[[3, 77, 200][j]]  # self is nearest
        assert rows[0]["score"] == pytest.approx(1.0, abs=1e-5)


@pytest.mark.usefixtures("ray_session")
def test_lsh_topk_recall(emb):
    import ray.data as rd

    ids, m = emb
    queries = m[[5, 150, 420]]
    ds = rd.read_parquet(f"{SF}/embeddings.parquet").repartition(5)
    exact = _exact_topk(ids, m, queries, 10)
    got = lsh_topk(ds, queries, k=10, n_planes=6, multiprobe=2).take_all()
    recalls = []
    for j in range(3):
        rows = [r["vec_id"] for r in got if r["query_id"] == j]
        recalls.append(len(set(rows) & set(exact[j])) / 10)
    assert np.mean(recalls) >= 0.5, recalls


@pytest.mark.usefixtures("ray_session")
def test_ann_index_build_and_query(emb, tmp_path):
    """Persisted LSH index: build partitioned-by-bucket parquet, query with
    partition pruning, recall ≥ 0.9 vs brute force (VERDICT r1 next-7)."""
    import os

    import ray.data as rd

    from webval.similarity import ann_index_topk, build_ann_index

    ids, m = emb
    ds = rd.read_parquet(f"{SF}/embeddings.parquet").repartition(5)
    idx_dir = str(tmp_path / "ann_index")
    meta = build_ann_index(ds, idx_dir, n_planes=6, seed=23)
    assert os.path.exists(os.path.join(idx_dir, "meta.json"))
    assert sum(meta["buckets"].values()) == len(ids) * meta["n_tables"]
    # every bucket dir referenced in meta exists with parquet inside
    some = next(iter(meta["buckets"]))
    t, b = some.split("/")
    assert os.path.isdir(os.path.join(idx_dir, f"tab={t}", f"bucket={b}"))

    queries = m[[5, 150, 420]]
    exact = _exact_topk(ids, m, queries, 10)
    got = ann_index_topk(idx_dir, queries, k=10, multiprobe=2).take_all()
    recalls = []
    for j in range(3):
        rows = [r["vec_id"] for r in got if r["query_id"] == j]
        recalls.append(len(set(rows) & set(exact[j])) / 10)
    assert np.mean(recalls) >= 0.9, recalls
    # pruning: a 1-query probe at multiprobe=0 touches exactly one bucket
    got0 = ann_index_topk(idx_dir, m[[5]], k=5, multiprobe=0).take_all()
    assert {r["query_id"] for r in got0} == {0}
    assert got0[0]["vec_id"] == ids[5] or ids[5] in [r["vec_id"] for r in got0]


@pytest.mark.usefixtures("ray_session")
def test_ann_index_append_and_shared_prune(emb, tmp_path):
    """VERDICT r2 next-9: append_to_index adds vectors into EXISTING bucket
    dirs (old parts untouched) and the batched-query prune reads strictly
    fewer files than a full scan."""
    import glob
    import os

    import pyarrow as pa
    import ray.data as rd

    from webval.similarity import (
        ann_index_topk,
        append_to_index,
        build_ann_index,
        pruned_index_files,
    )

    ids, m = emb
    half = len(ids) // 2
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ds_a = rd.from_arrow(t.slice(0, half)).repartition(3)
    ds_b = rd.from_arrow(t.slice(half)).repartition(3)
    idx_dir = str(tmp_path / "ann_index")
    meta0 = build_ann_index(ds_a, idx_dir, n_planes=6, seed=23)
    files_before = set(glob.glob(os.path.join(idx_dir, "**", "*.parquet"),
                                 recursive=True))
    meta1 = append_to_index(ds_b, idx_dir)
    files_after = set(glob.glob(os.path.join(idx_dir, "**", "*.parquet"),
                                recursive=True))
    # append only ADDS part files; totals cover the whole corpus
    assert files_before <= files_after and len(files_after) > len(files_before)
    assert sum(meta1["buckets"].values()) == len(ids) * meta0["n_tables"]
    # appended vectors are findable with the original planes
    queries = m[[half + 3, half + 40]]
    got = ann_index_topk(idx_dir, queries, k=5, multiprobe=2).take_all()
    found = {r["vec_id"] for r in got}
    assert ids[half + 3] in found and ids[half + 40] in found
    # batched multi-query prune: union of Hamming balls < full index scan
    pruned, probes = pruned_index_files(idx_dir, m[[5, 150, 420]],
                                        multiprobe=1)
    assert 0 < len(pruned) < len(files_after)
    assert len(probes) == 3 and all(len(p) > 0 for p in probes)


@pytest.mark.usefixtures("ray_session")
def test_ivf_index_build_and_query(emb, tmp_path):
    """IVF coarse-quantizer index: recall vs brute force at modest n_probe,
    and the probe scan touches a strict subset of the bucket files."""
    import glob
    import os

    import ray.data as rd

    from webval.similarity import build_ivf_index, ivf_index_topk

    ids, m = emb
    ds = rd.read_parquet(f"{SF}/embeddings.parquet").repartition(5)
    idx_dir = str(tmp_path / "ivf_index")
    meta = build_ivf_index(ds, idx_dir, n_centroids=16, sample_size=400)
    assert meta["kind"] == "ivf"
    assert sum(meta["buckets"].values()) == len(ids)  # each vector ONCE
    queries = m[[5, 150, 420]]
    exact = _exact_topk(ids, m, queries, 10)
    # probing EVERY centroid must reproduce brute force exactly — proves
    # the partitioned scan loses nothing
    full = ivf_index_topk(idx_dir, queries, k=10, n_probe=16).take_all()
    for j in range(3):
        rows = [r["vec_id"] for r in full if r["query_id"] == j]
        assert rows == exact[j], j
    # partial probe: these synthetic embeddings are near-random (no real
    # cluster structure for IVF to exploit), so only a modest recall floor
    # is honest — 6/16 buckets must still find well over chance
    got = ivf_index_topk(idx_dir, queries, k=10, n_probe=6).take_all()
    recalls = []
    for j in range(3):
        rows = [r["vec_id"] for r in got if r["query_id"] == j]
        recalls.append(len(set(rows) & set(exact[j])) / 10)
    assert np.mean(recalls) >= 0.5, recalls
    # pruning: n_probe=1 reads fewer files than the full index holds
    all_files = glob.glob(os.path.join(idx_dir, "**", "*.parquet"),
                          recursive=True)
    one = ivf_index_topk(idx_dir, m[[5]], k=3, n_probe=1).take_all()
    assert len(one) >= 1  # the vector's own bucket always contains it
    assert one[0]["vec_id"] == ids[5]
    assert len(all_files) > 16 // 4  # sanity: multiple buckets materialized


@pytest.mark.usefixtures("ray_session")
def test_ivf_build_deterministic_across_block_orders(emb, tmp_path):
    """r5s pin: the coarse-quantizer sample is a pure function of the id
    column (hash-selected, id-sorted), NOT of block completion order — a
    bare .take(n) sample made centroids (and recall at fixed n_probe)
    vary build to build on identical data.  Two builds at different
    partitionings must produce identical centroids and bucket counts."""
    import ray.data as rd

    from webval.similarity import build_ivf_index

    m1 = build_ivf_index(rd.read_parquet(f"{SF}/embeddings.parquet")
                         .repartition(2),
                         str(tmp_path / "a"), n_centroids=16,
                         sample_size=400)
    m2 = build_ivf_index(rd.read_parquet(f"{SF}/embeddings.parquet")
                         .repartition(7),
                         str(tmp_path / "b"), n_centroids=16,
                         sample_size=400)
    assert m1["centroids"] == m2["centroids"]
    assert m1["buckets"] == m2["buckets"]
