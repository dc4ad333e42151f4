"""PageRank: exact numpy oracle, dangling nodes, parallel edges, empty."""

import numpy as np
import pyarrow as pa
import pytest


def _collect(ds):
    import ray

    return pa.concat_tables([ray.get(x) for x in ds.to_arrow_refs()])


@pytest.mark.usefixtures("ray_session")
def test_pagerank_matches_reference():
    import ray.data as rd

    from webval.graph import pagerank, pagerank_reference

    rng = np.random.default_rng(3)
    m = 2000
    src = rng.integers(0, 150, m)
    dst = rng.integers(0, 200, m)  # nodes 150..199 are dangling
    t = pa.table({"s": pa.array(src, pa.int64()),
                  "d": pa.array(dst, pa.int64())})
    out = _collect(pagerank(rd.from_arrow(t).repartition(5), "s", "d",
                            n_iter=7, num_buckets=8))
    got = out.sort_by([("node", "ascending")])
    nodes, r = pagerank_reference(src, dst, n_iter=7)
    assert np.array_equal(
        got.column("node").to_numpy(zero_copy_only=False), nodes)
    gr = got.column("rank").to_numpy(zero_copy_only=False)
    assert np.abs(gr - r).max() < 1e-12
    assert abs(gr.sum() - 1.0) < 1e-9


@pytest.mark.usefixtures("ray_session")
def test_pagerank_parallel_edges_weigh_double():
    import ray.data as rd

    from webval.graph import pagerank

    # a->b twice, a->c once: b receives 2/3 of a's mass
    t = pa.table({"s": ["a", "a", "a"], "d": ["b", "b", "c"]})
    out = _collect(pagerank(rd.from_arrow(t), "s", "d", n_iter=1,
                            num_buckets=4))
    ranks = {r["node"]: r["rank"] for r in out.to_pylist()}
    n, d = 3, 0.85
    # after one iteration from uniform 1/3: b and c are dangling
    dangling = 2 / 3
    assert ranks["b"] == pytest.approx(
        (1 - d) / n + d * ((1 / 3) * (2 / 3) + dangling / n))
    assert ranks["c"] == pytest.approx(
        (1 - d) / n + d * ((1 / 3) * (1 / 3) + dangling / n))
    assert sum(ranks.values()) == pytest.approx(1.0)


@pytest.mark.usefixtures("ray_session")
def test_pagerank_empty_edges():
    import ray.data as rd

    from webval.graph import pagerank

    t = pa.table({"s": pa.array([], pa.string()),
                  "d": pa.array([], pa.string())})
    out = _collect(pagerank(rd.from_arrow(t), "s", "d", num_buckets=4))
    assert out.num_rows == 0


@pytest.mark.usefixtures("ray_session")
def test_connected_components_matches_union_find():
    import ray.data as rd

    from webval.graph import connected_components

    rng = np.random.default_rng(67)
    # several ring/chain components + singleton-free noise edges
    edges = []
    base = 0
    for size in (2, 3, 7, 40, 1):
        ids = list(range(base, base + max(size, 2)))
        edges += list(zip(ids, ids[1:]))
        base += 100
    extra = rng.integers(1000, 1200, (300, 2)).tolist()
    edges += [tuple(e) for e in extra]
    t = pa.table({"a": pa.array([a for a, _ in edges], pa.int64()),
                  "b": pa.array([b for _, b in edges], pa.int64())})
    got = connected_components(rd.from_arrow(t).repartition(5), "a", "b",
                               num_buckets=4).to_pandas()
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert dict(zip(got["id"], got["component"])) == want
    assert list(got.columns) == ["id", "component"]


def test_reciprocity_brute_force(ray_session):
    import ray.data as rd

    from webval.graph import reciprocity

    rng = np.random.default_rng(37)
    n = 4000
    a = rng.integers(0, 60, n).astype(np.int64)
    b = rng.integers(0, 60, n).astype(np.int64)
    t = pa.table({"s": a, "d": b})
    got = reciprocity(rd.from_arrow(t).repartition(5), "s", "d",
                      num_buckets=8).to_pydict()
    edges = {(x, y) for x, y in zip(a, b) if x != y}
    rec = sum((y, x) in edges for x, y in edges)
    assert got["n_edges"][0] == len(edges)
    assert got["n_reciprocal"][0] == rec
    assert abs(got["reciprocity"][0] - rec / len(edges)) < 1e-12

    # self-loops / nulls dropped; zero-edge graph -> NaN ratio
    t2 = pa.table({"s": pa.array([1, None, 2], pa.int64()),
                   "d": pa.array([1, 2, None], pa.int64())})
    got2 = reciprocity(rd.from_arrow(t2), "s", "d").to_pydict()
    assert got2["n_edges"][0] == 0 and np.isnan(got2["reciprocity"][0])
