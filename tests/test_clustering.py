"""Distributed k-means: recovers planted blobs, assignment matches the
brute-force argmin, and the fit is a pure function of (data, seed) —
identical centroids across parallelism levels."""

import numpy as np
import pyarrow as pa
import pytest

from webval.clustering import _assign, kmeans_assign, kmeans_fit


def _blob_table(n_per: int = 300, k: int = 5, d: int = 8, seed: int = 3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 10.0, (k, d))
    rows, labels = [], []
    for i, c in enumerate(centers):
        rows.append(c + rng.normal(0, 0.5, (n_per, d)))
        labels.extend([i] * n_per)
    x = np.concatenate(rows).astype(np.float32)
    order = rng.permutation(len(x))
    x, labels = x[order], np.asarray(labels)[order]
    return pa.table({
        "vec_id": pa.array(np.arange(len(x)), pa.int64()),
        "embedding": pa.array(list(x), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())}), centers


@pytest.fixture(scope="module")
def blobs(ray_session):
    import ray.data as rd
    t, centers = _blob_table()
    return t, centers, rd.from_arrow(t).repartition(6)


def test_kmeans_recovers_planted_blobs(blobs):
    t, centers, ds = blobs
    cents = kmeans_fit(ds, "embedding", 5, seed=11)
    # every fitted centroid sits within noise range of one planted center,
    # and the mapping is a bijection
    d2 = ((cents[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
    nearest = d2.argmin(axis=1)
    assert sorted(nearest) == list(range(5))
    assert float(np.sqrt(d2.min(axis=1)).max()) < 0.5

    # cluster purity vs the planted labels = 1.0 on well-separated blobs
    out = kmeans_assign(ds, "embedding", cents).to_pandas()
    purity = (out.groupby("cluster")["label"]
                 .agg(lambda s: s.value_counts().iloc[0] / len(s)))
    assert (purity == 1.0).all()


def test_kmeans_deterministic_across_parallelism(blobs):
    import ray.data as rd
    t, _, _ = blobs
    a = kmeans_fit(rd.from_arrow(t).repartition(2), "embedding", 5,
                   seed=11, batch_size=512)
    b = kmeans_fit(rd.from_arrow(t).repartition(9), "embedding", 5,
                   seed=11, batch_size=128)
    # partial sums are fp-order-sensitive across batching, so allow float
    # tolerance; the centroid SETS must match bijectively
    d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(axis=2)
    assert sorted(d2.argmin(axis=1)) == list(range(5))
    assert float(d2.min(axis=1).max()) < 1e-10


def test_kmeans_assign_matches_bruteforce(blobs):
    t, _, ds = blobs
    cents = kmeans_fit(ds, "embedding", 5, seed=11)
    got = (kmeans_assign(ds, "embedding", cents).to_pandas()
           .sort_values("vec_id")["cluster"].to_numpy())
    x = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    want = _assign(x, cents)
    assert np.array_equal(got, want)


def test_kmeans_needs_k_rows(ray_session):
    import ray.data as rd
    t = pa.table({"embedding": pa.array([[1.0, 2.0]],
                                        pa.list_(pa.float32()))})
    with pytest.raises(ValueError, match="need >= k"):
        kmeans_fit(rd.from_arrow(t), "embedding", 3)


@pytest.mark.usefixtures("ray_session")
def test_pca_matches_numpy_oracle():
    import ray.data as rd

    from webval.clustering import pca_fit, pca_transform

    rng = np.random.default_rng(59)
    n, d, k = 4000, 12, 4
    # anisotropic data: known dominant directions
    scales = np.array([30, 20, 10, 5, 1, 1, 1, 1, 1, 1, 1, 1], float)
    x = rng.normal(0, 1, (n, d)) * scales + rng.normal(5, 0.1, d)
    t = pa.table({"vec_id": pa.array(np.arange(n), pa.int64()),
                  "embedding": pa.array([r.tolist() for r in
                                         x.astype(np.float32)],
                                        pa.list_(pa.float32()))})
    ds = rd.from_arrow(t).repartition(7)
    model = pca_fit(ds, "embedding", k, batch_size=256)

    xf = x.astype(np.float32).astype(np.float64)  # engine sees float32 data
    cov = np.cov(xf, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    want_ev = evals[order]
    assert np.allclose(model["explained_variance"], want_ev, rtol=1e-6)
    # components match up to sign; engine fixes signs deterministically
    for i, ci in enumerate(order):
        v = evecs[:, ci]
        got = model["components"][i]
        assert min(np.abs(got - v).max(), np.abs(got + v).max()) < 1e-6, i
    # orthonormal rows
    g = model["components"] @ model["components"].T
    assert np.allclose(g, np.eye(k), atol=1e-10)
    assert model["n"] == n
    assert 0.99 > model["explained_variance_ratio"][0] > 0.4

    out = pca_transform(ds, "embedding", model).to_pandas() \
        .sort_values("vec_id")
    y = np.stack(out["pc"].to_numpy())
    want_y = (xf - xf.mean(axis=0)) @ (model["components"].T)
    assert np.allclose(y, want_y, atol=1e-3)
    # projection variance per component ≈ explained variance
    assert np.allclose(y.var(axis=0, ddof=1),
                       model["explained_variance"], rtol=1e-3)


@pytest.mark.usefixtures("ray_session")
def test_pca_rejects_bad_args():
    import ray.data as rd

    from webval.clustering import pca_fit

    t = pa.table({"embedding": pa.array([[1.0, 2.0]],
                                        pa.list_(pa.float32()))})
    with pytest.raises(ValueError, match=">= 2 rows"):
        pca_fit(rd.from_arrow(t), "embedding", 1)
    t2 = pa.table({"embedding": pa.array([[1.0, 2.0], [3.0, 4.0]],
                                         pa.list_(pa.float32()))})
    with pytest.raises(ValueError, match="n_components"):
        pca_fit(rd.from_arrow(t2), "embedding", 5)


def test_standardize_edges(ray_session):
    import ray.data as rd

    from webval.clustering import standardize_fit, standardize_transform

    t = pa.table({"a": [1.0, 2.0, 3.0, None], "b": [5.0, 5.0, 5.0, 5.0]})
    model = standardize_fit(rd.from_arrow(t), ["a", "b"])
    assert model["a"]["mean"] == 2.0
    assert model["b"]["std"] == 0.0
    out = standardize_transform(rd.from_arrow(t), model).to_pandas()
    assert abs(out["a_z"][1] - 0.0) < 1e-12          # (2-2)/std
    assert np.isnan(out["a_z"][3])                   # null in -> null out
    assert out["b_z"].isna().all()                   # zero std -> nulls


def test_kmeans_init_centroids_deterministic(ray_session):
    import ray.data as rd

    from webval.clustering import kmeans_assign, kmeans_fit

    rng = np.random.default_rng(11)
    blobs = np.concatenate([rng.normal(loc=c, scale=0.05, size=(30, 4))
                            for c in (0.0, 5.0, 10.0)]).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(90), pa.int64()),
                  "embedding": pa.array(list(map(list, blobs)),
                                        pa.list_(pa.float32()))})
    init = blobs[[0, 30, 60]].astype(np.float64)
    a = kmeans_fit(rd.from_arrow(t), "embedding", 3, n_iter=3, tol=0.0,
                   init_centroids=init)
    b = kmeans_fit(rd.from_arrow(t).repartition(5), "embedding", 3,
                   n_iter=3, tol=0.0, init_centroids=init)
    assert np.allclose(a, b, atol=1e-12)   # parallelism-invariant
    got = kmeans_assign(rd.from_arrow(t), "embedding", a).to_pandas()
    got = got.sort_values("vec_id")["cluster"].to_numpy()
    assert (got == np.repeat([0, 1, 2], 30)).all()  # blobs recovered

    import pytest
    with pytest.raises(ValueError, match="init_centroids"):
        kmeans_fit(rd.from_arrow(t), "embedding", 4, init_centroids=init)
