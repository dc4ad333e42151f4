"""Distributed k-means over an embedding column (Lloyd's iterations as
streaming Dataset passes — the scale path for IVF index training and
embedding-space curation).

Shape per iteration (no shuffle anywhere):
- centroids are broadcast ONCE via ``ray.put`` (read from the local object
  store by every task, never re-shipped per batch);
- one ``map_batches`` pass emits per-batch PARTIALS: per-cluster vector sums
  (k x d float64) + counts (k int64) — a few KB per batch regardless of
  batch size;
- the driver folds the tiny partial rows and recomputes centroids.

Assignment uses the algebraic identity argmin ||x - c||^2 =
argmin (||c||^2 - 2 x.c), i.e. one (B x d) @ (d x k) matmul per batch.

Empty clusters keep their previous centroid (deterministic; documented).
Everything is a pure function of (data, seed) — byte-stable across
parallelism levels, which the tests assert.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _matrix_of(col: pa.ChunkedArray) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> column, zero-copy from the
    flattened values buffer where possible."""
    arr = col.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):  # zero chunks edge
        arr = arr.chunk(0) if arr.num_chunks else pa.array([], arr.type)
    if pa.types.is_fixed_size_list(arr.type):
        d = arr.type.list_size
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return flat.astype(np.float64, copy=False).reshape(-1, d)
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    if len(widths) and (widths != widths[0]).any():
        raise ValueError("kmeans: ragged embedding column (unequal lengths)")
    # flatten() (not .values) so sliced arrays stay offset-correct
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    d = int(widths[0]) if len(widths) else 0
    return flat.astype(np.float64, copy=False).reshape(-1, d)


def _plusplus_init(x: np.ndarray, k: int, seed: int) -> np.ndarray:
    """k-means++ seeding on a driver-side sample (deterministic)."""
    rng = np.random.default_rng(seed)
    n = len(x)
    cents = np.empty((k, x.shape[1]), dtype=np.float64)
    cents[0] = x[rng.integers(n)]
    d2 = ((x - cents[0]) ** 2).sum(axis=1)
    for i in range(1, k):
        p = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        cents[i] = x[rng.choice(n, p=p)]
        d2 = np.minimum(d2, ((x - cents[i]) ** 2).sum(axis=1))
    return cents


def _assign(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    scores = x @ cents.T - 0.5 * (cents * cents).sum(axis=1)
    return np.argmax(scores, axis=1)


def kmeans_fit(ds, col: str, k: int, *, n_iter: int = 20, seed: int = 0,
               init_sample: int = 4096, tol: float = 1e-6,
               init_centroids: np.ndarray | None = None,
               batch_size: int | None = 4096) -> np.ndarray:
    """Fit k centroids to the list<float> column ``col``; returns a (k, d)
    float64 array.  ``init_sample`` rows are pulled to the driver only for
    k-means++ seeding (KB–MB); every full pass stays distributed.
    ``init_centroids`` (k, d) skips the ++ seeding — deterministic inits
    make the whole fit engine-reproducible (the SQL-twin path)."""
    import ray

    if init_centroids is not None:
        cents = np.ascontiguousarray(init_centroids, dtype=np.float64)
        if cents.shape[0] != k:
            raise ValueError(f"kmeans: init_centroids has {cents.shape[0]} "
                             f"rows, k={k}")
    else:
        sample = _matrix_of(
            pa.concat_tables(
                ds.select_columns([col]).limit(init_sample)
                  .iter_batches(batch_format="pyarrow", batch_size=None),
                promote_options="permissive").column(col))
        if len(sample) < k:
            raise ValueError(f"kmeans: need >= k={k} rows to initialize, "
                             f"got {len(sample)}")
        cents = _plusplus_init(sample, k, seed)
    proj = ds.select_columns([col])

    for _ in range(n_iter):
        ref = ray.put(cents)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            x = _matrix_of(batch.column(col))
            if x.size and x.shape[1] != c.shape[1]:
                raise ValueError(
                    f"kmeans: data dim {x.shape[1]} != centroid dim "
                    f"{c.shape[1]} (check init_centroids)")
            a = _assign(x, c)
            sums = np.zeros((k, x.shape[1]), dtype=np.float64)
            np.add.at(sums, a, x)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table({
                "sums": pa.array([sums.ravel()], pa.list_(pa.float64())),
                "counts": pa.array([counts], pa.list_(pa.int64()))})

        parts = pa.concat_tables(
            proj.map_batches(partial, batch_format="pyarrow",
                             batch_size=batch_size)
                .iter_batches(batch_format="pyarrow", batch_size=None),
            promote_options="permissive")
        # flatten→numpy, NOT to_pylist (value-identical, no Python floats)
        sc = parts.column("sums").combine_chunks()
        sums = pc.list_flatten(sc).to_numpy(zero_copy_only=False) \
            .astype(np.float64, copy=False).reshape(len(sc), -1) \
            .sum(axis=0).reshape(k, -1)
        cc = parts.column("counts").combine_chunks()
        counts = pc.list_flatten(cc).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False).reshape(len(cc), -1).sum(axis=0)
        new = cents.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        shift = float(np.abs(new - cents).max())
        cents = new
        if shift < tol:
            break
    return cents


def kmeans_assign(ds, col: str, centroids: np.ndarray, *,
                  out_col: str = "cluster",
                  batch_size: int | None = 4096):
    """Append an int32 ``out_col`` with each row's nearest-centroid id.
    Centroids broadcast once via ``ray.put``."""
    import ray

    ref = ray.put(np.ascontiguousarray(centroids, dtype=np.float64))

    def add_cluster(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        a = _assign(_matrix_of(batch.column(col)), c)
        return batch.append_column(out_col, pa.array(a.astype(np.int32)))

    return ds.map_batches(add_cluster, batch_format="pyarrow",
                          batch_size=batch_size)


# ---------------------------------------------------------------------------
# Distributed PCA: exact covariance via mergeable (n, Σx, XᵀX) partials
# ---------------------------------------------------------------------------


def pca_fit(ds, col: str, n_components: int, *, batch_size: int | None = 4096):
    """Exact PCA over an embedding column in ONE streaming pass: each batch
    emits (n, Σx, XᵀX) — a d-vector and a d×d float64 matrix, mergeable by
    plain addition — and the driver eigendecomposes the d×d covariance
    (d is the embedding dim, tiny next to n; the data itself is never
    centered, gathered, or shuffled).

    Returns {"mean", "components" (k×d, rows = descending-variance
    directions), "explained_variance", "explained_variance_ratio", "n"}.
    Component signs are fixed (largest-|coefficient| entry positive) so
    results are deterministic across runs and parallelism.
    """

    def partial(t: pa.Table) -> pa.Table:
        x = _matrix_of(t.column(col)).astype(np.float64)
        d = x.shape[1] if x.size else 0
        xtx = x.T @ x if d else np.zeros((0, 0))
        return pa.table({
            "n": pa.array([x.shape[0]], pa.int64()),
            "d": pa.array([d], pa.int64()),
            "s": pa.array([x.sum(axis=0).tolist()],
                          pa.list_(pa.float64())),
            "xtx": pa.array([xtx.ravel().tolist()],
                            pa.list_(pa.float64())),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=batch_size).materialize()
    n, d, s, xtx = 0, 0, None, None
    for b in parts.iter_batches(batch_format="pyarrow"):
        for row in b.to_pylist():
            if row["d"] == 0:
                continue
            if s is None:
                d = row["d"]
                s = np.zeros(d)
                xtx = np.zeros((d, d))
            elif row["d"] != d:
                raise ValueError(f"pca_fit: mixed dims {d} vs {row['d']}")
            n += row["n"]
            s += np.asarray(row["s"])
            xtx += np.asarray(row["xtx"]).reshape(d, d)
    if n < 2:
        raise ValueError(f"pca_fit: need >= 2 rows, got {n}")
    if not 1 <= n_components <= d:
        raise ValueError(f"pca_fit: n_components={n_components} not in "
                         f"[1, {d}]")
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)      # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T
    flip = np.sign(comps[np.arange(len(order)),
                         np.argmax(np.abs(comps), axis=1)])
    comps = comps * flip[:, None]
    ev = np.maximum(evals[order], 0.0)
    total = float(np.maximum(evals, 0.0).sum()) or 1.0
    return {"mean": mean, "components": comps, "cov": cov,
            "explained_variance": ev,
            "explained_variance_ratio": ev / total, "n": int(n)}


def pca_transform(ds, col: str, model: dict, *, out_col: str = "pc",
                  keep_cols: list[str] | None = None):
    """Project the embedding column onto fitted components (stateless map;
    the k×d model rides the closure — broadcast-once at task submission).
    Output keeps ``keep_cols`` (default: all non-embedding columns) and
    appends ``out_col`` as fixed_size_list<float>[k]."""
    comps = np.asarray(model["components"], dtype=np.float64)
    mean = np.asarray(model["mean"], dtype=np.float64)
    k = comps.shape[0]

    def project(t: pa.Table) -> pa.Table:
        x = _matrix_of(t.column(col)).astype(np.float64)
        y = (x - mean) @ comps.T if x.size else np.zeros((0, k))
        keep = keep_cols if keep_cols is not None else [
            c for c in t.column_names if c != col]
        cols = {c: t.column(c) for c in keep}
        cols[out_col] = pa.FixedSizeListArray.from_arrays(
            pa.array(y.ravel().astype(np.float32)), k)
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def standardize_fit(ds, cols: list[str], *,
                    batch_size: int | None = 8192) -> dict:
    """Fit per-column (mean, population std) for z-score standardization —
    the classic ML-preprocessing stage ahead of kmeans/pca.  One streaming
    pass of mergeable Moments partials (map_batches → driver merge of
    KB-sized accumulators); returns a JSON-able {col: {mean, std}} model."""
    import ray

    from webval.sketches import Moments

    def partial(batch: pa.Table) -> pa.Table:
        import json
        out = {}
        for c in cols:
            m = Moments()
            v = batch.column(c).to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            m.add(v, n_total=batch.num_rows)
            out[c] = json.dumps(m.to_dict())
        return pa.table({c: pa.array([out[c]]) for c in cols})

    import json
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=batch_size).materialize()
    merged = {c: None for c in cols}
    from webval.sketches import Moments as _M
    for ref in parts.to_arrow_refs():
        b = ray.get(ref)
        if b.num_rows == 0:
            continue  # empty blocks skip the map UDF and keep the INPUT schema
        for c in cols:
            for s in b.column(c).to_pylist():
                m = _M.from_dict(json.loads(s))
                merged[c] = m if merged[c] is None else merged[c].merge(m)
    return {c: {"mean": merged[c].mean if merged[c] else None,
                "std": merged[c].std if merged[c] else None}
            for c in cols}


def standardize_transform(ds, model: dict, *, suffix: str = "_z",
                          batch_size: int | None = 8192):
    """Append ``<col><suffix>`` = (x − mean)/std per fitted column (model
    broadcast in the task closure — it is bytes-sized).  Columns with
    std == 0 or an unfitted model yield nulls; null inputs stay null."""
    items = [(c, m["mean"], m["std"]) for c, m in model.items()]

    def fn(batch: pa.Table) -> pa.Table:
        out = batch
        for c, mean, std in items:
            col = batch.column(c)
            if mean is None or std is None or std == 0.0:
                z = pa.nulls(batch.num_rows, pa.float64())
            else:
                z = pc.divide(pc.subtract(pc.cast(col, pa.float64()), mean),
                              std)
            out = out.append_column(f"{c}{suffix}", z)
        return out

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def minmax_scale(ds, key: str, value_col: str, *, out_col: str = "scaled",
                 num_buckets: int | None = None):
    """Per-group min-max feature scaling: append
    ``(x − min_g) / (max_g − min_g)`` over each row's own ``key`` group —
    the bounded-range normalizer (standardize_* is the z-score sibling).
    A constant group (max == min) scales to null, matching SQL
    ``/ NULLIF(max − min, 0)``; null values stay null.

    Scale shape: per-key min/max via one count-combiner exchange (≤1 row
    per key per batch), the key-sized extrema table broadcast ONCE via
    ray.put, then a stateless map — the iqr_outliers/fence idiom.  The
    subtraction runs in the column's own type (int64 stays exact) and only
    the final division is float64, so results are bit-identical to the
    SQL twin without rounding.
    """
    import ray

    from webval.exchange import grouped_agg

    extrema_ds = grouped_agg(
        ds.map_batches(lambda t: t.select([key, value_col]).filter(
            pc.is_valid(t.column(value_col).combine_chunks())),
            batch_format="pyarrow"),
        [key], [(value_col, "min"), (value_col, "max")],
        rename={f"{value_col}_min": "mn", f"{value_col}_max": "mx"},
        num_buckets=num_buckets)
    blocks = [ray.get(r) for r in extrema_ds.materialize().to_arrow_refs()]
    blocks = [b for b in blocks if b.num_rows]
    if not blocks:
        def add_null(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                out_col, pa.nulls(batch.num_rows, pa.float64()))
        return ds.map_batches(add_null, batch_format="pyarrow")
    ext_ref = ray.put(pa.concat_tables(blocks).combine_chunks())

    def scale(batch: pa.Table) -> pa.Table:
        e = ray.get(ext_ref)
        pos = pc.index_in(batch.column(key).combine_chunks(),
                          value_set=e.column(key))
        mn = pc.take(e.column("mn"), pos)
        mx = pc.take(e.column("mx"), pos)
        x = batch.column(value_col).combine_chunks()
        num = pc.cast(pc.subtract(x, mn), pa.float64())
        den = pc.cast(pc.subtract(mx, mn), pa.float64())
        den = pc.if_else(pc.equal(den, 0.0),
                         pa.scalar(None, pa.float64()), den)
        return batch.append_column(out_col, pc.divide(num, den))

    return ds.map_batches(scale, batch_format="pyarrow")


def mahalanobis_outliers(ds, cols: list[str], *, top_k: int = 20,
                         id_col: str | None = None, ridge: float = 0.0,
                         batch_size: int | None = 8192):
    """Multivariate outlier detection: the ``top_k`` rows with the
    largest squared Mahalanobis distance d² = (x−μ)ᵀ Σ⁻¹ (x−μ) to the
    column-vector mean under the SAMPLE covariance — the cross-column
    anomaly test that catches rows each of whose coordinates looks
    normal in isolation (a 1-quantity/80k-price line item) where
    per-column z-scores see nothing.  Rows with any null coordinate are
    excluded from both the fit and the scoring.  ``ridge`` adds λI
    before inversion for near-singular covariances.  Rank key is
    round(d², 6) descending with ``id_col``-ascending ties
    (deterministic across engines); returns Dataset[{*cols, id_col?,
    d2}].

    Scale shape: pass 1 streams mergeable (n, Σx, XᵀX) partials (d
    small — a d-vector + d×d matrix per batch) and the driver inverts
    the d×d covariance once; pass 2 re-streams the input scoring each
    batch with one matmul against the broadcast (μ, Σ⁻¹); the final
    rank is a sort + limit, never a driver gather."""
    d = len(cols)
    if d < 1:
        raise ValueError("mahalanobis_outliers: need >= 1 column")

    def stack(t: pa.Table):
        arrs = [pc.cast(t.column(c).combine_chunks(), pa.float64())
                for c in cols]
        valid = arrs[0].is_valid()
        for a in arrs[1:]:
            valid = pc.and_(valid, a.is_valid())
        t = t.filter(valid)
        x = np.column_stack([
            pc.cast(t.column(c).combine_chunks(), pa.float64())
            .to_numpy(zero_copy_only=False) for c in cols]) \
            if t.num_rows else np.zeros((0, d))
        return t, x

    def partial(t: pa.Table) -> pa.Table:
        _, x = stack(t)
        return pa.table({
            "n": pa.array([x.shape[0]], pa.int64()),
            "s": pa.array([x.sum(axis=0).tolist()], pa.list_(pa.float64())),
            "xtx": pa.array([(x.T @ x).ravel().tolist()],
                            pa.list_(pa.float64()))})

    import ray

    parts = ds.select_columns(cols) \
        .map_batches(partial, batch_format="pyarrow",
                     batch_size=batch_size).materialize()
    n, s, xtx = 0, np.zeros(d), np.zeros((d, d))
    for ref in parts.to_arrow_refs():
        b = ray.get(ref)
        if b.num_rows == 0:
            continue
        for row in b.to_pylist():
            n += row["n"]
            s += np.asarray(row["s"])
            xtx += np.asarray(row["xtx"]).reshape(d, d)
    if n < d + 1:
        raise ValueError(f"mahalanobis_outliers: need >= {d + 1} complete "
                         f"rows to fit a {d}-dim covariance, got {n}")
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    sinv = np.linalg.inv(cov + ridge * np.eye(d))

    keep = list(cols) + ([id_col] if id_col and id_col not in cols else [])

    def score(t: pa.Table) -> pa.Table:
        t, x = stack(t)
        c = x - mean
        d2 = np.einsum("ij,ij->i", c @ sinv, c)
        out = {k: t.column(k) for k in keep}
        out["d2"] = pa.array(d2)
        out["rd2"] = pa.array(d2.round(6))
        return pa.table(out)

    ranked = ds.select_columns(keep) \
        .map_batches(score, batch_format="pyarrow") \
        .sort(["rd2"] + ([id_col] if id_col else []),
              descending=[True] + ([False] if id_col else [])) \
        .limit(top_k)
    return ranked.map_batches(lambda t: t.drop_columns(["rd2"]),
                              batch_format="pyarrow")


def fit_linear(ds, x_cols: list[str], y_col: str, *, ridge: float = 0.0,
               batch_size: int | None = 8192) -> dict:
    """Distributed ordinary least squares: fit y = b·x + b0 over any
    number of feature columns in ONE streaming pass of mergeable
    normal-equation partials (n, Σz, ZᵀZ for z = [x…, y]) — the
    multi-feature companion of the per-group simple regressions
    (aggregates.grouped_corr / simpson_slopes).  The driver solves the
    (d+1)-dim system from CENTERED sample covariances (numerically the
    same quantities SQL's covar_samp/var_samp expose, so twins can
    reproduce coefficients via Cramer's rule).  ``ridge`` adds λI to
    the covariance before solving.  Rows with any null are excluded.

    Returns {"coef": {x: b}, "intercept", "n", "r2"} — r2 is the
    in-sample coefficient of determination b·Cov(x,y) / Var(y).

    Scale shape: per batch one matmul emits a (d+1)² partial; the
    driver merges block partials by addition and solves a d×d system —
    nothing row-sized ever leaves the workers."""
    import ray

    d = len(x_cols)
    if d < 1:
        raise ValueError("fit_linear: need >= 1 feature column")
    cols = list(x_cols) + [y_col]

    def partial(t: pa.Table) -> pa.Table:
        arrs = [pc.cast(t.column(c).combine_chunks(), pa.float64())
                for c in cols]
        valid = arrs[0].is_valid()
        for a in arrs[1:]:
            valid = pc.and_(valid, a.is_valid())
        t = t.filter(valid)
        z = np.column_stack([
            pc.cast(t.column(c).combine_chunks(), pa.float64())
            .to_numpy(zero_copy_only=False) for c in cols]) \
            if t.num_rows else np.zeros((0, d + 1))
        return pa.table({
            "n": pa.array([z.shape[0]], pa.int64()),
            "s": pa.array([z.sum(axis=0).tolist()], pa.list_(pa.float64())),
            "ztz": pa.array([(z.T @ z).ravel().tolist()],
                            pa.list_(pa.float64()))})

    parts = ds.select_columns(cols) \
        .map_batches(partial, batch_format="pyarrow",
                     batch_size=batch_size).materialize()
    n, s, ztz = 0, np.zeros(d + 1), np.zeros((d + 1, d + 1))
    for ref in parts.to_arrow_refs():
        b = ray.get(ref)
        if b.num_rows == 0:
            continue
        for row in b.to_pylist():
            n += row["n"]
            s += np.asarray(row["s"])
            ztz += np.asarray(row["ztz"]).reshape(d + 1, d + 1)
    if n < d + 2:
        raise ValueError(f"fit_linear: need >= {d + 2} complete rows "
                         f"for {d} features, got {n}")
    mean = s / n
    cov = (ztz - n * np.outer(mean, mean)) / (n - 1)
    cxx = cov[:d, :d] + ridge * np.eye(d)
    cxy = cov[:d, d]
    coef = np.linalg.solve(cxx, cxy)
    intercept = float(mean[d] - coef @ mean[:d])
    vy = cov[d, d]
    r2 = float(coef @ cxy / vy) if vy > 0 else float("nan")
    return {"coef": {c: float(b) for c, b in zip(x_cols, coef)},
            "intercept": intercept, "n": int(n), "r2": r2}
