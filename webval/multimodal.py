"""Multimodal (image/audio/video) column plumbing.

Media are opaque binary columns with a typed metadata struct alongside —
the Ray-side plumbing (schema, actor-pool stage shape, batch sizing, output
layout) is real and tested; the actual codec work is STUBBED because no
image/audio library exists in this sandbox:

- ``decoder="fake"`` (default): a deterministic pure-function decoder so
  pipelines and tests run end-to-end (features = stable hash-derived floats).
- ``decoder="real"``: raises NotImplementedError at actor construction with
  the library it would use — swap in PIL/torchaudio/pyav in a real cluster.

Batch-size guidance for binary payloads: rows are 100×–10000× wider than
text rows; keep ``batch_size`` small (16–256) and let the object store hold
blocks, or actor heaps blow up (SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from webval.sketches import hash64

MEDIA_META_TYPE = pa.struct([
    ("media_type", pa.string()),   # "image" | "audio" | "video"
    ("format", pa.string()),       # e.g. "jpeg", "wav"
    ("width", pa.int32()),         # image/video; -1 if n/a
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),   # audio/video; -1 if n/a
    ("n_bytes", pa.int64()),
])


def attach_media_meta(ds, media_col: str, media_type: str, fmt: str = "unknown",
                      batch_size: int | None = 256):
    """Append a typed metadata struct derived from the binary payload (sizes
    are real; dimensions are parsed by a real decoder — stub fills -1)."""

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(media_col)
        metas = []
        for b in col.to_pylist():
            if b is None:
                metas.append(None)
            else:
                metas.append({"media_type": media_type, "format": fmt,
                              "width": -1, "height": -1, "duration_ms": -1,
                              "n_bytes": len(b)})
        return batch.append_column(f"{media_col}_meta",
                                   pa.array(metas, type=MEDIA_META_TYPE))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


class MediaFeatureExtractor:
    """Actor-pool stage: binary media → fixed-dim feature vector.

    Real decode/model-inference is the stateful part a pool amortizes (model
    load once per actor in __init__).  The fake decoder is a pure function
    of the bytes → deterministic across runs/parallelism, so the plumbing
    (including determinism tests) is fully exercised without codecs.

    Usage::

        ds.map_batches(MediaFeatureExtractor, batch_format="pyarrow",
                       batch_size=64, concurrency=(2, 8),
                       fn_constructor_kwargs={"media_col": "image"})
    """

    def __init__(self, media_col: str, out_col: str = "features", dim: int = 16,
                 decoder: str = "fake"):
        self.media_col = media_col
        self.out_col = out_col
        self.dim = dim
        if decoder == "real":
            raise NotImplementedError(
                "no image/audio codec libraries in this sandbox; install "
                "PIL/torchaudio/pyav on the cluster and implement decode here")
        if decoder != "fake":
            raise ValueError(f"unknown decoder: {decoder}")

    def _features(self, payload: bytes) -> np.ndarray:
        # deterministic fake: hash chunks of the payload into [0, 1) floats
        chunks = np.frombuffer(payload[: self.dim * 8].ljust(self.dim * 8, b"\0"),
                               dtype=np.uint64)
        h = hash64(chunks ^ np.uint64(len(payload)))
        return (h.astype(np.float64) / 2.0 ** 64).astype(np.float32)[: self.dim]

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for b in batch.column(self.media_col).to_pylist():
            feats.append(None if b is None else self._features(b).tolist())
        return batch.append_column(
            self.out_col, pa.array(feats, type=pa.list_(pa.float32(), self.dim)))


def write_linear_scorer_weights(path: str, dim: int = 16, seed: int = 5) -> str:
    """Persist deterministic model weights for LinearMediaScorer (stands in
    for a real model checkpoint — same load-from-file shape)."""
    rng = np.random.default_rng(seed)
    np.savez(path, w=rng.standard_normal(dim).astype(np.float32),
             b=np.float32(0.1))
    return path if path.endswith(".npz") else path + ".npz"


class LinearMediaScorer:
    """Model-backed extractor with REAL per-actor state (VERDICT r1
    next-10): weights load from a FILE once per actor in ``__init__`` —
    the rdv vision-extractor contract (model load amortized over the
    actor's lifetime) — and every batch is scored with one matmul.

    Each output batch carries ``actor_id`` (stable per actor) and
    ``call_idx`` (increments per batch) so tests can PROVE the
    load-once-per-actor behavior: #distinct actor_ids ≤ concurrency while
    max(call_idx) > 0 means actors were reused across batches without
    reloading.

    Usage::

        ds.map_batches(LinearMediaScorer, batch_format="pyarrow",
                       batch_size=256, concurrency=(2, 8),
                       fn_constructor_kwargs={"weights_path": p})
    """

    def __init__(self, weights_path: str, feat_col: str = "features",
                 out_col: str = "score"):
        import time
        import uuid

        t0 = time.perf_counter()
        wz = np.load(weights_path)
        self.w = np.asarray(wz["w"], dtype=np.float32)
        self.b = float(wz["b"])
        self.load_ms = (time.perf_counter() - t0) * 1000
        self.actor_id = uuid.uuid4().hex[:12]
        self.call_idx = 0
        self.feat_col = feat_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.feat_col).combine_chunks()
        flat = np.asarray(col.flatten(), dtype=np.float32)
        n = len(col)
        m = flat.reshape(n, -1) if n else flat.reshape(0, len(self.w))
        scores = m @ self.w + self.b
        out = batch.append_column(self.out_col,
                                  pa.array(scores, pa.float32()))
        out = out.append_column("actor_id",
                                pa.array([self.actor_id] * n, pa.string()))
        out = out.append_column("call_idx",
                                pa.array(np.full(n, self.call_idx,
                                                 dtype=np.int32), pa.int32()))
        self.call_idx += 1
        return out


class FrameSampler:
    """Actor-pool stage: video binary → n uniformly-spaced frame payloads
    (stub: deterministic byte slices standing in for decoded frames; the
    output layout — one row per (video, frame_idx) — is the real contract).
    Emits a flat table: id cols + frame_idx + frame_bytes.
    """

    def __init__(self, media_col: str, id_col: str, n_frames: int = 4,
                 decoder: str = "fake"):
        self.media_col = media_col
        self.id_col = id_col
        self.n_frames = n_frames
        if decoder == "real":
            raise NotImplementedError("pyav not available in sandbox")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for doc_id, b in zip(batch.column(self.id_col).to_pylist(),
                             batch.column(self.media_col).to_pylist()):
            if b is None or len(b) == 0:
                continue
            step = max(1, len(b) // self.n_frames)
            for f in range(self.n_frames):
                lo = min(f * step, len(b) - 1)
                ids.append(doc_id)
                idxs.append(f)
                frames.append(bytes(b[lo: lo + step]))
        return pa.table({self.id_col: pa.array(ids, batch.column(self.id_col).type),
                         "frame_idx": pa.array(idxs, pa.int32()),
                         "frame": pa.array(frames, pa.large_binary())})
