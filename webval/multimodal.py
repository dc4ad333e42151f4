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
