"""Multimodal plumbing: binary columns + typed meta, actor-pool feature
extraction (deterministic fake decoder), frame sampling layout."""

import numpy as np
import pyarrow as pa
import pytest

from webval.multimodal import (
    MEDIA_META_TYPE,
    FrameSampler,
    MediaFeatureExtractor,
    attach_media_meta,
)


def _media_table(n=50):
    rng = np.random.default_rng(3)
    payloads = [rng.bytes(100 + 37 * i) for i in range(n)]
    payloads[7] = None
    return pa.table({"media_id": pa.array(range(n), pa.int64()),
                     "image": pa.array(payloads, pa.large_binary())})


@pytest.mark.usefixtures("ray_session")
def test_media_meta():
    import ray.data as rd

    ds = attach_media_meta(rd.from_arrow(_media_table()), "image", "image", "jpeg")
    rows = {r["media_id"]: r for r in ds.take_all()}
    assert rows[0]["image_meta"]["n_bytes"] == 100
    assert rows[0]["image_meta"]["media_type"] == "image"
    assert rows[7]["image_meta"] is None


@pytest.mark.usefixtures("ray_session")
def test_feature_extractor_deterministic_across_parallelism():
    import ray.data as rd

    t = _media_table()
    feats = []
    for nblocks, conc in ((1, 1), (6, 2)):
        ds = rd.from_arrow(t).repartition(nblocks).map_batches(
            MediaFeatureExtractor, batch_format="pyarrow", batch_size=8,
            concurrency=conc, num_cpus=0.5,
            fn_constructor_kwargs={"media_col": "image"})
        feats.append({r["media_id"]: r["features"] for r in ds.take_all()})
    assert feats[0].keys() == feats[1].keys()
    for k in feats[0]:
        a, b = feats[0][k], feats[1][k]
        assert (a is None and b is None) or np.allclose(a, b)
    assert feats[0][7] is None
    assert len(feats[0][0]) == 16


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        MediaFeatureExtractor(media_col="image", decoder="real")
    with pytest.raises(NotImplementedError):
        FrameSampler(media_col="video", id_col="media_id", decoder="real")


@pytest.mark.usefixtures("ray_session")
def test_frame_sampler_layout():
    import ray.data as rd

    ds = rd.from_arrow(_media_table(10)).map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=4,
        concurrency=1, num_cpus=0.5,
        fn_constructor_kwargs={"media_col": "image", "id_col": "media_id",
                               "n_frames": 3})
    rows = ds.take_all()
    # 9 non-null payloads × 3 frames
    assert len(rows) == 27
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 1, 2] for v in by_id.values())
    assert 7 not in by_id
