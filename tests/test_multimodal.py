"""Multimodal plumbing tests: schema, actor lifecycle, deterministic stub."""

import numpy as np
import pyarrow as pa
import pytest

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.stages.multimodal import (
    FEATURE_DIM,
    DecodeMedia,
    FrameSampler,
    _fake_decode,
)


def _media_batch(n=4):
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "payload": pa.array([bytes([i]) * (1000 * (i + 1)) for i in range(n)],
                            pa.binary()),
        "media_type": pa.array(["image"] * n, pa.string()),
        "meta": pa.array(["{}"] * n, pa.string()),
    })


def test_decode_schema_and_determinism():
    out1 = DecodeMedia()(_media_batch())
    out2 = DecodeMedia()(_media_batch())
    assert out1.equals(out2)
    assert out1["n_bytes"].to_pylist() == [1000, 2000, 3000, 4000]
    feats = out1["feature"].to_pylist()
    assert all(len(f) == FEATURE_DIM for f in feats)
    assert feats[0] != feats[1]


def test_decode_stub_flag():
    d = DecodeMedia()
    if d.codec == "fake":
        with pytest.raises(NotImplementedError):
            DecodeMedia(require_real=True)


def test_fake_decode_ranges():
    v = _fake_decode(b"payload", 32)
    assert v.shape == (32,) and (v >= 0).all() and (v <= 1).all()
    wide = _fake_decode(b"payload", 100)  # spans several md5 chunks
    assert wide.shape == (100,)


def test_frame_sampler_flatmap_shape():
    out = FrameSampler(every_n_bytes=1024, max_frames=3)(_media_batch())
    per_media = {}
    for mid, frame in zip(out["media_id"].to_pylist(), out["frame"].to_pylist()):
        per_media.setdefault(mid, []).append(frame)
    # payload sizes 1000..4000 bytes -> 1,1,2,3 frames capped at 3
    assert [len(per_media[i]) for i in range(4)] == [1, 1, 2, 3]
    assert per_media[3] == [0, 1, 2]


def test_decode_in_ray_pipeline(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(_media_batch(16))
    out = ds.map_batches(DecodeMedia, batch_format="pyarrow", batch_size=4,
                         concurrency=2).to_pandas()
    assert len(out) == 16
    assert set(out.columns) >= {"media_id", "n_bytes", "feature"}


import pytest


@pytest.fixture()
def media_ds(ray_session):
    import ray.data as rd
    return rd.from_arrow(_media_batch(16))


def test_resize_media_stage(ray_session, media_ds):
    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.stages.multimodal import (
        DecodeMedia,
        ResizeMedia,
    )
    resized = media_ds.map_batches(
        ResizeMedia, fn_constructor_kwargs={"target_px": 64},
        batch_format="pyarrow", batch_size=16, concurrency=(1, 2))
    out = resized.materialize()
    rows = out.take_all()
    import json
    for r in rows:
        assert isinstance(r["payload"], bytes) and len(r["payload"]) >= 16
        meta = json.loads(r["meta"])
        assert meta["resized"]["target_px"] == 64
    # resized payloads still decode downstream (binary->binary->features)
    feats = out.map_batches(DecodeMedia, batch_format="pyarrow",
                            batch_size=16, concurrency=(1, 2)).take_all()
    assert len(feats) == len(rows)
    assert all(len(f["feature"]) == 32 for f in feats)


def test_resize_media_deterministic(ray_session, media_ds):
    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.stages.multimodal import (
        ResizeMedia,
    )
    def run():
        return {r["media_id"]: r["payload"] for r in media_ds.map_batches(
            ResizeMedia, batch_format="pyarrow", batch_size=16,
            concurrency=(1, 2)).take_all()}
    assert run() == run()
