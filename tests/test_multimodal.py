"""Multimodal stages: binary payload plumbing with stubbed codecs.

The decode itself is a deterministic fake (no image/audio libs in this
container — see stages/multimodal.py); what these tests pin down is the
REAL part: schemas, actor signatures, flat-map frame explode, feature
layout, and determinism across workers/runs.
"""

import numpy as np
import pyarrow as pa
import pytest

from fashion_knowledge_graph_ray.sources.media import (
    media_batch_from_documents,
)
from fashion_knowledge_graph_ray.stages.multimodal import (
    MEDIA_SCHEMA,
    AudioFeaturizer,
    ImageFeaturizer,
    decode_audio,
    decode_image,
    sample_frames_batch,
)


def _docs_batch(n=9):
    return pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array([f"document body {i} " * (i + 1) for i in range(n)]),
    })


def _media(n=9):
    return media_batch_from_documents(_docs_batch(n))


def test_media_schema_and_kind_rotation():
    m = _media(9)
    assert m.schema.equals(MEDIA_SCHEMA)
    kinds = m["kind"].to_pylist()
    assert kinds[:3] == ["image", "audio", "video"]
    assert all(len(p) > 0 for p in m["payload"].to_pylist())


def test_decode_image_deterministic_and_shaped():
    m = _media(3)
    p = m["payload"][0].as_py()
    meta = m["meta"][0].as_py()
    a = decode_image(p, meta)
    b = decode_image(p, meta)
    assert a.shape == (meta["height"], meta["width"], meta["channels"])
    assert a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
    # content-dependent: a different payload decodes differently
    c = decode_image(m["payload"][2].as_py(), meta)
    assert not np.array_equal(a, c)


def test_decode_audio_pcm():
    m = _media(3)
    meta = m["meta"][1].as_py()
    pcm = decode_audio(m["payload"][1].as_py(), meta)
    assert pcm.dtype == np.int16
    assert len(pcm) == meta["sample_rate"] * meta["n_frames"]


def test_image_featurizer_batch():
    m = _media(9)
    imgs = m.filter(pa.compute.equal(m["kind"], "image"))
    out = ImageFeaturizer(resize_to=8)(imgs)
    assert out.column_names == ["media_id", "features"]
    feats = out["features"].to_pylist()
    assert all(len(f) == 6 + ImageFeaturizer.N_BINS for f in feats)
    # histogram bins sum to ~1
    assert abs(sum(feats[0][6:]) - 1.0) < 1e-5
    # deterministic
    out2 = ImageFeaturizer(resize_to=8)(imgs)
    assert out.equals(out2)


def test_audio_featurizer_batch():
    m = _media(9)
    aud = m.filter(pa.compute.equal(m["kind"], "audio"))
    out = AudioFeaturizer(window=256)(aud)
    assert all(len(f) == 4 for f in out["features"].to_pylist())
    assert out.num_rows == aud.num_rows


def test_frame_sampling_explode():
    m = _media(9)
    frames = sample_frames_batch(m, every_k=10)
    # 3 videos (doc 2, 5, 8), n_frames=24 -> frames 0, 10, 20 each
    assert frames.num_rows == 9
    assert sorted(set(frames["frame_idx"].to_pylist())) == [0, 10, 20]
    assert set(frames["media_id"].to_pylist()) == {"doc-2", "doc-5", "doc-8"}
    # payload sliced, not decoded: every frame payload is a proper slice
    vids = {r["media_id"]: r for r in m.to_pylist() if r["kind"] == "video"}
    for r in frames.to_pylist():
        full = vids[r["media_id"]]["payload"]
        fsize = len(full) // 24
        assert r["payload"] == full[r["frame_idx"] * fsize:
                                    (r["frame_idx"] + 1) * fsize]
        assert r["meta"]["format"] == "frame"


def test_distributed_media_pipeline(ray_session, tmp_path):
    """End-to-end through Ray: documents parquet -> media -> features."""
    import pyarrow.parquet as pq

    from fashion_knowledge_graph_ray.sources.media import media_from_documents
    from fashion_knowledge_graph_ray.stages.multimodal import (
        audio_features,
        image_features,
        sample_video_frames,
    )

    docs = pa.table({
        "doc_id": pa.array(range(30), type=pa.int64()),
        "text": pa.array([f"body {i} " * 20 for i in range(30)]),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    media = media_from_documents(str(tmp_path))
    imgs = image_features(media, batch_size=4, concurrency=2).take_all()
    auds = audio_features(media, batch_size=4).take_all()
    frames = sample_video_frames(media, every_k=10)
    assert len(imgs) == 10 and len(auds) == 10
    assert frames.count() == 30  # 10 videos x 3 sampled frames
    # distributed result identical to the driver-side batch call
    local = ImageFeaturizer(resize_to=32)(
        media_batch_from_documents(docs).filter(
            pa.compute.equal(media_batch_from_documents(docs)["kind"],
                             "image")))
    got = {r["media_id"]: r["features"] for r in imgs}
    for r in local.to_pylist():
        np.testing.assert_allclose(got[r["media_id"]], r["features"],
                                   rtol=1e-6)
