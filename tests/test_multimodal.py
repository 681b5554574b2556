from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pygeoapi_ingestor_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    raw = multimodal.attach_payload(docs, id_col="doc_id", text_col="text")
    return multimodal.extract_metadata(raw, use_stub=True)


def test_decode_fills_metadata(media):
    rows = media.collect()
    assert len(rows) == 500
    assert all(64 <= r["width"] < 256 and 64 <= r["height"] < 256 for r in rows)
    imgs = [r for r in rows if r["media_type"] == "image"]
    assert imgs and all(r["n_frames"] == 1 for r in imgs)
    vids = [r for r in rows if r["media_type"] == "video"]
    assert vids and all(r["n_frames"] >= 1 for r in vids)


def test_real_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.real_decode(b"x", "image")


def test_resize_preserves_aspect(media):
    out = multimodal.resize_media(media, target=128).collect()
    for r in out:
        assert max(r["resized_width"], r["resized_height"]) == 128
        ar_in = r["width"] / r["height"]
        ar_out = r["resized_width"] / r["resized_height"]
        assert abs(ar_in - ar_out) / ar_in < 0.05


def test_frame_sampling(media, spark):
    frames = multimodal.sample_frames(media, every_n=10)
    joined = frames.join(media.select("media_id", "media_type", "n_frames"), "media_id")
    per_video = (
        joined.filter(F.col("media_type") == "video")
        .groupBy("media_id", "n_frames")
        .agg(F.count(F.lit(1)).alias("n_sampled"), F.max("frame_idx").alias("max_idx"))
        .collect()
    )
    assert per_video
    for r in per_video:
        expected = (int(r["n_frames"]) + 9) // 10
        assert r["n_sampled"] == expected
        assert r["max_idx"] < r["n_frames"]
    # non-video rows emit exactly frame 0
    others = joined.filter(F.col("media_type") != "video")
    assert others.filter(F.col("frame_idx") != 0).count() == 0
    # fingerprints deterministic across runs
    a = sorted(map(tuple, frames.collect()))
    b = sorted(map(tuple, multimodal.sample_frames(media, every_n=10).collect()))
    assert a == b
