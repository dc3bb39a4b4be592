"""Multimodal plumbing over opaque binary columns: the input_hint images
table, video frame sampling (stubbed decode), audio features."""

from __future__ import annotations

import pytest

from osm_render_spark.fixtures.images import images_df
from osm_render_spark.raster.ops import (
    audio_features,
    decode_features,
    fake_audio_bytes,
    fake_video_bytes,
    resize_images,
    sample_video_frames,
)


def test_images_table_shape_and_decode(spark):
    imgs = images_df(spark, 40)
    assert imgs.schema.simpleString() == (
        "struct<image_id:string,bytes:binary,w:int,h:int,fmt:string,"
        "caption:string,phash:bigint,lon:double,lat:double>"
    )
    feats = decode_features(imgs).collect()
    assert len(feats) == 40
    for r in feats:
        assert r["dims_ok"], r["image_id"]
        if r["fmt"] == "png":
            assert r["phash_ok"], r["image_id"]  # png rows round-trip exactly


def test_resize_block_mean(spark):
    imgs = images_df(spark, 6)
    thumbs = resize_images(imgs, 16, 16).collect()
    from osm_render_spark.raster.codec import decode_png

    for t in thumbs:
        img = decode_png(t["bytes"])
        assert img.shape == (16, 16, 4)


def test_video_frame_sampling(spark):
    vids = spark.createDataFrame(
        [(f"v{i}", bytearray(fake_video_bytes(i, 12))) for i in range(3)],
        "video_id string, bytes binary",
    )
    frames = sample_video_frames(vids, every_n=4).collect()
    # 12 frames sampled every 4 → indices 0,4,8 per video
    per_vid = {}
    for r in frames:
        per_vid.setdefault(r["video_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 4, 8] for v in per_vid.values())


def test_video_decode_stub_raises_on_real_blobs(spark):
    vids = spark.createDataFrame(
        [("vX", bytearray(b"\x00\x00\x01\xba fake mpeg"))], "video_id string, bytes binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        sample_video_frames(vids, 2).collect()


def test_audio_features(spark):
    auds = spark.createDataFrame(
        [(i, bytearray(fake_audio_bytes(i))) for i in range(4)],
        "audio_id long, bytes binary",
    )
    rows = {r["audio_id"]: r for r in audio_features(auds).collect()}
    assert len(rows) == 4
    for aid, r in rows.items():
        assert r["n_frames"] == 20 and r["rate"] == 8000
        # sin mix: rms ≈ sqrt(0.6²/2 + 0.3²/2) ≈ 0.474
        assert 0.3 < r["rms"] < 0.6
        assert 0.6 < r["peak"] <= 1.0  # two-sine peak depends on phase alignment
        assert 0.0 < r["zcr"] < 0.5
    # different ids → different spectra → different features
    assert rows[0]["zcr"] != rows[1]["zcr"]
