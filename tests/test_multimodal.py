"""Multimodal plumbing tests: binary schema, Arrow decode batches, stages."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from live_data_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.media_table(spark, n=120, seed=7)


def test_media_table_schema_and_determinism(spark, media):
    assert media.dtypes == [(f.name, f.dataType.simpleString()) for f in mm.MEDIA_SCHEMA]
    again = mm.media_table(spark, n=120, seed=7).collect()
    assert sorted(map(tuple, media.collect())) == sorted(map(tuple, again))
    kinds = {r[0] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_payload_header_parses(media):
    row = media.where(F.col("kind") == "image").first()
    payload = bytes(row["payload"])
    assert payload[:4] == b"IMG0"
    w, h, c = struct.unpack(">III", payload[4:16])
    assert 16 <= w < 528 and 16 <= h < 528 and 1 <= c <= 3
    assert len(payload) == 16 + 64


def test_decode_media_roundtrip(media):
    decoded = mm.decode_media(media)
    assert decoded.schema == mm.DECODED_SCHEMA
    rows = decoded.collect()
    assert len(rows) == 120
    # metadata parsed from headers matches range constraints, feature filled
    assert all(16 <= r["width"] < 528 for r in rows)
    assert all(r["n_bytes"] == 80 for r in rows)
    assert all(0 <= r["mean_byte"] <= 255 for r in rows)


def test_resize_clamps_dims(media):
    resized = mm.decode_media(mm.resize_images(media, max_dim=64))
    assert resized.where((F.col("width") > 64) & (F.col("height") > 64)).count() == 0
    # aspect ratio preserved-ish: no zero dims
    assert resized.where((F.col("width") < 1) | (F.col("height") < 1)).count() == 0
    # payload body untouched by the header rewrite → features identical
    orig = {r["media_id"]: r["mean_byte"] for r in mm.decode_media(media).collect()}
    after = {r["media_id"]: r["mean_byte"] for r in resized.collect()}
    assert orig == after


def test_sample_video_frames(media):
    frames = mm.sample_video_frames(media, every=16)
    assert frames.columns == ["media_id", "frame_idx"]
    n_videos = media.where(F.col("kind") == "video").count()
    assert frames.select("media_id").distinct().count() == n_videos
    # frame indices are multiples of the stride
    assert frames.where(F.col("frame_idx") % 16 != 0).count() == 0


def test_real_decode_is_marked_stub():
    with pytest.raises(NotImplementedError, match="real media decoding"):
        mm._decode_real(b"\xff\xd8\xff", "image")


def test_corrupt_payload_fails_loudly(spark):
    bad = spark.createDataFrame(
        [(1, "image", bytearray(b"JUNKxxxxxxxxxxxxxxxx"))], schema=mm.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="bad magic"):
        mm.decode_media(bad).collect()
