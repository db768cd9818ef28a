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
    imgs = resized.where(F.col("kind") == "image")
    assert imgs.where((F.col("width") > 64) & (F.col("height") > 64)).count() == 0
    # aspect ratio preserved-ish: no zero dims
    assert imgs.where((F.col("width") < 1) | (F.col("height") < 1)).count() == 0
    # payload body untouched by the header rewrite → features identical
    orig = {r["media_id"]: r["mean_byte"] for r in mm.decode_media(media).collect()}
    after = {r["media_id"]: r["mean_byte"] for r in resized.collect()}
    assert orig == after
    # NON-image payloads pass through byte-identical: the same header
    # words are frame-count/sample-rate there, and clamping them as
    # pixel dims corrupted every downstream stage (the regression that
    # made the frame sampler see a 400-frame video as 64 frames)
    before = {
        r["media_id"]: bytes(r["payload"])
        for r in media.where(F.col("kind") != "image").collect()
    }
    after_raw = {
        r["media_id"]: bytes(r["payload"])
        for r in mm.resize_images(media, max_dim=64)
        .where(F.col("kind") != "image")
        .collect()
    }
    assert before == after_raw


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


# -- real container-format header parsing ------------------------------------


def test_parse_real_headers_byte_exact():
    """Hand-built PNG/JPEG/GIF/WAV headers parse to exact dimensions; junk
    quarantines as 'unknown' instead of raising."""
    import struct

    from live_data_spark.operators.multimodal import _PNG_SIG, parse_media_header

    png = _PNG_SIG + struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", 640, 480) + b"\x08\x06\x00\x00\x00" + b"\x00" * 4
    assert parse_media_header(png) == ("png", 640, 480, None)

    sof = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 1080, 1920) + b"\x03"
    jpeg = b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 4) + b"JF" + sof
    assert parse_media_header(jpeg) == ("jpeg", 1920, 1080, 3)

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 6
    assert parse_media_header(gif) == ("gif", 320, 200, None)

    wav = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HH", 1, 2) + struct.pack("<I", 44100) + b"\x00" * 8
    )
    assert parse_media_header(wav) == ("wav", 2, None, 44100)

    assert parse_media_header(b"\x00junkjunkjunk")[0] == "unknown"
    assert parse_media_header(b"\xff\xd8\xff")[0] == "jpeg"  # truncated → no dims, no crash


def test_header_stats_formats_and_quarantine(spark):
    """The catalog entry parses the synthesized real-format corpus: every
    format bucket present, the corrupt sliver isolated in 'unknown', and
    parsed widths matching the generator's arithmetic."""
    from live_data_spark.catalog import catalog
    from live_data_spark.operators.multimodal import parse_headers, real_media_table

    stats = {r["format"]: r for r in catalog()["multimodal_header_stats"].spark(spark, "").collect()}
    assert set(stats) == {"png", "jpeg", "gif", "wav", "mp4", "unknown"}
    assert stats["unknown"]["n_media"] == 50  # 300 / 6
    assert stats["unknown"]["avg_width"] is None
    assert stats["wav"]["avg_extra"] is not None  # sample rates
    assert stats["mp4"]["avg_extra"] is not None  # durations (ms)

    parsed = {r["media_id"]: r for r in parse_headers(real_media_table(spark, n=10)).collect()}
    assert parsed[0]["format"] == "png" and parsed[0]["width"] == 16  # (0*37)%500+16
    assert parsed[1]["format"] == "jpeg" and parsed[1]["width"] == 16 + 37
    assert parsed[2]["format"] == "gif" and parsed[2]["height"] == 16 + 2 * 53
    assert parsed[4]["format"] == "mp4" and parsed[4]["width"] == 16 + (4 * 37) % 500
    assert parsed[4]["height"] == 16 + (4 * 53) % 400
    assert parsed[4]["extra"] == 1000 + (4 % 60) * 500  # mvhd ms at timescale 1000
    assert parsed[5]["format"] == "unknown"


def test_mp4_box_parse_variants():
    """ISO-BMFF walker edge cases: 64-bit largesize boxes, version-1
    mvhd (64-bit duration), zero-size (to-end) boxes, and malformed
    sizes terminating quietly."""
    import struct

    from live_data_spark.operators.multimodal import parse_media_header

    def box(t, body):
        return struct.pack(">I", 8 + len(body)) + t + body

    def box64(t, body):
        return struct.pack(">I", 1) + t + struct.pack(">Q", 16 + len(body)) + body

    tkhd = box(b"tkhd", b"\x00" * 76 + struct.pack(">II", 1920 << 16, 1080 << 16))
    mvhd_v1 = box(
        b"mvhd",
        b"\x01" + b"\x00" * 3 + b"\x00" * 16  # v1: 8-byte ctime/mtime
        + struct.pack(">I", 600) + struct.pack(">Q", 1800) + b"\x00" * 80,
    )
    p = box(b"ftyp", b"isom") + box64(b"moov", mvhd_v1 + box(b"trak", tkhd))
    assert parse_media_header(p) == ("mp4", 1920, 1080, 3000)

    # malformed inner size: outer type still detected, fields None
    bad = box(b"ftyp", b"isom") + struct.pack(">I", 3) + b"moov"
    assert parse_media_header(bad) == ("mp4", None, None, None)


def test_phash_neardup_finds_planted_flips(spark):
    """Every byte-flipped copy must pair with its original at small
    hamming distance; locality sanity: a one-pixel change never looks
    like an unrelated surface (distance stays far below the ~31-bit
    random baseline)."""
    from live_data_spark.catalog import catalog
    from live_data_spark.operators.multimodal import _phash64, media_table

    rows = catalog()["multimodal_phash_neardup"].spark(spark, "unused").collect()
    planted = {
        r["media_id_1"]: r["hamming"]
        for r in rows
        if r["media_id_2"] == r["media_id_1"] + 10000
    }
    assert set(planted) == set(range(20))  # all 20 planted pairs found
    assert all(h <= 10 for h in planted.values())
    assert all(r["hamming"] <= 16 for r in rows)

    # random-baseline sanity on the hash itself: unrelated payloads
    # disagree on roughly half the 63 bits
    pays = {r["media_id"]: bytes(r["payload"]) for r in media_table(spark, n=10).collect()}
    dists = [
        bin(_phash64(pays[i]) ^ _phash64(pays[j])).count("1")
        for i in pays for j in pays if i < j
    ]
    assert min(dists) > 16
