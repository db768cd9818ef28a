"""Multimodal columns: binary payloads + typed metadata + Pandas-UDF decode.

BASELINE.json north star: treat image/audio/video as opaque ``binary``
columns flowing through the same DataFrame pipeline as text — decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
stages so a 100 TB media corpus streams through Python in columnar batches
(never row-at-a-time, never collected).

Container note (per the build contract): no image/audio libraries ship in
this environment, so REAL codec work (JPEG/PNG/WAV decode) is stubbed
behind ``NotImplementedError`` in ``_decode_real``. Everything around it is
real and tested: a deterministic fake media format with a parseable binary
header, the Arrow batch path, schemas, and the explode/aggregate plumbing
downstream of decode. Swapping in PIL/libsndfile later changes ONE
function, not the pipeline.

Fake format (16-byte header + payload):
  bytes 0-3   magic  b"IMG0" | b"AUD0" | b"VID0"
  bytes 4-7   width / sample-rate / frame-count   (big-endian uint32)
  bytes 8-11  height / n-samples / frame-size     (big-endian uint32)
  bytes 12-15 channels                            (big-endian uint32)
  bytes 16+   payload (pseudo-random bytes from the media id)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", IntegerType()),  # the fake "feature"
    ]
)

_MAGIC = {"image": b"IMG0", "audio": b"AUD0", "video": b"VID0"}


def media_table(spark: SparkSession, n: int = 300, seed: int = 42) -> DataFrame:
    """Deterministic fake media corpus, built JVM-side.

    Header ints and payload bytes derive from xxhash64 of the id — the
    whole table is expressions over ``spark.range`` (parallel, no Python),
    exactly how a real pipeline would project ``binaryFile`` reads.
    """
    i = F.col("id")
    kind = F.element_at(F.lit(list(_MAGIC)), (F.pmod(i, F.lit(3)) + 1).cast("int"))
    width = (F.pmod(F.xxhash64(i, F.lit(seed), F.lit("w")), F.lit(512)) + 16).cast("int")
    height = (F.pmod(F.xxhash64(i, F.lit(seed), F.lit("h")), F.lit(512)) + 16).cast("int")
    channels = (F.pmod(i, F.lit(3)) + 1).cast("int")
    magic_hex = F.element_at(
        F.lit([m.hex() for m in _MAGIC.values()]), (F.pmod(i, F.lit(3)) + 1).cast("int")
    )
    # payload: 64 pseudo-random bytes from chained hashes of the id
    payload_hex = F.concat(
        *[F.lpad(F.hex(F.abs(F.xxhash64(i, F.lit(seed), F.lit(j)))), 16, "0") for j in range(8)]
    )
    header_hex = F.concat(
        magic_hex,
        F.lpad(F.hex(width), 8, "0"),
        F.lpad(F.hex(height), 8, "0"),
        F.lpad(F.hex(channels), 8, "0"),
    )
    return spark.range(n).select(
        i.alias("media_id"),
        kind.alias("kind"),
        F.unhex(F.concat(header_hex, payload_hex)).alias("payload"),
    )


def _decode_real(payload: bytes, kind: str):  # pragma: no cover - stub
    """STUB: real codec decode (JPEG/PNG/WAV/MP4).

    The container has no imaging/audio libraries; a production deploy
    replaces this with PIL / soundfile / pyav. Marked loudly so nobody
    mistakes the fake-format path for a real decoder.
    """
    raise NotImplementedError(
        "real media decoding requires imaging/audio libraries not present "
        "in this environment; the deterministic fake format exercises the "
        "full Spark pipeline instead"
    )


def _decode_fake(payload: bytes) -> tuple[int, int, int, int]:
    magic, w, h, c = payload[:4], *struct.unpack(">III", payload[4:16])
    if magic not in _MAGIC.values():
        raise ValueError(f"bad magic {magic!r}")
    body = payload[16:]
    mean = sum(body) // len(body) if body else 0
    return w, h, c, mean


def decode_media(df: DataFrame) -> DataFrame:
    """Decode binary payloads → typed metadata via Arrow-batched mapInPandas.

    The batch shape is the point: each partition arrives as pandas
    DataFrames of ~10k rows (Arrow columnar transfer), payload bytes are
    decoded in-process, and only the (tiny) typed metadata flows on —
    the binary column is dropped by Catalyst downstream of this stage
    unless re-selected. Narrow op: no shuffle at any scale.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, c, mb = zip(*(_decode_fake(p) for p in pdf["payload"])) if len(pdf) else ((), (), (), ())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": pd.array(w, dtype="int32"),
                    "height": pd.array(h, dtype="int32"),
                    "channels": pd.array(c, dtype="int32"),
                    "n_bytes": pdf["payload"].map(len),
                    "mean_byte": pd.array(mb, dtype="int32"),
                }
            )

    return df.mapInPandas(decode, schema=DECODED_SCHEMA)


def resize_images(df: DataFrame, max_dim: int = 64) -> DataFrame:
    """'Resize' stage: rewrite headers with clamped dims (fake transform,
    real plumbing — same mapInPandas shape a thumbnailer would use)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def shrink(p: bytes) -> bytes:
                w, h, c, _ = _decode_fake(p)
                scale = max(w, h, 1) / max_dim
                if scale <= 1:
                    return p
                nw, nh = max(int(w / scale), 1), max(int(h / scale), 1)
                return p[:4] + struct.pack(">III", nw, nh, c) + p[16:]

            out = pdf.copy()
            out["payload"] = out["payload"].map(shrink)
            yield out

    return df.mapInPandas(resize, schema=MEDIA_SCHEMA)


from live_data_spark.catalog import register  # noqa: E402  (cycle-free)


@register("multimodal_decode_stats", oracle=None, tags=("multimodal",))
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media pipeline end-to-end: synth corpus → Arrow decode → rollup.

    Rows-only driver check (payloads are binary, not SQL-reproducible);
    the format/decode invariants are pytest-verified in
    tests/test_multimodal.py. ``sf_dir`` is unused — media is synthesized
    (the driver testdata has no binary table).
    """
    decoded = decode_media(media_table(spark, n=300))
    return (
        decoded.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.round(F.avg("width"), 2).alias("avg_width"),
            F.round(F.avg("mean_byte"), 2).alias("avg_mean_byte"),
            F.sum("n_bytes").alias("total_bytes"),
        )
        .orderBy("kind")
    )


def sample_video_frames(df: DataFrame, every: int = 16) -> DataFrame:
    """Frame sampling: explode video payload bytes into per-frame rows.

    JVM-side explode over byte offsets (the frame boundaries live in the
    header) — the decode of each sampled frame would then run through
    ``decode_media``'s batch path. No Python for the sampling itself.
    """
    vids = df.where(F.col("kind") == "video")
    n_frames = F.conv(F.hex(F.substring("payload", 5, 4)), 16, 10).cast("int")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(((n_frames - 1) / every).cast("int"), F.lit(0)))
        ).alias("frame_bucket"),
    ).select("media_id", (F.col("frame_bucket") * every).alias("frame_idx"))


@register("multimodal_frame_sample", oracle=None, tags=("multimodal",))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained media stages: synth corpus → resize → frame-sample → rollup.

    Exercises multi-stage binary processing as ONE lazy plan: the resize
    mapInPandas feeds the JVM-side frame explode with no materialization
    between stages (Catalyst pipelines the Arrow stage into the scan).
    Rows-only driver check; per-stage invariants are pytest-verified.
    ``sf_dir`` unused (media is synthesized).
    """
    media = resize_images(media_table(spark, n=300))
    frames = sample_video_frames(media, every=16)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.max("frame_idx").alias("max_frame_idx"),
        )
        .orderBy("media_id")
    )
