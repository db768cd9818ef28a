"""Multimodal columns: binary payloads + typed metadata + Pandas-UDF decode.

BASELINE.json north star: treat image/audio/video as opaque ``binary``
columns flowing through the same DataFrame pipeline as text — decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
stages so a 100 TB media corpus streams through Python in columnar batches
(never row-at-a-time, never collected).

Container note (per the build contract): no image/audio libraries ship in
this environment, so PIXEL/SAMPLE decode is stubbed behind
``NotImplementedError`` in ``_decode_real``. Container STRUCTURE, however,
needs no library: ``parse_media_header`` parses REAL PNG/JPEG/GIF/WAV
headers (IHDR, SOF marker scan, logical screen, fmt chunk) with pure byte
arithmetic, including quarantine of corrupt payloads. The rest of the
pipeline — the Arrow batch path, schemas, explode/aggregate plumbing, and
a deterministic fake full-payload format — is real and tested. Swapping in
PIL/libsndfile later changes ONE function, not the pipeline.

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


def _synth_partitions(n: int) -> int:
    """Partition count for an n-row synthetic media corpus: track the DATA
    size, not the cluster width. ``spark.range(n)`` defaults to
    defaultParallelism partitions, which on local[32] hands a 300-row
    corpus to 32 Python workers — ~10 rows per Arrow batch, so worker
    launch dominates by 10×+ (measured: 20.8 s → 7.4 s cold for
    ``multimodal_header_stats`` at n=300). A real ``binaryFile`` scan
    sizes splits by ``maxPartitionBytes`` for exactly this reason; at
    real corpus sizes this returns the parallel fan-out again.
    """
    return max(1, min(64, n // 64))


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
    return spark.range(n, numPartitions=_synth_partitions(n)).select(
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
    """'Resize' stage: rewrite IMAGE headers with clamped dims (fake
    transform, real plumbing — same mapInPandas shape a thumbnailer
    would use). Non-image payloads pass through UNTOUCHED: the same
    header words mean frame-count/frame-size for video and
    sample-rate/sample-count for audio, so clamping them "as if" they
    were pixel dims silently corrupts the metadata every downstream
    stage reads (the frame sampler would see a 400-frame video as a
    64-frame one)."""

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
            out["payload"] = [
                shrink(p) if k == "image" else p
                for k, p in zip(out["kind"], out["payload"])
            ]
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


# ---------------------------------------------------------------------------
# REAL container formats — pure-byte header parsing (no codec libraries).
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _mp4_boxes(b: bytes, start: int, end: int):
    """Walk ISO-BMFF boxes in b[start:end] → (type, body_start, box_end).
    Handles 64-bit largesize (size==1) and to-end boxes (size==0);
    malformed sizes terminate the walk instead of raising."""
    off = start
    while off + 8 <= end:
        (size,) = struct.unpack(">I", b[off : off + 4])
        typ = b[off + 4 : off + 8]
        hdr = 8
        if size == 1:
            if off + 16 > end:
                break
            (size,) = struct.unpack(">Q", b[off + 8 : off + 16])
            hdr = 16
        elif size == 0:
            size = end - off
        if size < hdr or off + size > end:
            break
        yield typ, off + hdr, off + size
        off += size


def _parse_mp4(payload: bytes) -> tuple[str, int | None, int | None, int | None]:
    """ISO-BMFF (MP4/MOV) structure parse: track width/height from tkhd
    (16.16 fixed point) and duration in ms from mvhd — pure box walking,
    no codec. Returns partial info for truncated files."""
    w = h = dur_ms = None
    for typ, s, e in _mp4_boxes(payload, 0, len(payload)):
        if typ != b"moov":
            continue
        for t2, s2, e2 in _mp4_boxes(payload, s, e):
            if t2 == b"mvhd" and s2 + 20 <= e2:
                ver = payload[s2]
                if ver == 1:
                    if s2 + 32 > e2:
                        continue  # truncated v1 box: None, never a v0 misparse
                    (timescale,) = struct.unpack(">I", payload[s2 + 20 : s2 + 24])
                    (duration,) = struct.unpack(">Q", payload[s2 + 24 : s2 + 32])
                else:
                    timescale, duration = struct.unpack(">II", payload[s2 + 12 : s2 + 20])
                if timescale:
                    dur_ms = duration * 1000 // timescale
            elif t2 == b"trak":
                for t3, s3, e3 in _mp4_boxes(payload, s2, e2):
                    if t3 == b"tkhd" and e3 - s3 >= 8:
                        fw, fh = struct.unpack(">II", payload[e3 - 8 : e3])
                        if fw and fh:
                            w, h = fw >> 16, fh >> 16
    return "mp4", w, h, dur_ms


def parse_media_header(payload: bytes) -> tuple[str, int | None, int | None, int | None]:
    """Sniff + parse REAL container headers: (format, width, height, extra).

    Pure byte arithmetic on the container STRUCTURE — PNG IHDR, JPEG SOF
    marker scan, GIF logical screen, WAV fmt chunk, MP4/ISO-BMFF box
    walk (tkhd dimensions + mvhd duration) — which needs no codec
    library; only pixel/sample decode does (still stubbed in
    ``_decode_real``). ``extra`` is channels (images), sample rate
    (WAV), or duration in ms (MP4). Unknown/corrupt payloads return ('unknown', None, None, None)
    — quarantine rows, never exceptions, so one bad file can't kill a
    100 TB scan.
    """
    try:
        if payload[:8] == _PNG_SIG and payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            return "png", w, h, None
        if payload[:2] == b"\xff\xd8":  # JPEG SOI, then marker scan
            i = 2
            while i + 9 < len(payload) and payload[i] == 0xFF:
                marker, seglen = payload[i + 1], struct.unpack(">H", payload[i + 2 : i + 4])[0]
                if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0-3
                    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                    return "jpeg", w, h, payload[i + 9]
                i += 2 + seglen
            return "jpeg", None, None, None  # truncated before SOF
        if payload[:4] in (b"GIF8",):
            w, h = struct.unpack("<HH", payload[6:10])
            return "gif", w, h, None
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE" and payload[12:16] == b"fmt ":
            channels, rate = struct.unpack("<HI", payload[22:28])
            return "wav", channels, None, rate
        if len(payload) >= 12 and payload[4:8] == b"ftyp":
            return _parse_mp4(payload)
    except (struct.error, IndexError):
        pass
    return "unknown", None, None, None


def real_media_table(spark: SparkSession, n: int = 300) -> DataFrame:
    """Deterministic corpus of REAL-format headers (PNG/JPEG/GIF/WAV + a
    corrupt sliver), generated distributed via mapInPandas over a range —
    the stand-in for a ``spark.read.format("binaryFile")`` scan.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["id"]:
                w, h = 16 + (mid * 37) % 500, 16 + (mid * 53) % 400
                kind = mid % 6
                if kind == 0:
                    p = _PNG_SIG + struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00" + b"\x00" * 4
                elif kind == 1:
                    sof = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", h, w) + b"\x03"
                    p = b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 4) + b"JF" + sof + b"\x00" * 8
                elif kind == 2:
                    p = b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6
                elif kind == 3:
                    rate = 8000 + (mid % 6) * 8000
                    p = (
                        b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt " + struct.pack("<I", 16)
                        + struct.pack("<HH", 1, 1 + mid % 2) + struct.pack("<I", rate) + b"\x00" * 8
                    )
                elif kind == 4:
                    box = lambda t, body: struct.pack(">I", 8 + len(body)) + t + body
                    tkhd = box(b"tkhd", b"\x00" * 76 + struct.pack(">II", w << 16, h << 16))
                    mvhd = box(b"mvhd", b"\x00" * 12 + struct.pack(">II", 1000, 1000 + (mid % 60) * 500) + b"\x00" * 80)
                    p = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + box(b"moov", mvhd + box(b"trak", tkhd))
                else:
                    p = b"\x00garbage" + bytes([mid % 256]) * 4  # corrupt sliver
                payloads.append(p)
            yield pd.DataFrame({"media_id": pdf["id"], "payload": payloads})

    return spark.range(n, numPartitions=_synth_partitions(n)).mapInPandas(
        gen, schema="media_id long, payload binary"
    )


HEADER_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("extra", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def parse_headers(df: DataFrame) -> DataFrame:
    """Arrow-batched header parse over a (media_id, payload) frame."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_media_header(p) for p in pdf["payload"]]
            fmts, ws, hs, extras = zip(*parsed) if parsed else ((), (), (), ())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": fmts,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "extra": pd.array(extras, dtype="Int32"),
                    "n_bytes": pdf["payload"].map(len),
                }
            )

    return df.mapInPandas(parse, schema=HEADER_SCHEMA)


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


@register("multimodal_header_stats", oracle=None, tags=("multimodal",))
def multimodal_header_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container formats end-to-end: PNG/JPEG/GIF/WAV headers parsed
    with pure byte logic (no codec libraries — see ``parse_media_header``)
    plus a corrupt sliver that must land in the 'unknown' quarantine
    bucket instead of failing the scan.

    Rows-only driver check (binary payloads aren't SQL-reproducible);
    byte-exact parses are pytest-verified against hand-built headers in
    tests/test_multimodal.py. ``sf_dir`` unused (media is synthesized).
    """
    parsed = parse_headers(real_media_table(spark, n=300))
    return (
        parsed.groupBy("format")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.round(F.avg("width"), 2).alias("avg_width"),
            F.round(F.avg("height"), 2).alias("avg_height"),
            F.round(F.avg("extra"), 2).alias("avg_extra"),
        )
        .orderBy("format")
    )


# ---------------------------------------------------------------------------
# Perceptual hashing — pHash near-dup candidates over binary payloads.
# ---------------------------------------------------------------------------

PHASH_BANDS = 8  # 8 × 8-bit bands over the 63-bit hash
PHASH_BAND_BITS = 8
PHASH_MAX_HAMMING = 16

PHASH_SCHEMA = StructType(
    [StructField("media_id", LongType()), StructField("phash", LongType())]
)


def _phash64(payload: bytes) -> int:
    """63-bit pHash of the fake-decoded pixel surface: the 64-byte body
    IS an 8×8 grayscale surface (no tiling — a periodic tile would give
    unrelated media correlated low-frequency spectra), 2-D DCT-II via an
    explicit cosine-basis matmul (numpy only, no scipy), all 63 AC
    coefficients thresholded at their median. The standard pHash recipe
    (Zauner 2010) on the deterministic fake decode: a real deploy swaps
    the byte surface for PIL's grayscale-resize(8,8) of the decoded
    image and nothing else changes. Locality is the point: one flipped
    payload byte = one pixel = a few sign flips, while independent
    surfaces disagree on ~half the bits."""
    import numpy as np

    body = (payload[16:] + b"\x00" * 64)[:64]
    m = np.frombuffer(body, dtype=np.uint8).astype(np.float64).reshape(8, 8)
    n = 8
    k = np.arange(n)
    basis = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    basis[0, :] = np.sqrt(1.0 / n)
    d = basis @ m @ basis.T
    ac = d.flatten()[1:]  # drop the DC term → 63 bits
    med = np.median(ac)
    bits = 0
    for i, v in enumerate(ac):
        if v > med:
            bits |= 1 << i
    return bits  # 63 bits: always fits signed int64


def phash_media(df: DataFrame) -> DataFrame:
    """payload → 64-bit pHash via Arrow-batched mapInPandas (the decode
    stage's shape: binary in, 16 bytes out per row, no shuffle)."""

    def ph(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": pd.array(
                        [_phash64(p) for p in pdf["payload"]], dtype="int64"
                    ),
                }
            )

    return df.mapInPandas(ph, schema=PHASH_SCHEMA)


@register("multimodal_phash_neardup", oracle=None, tags=("multimodal", "dedup"))
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate media detection without decoding pixels twice:
    64-bit pHash per payload (Arrow batch stage), then the SimHash-style
    scale path — split each hash into 8×8-bit bands, candidate pairs
    must collide on ≥1 band (pigeonhole: any pair within hamming ≤ 7
    must; near-dups collide with high probability beyond), verify with
    bit_count(xor) ≤ 16 in codegen. The media twin of dedup_simhash:
    re-encoded/resized/lightly-edited assets hash near each other while
    unrelated content sits at hamming ≈ 32.

    The corpus is the synthetic media table plus planted perturbations
    (one payload byte flipped) so the operator's recall is measurable:
    tests/test_multimodal.py pins that every planted pair is found at
    distance < the unrelated-pair baseline. Rows-only driver check
    (binary + BLAS-side DCT aren't SQL-reproducible).

    Scale: band explode = PHASH_BANDS (8) rows/asset; the candidate shuffle carries
    bare (band_key → id, hash) pairs; verification touches candidates
    only. Never all-pairs — same contract as the text dedup ladder.
    """
    base = media_table(spark, n=300)
    # planted near-dups: ids 10000+k are byte-flipped copies of ids < 20
    perturbed = base.where(F.col("media_id") < 20).select(
        (F.col("media_id") + 10000).alias("media_id"),
        "kind",
        F.concat(
            F.expr("substring(payload, 1, length(payload) - 1)"),
            F.unhex(F.lit("00")),
        ).alias("payload"),
    )
    hashed = phash_media(base.unionByName(perturbed))
    bands = hashed.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("phash", b * PHASH_BAND_BITS)
                        .bitwiseAND(F.lit(0xFF))
                        .alias("key"),
                    )
                    for b in range(PHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "phash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_id_1"),
            F.col("b.media_id").alias("media_id_2"),
            F.col("a.phash").alias("h1"),
            F.col("b.phash").alias("h2"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return (
        cand.select("media_id_1", "media_id_2", ham.alias("hamming"))
        .where(F.col("hamming") <= PHASH_MAX_HAMMING)
        .orderBy("hamming", "media_id_1", "media_id_2")
    )
