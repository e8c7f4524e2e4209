"""Multimodal-column coverage (binary payloads + Pandas-UDF decode stages).

A synthetic media table is derived from documents: payload = container
magic bytes (PNG/JPEG/RIFF chosen by doc_id % 3) ++ utf-8 text bytes. That
makes every stage oracle-checkable in DuckDB — the fake decoders are
deterministic functions of byte length, which SQL can replicate — while
the Spark side exercises the REAL plumbing: binary columns, magic-byte
sniffing as column expressions, Arrow-batched mapInPandas feature
extraction, and one-to-many frame expansion.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pspcz_analyzer_spark.catalog import load_table
from pspcz_analyzer_spark.operators.multimodal import (
    binary_stats,
    extract_image_features,
    sample_frames,
)
from pspcz_analyzer_spark.plans import register

_PNG = bytes.fromhex("89504E470D0A1A0A")
_JPEG = bytes.fromhex("FFD8FF")
_RIFF = b"RIFF"

# DuckDB twin of _media(): payload length per kind (prefix + utf-8 text).
_SQL_MEDIA = """
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image/png'
                         WHEN 1 THEN 'image/jpeg'
                         ELSE 'audio/riff' END AS mime,
         CASE doc_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 3 ELSE 4 END
           + octet_length(encode(text)) AS n_bytes
  FROM documents
"""


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    prefix = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(_PNG))
        .when(F.col("doc_id") % 3 == 1, F.lit(_JPEG))
        .otherwise(F.lit(_RIFF))
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(prefix, F.encode("text", "utf-8").cast("binary")).alias("content"),
    )


@register(
    "media_binary_stats",
    oracle=f"""
    SELECT media_id, n_bytes, mime AS mime_guess
    FROM ({_SQL_MEDIA})
    ORDER BY media_id
    """,
    tags=("multimodal", "binary"),
    doc="Binary-column metadata pass: payload size + container sniffing "
    "from magic bytes, all JVM-side column expressions (no UDF).",
)
def media_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = binary_stats(_media(spark, sf_dir))
    return media.select("media_id", "n_bytes", "mime_guess").orderBy("media_id")


@register(
    "media_image_features",
    oracle=f"""
    SELECT media_id, mime, n_bytes,
           CAST(n_bytes % 640 + 1 AS INTEGER) AS width,
           CAST((n_bytes * 7) % 480 + 1 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS n_channels,
           CAST(FALSE AS BOOLEAN) AS decoded
    FROM ({_SQL_MEDIA})
    ORDER BY media_id
    """,
    tags=("multimodal", "pandas-udf"),
    doc="Arrow-batched mapInPandas decode/feature stage. Dimensions come "
    "from REAL header parsing (operators/multimodal.py::parse_image_header "
    "— PNG IHDR, GIF screen descriptor, JPEG SOF scan; pure header bytes, "
    "no codec) when a valid header is present, else the deterministic "
    "fake, flagged by the decoded column. The synthetic payloads are "
    "magic-prefix + UTF-8 text — headerless by construction (UTF-8 can't "
    "carry the required 0x00/0xFF bytes), so every row takes the fake "
    "path here and decoded=false is itself oracle-checked; real-header "
    "parsing is pinned by hand-built PNG/GIF/JPEG bytes in "
    "tests/test_media.py.",
)
def media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_image_features(_media(spark, sf_dir)).orderBy("media_id")


@register(
    "media_frame_sample",
    oracle=f"""
    SELECT media_id,
           CAST(unnest(generate_series(0, n_bytes % 5)) AS INTEGER) AS frame_idx
    FROM ({_SQL_MEDIA})
    ORDER BY media_id, frame_idx
    """,
    tags=("multimodal", "udtf"),
    doc="One-to-many frame sampling (video keyframe shape): mapInPandas "
    "emitting n_bytes % 5 + 1 rows per input row.",
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = sample_frames(_media(spark, sf_dir), max_frames=5)
    return frames.select("media_id", "frame_idx").orderBy("media_id", "frame_idx")


@register(
    "media_audio_features",
    oracle=f"""
    SELECT media_id, mime, n_bytes,
           CAST(n_bytes % 2 + 1 AS INTEGER) AS n_channels,
           CAST(CASE n_bytes % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                                 WHEN 2 THEN 22050 ELSE 44100 END
                AS INTEGER) AS sample_rate,
           CAST(16 AS INTEGER) AS bits_per_sample,
           (n_bytes * 13) % 5000 AS duration_ms,
           FALSE AS decoded
    FROM ({_SQL_MEDIA})
    WHERE mime = 'audio/riff'
    ORDER BY media_id
    """,
    tags=("multimodal", "audio", "new-surface"),
    priority=18,
    doc="Audio metadata extraction (operators/multimodal.py::"
    "extract_audio_features): Arrow-batched mapInPandas with REAL "
    "RIFF/WAVE fmt-chunk parsing (parse_wav_header — channels, rate, "
    "bit width, duration from header bytes alone, no audio library; "
    "unit-tested on struct-built WAV headers incl. chunk padding and "
    "truncation) and the deterministic fake for unreadable payloads. "
    "The synthetic RIFF payloads carry no WAVE tag, so this catalog row "
    "pins the fake path + plumbing (decoded=false throughout), exactly "
    "as media_image_features does for images.",
)
def media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.multimodal import extract_audio_features

    feats = extract_audio_features(_media(spark, sf_dir))
    return feats.filter(F.col("mime") == "audio/riff").orderBy("media_id")


# Real ISO-BMFF header constants for the video stage: a 24-byte ftyp
# (matching the sniffer's video/mp4 magic) and the mvhd prefix through
# its timescale field (size 108, version 0, timescale 1000); duration
# and the trak stubs vary per row and are spliced in column-side.
_MP4_FTYP = bytes.fromhex(
    "0000001866747970" + "69736f6d" + "00000200" + "69736f6d" + "69736f32"
)
_MP4_MVHD_PRE = bytes.fromhex(
    "0000006c6d766864" + "00000000" + "00000000" + "00000000" + "000003e8"
)
_MP4_TRAK3 = bytes.fromhex("000000087472616b") * 3


def _video_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents re-skinned as VALID minimal MP4s: ftyp + moov(mvhd +
    doc_id%3+1 trak stubs) + the text as trailing bytes — so the REAL
    box walker (not the fake) is what the oracle checks, with duration
    and track count deterministic functions of doc_id that SQL
    replicates."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def be32(c):
        return F.unhex(F.lpad(F.hex(c), 8, "0"))

    n_tracks = (F.col("doc_id") % 3 + 1).cast("int")
    duration = (F.col("doc_id") * 37) % 590000 + 10000
    return (
        docs.withColumn("__trak3", F.lit(_MP4_TRAK3))
        .withColumn("__nt", n_tracks)
        .select(
            F.col("doc_id").alias("media_id"),
            F.concat(
                F.lit(_MP4_FTYP),
                be32(F.lit(116) + 8 * F.col("__nt")),  # moov size
                F.lit(b"moov"),
                F.lit(_MP4_MVHD_PRE),
                be32(duration),
                F.lit(bytes(80)),  # mvhd tail (rate/volume/matrix zeros)
                F.expr("substring(__trak3, 1, 8 * __nt)"),
                F.encode("text", "utf-8").cast("binary"),
            ).alias("content"),
        )
    )


@register(
    "media_video_mp4_features",
    oracle="""
    SELECT doc_id AS media_id,
           'video/mp4' AS mime,
           140 + 8 * (doc_id % 3 + 1) + octet_length(encode(text))
             AS n_bytes,
           (doc_id * 37) % 590000 + 10000 AS duration_ms,
           CAST(1000 AS INTEGER) AS timescale,
           CAST(doc_id % 3 + 1 AS INTEGER) AS n_tracks,
           TRUE AS decoded
    FROM documents
    ORDER BY media_id
    """,
    tags=("multimodal", "video", "mp4", "new-surface"),
    priority=18,
    doc="Video metadata extraction (operators/multimodal.py::"
    "extract_video_features): Arrow-batched mapInPandas with REAL "
    "ISO-BMFF box walking (parse_mp4_header — moov/mvhd timescale + "
    "duration, trak count, big-endian per ISO/IEC 14496-12; v0 AND v1 "
    "mvhd unit-tested on struct-built boxes). Unlike the image/audio "
    "rows (which pin the fake path), the payloads here are VALID "
    "minimal MP4s built column-side with doc_id-derived duration and "
    "track count, so the oracle hash-checks the real parser end-to-end "
    "(decoded=true on every row).",
)
def media_video_mp4_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pspcz_analyzer_spark.operators.multimodal import (
        extract_video_features,
    )

    feats = extract_video_features(_video_media(spark, sf_dir))
    return feats.orderBy("media_id")
