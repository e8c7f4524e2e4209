"""Multimodal plumbing tests: magic-byte sniffing, Arrow batch traversal,
one-to-many frame expansion, binary payload integrity."""

from __future__ import annotations

import pyspark.sql.functions as F

from pspcz_analyzer_spark.operators.multimodal import (
    binary_stats,
    extract_image_features,
    sample_frames,
    sniff_mime,
)


def _media(spark):
    rows = [
        (1, bytes.fromhex("89504E470D0A1A0A") + b"png-payload"),
        (2, bytes.fromhex("FFD8FF") + b"jpeg-payload"),
        (3, b"RIFF" + b"wav-payload"),
        (4, b"plain text bytes"),
        (5, b""),
    ]
    return spark.createDataFrame(rows, "media_id long, content binary")


def test_sniff_mime(spark):
    got = {
        r["media_id"]: r["m"]
        for r in _media(spark).select("media_id", sniff_mime("content").alias("m")).collect()
    }
    assert got == {
        1: "image/png",
        2: "image/jpeg",
        3: "audio/riff",
        4: "application/octet-stream",
        5: "application/octet-stream",
    }


def test_binary_stats(spark):
    got = {r["media_id"]: r["n_bytes"] for r in binary_stats(_media(spark)).collect()}
    assert got[1] == 8 + len(b"png-payload")
    assert got[5] == 0


def test_image_features_row_preserving(spark):
    df = _media(spark).repartition(3)  # force multiple Arrow batches/partitions
    out = extract_image_features(df)
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    for mid, r in rows.items():
        assert r["width"] == r["n_bytes"] % 640 + 1
        assert r["height"] == (r["n_bytes"] * 7) % 480 + 1
        assert r["n_channels"] == 3


def test_frame_expansion_counts(spark):
    out = sample_frames(_media(spark), max_frames=5)
    counts = (
        out.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    by_id = {r["media_id"]: r["n"] for r in counts}
    media = {r["media_id"]: r["content"] for r in _media(spark).collect()}
    for mid, blob in media.items():
        assert by_id[mid] == len(blob) % 5 + 1
    idxs = [r["frame_idx"] for r in out.filter(F.col("media_id") == 1).collect()]
    assert sorted(idxs) == list(range(len(media[1]) % 5 + 1))


def test_frame_bytes_are_slices(spark):
    out = sample_frames(_media(spark), max_frames=5)
    r = out.filter((F.col("media_id") == 4) & (F.col("frame_idx") == 0)).collect()[0]
    assert bytes(r["frame_bytes"]) == b"plain text bytes"[:16]
