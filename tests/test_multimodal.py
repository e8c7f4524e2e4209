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
        # Magic-prefix + text payloads carry no real header: fake path.
        assert r["decoded"] is False
        assert r["width"] == r["n_bytes"] % 640 + 1
        assert r["height"] == (r["n_bytes"] * 7) % 480 + 1
        assert r["n_channels"] == 3


def _png(w=64, h=48, color=6, depth=8):
    import struct

    return (
        bytes.fromhex("89504E470D0A1A0A")
        + b"\x00\x00\x00\rIHDR"
        + struct.pack(">II", w, h)
        + bytes([depth, color, 0, 0, 0])
        + b"\xaa" * 8  # crc + whatever follows; the parser never reads it
    )


def _gif(w=320, h=200):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\xf7\x00\x00trailing"


def _jpeg(w=640, h=480, ncomp=3, sof=0xC0):
    import struct

    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof_seg = (
        bytes([0xFF, sof])
        + struct.pack(">H", 8 + 3 * ncomp)
        + bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([ncomp])
        + b"\x01\x22\x00" * ncomp
    )
    return b"\xff\xd8" + app0 + sof_seg + b"restofscan"


def test_parse_image_header_real_headers():
    from pspcz_analyzer_spark.operators.multimodal import parse_image_header

    assert parse_image_header(_png(64, 48, color=6)) == (64, 48, 4)
    assert parse_image_header(_png(1, 1, color=0)) == (1, 1, 1)
    assert parse_image_header(_png(10, 10, color=2)) == (10, 10, 3)
    assert parse_image_header(_gif(320, 200)) == (320, 200, 3)
    assert parse_image_header(_jpeg(640, 480)) == (640, 480, 3)
    # Progressive JPEG (SOF2) and grayscale single-component.
    assert parse_image_header(_jpeg(12, 34, sof=0xC2)) == (12, 34, 3)
    assert parse_image_header(_jpeg(12, 34, ncomp=1)) == (12, 34, 1)


def test_parse_image_header_rejects_malformed():
    from pspcz_analyzer_spark.operators.multimodal import parse_image_header

    # Magic + text (the synthetic-media shape): never a false positive.
    assert parse_image_header(bytes.fromhex("89504E470D0A1A0A") + b"text") is None
    assert parse_image_header(b"\xff\xd8\xff" + "text čšž".encode()) is None
    assert parse_image_header(b"GIF89a") is None  # truncated descriptor
    assert parse_image_header(_png(0, 5)) is None  # zero dimension
    assert parse_image_header(b"RIFFwav-payload") is None
    assert parse_image_header(b"") is None


def test_image_features_decode_real_headers(spark):
    rows = [(1, _png(64, 48)), (2, _gif(320, 200)), (3, _jpeg(640, 480)), (4, b"opaque")]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in extract_image_features(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_channels"]) == (64, 48, 4)
    assert (got[2]["width"], got[2]["height"]) == (320, 200)
    assert (got[3]["width"], got[3]["height"], got[3]["n_channels"]) == (640, 480, 3)
    assert all(got[i]["decoded"] for i in (1, 2, 3))
    assert got[4]["decoded"] is False  # unrecognized container -> fake dims


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


class TestWavHeader:
    @staticmethod
    def _wav(ch=2, rate=44100, width=16, data=b"\x00" * 1000, extra_chunk=b""):
        import struct

        byte_rate = rate * ch * width // 8
        fmt = struct.pack("<HHIIHH", 1, ch, rate, byte_rate, ch * width // 8, width)
        chunks = extra_chunk + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    def test_parses_real_headers(self):
        from pspcz_analyzer_spark.operators.multimodal import parse_wav_header

        b = self._wav(ch=1, rate=8000, width=8, data=b"\x00" * 16000)
        assert parse_wav_header(b) == (1, 8000, 8, 2000)  # 16000 B / 8 kB/s
        # Stereo 16-bit 44.1k, one second.
        b = self._wav(ch=2, rate=44100, width=16, data=b"\x00" * (44100 * 4))
        assert parse_wav_header(b) == (2, 44100, 16, 1000)

    def test_skips_leading_chunks_and_pads_odd_sizes(self):
        import struct

        from pspcz_analyzer_spark.operators.multimodal import parse_wav_header

        # An odd-length LIST chunk before fmt: the word-alignment pad must
        # be honored or the walker desyncs.
        junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
        b = self._wav(ch=2, rate=22050, width=16, data=b"\x00" * 8820,
                      extra_chunk=junk)
        assert parse_wav_header(b) == (2, 22050, 16, 100)

    def test_rejects_malformed(self):
        from pspcz_analyzer_spark.operators.multimodal import parse_wav_header

        assert parse_wav_header(b"RIFF\x00\x00\x00\x00DATA") is None
        assert parse_wav_header(b"RIFF" + b"junk that is not wave") is None
        assert parse_wav_header(self._wav()[:20]) is None  # truncated fmt
        assert parse_wav_header(b"") is None

    def test_spark_stage_decodes_real_and_fakes_rest(self, spark):
        from pspcz_analyzer_spark.operators.multimodal import (
            extract_audio_features,
        )

        real = self._wav(ch=1, rate=16000, width=16, data=b"\x00" * 32000)
        df = spark.createDataFrame(
            [(1, bytearray(real)), (2, bytearray(b"RIFF not a wave"))],
            "media_id long, content binary",
        )
        got = {
            r["media_id"]: (
                r["n_channels"], r["sample_rate"], r["duration_ms"], r["decoded"]
            )
            for r in extract_audio_features(df).collect()
        }
        assert got[1] == (1, 16000, 1000, True)
        assert got[2][3] is False


class TestMp4Header:
    def _ftyp(self):
        import struct

        return (
            struct.pack(">I", 24)
            + b"ftypisom"
            + struct.pack(">I", 0x200)
            + b"isomiso2"
        )

    def test_v0_mvhd_and_trak_count(self):
        import struct

        from pspcz_analyzer_spark.operators.multimodal import parse_mp4_header

        mvhd = (
            struct.pack(">I", 108)
            + b"mvhd"
            + bytes(4)  # version 0 + flags
            + bytes(8)  # creation + modification
            + struct.pack(">II", 1000, 45123)
            + bytes(80)
        )
        traks = (struct.pack(">I", 8) + b"trak") * 2
        moov = struct.pack(">I", 8 + len(mvhd) + len(traks)) + b"moov" + mvhd + traks
        blob = self._ftyp() + moov + b"trailing garbage is not a box"
        assert parse_mp4_header(blob) == (45123, 1000, 2)

    def test_v1_mvhd_64bit_duration(self):
        import struct

        from pspcz_analyzer_spark.operators.multimodal import parse_mp4_header

        mvhd = (
            struct.pack(">I", 120)
            + b"mvhd"
            + b"\x01"
            + bytes(3)
            + bytes(16)  # creation + modification as u64s
            + struct.pack(">IQ", 90000, 90000 * 7)
            + bytes(120 - 40)
        )
        moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
        assert parse_mp4_header(self._ftyp() + moov) == (7000, 90000, 0)

    def test_malformed_and_truncated_return_none(self):
        from pspcz_analyzer_spark.operators.multimodal import parse_mp4_header

        assert parse_mp4_header(b"not a video at all") is None
        assert parse_mp4_header(b"") is None
        # moov claimed but stream ends before it completes.
        import struct

        moov = struct.pack(">I", 4096) + b"moov" + bytes(16)
        assert parse_mp4_header(self._ftyp() + moov) is None
