"""Multimodal columns: opaque binary payloads with typed metadata.

New surface beyond the reference (its documents are PDFs parsed to text —
SURVEY S7/X3); this module is the engine's pattern for image/audio/video at
100 TB:

* media rides as an opaque ``binary`` column next to typed metadata —
  never exploded into Python objects on the driver;
* cheap per-row facts (size, container sniffing) are pure column
  expressions (JVM-side, codegen);
* decode / feature-extract / frame-sample run as Arrow-batched
  ``mapInPandas`` stages — the ONLY place bytes cross into Python, one
  batch at a time (bounded by spark.sql.execution.arrow.maxRecordsPerBatch),
  so executor memory stays flat regardless of corpus size.

The image/audio codec libraries are not in this container, so the decoders
use a DETERMINISTIC FAKE derived from byte length (clearly marked; swap
``_decode_image_batch`` internals for PIL/ffmpeg in production). The Spark
plumbing — schemas, UDF signatures, batch iteration, multi-row expansion —
is real and oracle-tested (plans/media.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Container magic bytes -> mime, checked as hex prefixes (JVM-side).
_MAGIC: list[tuple[str, str]] = [
    ("89504E470D0A1A0A", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("52494646", "audio/riff"),  # RIFF container (wav/avi)
    ("474946383", "image/gif"),
    ("0000001866747970", "video/mp4"),
]

IMAGE_FEATURES_SCHEMA = (
    "media_id long, mime string, n_bytes long, width int, height int, "
    "n_channels int, decoded boolean"
)
FRAME_SCHEMA = "media_id long, frame_idx int, frame_bytes binary"

# PNG color type -> sample channels (PNG spec, 11.2.2).
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def parse_image_header(b: bytes) -> "tuple[int, int, int] | None":
    """(width, height, n_channels) from container HEADER bytes alone —
    PNG IHDR, GIF logical-screen descriptor, JPEG SOF marker scan. Pure
    byte parsing, no codec library (the same playbook as the pure-Python
    PDF fallback, operators/docparse.py): dimensions live in the first
    few header bytes of each format, defined by the public specs (PNG
    11.2.2, GIF89a §18, JPEG/JFIF SOF segment). Returns None for
    unrecognized or malformed containers — callers fall back to the
    deterministic fake and flag ``decoded=False``."""
    import struct

    if len(b) >= 26 and b[:8] == b"\x89PNG\r\n\x1a\n":
        # IHDR must be the first chunk; its length field is always 13,
        # so bytes 8..16 are fixed — a non-PNG payload behind the magic
        # (e.g. UTF-8 text, which cannot contain 0x00) can't match.
        if b[8:16] == b"\x00\x00\x00\rIHDR":
            w, h = struct.unpack(">II", b[16:24])
            depth, color = b[24], b[25]
            ch = _PNG_CHANNELS.get(color)
            if 0 < w and 0 < h and ch and depth in (1, 2, 4, 8, 16):
                return w, h, ch
        return None
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return (w, h, 3) if w > 0 and h > 0 else None
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        # Walk the marker stream to the first frame header; APPn/EXIF
        # segments are skipped by their declared length, so a SOF deep in
        # the file is still found without decoding anything. UTF-8 text
        # behind a bare FFD8FF magic can't contain the 0xFF a marker
        # needs, so it falls out of the loop -> None.
        i = 2
        while i + 2 <= len(b):
            if b[i] != 0xFF:
                return None
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            if i + 4 > len(b):
                return None
            seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if seglen < 2:
                return None
            # SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC) carry the frame
            # dimensions: precision(1), height(2), width(2), ncomp(1).
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 10 > len(b):
                    return None
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                ncomp = b[i + 9]
                return (w, h, ncomp) if w > 0 and h > 0 else None
            i += 2 + seglen
        return None
    return None


def sniff_mime(content: Column | str) -> Column:
    """Container detection from magic bytes — a column expression, no UDF."""
    c = F.col(content) if isinstance(content, str) else content
    head = F.hex(F.substring(c, 1, 8))
    expr = F.lit("application/octet-stream")
    for magic, mime in reversed(_MAGIC):
        expr = F.when(head.startswith(magic), F.lit(mime)).otherwise(expr)
    return expr


def binary_stats(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach n_bytes + sniffed mime — the cheap always-on metadata pass."""
    return df.withColumn("n_bytes", F.length(F.col(content_col)).cast("long")).withColumn(
        "mime_guess", sniff_mime(content_col)
    )


def _fake_image_dims(n_bytes: int) -> tuple[int, int, int]:
    # DETERMINISTIC FAKE decode for payloads header parsing can't read
    # (truncated/opaque containers, and PIXEL decode in general — no
    # codec libs in this container): dimensions derived from payload
    # length. Production: PIL.Image.open(io.BytesIO(b)).size etc.
    return (n_bytes % 640 + 1, (n_bytes * 7) % 480 + 1, 3)


def extract_image_features(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas.

    One output row per input row; bytes stay inside the executor batch.
    Dimensions come from REAL header parsing (:func:`parse_image_header`
    — PNG/GIF/JPEG, no codec needed) when the payload carries a valid
    header, flagged ``decoded=true``; otherwise the deterministic fake,
    flagged ``decoded=false``.
    """
    import pandas as pd

    mime = sniff_mime(content_col).alias("mime")
    src = df.select(F.col(id_col).alias("media_id"), mime, F.col(content_col).alias("content"))

    def _feat(blob) -> tuple[int, int, int, int, bool]:
        b = bytes(blob)
        hdr = parse_image_header(b)
        if hdr is None:
            w, h, c = _fake_image_dims(len(b))
            return (len(b), w, h, c, False)
        w, h, c = hdr
        return (len(b), w, h, c, True)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["content"].map(_feat)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": feats.map(lambda t: t[0]).astype("int64"),
                    "width": feats.map(lambda t: t[1]).astype("int32"),
                    "height": feats.map(lambda t: t[2]).astype("int32"),
                    "n_channels": feats.map(lambda t: t[3]).astype("int32"),
                    "decoded": feats.map(lambda t: t[4]).astype("bool"),
                }
            )

    return src.mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    max_frames: int = 5,
) -> DataFrame:
    """Frame sampling: one input row -> several frame rows (UDTF shape).

    The deterministic fake emits ``n_bytes % max_frames + 1`` frames whose
    payload is a byte slice; production swaps in ffmpeg keyframe extraction.
    The row-expansion plumbing (mapInPandas yielding more rows than it
    consumed) is the real, tested part.
    """
    import pandas as pd

    src = df.select(F.col(id_col).alias("media_id"), F.col(content_col).alias("content"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, blobs = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                n = len(blob) % max_frames + 1
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    blobs.append(bytes(blob[i : i + 16]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": pd.array(idxs, dtype="int32"), "frame_bytes": blobs}
            )

    return src.mapInPandas(batches, schema=FRAME_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_id long, mime string, n_bytes long, n_channels int, "
    "sample_rate int, bits_per_sample int, duration_ms long, decoded boolean"
)


def parse_wav_header(b: bytes) -> "tuple[int, int, int, int] | None":
    """(n_channels, sample_rate, bits_per_sample, duration_ms) from
    RIFF/WAVE HEADER bytes alone — the audio twin of
    :func:`parse_image_header`, same playbook: the fmt chunk (RIFF spec /
    WAVEFORMAT, all little-endian) carries channels, rate, and width; the
    data chunk's declared size over the byte rate gives duration. Pure
    byte parsing, no audio library; PCM and any format whose fmt chunk is
    well-formed. Returns None for anything malformed — callers fall back
    to the deterministic fake with ``decoded=False``."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i = 12
    fmt = None
    data_size = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (clen,) = struct.unpack("<I", b[i + 4 : i + 8])
        if cid == b"fmt " and clen >= 16 and i + 8 + 16 <= len(b):
            _, ch, rate, byte_rate, _, width = struct.unpack(
                "<HHIIHH", b[i + 8 : i + 24]
            )
            if ch > 0 and rate > 0 and byte_rate > 0:
                fmt = (ch, rate, byte_rate, width)
        elif cid == b"data":
            data_size = clen
        # Chunks are word-aligned: odd sizes carry a pad byte.
        i += 8 + clen + (clen & 1)
    if fmt is None:
        return None
    ch, rate, byte_rate, width = fmt
    dur_ms = int(data_size * 1000 / byte_rate) if data_size else 0
    return ch, rate, width, dur_ms


def _fake_audio_meta(n_bytes: int) -> "tuple[int, int, int, int]":
    # DETERMINISTIC FAKE for payloads the header parser can't read —
    # same honesty contract as _fake_image_dims (no codec libs here;
    # production swaps in soundfile/ffprobe).
    rates = (8000, 16000, 22050, 44100)
    return (n_bytes % 2 + 1, rates[n_bytes % 4], 16, (n_bytes * 13) % 5000)


def extract_audio_features(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Audio metadata via Arrow-batched mapInPandas — REAL RIFF/WAVE
    header parsing (:func:`parse_wav_header`, ``decoded=true``) with the
    deterministic fake for unreadable payloads (``decoded=false``).
    Same shape as :func:`extract_image_features`: one row out per row
    in, bytes never leave the executor batch."""
    import pandas as pd

    mime = sniff_mime(content_col).alias("mime")
    src = df.select(
        F.col(id_col).alias("media_id"), mime, F.col(content_col).alias("content")
    )

    def _feat(blob) -> "tuple[int, int, int, int, int, bool]":
        b = bytes(blob)
        hdr = parse_wav_header(b)
        if hdr is None:
            ch, rate, width, dur = _fake_audio_meta(len(b))
            return (len(b), ch, rate, width, dur, False)
        ch, rate, width, dur = hdr
        return (len(b), ch, rate, width, dur, True)

    def batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in it:
            feats = pdf["content"].map(_feat)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": feats.map(lambda t: t[0]).astype("int64"),
                    "n_channels": feats.map(lambda t: t[1]).astype("int32"),
                    "sample_rate": feats.map(lambda t: t[2]).astype("int32"),
                    "bits_per_sample": feats.map(lambda t: t[3]).astype("int32"),
                    "duration_ms": feats.map(lambda t: t[4]).astype("int64"),
                    "decoded": feats.map(lambda t: t[5]).astype("bool"),
                }
            )

    return src.mapInPandas(batches, schema=AUDIO_FEATURES_SCHEMA)


VIDEO_FEATURES_SCHEMA = (
    "media_id long, mime string, n_bytes long, duration_ms long, "
    "timescale int, n_tracks int, decoded boolean"
)


def parse_mp4_header(b: bytes) -> "tuple[int, int, int] | None":
    """(duration_ms, timescale, n_tracks) from ISO-BMFF (MP4) HEADER
    bytes alone — the video sibling of :func:`parse_image_header` /
    :func:`parse_wav_header`, same playbook: walk the top-level box
    stream (big-endian u32 size + fourcc, ISO/IEC 14496-12 §4.2) to
    ``moov``, read ``mvhd``'s timescale/duration (version 0: u32s after
    creation/modification; version 1: u64 duration), count ``trak``
    children. Pure struct parsing, no codec; a malformed or truncated
    box stream simply stops the walk, and anything without a complete
    moov/mvhd returns None — callers fall back to the deterministic
    fake with ``decoded=False``. (size==1 64-bit extended boxes and
    size==0 to-EOF boxes are treated as end-of-walk: headers this
    function targets never need them.)"""
    import struct

    n = len(b)
    i = 0
    ts = dur = None
    n_trak = 0
    found_moov = False
    while i + 8 <= n:
        (size,) = struct.unpack(">I", b[i : i + 4])
        typ = b[i + 4 : i + 8]
        if size < 8 or i + size > n:
            break
        if typ == b"moov":
            found_moov = True
            j, end = i + 8, i + size
            while j + 8 <= end:
                (s2,) = struct.unpack(">I", b[j : j + 4])
                t2 = b[j + 4 : j + 8]
                if s2 < 8 or j + s2 > end:
                    break
                if t2 == b"mvhd":
                    ver = b[j + 8]
                    if ver == 1 and s2 >= 8 + 4 + 8 + 8 + 4 + 8:
                        # fullbox(4) + creation(8) + modification(8).
                        (ts,) = struct.unpack(">I", b[j + 28 : j + 32])
                        (dur,) = struct.unpack(">Q", b[j + 32 : j + 40])
                    elif ver == 0 and s2 >= 8 + 4 + 4 + 4 + 4 + 4:
                        # fullbox(4) + creation(4) + modification(4).
                        ts, dur = struct.unpack(">II", b[j + 20 : j + 28])
                elif t2 == b"trak":
                    n_trak += 1
                j += s2
        i += size
    if not found_moov or not ts:
        return None
    return int(dur * 1000 // ts), ts, n_trak


def _fake_video_meta(n_bytes: int) -> "tuple[int, int, int]":
    # DETERMINISTIC FAKE for payloads without a parsable moov — same
    # honesty contract as _fake_image_dims (production: ffprobe).
    return ((n_bytes * 31) % 90000, 600, n_bytes % 3 + 1)


def extract_video_features(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Video metadata via Arrow-batched mapInPandas — REAL ISO-BMFF box
    walking (:func:`parse_mp4_header`, ``decoded=true``) with the
    deterministic fake for unreadable payloads. Same shape as the image
    and audio stages: one row out per row in, bytes never leave the
    executor batch, no codec library in the hot path."""
    import pandas as pd

    mime = sniff_mime(content_col).alias("mime")
    src = df.select(
        F.col(id_col).alias("media_id"), mime, F.col(content_col).alias("content")
    )

    def _feat(blob) -> "tuple[int, int, int, int, bool]":
        b = bytes(blob)
        hdr = parse_mp4_header(b)
        if hdr is None:
            dur, ts, trk = _fake_video_meta(len(b))
            return (len(b), dur, ts, trk, False)
        dur, ts, trk = hdr
        return (len(b), dur, ts, trk, True)

    def batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in it:
            feats = pdf["content"].map(_feat)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": feats.map(lambda t: t[0]).astype("int64"),
                    "duration_ms": feats.map(lambda t: t[1]).astype("int64"),
                    "timescale": feats.map(lambda t: t[2]).astype("int32"),
                    "n_tracks": feats.map(lambda t: t[3]).astype("int32"),
                    "decoded": feats.map(lambda t: t[4]).astype("bool"),
                }
            )

    return src.mapInPandas(batches, schema=VIDEO_FEATURES_SCHEMA)
