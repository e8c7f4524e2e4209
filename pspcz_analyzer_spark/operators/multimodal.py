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
    "media_id long, mime string, n_bytes long, width int, height int, n_channels int"
)
FRAME_SCHEMA = "media_id long, frame_idx int, frame_bytes binary"


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
    # DETERMINISTIC FAKE decode: dimensions derived from payload length.
    # Production: PIL.Image.open(io.BytesIO(b)).size etc.
    return (n_bytes % 640 + 1, (n_bytes * 7) % 480 + 1, 3)


def extract_image_features(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas.

    One output row per input row; bytes stay inside the executor batch.
    """
    import pandas as pd

    mime = sniff_mime(content_col).alias("mime")
    src = df.select(F.col(id_col).alias("media_id"), mime, F.col(content_col).alias("content"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_bytes = pdf["content"].map(len)
            dims = n_bytes.map(_fake_image_dims)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": n_bytes.astype("int64"),
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "n_channels": dims.map(lambda d: d[2]).astype("int32"),
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
