"""Multimodal (binary) column plumbing for training-data pipelines.

Media payloads (image/audio/video) are opaque `binary` columns with typed
metadata, processed in Arrow batches via mapInPandas. The actual codecs are
NOT available in this environment, so decode is stubbed behind
`decode_image` (deterministic fake) / NotImplementedError — the Spark-side
plumbing (schema, batching, partitioning, UDF signature) is real and
tested. The reference's analog is the per-page rendered image next to its
OCR text (file_analysis_service.py:566-583, S4).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha256", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("format", StringType(), True),
    ]
)

REAL_CODECS_AVAILABLE = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    REAL_CODECS_AVAILABLE = True
except Exception:
    pass


def decode_image(data: bytes) -> tuple[int, int, str]:
    """STUB: deterministic fake decode. With real codecs this would be
    PIL.Image.open(io.BytesIO(data)).size; here width/height derive from the
    payload hash so tests are stable. Raises when asked for real decoding."""
    if REAL_CODECS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("wire PIL decode here when codecs exist")
    h = hashlib.sha256(data).digest()
    return (64 + h[0] % 192, 64 + h[1] % 192, "fakepng")


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a binary media column (here: utf-8 bytes of the text standing
    in for an encoded image — a real corpus reads `binaryFile` sources)."""
    return df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").cast(BinaryType()).alias("payload"),
    )


def extract_media_metadata(binary_df: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction: byte length, sha256, stub decode.
    Arrow moves the bytes in batches; no per-row Python UDF."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_image(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(b)) for b in pdf["payload"]],
                    "sha256": [hashlib.sha256(bytes(b)).hexdigest() for b in pdf["payload"]],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "format": [m[2] for m in metas],
                }
            )

    return binary_df.mapInPandas(run, schema=MEDIA_META_SCHEMA)


def frame_sample_plan(binary_df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: emits (doc_id, frame_idx) rows for a stub
    frame count derived from payload size — demonstrates fan-out shape
    (explode) without codecs."""
    n_frames = (F.length(F.col("payload")) / 100).cast("int") + 1
    return binary_df.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
