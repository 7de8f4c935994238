"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side plumbing here is real and tested — schema contracts,
batch iteration, partition-preserving transforms.  The actual codec
step is STUBBED: the image/audio libraries are not in this container,
so :func:`decode_image_meta` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic arithmetic 'decoder'
stands in (the oracle-checkable path used by
``queries/llm_extra.multimodal_meta_extract``).

At 100 TB: binaries stay columnar (parquet BYTE_ARRAY) next to their
metadata; decode/resize/frame-sample run as mapInPandas over
size-bounded batches (``spark.sql.execution.arrow.maxRecordsPerBatch``
tuned so batch_bytes ≈ rows x avg_blob fits executor memory), and
outputs write back partitioned — never collected.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def _fake_decode(blob: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a codec: dimensions derived from the
    byte stream (reproducible in SQL for the oracle)."""
    width = len(blob) % 640
    height = (blob[0] if blob else 0) % 480
    return width, height


def decode_image_meta(blob: bytes, fake: bool = False) -> tuple[int, int]:
    """Decode (width, height) from an image blob.

    Real decoding requires an image library not present in this
    container — STUB: raises unless ``fake=True``.
    """
    if not fake:
        raise NotImplementedError(
            "image codec not available in this environment; pass fake=True "
            "for the deterministic stand-in"
        )
    return _fake_decode(blob)


def as_binary_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model documents as a media table: opaque binary payload + id."""
    return df.select(
        "doc_id", F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def extract_media_meta(media_df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas metadata extraction over the binary column.

    Arrow-batched: each pandas batch holds ``maxRecordsPerBatch`` rows;
    the transform is partition-preserving (no shuffle).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = pdf["payload"].map(lambda b: decode_image_meta(b, fake=fake))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                }
            )

    return media_df.mapInPandas(batches, MEDIA_META_SCHEMA)
