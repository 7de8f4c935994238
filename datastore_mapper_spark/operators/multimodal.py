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
    ArrayType,
    BinaryType,
    FloatType,
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


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FRAME_BYTES = 256  # fake fixed-size frame for the deterministic codec


def resize_media(
    media_df: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Resize step (STUBBED codec): a real implementation decodes,
    resamples, re-encodes inside the same mapInPandas batch loop; the
    deterministic stand-in truncates/cycles the byte stream to
    width*height bytes so tests can assert exact output sizes.  The
    Spark plumbing — Arrow batching, schema contract, no shuffle — is
    the real thing."""
    if not fake:
        raise NotImplementedError("image codec not available; fake=True only")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in it:
            resized = pdf["payload"].map(
                lambda b: bytes((b * (target // max(len(b), 1) + 1))[:target])
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "width": width,
                    "height": height,
                }
            )

    return media_df.mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(
    media_df: DataFrame, every_n: int = 2, frame_bytes: int = FRAME_BYTES
) -> DataFrame:
    """Frame sampling (flatMap shape): split the payload into fixed
    ``frame_bytes`` frames, keep every ``every_n``-th.  One input row
    fans out to many frame rows INSIDE the pandas batch — no explode
    shuffle, partition-preserving; at 100 TB this is why frame
    sampling runs as mapInPandas, not as array explode."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nos, frames = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = (len(blob) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    nos.append(i)
                    frames.append(bytes(blob[i * frame_bytes:(i + 1) * frame_bytes]))
            yield pd.DataFrame({"doc_id": ids, "frame_no": nos, "frame": frames})

    return media_df.mapInPandas(batches, FRAME_SCHEMA)


def extract_features(media_df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature extraction (STUBBED model): byte-value histogram,
    L1-normalized, as ``array<float>`` — deterministic, so tests can
    assert values.  A real encoder swaps the histogram for a model
    forward pass; the output column type is exactly the ``embeddings``
    table's, so results feed the ANN/near-dup operators unchanged."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(
                lambda b: _byte_histogram(b, dim)
            )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return media_df.mapInPandas(batches, FEATURE_SCHEMA)


def _byte_histogram(blob: bytes, dim: int) -> list[float]:
    counts = [0] * dim
    for byte in blob:
        counts[byte % dim] += 1
    total = max(sum(counts), 1)
    return [float(c) / total for c in counts]
