"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as `binary` columns with a struct of metadata;
decode / feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` stages. The Spark-side plumbing (schemas, batch iteration,
partition sizing) is real and tested; the actual media decode is stubbed
behind `_decode_image_stub` (codec libraries are not in this
environment) — swap the stub for PIL/ffmpeg calls in production, the
dataflow does not change.

Scale notes: mapInPandas streams Arrow batches, so memory is bounded by
`spark.sql.execution.arrow.maxRecordsPerBatch` regardless of partition
size; binary payloads never pass through the driver; feature arrays are
fixed-length so downstream joins/aggregations stay columnar.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_FEATURE_DIM = 8

DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("features", T.ArrayType(T.FloatType()), True),
])


def attach_binary_payload(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic fake binary payload + metadata struct.

    Stands in for reading real image bytes; keeps the downstream
    plumbing (binary column + metadata struct) identical to production.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit("image/fake").alias("content_type"),
        F.length(payload).alias("content_length"),
    )
    return df.select(
        F.col(id_col), payload.alias("payload"), meta.alias("media_meta")
    )


def _decode_image_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decode: derives dims/features from the bytes.

    Production swap-point: replace with PIL.Image.open + model features.
    Raising NotImplementedError here would also be acceptable; a
    deterministic fake lets the plumbing be integration-tested.
    """
    n = len(payload)
    width = (n % 97) + 1
    height = (n % 31) + 1
    # 8 deterministic pseudo-features from byte sums over strides
    feats = [
        float(sum(payload[i::IMAGE_FEATURE_DIM]) % 1000) / 1000.0
        for i in range(IMAGE_FEATURE_DIM)
    ]
    return width, height, feats


def decode_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode + feature extraction over binary payloads."""
    from ..session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_decode_image_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "media_type": [m["content_type"] for m in pdf["media_meta"]],
                "width": pd.Series([d[0] for d in decoded], dtype="int32"),
                "height": pd.Series([d[1] for d in decoded], dtype="int32"),
                "n_bytes": pd.Series(
                    [len(p) for p in pdf["payload"]], dtype="int64"
                ),
                "features": [d[2] for d in decoded],
            })

    return df.mapInPandas(batches, DECODED_SCHEMA)


def resize_spec(df: DataFrame, max_side: int = 64) -> DataFrame:
    """Compute target resize dims preserving aspect ratio (pure exprs)."""
    scale = F.least(
        F.lit(float(max_side)) / F.col("width"),
        F.lit(float(max_side)) / F.col("height"),
        F.lit(1.0),
    )
    return df.select(
        "*",
        F.ceil(F.col("width") * scale).cast("int").alias("target_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("target_height"),
    )


def multimodal_features(df: DataFrame) -> DataFrame:
    """End-to-end: attach payload -> decode -> resize spec."""
    return resize_spec(decode_media(attach_binary_payload(df)))
