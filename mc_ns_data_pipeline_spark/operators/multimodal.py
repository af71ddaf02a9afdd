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


FRAME_FEATURE_DIM = 4

FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("ts_ms", T.LongType(), False),
    T.StructField("frame_features", T.ArrayType(T.FloatType()), True),
])


def _probe_video_stub(payload: bytes) -> int:
    """Deterministic fake container probe: frame count from byte length.

    Production swap-point: ffprobe/pyav stream inspection.
    """
    return (len(payload) % 241) + 1


def _decode_frame_stub(payload: bytes, idx: int) -> list[float]:
    """Deterministic fake frame decode: features from strided byte sums.

    Production swap-point: pyav seek + decode + model features.
    """
    return [
        float(sum(payload[(idx + i) :: FRAME_FEATURE_DIM]) % 1000) / 1000.0
        for i in range(FRAME_FEATURE_DIM)
    ]


def sample_frames(df: DataFrame, id_col: str = "doc_id",
                  every_n: int = 10, fps: float = 30.0) -> DataFrame:
    """Sample every Nth frame of video payloads; one row per kept frame.

    Arrow-batched mapInPandas: the batch yields a variable number of
    output rows per input row (frame explosion happens executor-side,
    never through the driver). Timestamps assume constant `fps` — the
    stub contract; a real decoder would read PTS per frame. Output rows
    carry fixed-length feature vectors so downstream similarity/dedup
    operators apply unchanged to frames.
    """
    from ..session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)
    ms_per_frame = 1000.0 / fps

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss, feats = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                for fi in range(0, _probe_video_stub(payload), every_n):
                    ids.append(int(doc_id))
                    idxs.append(fi)
                    tss.append(int(fi * ms_per_frame))
                    feats.append(_decode_frame_stub(payload, fi))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "ts_ms": pd.Series(tss, dtype="int64"),
                "frame_features": feats,
            })

    return df.mapInPandas(batches, FRAME_SCHEMA)
