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


AUDIO_SAMPLE_RATE = 16000  # fake PCM8 contract: 1 byte = 1 sample
AUDIO_FRAME = 160          # 10 ms frames at 16 kHz
AUDIO_SILENCE_MEAN = 64    # frame mean amplitude below this = silence

AUDIO_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), True),
    T.StructField("sample_rate", T.IntegerType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("duration_ms", T.LongType(), False),
    T.StructField("peak_amp", T.IntegerType(), False),
    T.StructField("sum_amp", T.LongType(), False),
    T.StructField("n_frames", T.IntegerType(), False),
    T.StructField("n_silent", T.IntegerType(), False),
])


def attach_audio_payload(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake audio payload + metadata struct (see
    attach_binary_payload): 1 byte = 1 PCM8 sample at 16 kHz."""
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit("audio/fake").alias("content_type"),
        F.length(payload).alias("content_length"),
        F.lit(AUDIO_SAMPLE_RATE).alias("sample_rate"),
    )
    return df.select(
        F.col(id_col), payload.alias("payload"), meta.alias("media_meta")
    )


def _decode_audio_stub(payload: bytes) -> tuple[int, int, int, int, int]:
    """Deterministic fake waveform analysis: integer frame energies.

    Production swap-point: soundfile/librosa decode + real VAD. The
    stub treats each byte as one unsigned sample and computes the
    voice-activity summary a quality filter needs — peak, total
    amplitude, and how many 10 ms frames fall below the silence
    threshold. All-integer arithmetic so the DuckDB oracle reproduces
    it byte-for-byte.
    """
    n = len(payload)
    peak = max(payload) if n else 0
    total = sum(payload)
    n_frames = (n + AUDIO_FRAME - 1) // AUDIO_FRAME
    n_silent = 0
    for s in range(0, n, AUDIO_FRAME):
        frame = payload[s:s + AUDIO_FRAME]
        if sum(frame) < AUDIO_SILENCE_MEAN * len(frame):
            n_silent += 1
    return n, peak, total, n_frames, n_silent


def decode_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched waveform summary over binary audio payloads.

    Same dataflow contract as decode_media: memory bounded by the
    Arrow batch size, payloads never pass through the driver, outputs
    are fixed-width scalars so downstream filters stay columnar.
    """
    from ..session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_decode_audio_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "media_type": [m["content_type"] for m in pdf["media_meta"]],
                "sample_rate": pd.Series(
                    [AUDIO_SAMPLE_RATE] * len(pdf), dtype="int32"
                ),
                "n_bytes": pd.Series([d[0] for d in decoded], dtype="int64"),
                "duration_ms": pd.Series(
                    [d[0] * 1000 // AUDIO_SAMPLE_RATE for d in decoded],
                    dtype="int64",
                ),
                "peak_amp": pd.Series([d[1] for d in decoded], dtype="int32"),
                "sum_amp": pd.Series([d[2] for d in decoded], dtype="int64"),
                "n_frames": pd.Series([d[3] for d in decoded], dtype="int32"),
                "n_silent": pd.Series([d[4] for d in decoded], dtype="int32"),
            })

    return df.mapInPandas(batches, AUDIO_SCHEMA)


def resample_spec(df: DataFrame, target_rate: int = 8000) -> DataFrame:
    """Target sample count for rate conversion (pure exprs, cf.
    resize_spec): floor(n_bytes * target / source) — the length
    contract a real polyphase resampler would honor."""
    return df.select(
        "*",
        F.floor(
            F.col("n_bytes") * F.lit(target_rate) / F.col("sample_rate")
        ).cast("long").alias("target_n_samples"),
    )


def audio_summary(df: DataFrame) -> DataFrame:
    """End-to-end audio path: attach payload -> decode -> resample spec."""
    return resample_spec(decode_audio(attach_audio_payload(df)))


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
