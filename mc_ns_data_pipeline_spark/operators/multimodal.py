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

    The stub is the ORACLE FIXTURE (byte arithmetic DuckDB can
    reproduce); `_decode_image_pil` is the real codec behind the same
    swap-point, used when `codec="pil"` and Pillow is importable.
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


def _decode_image_pil(payload: bytes) -> tuple[int, int, list[float]]:
    """Real image decode via Pillow (import-guarded: the library is
    optional and absent in some deploys/sandboxes — callers selecting
    codec="pil" get a clear ImportError, not a worker crash).

    Features: 8-dim gray-histogram mass (normalized eighths of the
    luminance range) — cheap, deterministic for a given decoder, and
    the same fixed-length contract as the stub so downstream operators
    (similarity, dedup over frames) apply unchanged.
    """
    import io

    try:
        from PIL import Image
    except ImportError as err:  # pragma: no cover - env-dependent
        raise ImportError(
            "codec='pil' needs Pillow (pip install Pillow); "
            "use codec='stub' for the deterministic test fixture"
        ) from err
    import numpy as np

    with Image.open(io.BytesIO(payload)) as img:
        width, height = img.size
        gray = np.asarray(img.convert("L"), dtype=np.uint8)
    hist, _ = np.histogram(gray, bins=IMAGE_FEATURE_DIM, range=(0, 256))
    total = max(int(hist.sum()), 1)
    return width, height, [float(h) / total for h in hist]


def _decode_image_bmp(payload: bytes) -> tuple[int, int, list[float]]:
    """Real image decode for uncompressed BMP (BI_RGB, 24/32-bit) —
    pure stdlib+numpy, always importable, so the real-codec dataflow
    is exercised in every environment (the Pillow path stays for
    compressed formats where available).

    Features match `_decode_image_pil`'s contract: 8-dim normalized
    gray-histogram mass over ITU-R 601 luminance
    (L = (299·R + 587·G + 114·B) / 1000, truncating division — the
    same integer formula Pillow's convert("L") documents).
    """
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"only uncompressed 24/32-bit BI_RGB supported "
            f"(got bpp={bpp}, compression={compression}); "
            "use codec='pil' for compressed formats"
        )
    top_down = height < 0
    height = abs(height)
    nchan = bpp // 8
    stride = (nchan * width + 3) // 4 * 4
    need = data_offset + stride * height
    if len(payload) < need:
        raise ValueError(f"truncated BMP: {len(payload)} < {need} bytes")
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=data_offset
    ).reshape(height, stride)
    px = raw[:, : nchan * width].reshape(height, width, nchan)
    if not top_down:
        px = px[::-1]
    b = px[:, :, 0].astype(np.uint32)
    g = px[:, :, 1].astype(np.uint32)
    r = px[:, :, 2].astype(np.uint32)
    gray = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
    hist, _ = np.histogram(gray, bins=IMAGE_FEATURE_DIM, range=(0, 256))
    total = max(int(hist.sum()), 1)
    return width, height, [float(h) / total for h in hist]


_IMAGE_CODECS = {
    "stub": _decode_image_stub,
    "pil": _decode_image_pil,
    "bmp": _decode_image_bmp,
}


def decode_media(df: DataFrame, id_col: str = "doc_id",
                 codec: str = "stub") -> DataFrame:
    """Arrow-batched decode + feature extraction over binary payloads.

    `codec` picks the executor-side decoder: "stub" (deterministic
    fixture, the oracle path), "bmp" (real stdlib decode, uncompressed
    BI_RGB) or "pil" (real Pillow decode, any format). The dataflow —
    schema, Arrow batching, partition memory bounds — is identical for
    all three; that is the point of the swap-point design.
    """
    from ..session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)
    if codec not in _IMAGE_CODECS:
        raise ValueError(
            f"unknown image codec {codec!r}; "
            f"valid: {sorted(_IMAGE_CODECS)}"
        )
    decode = _IMAGE_CODECS[codec]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decode(p) for p in pdf["payload"]]
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
    T.StructField("n_samples", T.LongType(), False),
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


def _decode_audio_wav(payload: bytes) -> tuple[int, int, int, int, int, int]:
    """REAL audio codec: RIFF/WAVE PCM parse, pure stdlib + numpy (no
    optional dependency — unlike the PIL image path this one always
    works). Returns (sample_rate, n_samples, peak, total, n_frames,
    n_silent) over per-sample amplitudes: |s - 128| for unsigned 8-bit,
    |s| for signed 16-bit, channel-averaged for multi-channel. Frames
    are 10 ms; a frame whose mean amplitude is below
    AUDIO_SILENCE_MEAN counts as silent (same VAD contract as the
    stub).
    """
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_format != 1:
        raise ValueError(f"only PCM supported, got format {audio_format}")
    if bits == 8:
        amp = np.abs(
            np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
        )
    elif bits == 16:
        usable = len(data) // 2 * 2
        amp = np.abs(
            np.frombuffer(data[:usable], dtype="<i2").astype(np.int64)
        )
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    if n_channels > 1:
        usable = len(amp) // n_channels * n_channels
        amp = (
            amp[:usable]
            .reshape(-1, n_channels)
            .sum(axis=1) // n_channels
        )
    n = int(len(amp))
    frame_len = max(sample_rate // 100, 1)  # 10 ms
    n_frames = (n + frame_len - 1) // frame_len
    n_silent = 0
    for s in range(0, n, frame_len):
        f = amp[s:s + frame_len]
        if int(f.sum()) < AUDIO_SILENCE_MEAN * len(f):
            n_silent += 1
    return (
        int(sample_rate), n, int(amp.max()) if n else 0, int(amp.sum()),
        n_frames, n_silent,
    )


def decode_audio(df: DataFrame, id_col: str = "doc_id",
                 codec: str = "stub") -> DataFrame:
    """Arrow-batched waveform summary over binary audio payloads.

    Same dataflow contract as decode_media: memory bounded by the
    Arrow batch size, payloads never pass through the driver, outputs
    are fixed-width scalars so downstream filters stay columnar.

    codec="stub" treats each byte as a PCM8 sample at the fake fixed
    rate (the oracle fixture); codec="wav" runs the real RIFF/WAVE
    parser (_decode_audio_wav) and reports the container's true sample
    rate. n_bytes stays the payload length in both paths (duration is
    derived from samples/rate, not bytes).
    """
    from ..session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)
    if codec not in ("stub", "wav"):
        raise ValueError(f"unknown audio codec {codec!r}")

    def decode(p: bytes) -> tuple[int, int, int, int, int, int]:
        if codec == "wav":
            return _decode_audio_wav(p)
        n, peak, total, n_frames, n_silent = _decode_audio_stub(p)
        return AUDIO_SAMPLE_RATE, n, peak, total, n_frames, n_silent

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "media_type": [m["content_type"] for m in pdf["media_meta"]],
                "sample_rate": pd.Series(
                    [d[0] for d in decoded], dtype="int32"
                ),
                "n_bytes": pd.Series(
                    [len(p) for p in pdf["payload"]], dtype="int64"
                ),
                "n_samples": pd.Series(
                    [d[1] for d in decoded], dtype="int64"
                ),
                "duration_ms": pd.Series(
                    [d[1] * 1000 // d[0] for d in decoded], dtype="int64"
                ),
                "peak_amp": pd.Series([d[2] for d in decoded], dtype="int32"),
                "sum_amp": pd.Series([d[3] for d in decoded], dtype="int64"),
                "n_frames": pd.Series([d[4] for d in decoded], dtype="int32"),
                "n_silent": pd.Series([d[5] for d in decoded], dtype="int32"),
            })

    return df.mapInPandas(batches, AUDIO_SCHEMA)


def resample_spec(df: DataFrame, target_rate: int = 8000) -> DataFrame:
    """Target sample count for rate conversion (pure exprs, cf.
    resize_spec): (n_samples * target) div source — the length contract
    a real polyphase resampler would honor. Integer `div`, not
    floor(double /): for a non-dyadic target/source ratio the floor of
    the correctly-rounded double quotient can disagree with an integer
    '//' by one, so the contract is pinned engine-exactly."""
    return df.select(
        "*",
        F.expr(
            f"(n_samples * CAST({int(target_rate)} AS BIGINT)) div sample_rate"
        ).alias("target_n_samples"),
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
