"""Multimodal plumbing: stub codecs, batch shapes, silence semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.operators.multimodal import (
    AUDIO_FRAME,
    _decode_audio_stub,
    audio_summary,
)


def test_audio_stub_silence_counting():
    # one loud frame, one silent frame, one partial silent tail
    loud = bytes([200] * AUDIO_FRAME)
    quiet = bytes([10] * AUDIO_FRAME)
    tail = bytes([5] * 40)
    n, peak, total, n_frames, n_silent = _decode_audio_stub(
        loud + quiet + tail
    )
    assert n == 2 * AUDIO_FRAME + 40
    assert peak == 200
    assert total == 200 * AUDIO_FRAME + 10 * AUDIO_FRAME + 5 * 40
    assert n_frames == 3
    assert n_silent == 2  # quiet frame + tail; loud frame is voiced


def test_audio_stub_empty_payload():
    assert _decode_audio_stub(b"") == (0, 0, 0, 0, 0)


def test_audio_summary_schema_and_resample(spark):
    df = spark.createDataFrame(
        [(1, "a" * 16000), (2, "")], ["doc_id", "text"]
    )
    out = audio_summary(df).orderBy("doc_id").collect()
    assert [f.name for f in audio_summary(df).schema.fields] == [
        "doc_id", "media_type", "sample_rate", "n_bytes", "duration_ms",
        "peak_amp", "sum_amp", "n_frames", "n_silent", "target_n_samples",
    ]
    r1, r2 = out
    # 16000 one-byte samples at 16 kHz = exactly 1 s, resampled to 8000
    assert (r1.duration_ms, r1.target_n_samples) == (1000, 8000)
    assert r1.n_frames == 16000 // AUDIO_FRAME
    assert r1.n_silent == 0  # 'a' = 97 >= the silence mean of 64
    assert (r2.n_bytes, r2.n_frames, r2.target_n_samples) == (0, 0, 0)
