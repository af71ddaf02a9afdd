"""Audit sinks — SURVEY.md §2.2 K4 + processing history.

The reference rewrote the WHOLE status CSV per processed record
(status_tracker.py:43-55 — O(n^2) write amplification); here status rows
append to a partitioned parquet audit table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.schemas import (
    PROCESSING_HISTORY_SCHEMA,
    STATUS_LOG_SCHEMA,
)


def append_status(spark: SparkSession, path: str, records: list[dict]) -> None:
    """K4: append status rows (id, lot, status, reason)."""
    df = spark.createDataFrame(
        [tuple(r.get(f.name) for f in STATUS_LOG_SCHEMA.fields) for r in records],
        STATUS_LOG_SCHEMA,
    )
    df.write.mode("append").parquet(path)


def append_history(spark: SparkSession, path: str, record: dict) -> None:
    """File-processing history row (operations.py:40-46)."""
    df = spark.createDataFrame(
        [tuple(record.get(f.name) for f in PROCESSING_HISTORY_SCHEMA.fields)],
        PROCESSING_HISTORY_SCHEMA,
    )
    df.withColumn(
        "processed_at", F.coalesce(F.col("processed_at"), F.current_timestamp())
    ).write.mode("append").parquet(path)
