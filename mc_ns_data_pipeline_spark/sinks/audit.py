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


def recent_report(df: DataFrame, ts_col: str = "processed_at",
                  as_of: F.Column | None = None, days: int = 7) -> DataFrame:
    """P14+O2: the reference's recent-activity report read
    (sql/queries.py:45-56: `WHERE processed_at > CURRENT_TIMESTAMP -
    INTERVAL '7 days' ORDER BY processed_at DESC`).

    `as_of` defaults to current_timestamp() for reference parity; pass
    a derived/literal timestamp to make the window reproducible (the
    oracle-checked q16 pins as_of = max(ts)). Scale: the timestamp
    predicate is a plain pushdown filter (parquet min/max row-group
    pruning skips everything older than the window); the descending
    sort is the report contract and is bounded by the window's rows,
    not the table's.
    """
    anchor = as_of if as_of is not None else F.current_timestamp()
    cutoff = anchor - F.expr(f"INTERVAL {int(days)} DAYS")
    return df.filter(F.col(ts_col) > cutoff).orderBy(F.col(ts_col).desc())


def append_history(spark: SparkSession, path: str, record: dict) -> None:
    """File-processing history row (operations.py:40-46)."""
    df = spark.createDataFrame(
        [tuple(record.get(f.name) for f in PROCESSING_HISTORY_SCHEMA.fields)],
        PROCESSING_HISTORY_SCHEMA,
    )
    df.withColumn(
        "processed_at", F.coalesce(F.col("processed_at"), F.current_timestamp())
    ).write.mode("append").parquet(path)
