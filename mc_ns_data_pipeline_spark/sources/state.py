"""State/audit readers — SURVEY.md §2.1 S5, S7-S9.

Checkpoints, status logs, and window logs are tiny state tables; the
batch pipelines read them with fixed schemas and empty-with-schema
fallbacks (the streaming pipeline replaces them with checkpoint offsets,
see streaming/incremental.py).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.schemas import (
    STATUS_LOG_SCHEMA,
    WINDOW_LOG_SCHEMA,
)

DEFAULT_CHECKPOINT = {"last_processed_id": -1, "timestamp": None}


def read_checkpoint(path: str) -> dict:
    """S7: JSON checkpoint with default -1 (checkpoint_manager.py:49-55)."""
    if not os.path.exists(path):
        return dict(DEFAULT_CHECKPOINT)
    with open(path) as fh:
        data = json.load(fh)
    return {
        "last_processed_id": int(data.get("last_processed_id", -1)),
        "timestamp": data.get("timestamp"),
    }


def write_checkpoint(path: str, last_processed_id: int,
                     timestamp: str) -> None:
    """K3: atomic checkpoint write (tmp + rename)."""
    tmp = f"{path}.tmp"
    with open(tmp, "w") as fh:
        json.dump(
            {"last_processed_id": last_processed_id, "timestamp": timestamp},
            fh,
        )
    os.replace(tmp, path)


def read_status_log(spark: SparkSession, path: str) -> DataFrame:
    """S8: status log CSV; empty-with-schema fallback
    (status_tracker.py:16-32)."""
    if not os.path.exists(path):
        return spark.createDataFrame([], STATUS_LOG_SCHEMA)
    return spark.read.csv(path, header=True, schema=STATUS_LOG_SCHEMA)


def read_window_log(spark: SparkSession, path: str) -> DataFrame:
    """S9 source: processed-window audit table."""
    if not os.path.exists(path):
        return spark.createDataFrame([], WINDOW_LOG_SCHEMA)
    return spark.read.csv(path, header=True, schema=WINDOW_LOG_SCHEMA)


def last_processed_epoch(spark: SparkSession, path: str,
                         first_run_epoch: int) -> int:
    """S9: max end_epoch, order-independent (the reference read the last
    row of the append-ordered CSV, incremental_fetch.py:134-137)."""
    log = read_window_log(spark, path)
    row = log.agg(F.max("end_epoch").alias("m")).first()
    return int(row["m"]) if row and row["m"] is not None else first_run_epoch
