"""File sinks — SURVEY.md §2.2 K1, K2, K11.

The reference wrote one CSV per lot with the lot number encoded in the
filename (bulk_fetch.py:90-91) — the filename-as-key convention becomes
a real partition column, which buys partition pruning on read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.functions.scalar import sanitize_commas


def write_per_lot(df: DataFrame, out_dir: str,
                  lot_col: str = "Lot Number") -> None:
    """K1: per-lot partitioned CSV (header on, one dir per lot).

    `partitionBy` routes rows by key inside the writing stage — no
    driver loop, no shuffle beyond what the upstream plan already did.
    """
    (
        df.withColumn("lot_number", F.col(lot_col))
        .write.mode("overwrite")
        .option("header", True)
        .partitionBy("lot_number")
        .csv(out_dir)
    )


def write_window_ids(df: DataFrame, out_dir: str, start_epoch: int,
                     end_epoch: int) -> None:
    """K2: record-IDs audit for a window, partitioned by window bounds."""
    (
        df.withColumn("start_epoch", F.lit(start_epoch))
        .withColumn("end_epoch", F.lit(end_epoch))
        .write.mode("append")
        .partitionBy("start_epoch", "end_epoch")
        .parquet(out_dir)
    )


def write_report(sections: list[DataFrame], out_dir: str) -> None:
    """K11: report sink — each section CSV-safe (commas -> ';',
    reference reporting.py:28-42) written under its own subdir."""
    for i, df in enumerate(sections):
        safe = df.select(*[
            sanitize_commas(F.col(c)).alias(c) for c in df.columns
        ])
        safe.coalesce(1).write.mode("overwrite").option("header", True).csv(
            f"{out_dir}/section_{i}"
        )
