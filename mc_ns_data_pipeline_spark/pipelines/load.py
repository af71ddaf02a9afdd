"""Load pipeline: 14-column exchange files -> warehouse tables.

Spark re-expression of the reference's FileProcessor
(file_processor.py:59-126): parse timestamps with coerce-to-NULL (F7),
compute the md5 change-detection hash (F6), upsert the `lots` dimension
(K6) and append/replace `lot_data` (K5/K7). The per-file transaction
becomes per-batch idempotent writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.functions.scalar import (
    md5_row_hash,
    parse_report_ts,
)
from mc_ns_data_pipeline_spark.sinks.upsert import (
    append,
    merge_upsert,
    replace_by_key,
)


def to_lot_data(exchange: DataFrame) -> DataFrame:
    """Exchange contract -> `lot_data` rows: typed timestamp + row hash.

    Hash contract (F6, SURVEY.md §7.3): md5 over
    label|description|value|time with NULLs coalesced to ''.
    """
    return exchange.select(
        F.col("Lot Number").alias("lot_number"),
        F.col("Master Template Name").alias("master_template_name"),
        F.col("Unit").alias("unit"),
        F.col("Operation").alias("operation"),
        F.col("Phase").alias("phase"),
        parse_report_ts(F.col("Data Capture Time")).alias("data_capture_time"),
        F.col("Structure Label").alias("structure_label"),
        F.col("Description").alias("description"),
        F.col("Input Data Value").alias("input_data_value"),
        F.col("Performed By").alias("performed_by"),
        F.col("Action Performed").alias("action_performed"),
        F.col("Captured Data Type").alias("captured_data_type"),
        md5_row_hash(
            F.col("Structure Label"),
            F.col("Description"),
            F.col("Input Data Value"),
            F.col("Data Capture Time"),
        ).alias("data_hash"),
        F.current_timestamp().alias("created_at"),
        F.current_timestamp().alias("updated_at"),
    )


def to_lots(exchange: DataFrame) -> DataFrame:
    """Exchange contract -> `lots` dimension rows (one per lot)."""
    return (
        exchange.groupBy(F.col("Lot Number").alias("lot_number"))
        .agg(
            F.min("Product ID").alias("product_id"),
            F.min("Master Template Name").alias("product_name"),
            F.min("Production Record Status").alias("status"),
        )
        .withColumn("first_loaded", F.current_timestamp())
        .withColumn("last_updated", F.current_timestamp())
    )


def load_exchange(spark: SparkSession, exchange: DataFrame,
                  warehouse_dir: str, incremental: bool = False) -> None:
    """The bulk/incremental load lifecycle (data_load.py:10-37).

    bulk: upsert lots + append lot_data (K6+K5)
    incremental: upsert lots + per-lot replace of lot_data (K6+K7)
    """
    merge_upsert(spark, to_lots(exchange), f"{warehouse_dir}/lots", "lot_number")
    rows = to_lot_data(exchange)
    if incremental:
        replace_by_key(rows, f"{warehouse_dir}/lot_data", "lot_number")
    else:
        append(rows, f"{warehouse_dir}/lot_data")
