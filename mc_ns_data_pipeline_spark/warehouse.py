"""Warehouse DDL + SQL-first enrichment — SURVEY.md §2.2 K9/K10.

The reference creates its PostgreSQL schema imperatively
(connection.py:40-53; sql/schema.py:6-56: CREATE TABLE IF NOT EXISTS x3
plus two B-tree indexes) and populates dashboard tables with
INSERT...SELECT statements that run entirely inside the database
(inventory_data.py:109-125; sales_data.py:106-137).

Spark-native shape: managed/external parquet tables registered in the
session catalog via `spark.sql` DDL — idempotent (IF NOT EXISTS), typed,
partitioned. Indexes have no Spark equivalent; partition columns +
parquet min/max file statistics serve the same pruning role (the
reference's `idx_lot_data_lot_number` becomes `PARTITIONED BY
(lot_number)` at write time). INSERT...SELECT stays literal SQL —
Catalyst plans it like any DataFrame, so the K10 enrichment runs
distributed instead of inside PostgreSQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

LOTS_DDL = """
CREATE TABLE IF NOT EXISTS {db}.lots (
    lot_number STRING,
    product_name STRING,
    product_id STRING,
    status STRING,
    created_at TIMESTAMP,
    last_updated TIMESTAMP
) USING parquet
"""

LOT_DATA_DDL = """
CREATE TABLE IF NOT EXISTS {db}.lot_data (
    lot_number STRING,
    master_template_name STRING,
    unit STRING,
    operation STRING,
    phase STRING,
    data_capture_time TIMESTAMP,
    structure_label STRING,
    description STRING,
    data_value STRING,
    performed_by STRING,
    data_hash STRING
) USING parquet
"""

HISTORY_DDL = """
CREATE TABLE IF NOT EXISTS {db}.file_processing_history (
    file_name STRING,
    lot_number STRING,
    process_type STRING,
    status STRING,
    error_message STRING,
    processed_at TIMESTAMP
) USING parquet
"""


def create_warehouse(spark: SparkSession, db: str = "warehouse") -> None:
    """K9: idempotent schema bootstrap (3 tables, like schema.py:6-51)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    for ddl in (LOTS_DDL, LOT_DATA_DDL, HISTORY_DDL):
        spark.sql(ddl.format(db=db))


def insert_select(spark: SparkSession, target: str, select_sql: str,
                  overwrite: bool = False) -> None:
    """K10: INSERT ... SELECT enrichment as literal SQL.

    `overwrite=True` maps the reference's full-refresh pattern (K8 DELETE
    then repopulate) onto one atomic INSERT OVERWRITE.
    """
    verb = "INSERT OVERWRITE TABLE" if overwrite else "INSERT INTO"
    spark.sql(f"{verb} {target} {select_sql}")


def table(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)
