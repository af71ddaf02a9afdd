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
from pyspark.sql import types as T

from mc_ns_data_pipeline_spark.schemas import (
    LOT_DATA_SCHEMA,
    LOTS_SCHEMA,
    PROCESSING_HISTORY_SCHEMA,
)


def _ddl(table: str, schema: T.StructType) -> str:
    """DDL generated from the shared StructType contract — the schema in
    schemas.py is the single source of truth, so the warehouse tables
    can never drift from what pipelines/load.py emits (they had: the
    hand-written lot_data DDL was missing 4 of to_lot_data's columns).
    """
    cols = ",\n    ".join(
        f"{f.name} {f.dataType.simpleString().upper()}"
        for f in schema.fields
    )
    return (
        f"CREATE TABLE IF NOT EXISTS {{db}}.{table} (\n    {cols}\n)"
        " USING parquet"
    )


LOTS_DDL = _ddl("lots", LOTS_SCHEMA)
LOT_DATA_DDL = _ddl("lot_data", LOT_DATA_SCHEMA)
HISTORY_DDL = _ddl("file_processing_history", PROCESSING_HISTORY_SCHEMA)


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
