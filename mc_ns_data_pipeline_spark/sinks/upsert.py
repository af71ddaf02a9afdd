"""Warehouse write semantics — SURVEY.md §2.2 K5-K8.

Parquet-table emulations of the reference's PostgreSQL operations:
  K5 append            -> mode("append")
  K6 upsert by PK      -> anti-join + union overwrite (MERGE emulation)
  K7 per-key replace   -> dynamic partition overwrite
  K8 full refresh      -> mode("overwrite")

With Delta/Iceberg on the classpath K6 becomes `MERGE INTO` and K7
`replaceWhere`; the call sites don't change. (Those jars aren't in this
image — see import-try in `merge_upsert`.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def append(df: DataFrame, path: str) -> None:
    """K5: batch append."""
    df.write.mode("append").parquet(path)


def full_refresh(df: DataFrame, path: str) -> None:
    """K8: truncate-reload (inventory_data.py:83,106)."""
    df.write.mode("overwrite").parquet(path)


def merge_upsert(spark: SparkSession, updates: DataFrame, path: str,
                 key: str) -> None:
    """K6: upsert by primary key (operations.py:14-28 SELECT-then-
    INSERT-or-UPDATE). Updated rows win; unmatched target rows survive.

    Parquet emulation: target-anti-updates ∪ updates, written to a
    staging dir then swapped into place by directory rename (metadata-
    only, no second data write, no window where the target is a
    half-written overwrite). Idempotent: applying the same batch twice
    yields identical state. On an object store without atomic rename
    the Delta MERGE path is the real answer — the probe below catches
    ONLY ImportError, so with Delta on the classpath a failing merge
    (or a non-Delta target dir) raises instead of silently reading the
    directory as parquet and ignoring the transaction log.
    """
    try:
        from delta.tables import DeltaTable  # type: ignore
    except ImportError:
        DeltaTable = None  # no Delta in this image -> parquet emulation

    if DeltaTable is not None:
        DeltaTable.forPath(spark, path).alias("t").merge(
            updates.alias("u"), f"t.{key} = u.{key}"
        ).whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
        return

    if not os.path.exists(path):
        updates.write.mode("overwrite").parquet(path)
        return
    target = spark.read.parquet(path)
    keys = updates.select(key).distinct()
    kept = target.join(F.broadcast(keys), key, "left_anti")
    merged = kept.unionByName(updates)
    staging = f"{path}__staging"
    merged.write.mode("overwrite").parquet(staging)

    import shutil

    backup = f"{path}__old"
    shutil.rmtree(backup, ignore_errors=True)
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)


def replace_by_key(updates: DataFrame, path: str, key: str) -> None:
    """K7: delete-then-insert per key (file_processor.py:95-102) as
    dynamic partition overwrite — only the keys present in `updates`
    are replaced; other partitions untouched."""
    (
        updates.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(key)
        .parquet(path)
    )
