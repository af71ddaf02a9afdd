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
    """K8: truncate-reload (inventory_data.py:83,106).

    Single-writer enforced like the other mutating sinks: two
    concurrent overwrites race the `_temporary` staging directory and
    the delete-then-commit window with no transaction around either.
    """
    from mc_ns_data_pipeline_spark.sinks.lease import table_lease

    with table_lease(path, owner="full_refresh"):
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

    from mc_ns_data_pipeline_spark.sinks.layout import (
        restore_interrupted_swap,
    )
    from mc_ns_data_pipeline_spark.sinks.lease import table_lease

    # The read-stage-swap cycle below is single-writer: a second merge
    # interleaving its read before this swap would base its output on
    # pre-merge state and silently drop these updates at ITS swap. The
    # lease turns that corruption into a fail-fast TableLockedError.
    with table_lease(path, owner=f"merge_upsert:{key}"):
        # A crash between the two renames below leaves the data only in
        # the __old backup; without this recovery the not-exists branch
        # would treat the next merge as a fresh table and silently drop
        # every pre-existing row.
        restore_interrupted_swap(path)
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
    are replaced; other partitions untouched.

    Single-writer enforced (sinks/lease): two concurrent replaces
    landing the same key partition race Spark's per-partition
    delete+write with no transaction around them."""
    from mc_ns_data_pipeline_spark.sinks.lease import table_lease

    with table_lease(path, owner=f"replace_by_key:{key}"):
        (
            updates.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(key)
            .parquet(path)
        )


def delete_keys_targeted(spark: SparkSession, path: str, key: str,
                         doomed: DataFrame) -> int:
    """Targeted row delete (right-to-be-forgotten): rewrite ONLY the
    parquet files that contain a doomed key; every other file is left
    byte-identical on disk.

    This is the copy-on-write delete a 100 TB table needs — a naive
    `read → anti-join → overwrite` rewrites the whole table to drop a
    handful of rows. Here the write amplification is bounded by the
    files actually touched:

    1. Locate: scan ONLY the key column (+ `input_file_name()`) with a
       broadcast semi join against the doomed keys — the scan prunes to
       one column, and on sorted/clustered layouts (sinks/layout) the
       footer min/max stats prune most files before they are read.
    2. Rewrite: re-read just the affected files, anti-join the doomed
       keys, write survivors to a staging dir.
    3. Swap: remove the affected files, move the staged files in. The
       swap is per-file (not atomic across files) — a table format with
       a transaction log (Delta/Iceberg) is the answer where readers
       race writers; the dataflow above is exactly its COW delete.

    Returns the number of files rewritten. The doomed key set is
    assumed broadcast-small (a deletion request batch); a huge doomed
    set degrades gracefully: every file matches and this becomes the
    full rewrite it would have to be anyway.
    """
    from mc_ns_data_pipeline_spark.sinks.lease import table_lease

    doomed_keys = doomed.select(key).distinct()
    with table_lease(path, owner=f"delete_keys:{key}"):
        return _delete_keys_locked(spark, path, key, doomed_keys)


def _delete_keys_locked(spark, path, key, doomed_keys) -> int:
    import shutil
    import uuid

    affected = [
        r["_file"]
        for r in (
            spark.read.parquet(path)
            .select(key, F.input_file_name().alias("_file"))
            .join(F.broadcast(doomed_keys), key, "left_semi")
            .select("_file")
            .distinct()
            .collect()
        )
    ]
    if not affected:
        return 0

    local = [f[len("file://"):] if f.startswith("file://") else f
             for f in affected]
    staging = f"{path}__delete_staging"
    survivors = (
        spark.read.parquet(*local)
        .join(F.broadcast(doomed_keys), key, "left_anti")
    )
    survivors.write.mode("overwrite").parquet(staging)

    for f in local:
        os.remove(f)
    tag = uuid.uuid4().hex[:8]
    for i, name in enumerate(sorted(os.listdir(staging))):
        if name.endswith(".parquet"):
            shutil.move(
                os.path.join(staging, name),
                os.path.join(path, f"part-del{tag}-{i:05d}.parquet"),
            )
    shutil.rmtree(staging)
    return len(local)
