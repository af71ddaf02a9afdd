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
                  lot_col: str = "Lot Number",
                  mode: str = "overwrite") -> None:
    """K1: per-lot partitioned CSV (header on, one dir per lot).

    `partitionBy` routes rows by key inside the writing stage — no
    driver loop, no shuffle beyond what the upstream plan already did.
    The default overwrite is the single-shot batch contract; the CLI
    achieves exactly-once resume delivery by overwriting into
    batch-scoped subdirectories (a plain append would be at-least-once
    under a crash between delivery and checkpoint).
    """
    (
        df.withColumn("lot_number", F.col(lot_col))
        .write.mode(mode)
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


def archive_processed(src_path: str, processed_dir: str, archive_root: str,
                      *, delete_original: bool = False,
                      now: "datetime | None" = None) -> tuple[str, str]:
    """K12: post-batch archival bookkeeping (file_utils.py:19-45).

    Copy the processed file into `processed_dir`, copy a timestamped
    duplicate into a dated archive directory (`archive_root/YYYY-MM-DD/
    name.HHMMSS.ext`), and optionally delete the original (the
    reference's incremental mode). Driver-side filesystem bookkeeping,
    not a relational op — in production this runs inside foreachBatch.
    Returns (processed_path, archive_path).
    """
    import os
    import shutil
    from datetime import datetime

    ts = now or datetime.now()
    os.makedirs(processed_dir, exist_ok=True)
    dated = os.path.join(archive_root, ts.strftime("%Y-%m-%d"))
    os.makedirs(dated, exist_ok=True)
    name = os.path.basename(src_path)
    stem, ext = os.path.splitext(name)
    processed_path = os.path.join(processed_dir, name)
    archive_path = os.path.join(
        dated, f"{stem}.{ts.strftime('%H%M%S')}{ext}"
    )
    shutil.copy2(src_path, processed_path)
    shutil.copy2(src_path, archive_path)
    if delete_original:
        os.remove(src_path)
    return processed_path, archive_path


EXPORT_FORMATS = ("parquet", "orc", "json", "csv")


def export_table(df: DataFrame, path: str, fmt: str = "parquet",
                 compression: str | None = None) -> None:
    """Format-agnostic table export: parquet, ORC, JSON-lines, or CSV.

    The delivery-format escape hatch next to `layout.write_shards`
    (which owns the manifest/sharding contract): downstream consumers
    that require ORC (Hive/Trino estates) or JSONL (tokenizer/training
    loaders) get the same DataFrame out in their format. Columnar
    formats default to snappy/zstd-class codecs chosen by Spark; CSV
    and JSON write with a header/UTF-8 per Spark defaults.
    """
    if fmt not in EXPORT_FORMATS:
        raise ValueError(
            f"unsupported export format {fmt!r}; one of {EXPORT_FORMATS}"
        )
    w = df.write.mode("overwrite").format(fmt)
    if compression:
        w = w.option("compression", compression)
    if fmt == "csv":
        w = w.option("header", "true")
    w.save(path)


def read_export(spark, path: str, fmt: str = "parquet",
                schema=None) -> DataFrame:
    """Read back an `export_table` directory (schema required for CSV
    and JSON round-trip fidelity — text formats do not self-describe)."""
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true")
    return r.load(path)
