#!/usr/bin/env python
"""10x stress measurement for the manifest-versioned table sink
(sinks/versioned.py) — the write-amplification numbers behind
BASELINE.md's round-4 stress rows.

Scenario (orders at 10x = 1.5M rows, range-clustered into 64 pool
files on o_orderkey):
  * clustered 1% update batch (contiguous key range) — the COW merge
    should rewrite ~1-2 files and reuse the other ~62;
  * scattered 1% update batch (uniform keys) — the honest worst case:
    every file holds an updated key, COW degrades to the full rewrite
    it would have to be anyway;
  * merge_upsert (staged-swap full rewrite) on the same batches as
    the baseline;
  * append_snapshot (zero-rewrite) and compact_snapshot afterwards.

Usage: python scripts/stress_versioned.py [STRESS_DIR] [TABLE_DIR]
"""

from __future__ import annotations

import shutil
import sys
import time

STRESS = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_sf1"
WORK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stress_versioned"


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    sys.path.insert(0, "/root/repo")
    from mc_ns_data_pipeline_spark.sinks import upsert, versioned as V

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(WORK, ignore_errors=True)
    orders = (
        spark.read.option("mergeSchema", "false")
        .parquet(f"{STRESS}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice",
                "o_orderstatus")
    )
    n = orders.count()
    lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    batch_n = n // 100
    print(f"orders rows={n} keys=[{lo},{hi}] batch={batch_n}")

    base = orders.repartitionByRange(64, "o_orderkey") \
                 .sortWithinPartitions("o_orderkey")

    def timed(label, fn):
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        print(f"{label:42s} {dt:7.2f} s")
        return out, dt

    table = f"{WORK}/vtbl"
    timed("versioned init (64 clustered files)",
          lambda: V.write_snapshot(base, table))

    # Clustered batch: one contiguous key range of ~batch_n keys.
    clustered = orders.orderBy("o_orderkey").limit(batch_n) \
        .withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
    clustered.cache().count()
    snap, _ = timed("COW merge, clustered 1% batch",
                    lambda: V.merge_snapshot(spark, clustered, table,
                                             "o_orderkey"))
    man = V.read_manifest(table, snap)
    total = len(man["files"])
    print(f"  -> files: {total - man['reused_files']} rewritten / "
          f"{man['reused_files']} reused")

    # Scattered batch: every ~100th key — hits every range file.
    scattered = orders.filter(F.col("o_orderkey") % 100 == 1) \
        .limit(batch_n) \
        .withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
    scattered.cache().count()
    snap, _ = timed("COW merge, scattered 1% batch",
                    lambda: V.merge_snapshot(spark, scattered, table,
                                             "o_orderkey"))
    man = V.read_manifest(table, snap)
    print(f"  -> files: {len(man['files']) - man['reused_files']} "
          f"rewritten / {man['reused_files']} reused")

    # Staged-swap full-rewrite baseline on the same batches.
    swap = f"{WORK}/swap_tbl"
    timed("merge_upsert init (staged swap)",
          lambda: base.write.parquet(swap))
    timed("merge_upsert, clustered 1% batch",
          lambda: upsert.merge_upsert(spark, clustered, swap,
                                      "o_orderkey"))
    timed("merge_upsert, scattered 1% batch",
          lambda: upsert.merge_upsert(spark, scattered, swap,
                                      "o_orderkey"))

    # Zero-rewrite append + reader-safe compaction.
    timed("append_snapshot (1% new rows)",
          lambda: V.append_snapshot(
              clustered.withColumn(
                  "o_orderkey", F.col("o_orderkey") + 1_000_000_000),
              table))
    snap, _ = timed("compact_snapshot (back to 64 clustered)",
                    lambda: V.compact_snapshot(
                        spark, table, sort_col="o_orderkey",
                        target_files=64))
    print(f"  -> rows after lifecycle: "
          f"{V.read_manifest(table, snap)['rows']}")
    reaped, _ = timed("vacuum keep=1",
                      lambda: V.vacuum_snapshots(table, keep=1))
    print(f"  -> reaped {len(reaped['snapshots'])} snapshots, "
          f"{reaped['files']} pool files")


if __name__ == "__main__":
    main()
