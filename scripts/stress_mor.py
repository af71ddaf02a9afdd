#!/usr/bin/env python
"""Stress measurement for merge-on-read vs copy-on-write deletes
(sinks/versioned.py delete_keys_mor vs delete_keys_snapshot) — the
numbers behind BASELINE.md's round-4 MOR rows.

Scenario (orders range-clustered into 64 pool files on o_orderkey):
a SCATTERED delete batch — every ~1000th key, so every file holds a
doomed key. This is COW's honest worst case (it must rewrite all 64
files at full row width) and exactly the shape MOR exists for (one
tiny equality-delete file, physical rewrite deferred to compaction).

Measured per scale:
  * COW delete wall + files rewritten,
  * MOR delete wall + delete-file bytes,
  * read_current wall before the delete / after MOR (mask overhead) /
    after compact (mask applied + cleared),
  * compact wall (the deferred cost, paid once per maintenance cycle).

Usage: python scripts/stress_mor.py [STRESS_DIR] [WORK_DIR]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

STRESS = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_sf1"
WORK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stress_mor"


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    sys.path.insert(0, "/root/repo")
    from mc_ns_data_pipeline_spark.sinks import versioned as V

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
    doomed = orders.filter(F.col("o_orderkey") % 1000 == 0) \
                   .select("o_orderkey")
    n_doomed = doomed.count()
    print(f"orders rows={n} doomed_keys={n_doomed} (scattered)")

    base = orders.repartitionByRange(64, "o_orderkey") \
                 .sortWithinPartitions("o_orderkey")

    def read_wall(table):
        t0 = time.perf_counter()
        got = V.read_current(spark, table).count()
        return time.perf_counter() - t0, got

    # --- COW ---------------------------------------------------------
    t_cow = os.path.join(WORK, "cow")
    V.write_snapshot(base, t_cow, stats_cols=["o_orderkey"])
    r0, live0 = read_wall(t_cow)
    t0 = time.perf_counter()
    snap = V.delete_keys_snapshot(spark, t_cow, "o_orderkey", doomed)
    cow_wall = time.perf_counter() - t0
    man = V.read_manifest(t_cow, snap)
    print(f"COW delete: {cow_wall:.2f}s, reused {man['reused_files']}"
          f"/64 files, rows {man['rows']}")
    r1, live1 = read_wall(t_cow)
    print(f"  read: pre {r0:.2f}s ({live0}) post {r1:.2f}s ({live1})")

    # --- MOR ---------------------------------------------------------
    t_mor = os.path.join(WORK, "mor")
    V.write_snapshot(base, t_mor, stats_cols=["o_orderkey"])
    t0 = time.perf_counter()
    snap = V.delete_keys_mor(spark, t_mor, "o_orderkey", doomed)
    mor_wall = time.perf_counter() - t0
    man = V.read_manifest(t_mor, snap)
    del_bytes = sum(
        os.path.getsize(os.path.join(t_mor, "data", d["file"]))
        for d in man["delete_files"])
    print(f"MOR delete: {mor_wall:.2f}s, {len(man['delete_files'])} "
          f"delete file(s) totalling {del_bytes} bytes, 64/64 data "
          f"files untouched, rows {man['rows']}")
    r2, live2 = read_wall(t_mor)
    print(f"  masked read: {r2:.2f}s ({live2}) — overhead vs pre "
          f"{r2 - r0:+.2f}s")
    t0 = time.perf_counter()
    V.compact_snapshot(spark, t_mor, sort_col="o_orderkey",
                       target_files=64)
    compact_wall = time.perf_counter() - t0
    r3, live3 = read_wall(t_mor)
    print(f"  compact (applies+clears masks): {compact_wall:.2f}s; "
          f"post-compact read {r3:.2f}s ({live3})")
    assert live1 == live2 == live3 == n - n_doomed

    print(f"SUMMARY scale={n}: cow={cow_wall:.2f}s "
          f"mor={mor_wall:.2f}s ({cow_wall / mor_wall:.1f}x) "
          f"mask_read_overhead={r2 - r0:+.2f}s "
          f"compact={compact_wall:.2f}s")

    # --- MOR upsert vs COW merge on the SCATTERED batch (the measured
    # COW worst case: every range file holds an updated key, 0 reused)
    batch = (
        orders.filter(F.col("o_orderkey") % 100 == 0)
        .withColumn("o_orderstatus", F.lit("U"))
    )
    print(f"scattered update batch: {batch.count()} rows")
    t_cm = os.path.join(WORK, "cow_merge")
    V.write_snapshot(base, t_cm, stats_cols=["o_orderkey"])
    t0 = time.perf_counter()
    snap = V.merge_snapshot(spark, batch, t_cm, "o_orderkey")
    cowm = time.perf_counter() - t0
    reused = V.read_manifest(t_cm, snap)["reused_files"]
    t_mm = os.path.join(WORK, "mor_merge")
    V.write_snapshot(base, t_mm, stats_cols=["o_orderkey"])
    t0 = time.perf_counter()
    snap = V.merge_snapshot_mor(spark, batch, t_mm, "o_orderkey")
    morm = time.perf_counter() - t0
    man = V.read_manifest(t_mm, snap)
    r4, live4 = read_wall(t_mm)
    print(f"MERGE SUMMARY scale={n}: cow_merge={cowm:.2f}s "
          f"(reused {reused}/64) mor_merge={morm:.2f}s "
          f"({cowm / morm:.1f}x, {man['reused_files']}/64 reused + "
          f"{len(man['new_files'])} batch files) "
          f"masked_read={r4:.2f}s rows={man['rows']}")


if __name__ == "__main__":
    main()
