#!/usr/bin/env python
"""Stress measurement for incrementally-maintained aggregate views
(sinks/matview.py) — the refresh-cost-vs-table-growth numbers behind
BASELINE.md's round-4 matview rows.

Scenario: a per-customer count/sum view over orders. Bootstrap the
view, then land a FIXED-size append (~15k rows at every scale) and
refresh. The claim under test: the incremental refresh cost tracks
the DELTA plus the VIEW (both constant here as the table grows),
while the full-recompute-and-republish alternative tracks the TABLE
(linear) — the same constant-vs-linear slope argument as the
changelog study, one level up the stack. (A delta that GROWS with the
table — e.g. a fixed 1% — makes both paths grow; the first version
of this script measured that and wrongly read it as a refresh
regression.)

Usage: python scripts/stress_matview.py [STRESS_DIR] [WORK_DIR]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

STRESS = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_sf1"
WORK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stress_matview"


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    sys.path.insert(0, "/root/repo")
    from mc_ns_data_pipeline_spark.sinks import matview as MV
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
        .select("o_orderkey", "o_custkey",
                F.col("o_totalprice").cast("decimal(18,4)")
                .alias("price"))
    )
    n = orders.count()
    source = os.path.join(WORK, "src")
    view = os.path.join(WORK, "mv")

    mod = max(100, n // 15_000)  # fixed ~15k-row delta at any scale
    base = orders.filter(F.col("o_orderkey") % mod != 0) \
                 .drop("o_orderkey")
    delta = orders.filter(F.col("o_orderkey") % mod == 0) \
                  .drop("o_orderkey")
    print(f"delta rows={delta.count()} (mod={mod})")
    V.write_snapshot(base.repartition(64), source)

    t0 = time.perf_counter()
    out = MV.refresh_aggregate_view(spark, source, view,
                                    ["o_custkey"], ["price"])
    boot_wall = time.perf_counter() - t0
    groups = V.read_manifest(view, V.current_snapshot(view))["rows"]
    print(f"bootstrap: {boot_wall:.2f}s mode={out['mode']} "
          f"groups={groups} source_rows={n}")

    V.append_snapshot(delta, source)
    t0 = time.perf_counter()
    out = MV.refresh_aggregate_view(spark, source, view,
                                    ["o_custkey"], ["price"])
    inc_wall = time.perf_counter() - t0
    print(f"incremental refresh (fixed ~15k-row append): "
          f"{inc_wall:.2f}s mode={out['mode']}")

    # The alternative a nightly pipeline pays: recompute from scratch
    # AND publish the result (the refresh path publishes too).
    alt = os.path.join(WORK, "mv_full")
    t0 = time.perf_counter()
    V.write_snapshot(
        V.read_current(spark, source)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.sum("price").alias("sum_price")),
        alt)
    full_wall = time.perf_counter() - t0
    print(f"full recompute + publish: {full_wall:.2f}s")

    print(f"SUMMARY rows={n}: bootstrap={boot_wall:.2f}s "
          f"increment={inc_wall:.2f}s full_agg={full_wall:.2f}s")


if __name__ == "__main__":
    main()
