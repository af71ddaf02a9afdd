#!/usr/bin/env python
"""Scale-stress for per-file equality blooms (sinks/versioned.py):
the point-lookup pruning numbers behind BASELINE.md's round-4 rows.

Scenario: orders UNCLUSTERED (hash-scattered across 64 files — every
file's [min, max] spans the keyspace, so range stats can prune
nothing), bloom on o_orderkey:
  * publish overhead of the bloom-building pass (one Arrow-batched
    applyInPandas over the commit's own files);
  * point lookups of present keys: how many files the bloom keeps
    (the true file + false positives) vs the 64 a stats-only table
    must scan;
  * absent-key lookups: files kept (pure FP rate);
  * wall time pruned vs unpruned, results asserted identical.

Usage: python scripts/stress_bloom.py [STRESS_DIR] [TABLE_DIR]
"""

from __future__ import annotations

import shutil
import sys
import time

STRESS = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_sf1"
WORK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stress_bloom"


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
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    n = orders.count()
    print(f"orders rows={n} (~{n // 64} rows/file unclustered)")

    def timed(label, fn):
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        print(f"{label:52s} {dt:7.2f} s")
        return out, dt

    base = orders.repartition(64)  # hash-scattered: worst case for
    plain_tbl = f"{WORK}/plain"    # min/max, the bloom's home turf
    bloom_tbl = f"{WORK}/bloom"
    V.write_snapshot(orders.limit(1000), f"{WORK}/warmup")  # JIT
    timed("publish 64 unclustered files, no metadata",
          lambda: V.write_snapshot(base, plain_tbl))
    timed("publish 64 unclustered files, bloom(o_orderkey)",
          lambda: V.write_snapshot(base, bloom_tbl,
                                   bloom_cols=["o_orderkey"]))
    snap = V.current_snapshot(bloom_tbl)

    # Present keys: quantile picks are guaranteed to exist.
    keys = [int(k) for k in
            orders.approxQuantile("o_orderkey",
                                  [0.1, 0.3, 0.5, 0.7, 0.9], 0.0)]
    kept = []
    for k in keys:
        rep = V.prune_report(bloom_tbl, snap, [("o_orderkey", "=", k)])
        kept.append(len(rep["kept"]))
        got = V.read_current(spark, bloom_tbl,
                             predicates=[("o_orderkey", "=", k)])
        full = V.read_current(spark, plain_tbl).filter(
            F.col("o_orderkey") == k)
        assert got.count() == full.count() >= 1, k
    print(f"present-key lookups: kept {kept} of 64 files "
          f"(1 true + FPs)")

    absent = [10**15 + i for i in range(20)]
    fp = [len(V.prune_report(bloom_tbl, snap,
                             [("o_orderkey", "=", a)])["kept"])
          for a in absent]
    print(f"absent-key lookups: kept {fp} of 64 (pure FP rate: "
          f"{sum(fp) / (64 * len(fp)):.3%})")

    def point(table, k):
        return (V.read_current(spark, table,
                               predicates=[("o_orderkey", "=", k)])
                .agg(F.count(F.lit(1)), F.sum("o_totalprice")).first())

    _, t_b = timed("point lookup, bloom-pruned",
                   lambda: point(bloom_tbl, keys[2]))
    _, t_p = timed("point lookup, all 64 files to Spark",
                   lambda: point(plain_tbl, keys[2]))
    print(f"  -> speedup {t_p / max(t_b, 1e-9):.2f}x")


if __name__ == "__main__":
    main()
