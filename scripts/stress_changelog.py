#!/usr/bin/env python
"""Scale-stress for incremental consumption on versioned tables
(sinks/versioned.py): the BASELINE.md rows proving the changelog
claim — a consumer catching up from snapshot N pays for the NEW rows,
never the table.

Scenario (orders at 100x = 15M rows, 64 clustered pool files):
  * append a 1% batch, then read_appended_since(base) — cost should
    track the 150k appended rows;
  * read_current (the full 15M-row scan a changelog-less consumer
    would pay) on the same aggregate;
  * changes_between(base, current) — the keyed-diff fallback's one
    key-shuffle join of both snapshots, the honest price when history
    is not append-only.

Usage: python scripts/stress_changelog.py [STRESS_DIR] [TABLE_DIR]
"""

from __future__ import annotations

import shutil
import sys
import time

STRESS = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_sf10"
WORK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stress_changelog"


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
    print(f"orders rows={n}")

    def timed(label, fn):
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        print(f"{label:52s} {dt:7.2f} s")
        return out, dt

    table = f"{WORK}/vtbl"
    base = orders.repartitionByRange(64, "o_orderkey") \
                 .sortWithinPartitions("o_orderkey")
    s0, _ = timed(f"init 64 clustered files ({n} rows)",
                  lambda: V.write_snapshot(base, table))

    batch = (orders.limit(n // 100)
             .withColumn("o_orderkey",
                         F.col("o_orderkey") + 100_000_000_000))
    batch.cache().count()
    timed(f"append_snapshot (1 pct = {n // 100_000}k rows)",
          lambda: V.append_snapshot(batch, table))

    def agg_count(df):
        # count + a real column sum: a bare count() answers from
        # parquet footers alone and would flatter the full scan
        r = df.agg(F.count(F.lit(1)).alias("n"),
                   F.sum("o_totalprice").alias("s")).first()
        return r["n"]

    got_inc, t_inc = timed(
        "read_appended_since(base): changelog catch-up",
        lambda: agg_count(V.read_appended_since(spark, table, s0)))
    got_full, t_full = timed(
        "read_current: the full-scan alternative",
        lambda: agg_count(V.read_current(spark, table)))
    print(f"  -> changelog rows={got_inc} (expect {n // 100}); "
          f"full={got_full}; catch-up is {t_full / max(t_inc, 1e-9):.1f}x "
          "cheaper")

    s1 = V.current_snapshot(table)
    got_cdc, t_cdc = timed(
        "changes_between(base, current): keyed-diff fallback",
        lambda: (V.changes_between(spark, table, s0, s1, "o_orderkey")
                 .groupBy("change_type").count().collect()))
    print(f"  -> CDC classes: {sorted((r[0], r[1]) for r in got_cdc)}")


if __name__ == "__main__":
    main()
