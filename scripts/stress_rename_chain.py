#!/usr/bin/env python
"""Rename-chain scale posture (round-10; x119's machinery).

The claim to verify: column RENAME is metadata-only and stays cheap —
a read through a k-long physical-name chain adds only k extra
schema fields and one coalesce to the scan plan (no data rewrite,
no shuffle), and COMPACTION clears the chain (full rewrite under
current names) restoring the zero-chain plan.

Usage: python scripts/stress_rename_chain.py [WORK] [N_RENAMES]
"""

from __future__ import annotations

import os
import shutil
import sys
import time


def main() -> None:
    sys.path.insert(0, "/root/repo")
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_rename"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mc_ns_data_pipeline_spark.sinks import versioned as V

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(work, ignore_errors=True)
    table = os.path.join(work, "tbl")

    V.write_snapshot(
        spark.range(1_000_000).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("double").alias("v0"),
            F.sha1(F.col("id").cast("string")).alias("pad")),
        table, stats_cols=["k", "v0"])

    def read_cost(col):
        t0 = time.perf_counter()
        got = (V.read_current(spark, table)
               .agg(F.sum(F.col(col)).alias("s")).first()["s"])
        return time.perf_counter() - t0, got

    base_t, base_sum = read_cost("v0")
    print(f"chain 0: read {base_t:5.2f} s (sum {base_sum})",
          flush=True)

    cur = "v0"
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        nxt = f"v{i}"
        V.rename_column(table, cur, nxt)
        cur = nxt
        # era mixing: every 10 renames, land a commit under the NEW
        # name so live files span many chain eras
        if i % 10 == 0:
            V.append_snapshot(
                spark.range(1000).select(
                    F.col("id").alias("k"),
                    F.lit(0.0).alias(cur),
                    F.lit("x").alias("pad")), table)
    print(f"{n} renames (+{n // 10} era appends): "
          f"{time.perf_counter() - t0:5.2f} s total "
          f"({(time.perf_counter() - t0) / n * 1000:5.1f} ms/rename, "
          "metadata-only)", flush=True)

    t_long, s_long = read_cost(cur)
    print(f"chain {n}: read {t_long:5.2f} s (sum {s_long}) — "
          "every era coalesced under the current name", flush=True)

    t0 = time.perf_counter()
    V.compact_snapshot(spark, table, target_files=8)
    t_comp = time.perf_counter() - t0
    t_after, s_after = read_cost(cur)
    man = V._read_core(table, V.current_snapshot(table))
    assert not man.get("renames"), "compaction must clear the chain"
    assert not man.get("retired"), "compaction must clear the fence"
    print(f"compaction {t_comp:5.2f} s clears chain+fence; "
          f"post-compaction read {t_after:5.2f} s "
          f"(sum {s_after})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
