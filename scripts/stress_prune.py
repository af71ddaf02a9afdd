#!/usr/bin/env python
"""Scale-stress measurement for manifest column stats
(sinks/versioned.py): what file-level pruning buys at 10x/100x — the
numbers behind BASELINE.md's round-4 pruning stress rows.

Scenario (orders range-clustered into 64 pool files on o_orderkey,
stats-enabled table vs identical no-stats table):
  * publish overhead — stats ride the row-accounting scan, so the
    delta should be noise;
  * predicated read of a ~1-file key range — the stats table hands
    Spark only the surviving files; the no-stats table hands all 64
    and relies on footer row-group skipping alone;
  * COW merge of a clustered 1% batch — the locate step on the stats
    table opens only the files whose manifest range intersects the
    batch span; the no-stats table key-scans all 64.

The N_FILES knob simulates the object-store regime on local disk:
at 64 files, parquet footer skipping hides everything; at 512+ files
the per-file open/footer cost is the workload — the 100 TB shape,
where a table is ~100k files and every unnecessary open is a remote
round trip.

Usage: python scripts/stress_prune.py [STRESS_DIR] [TABLE_DIR] [N_FILES]
"""

from __future__ import annotations

import shutil
import sys
import time

STRESS = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_sf1"
WORK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stress_prune"
N_FILES = int(sys.argv[3]) if len(sys.argv) > 3 else 64


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
    lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    print(f"orders rows={n} keys=[{lo},{hi}]")

    base = orders.repartitionByRange(N_FILES, "o_orderkey") \
                 .sortWithinPartitions("o_orderkey")

    def timed(label, fn):
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        print(f"{label:48s} {dt:7.2f} s")
        return out, dt

    stats_tbl = f"{WORK}/with_stats"
    plain_tbl = f"{WORK}/no_stats"
    # Warm the write path first so the JVM-JIT cost of the first
    # parquet write doesn't masquerade as stats overhead.
    V.write_snapshot(orders.limit(1000), f"{WORK}/warmup")
    timed("publish %d clustered files, no stats" % N_FILES,
          lambda: V.write_snapshot(base, plain_tbl))
    timed("publish %d clustered files, stats on o_orderkey" % N_FILES,
          lambda: V.write_snapshot(base, stats_tbl,
                                   stats_cols=["o_orderkey"]))

    # A key range holding ~1.5% of ROWS (quantile-chosen — the
    # replicated keyspace is sparse, so arithmetic midpoints can land
    # in key gaps), about one clustered file wide.
    mid_lo, mid_hi = orders.approxQuantile(
        "o_orderkey", [0.500, 0.515], 0.0005)
    mid_lo, mid_hi = int(mid_lo), int(mid_hi)
    preds = [("o_orderkey", ">=", mid_lo),
             ("o_orderkey", "<=", mid_hi)]
    rep = V.prune_report(stats_tbl, V.current_snapshot(stats_tbl),
                         preds)
    print(f"prune_report: kept {len(rep['kept'])}/{rep['total']} "
          f"files, skipped {rep['skipped']}")

    def read_range(table):
        # decimal sum: order-independent exactness, the repo-wide
        # convention for cross-plan comparisons
        return (V.read_current(spark, table, predicates=preds)
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                     .alias("s")).first())

    got_s, t_s = timed("range read, manifest-pruned",
                       lambda: read_range(stats_tbl))
    got_p, t_p = timed("range read, all files to Spark",
                       lambda: read_range(plain_tbl))
    print(f"  pruned:   n={got_s['n']} s={got_s['s']}")
    print(f"  unpruned: n={got_p['n']} s={got_p['s']}")
    assert (got_s["n"], got_s["s"]) == (got_p["n"], got_p["s"]), \
        "pruned read diverged from full scan + filter!"
    print(f"  -> identical results ({got_s['n']} rows); "
          f"speedup {t_p / max(t_s, 1e-9):.2f}x")

    # Clustered 1% update batch: locate must open only the files whose
    # manifest range intersects the batch span.
    batch = (orders.filter((F.col("o_orderkey") >= mid_lo) &
                           (F.col("o_orderkey") <= mid_hi))
             .withColumn("o_totalprice", F.col("o_totalprice") + 1.0))
    batch.cache()
    print(f"merge batch rows: {batch.count()}")
    snap, _ = timed("COW merge, stats locate",
                    lambda: V.merge_snapshot(spark, batch, stats_tbl,
                                             "o_orderkey"))
    man = V.read_manifest(stats_tbl, snap)
    print(f"  -> files: {len(man['files']) - man['reused_files']} "
          f"rewritten / {man['reused_files']} reused; stats carried "
          f"for {len(man.get('stats') or {})} files")
    snap, _ = timed("COW merge, no-stats locate (scans all %d)" % N_FILES,
                    lambda: V.merge_snapshot(spark, batch, plain_tbl,
                                             "o_orderkey"))
    man = V.read_manifest(plain_tbl, snap)
    print(f"  -> files: {len(man['files']) - man['reused_files']} "
          f"rewritten / {man['reused_files']} reused")


if __name__ == "__main__":
    main()
