#!/usr/bin/env python
"""Streaming table-source planning cost vs lineage length (round-9
"table as stream", streaming/table_source.py).

The 100 TB claim to verify: a catch-up micro-batch's cost is bounded
by NEW data, never by table size or history length — `partitions()`
walks only the in-range manifests (O(commits behind), metadata-only)
and ships one InputPartition per new pool file.

Builds a table with N_COMMITS tiny appends, drains once (bootstrap),
lands K more appends, then measures the catch-up drain and the
driver-side planning calls in isolation.

Usage: python scripts/stress_table_source.py [WORK] [N_COMMITS] [K]
"""

from __future__ import annotations

import os
import shutil
import sys
import time


def main() -> None:
    sys.path.insert(0, "/root/repo")
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_tsource"
    n_commits = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from pyspark.sql import SparkSession

    from mc_ns_data_pipeline_spark.sinks import versioned as V
    from mc_ns_data_pipeline_spark.streaming import table_source as TS

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(work, ignore_errors=True)
    table = os.path.join(work, "tbl")
    out, ckpt = os.path.join(work, "out"), os.path.join(work, "ckpt")

    t0 = time.perf_counter()
    V.write_snapshot(
        spark.createDataFrame([(0, "v0")], "k int, v string")
        .coalesce(1), table)
    for i in range(1, n_commits):
        V.append_snapshot(
            spark.createDataFrame([(i, f"v{i}")], "k int, v string")
            .coalesce(1), table)
    print(f"build {n_commits} commits: "
          f"{time.perf_counter() - t0:7.1f} s", flush=True)

    def drain():
        q = (TS.read_stream_table(spark, table, starting="genesis")
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    t0 = time.perf_counter()
    drain()
    print(f"bootstrap drain ({n_commits} files): "
          f"{time.perf_counter() - t0:7.2f} s", flush=True)
    mark = V.current_snapshot(table)
    for i in range(k):
        V.append_snapshot(
            spark.createDataFrame([(10_000 + i, "new")],
                                  "k int, v string").coalesce(1),
            table)

    # driver-side planning in isolation: the exact calls the source
    # makes per micro-batch
    schema = V.table_schema(table, V.current_snapshot(table))
    reader = TS.VersionedTableStreamReader(schema, {"table": table})
    t0 = time.perf_counter()
    latest = reader.latestOffset()
    t_latest = time.perf_counter() - t0
    t0 = time.perf_counter()
    parts = reader.partitions({"snapshot": mark}, latest)
    t_parts = time.perf_counter() - t0
    assert len(parts) == k, (len(parts), k)
    print(f"latestOffset: {t_latest * 1000:6.1f} ms; "
          f"partitions({k}-commit catch-up behind a {n_commits}-commit"
          f" history): {t_parts * 1000:6.1f} ms, {len(parts)} slices",
          flush=True)

    t0 = time.perf_counter()
    drain()
    dt = time.perf_counter() - t0
    rows = spark.read.parquet(out).count()
    assert rows == n_commits + k, (rows, n_commits + k)
    print(f"catch-up drain ({k} new files): {dt:7.2f} s "
          f"(bounded by new data, not the {n_commits}-commit history)",
          flush=True)

    # --- admission control (VERDICT r09 #3) ---------------------------
    # capped latestOffset: the bounding walk is O(commits behind),
    # metadata-only, memoized across triggers
    capped = TS.VersionedTableStreamReader(
        schema, {"table": table, "starting": "genesis",
                 "max_commits_per_trigger": "25"})
    capped.initialOffset()
    t0 = time.perf_counter()
    off1 = capped.latestOffset()  # cold: walks the full lineage
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    capped.latestOffset()  # warm: memoized cores
    t_warm = time.perf_counter() - t0
    print(f"capped latestOffset behind {n_commits + k} commits: "
          f"cold {t_cold * 1000:6.1f} ms, warm {t_warm * 1000:6.1f} ms"
          f" (offer = 25 commits)", flush=True)

    # capped genesis bootstrap under a continuous trigger: the whole
    # backlog drains as ceil(N/25) checkpointed batches, kill/resume
    # mid-drain preserves exactly-once
    total = n_commits + k
    out2, ckpt2 = os.path.join(work, "out2"), os.path.join(work,
                                                           "ckpt2")

    def capped_run(stop_after_rows=None, timeout_s=600):
        q = (TS.read_stream_table(spark, table, starting="genesis",
                                  max_commits_per_trigger=25,
                                  checkpoint=ckpt2)
             .writeStream.format("parquet").option("path", out2)
             .option("checkpointLocation", ckpt2)
             .trigger(processingTime="50 milliseconds").start())
        deadline = time.time() + timeout_s
        target = stop_after_rows or total
        while time.time() < deadline:
            try:
                n = spark.read.parquet(out2).count()
            except Exception:
                n = 0
            if n >= target:
                break
            time.sleep(0.3)
        q.stop()
        q.awaitTermination()
        return spark.read.parquet(out2).count()

    t0 = time.perf_counter()
    n_mid = capped_run(stop_after_rows=total // 2)  # kill mid-drain
    n_end = capped_run()                            # resume, finish
    dt = time.perf_counter() - t0
    batches = len([f for f in os.listdir(os.path.join(
        ckpt2, "commits")) if f.isdigit()])
    assert n_end == total, (n_end, total)
    import math
    print(f"capped genesis drain ({total} commits, cap 25, killed at "
          f"{n_mid} rows then resumed): {dt:7.2f} s, {batches} "
          f"batches (ceil = {math.ceil(total / 25)}), rows exact "
          f"{n_end}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
