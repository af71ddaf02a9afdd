#!/usr/bin/env python
"""CDC-apply scale posture (round-10, VERDICT r09 #6).

The 100 TB claim to verify: applying a change feed to a replica costs
O(batch events) per micro-batch — delete files are kilobytes, upserts
land as new files plus one equality-delete mask, the replica is never
rewritten — and a capped drain applies a long backlog as bounded
batches with the replica readable (and consistent) between each.

Builds a source table, lands N_COMMITS interleaved append/upsert/
delete commits, then drains them onto a replica with
max_commits_per_trigger=CAP and verifies replica ≡ source.

Usage: python scripts/stress_cdc_apply.py [WORK] [N_COMMITS] [CAP]
"""

from __future__ import annotations

import os
import shutil
import sys
import time


def main() -> None:
    sys.path.insert(0, "/root/repo")
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_cdc"
    n_commits = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from pyspark.sql import SparkSession

    from mc_ns_data_pipeline_spark.sinks import versioned as V
    from mc_ns_data_pipeline_spark.streaming.incremental import (
        apply_change_batch,
    )
    from mc_ns_data_pipeline_spark.streaming.table_source import (
        read_stream_changes,
    )

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(work, ignore_errors=True)
    src = os.path.join(work, "src")
    rep = os.path.join(work, "rep")
    ckpt = os.path.join(work, "ckpt")

    def df(rows):
        return spark.createDataFrame(rows, "k int, v string") \
            .coalesce(1)

    t0 = time.perf_counter()
    V.write_snapshot(df([(i, "base") for i in range(500)]), src)
    mark = V.current_snapshot(src)
    V.write_snapshot(V.read_current(spark, src), rep)
    for i in range(n_commits):
        kind = i % 3
        if kind == 0:
            V.append_snapshot(df([(1000 + i, f"app{i}")]), src)
        elif kind == 1:
            V.merge_snapshot_mor(
                spark, df([(i % 500, f"up{i}")]), src, "k")
        else:
            V.delete_keys_mor(
                spark, src, "k", df([(i % 500, "")]).select("k"))
    print(f"build: {n_commits} interleaved commits in "
          f"{time.perf_counter() - t0:6.1f} s", flush=True)

    batch_times: list[float] = []

    def apply(b, bid):
        t = time.perf_counter()
        apply_change_batch(spark, b, rep, "k", f"stress-{bid}")
        if bid % 4 == 3:  # threshold-gated replica maintenance —
            V.optimize_table(spark, rep)  # the flatness lever
        batch_times.append(time.perf_counter() - t)

    t0 = time.perf_counter()
    q = (read_stream_changes(spark, src, starting=mark,
                             max_commits_per_trigger=cap,
                             checkpoint=ckpt)
         .writeStream.foreachBatch(apply)
         .option("checkpointLocation", ckpt)
         .trigger(processingTime="50 milliseconds").start())
    want = {tuple(r) for r in V.read_current(spark, src).collect()}
    deadline = time.time() + 600
    got = set()
    while time.time() < deadline:
        got = {tuple(r) for r in V.read_current(spark, rep).collect()}
        if got == want:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination()
    dt = time.perf_counter() - t0
    assert got == want, (len(got), len(want))
    half = len(batch_times) // 2
    import statistics
    print(f"capped apply drain: {n_commits} commits as "
          f"{len(batch_times)} batches (cap {cap}) in {dt:6.1f} s; "
          f"replica == source ({len(want)} rows)", flush=True)
    print(f"per-batch apply: first-half median "
          f"{statistics.median(batch_times[:half]):5.2f} s, "
          f"second-half median "
          f"{statistics.median(batch_times[half:]):5.2f} s "
          f"(flat = O(batch), not O(replica history))", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
