#!/usr/bin/env python
"""Per-phase breakdown of xs14's in-suite cost (VERDICT r08 #3 —
"profile xs14's in-suite floor per-epoch and shrink or price it").

Runs the exact gate query (run_stream_incremental_dedup at
$SPARK_GRAFT_SF_DIR, default sf0.1) with the batch function wrapped to
time each foreachBatch epoch, and times the phases around it:

  * stream definition (schema inference + staging symlink)
  * stream machinery: awaitTermination wall MINUS the time spent
    inside dedup_index_batch (checkpoint setup, offset log, file-source
    listing, micro-batch planning — the Structured Streaming fixed cost)
  * per-epoch dedup_index_batch wall (the actual work: LSH + band join
    + jaccard verify + index writes), with the store's probe stats
  * final result read (pairs parquet + orderBy + collect)

Usage: python scripts/profile_xs14.py [reps]
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    sys.path.insert(0, "/root/repo")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import SparkSession

    from mc_ns_data_pipeline_spark.streaming import incremental as I

    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    docs = f"{sf_dir}/documents.parquet"
    orig_batch = I.dedup_index_batch

    for rep in range(reps):
        import tempfile

        ckpt = tempfile.mkdtemp(prefix="xs14_prof_ckpt_")
        store = tempfile.mkdtemp(prefix="xs14_prof_store_") + "/index"
        epochs: list[tuple[int, float]] = []

        def timed_batch(spark_, batch_df, epoch_id, store_, **kw):
            t0 = time.perf_counter()
            out = orig_batch(spark_, batch_df, epoch_id, store_, **kw)
            epochs.append((epoch_id, time.perf_counter() - t0))
            return out

        I.dedup_index_batch = timed_batch
        t0 = time.perf_counter()
        df = I.run_stream_incremental_dedup(spark, docs, ckpt, store)
        t_stream = time.perf_counter() - t0
        n = df.count()
        t_read = time.perf_counter() - t0 - t_stream
        I.dedup_index_batch = orig_batch

        in_batch = sum(dt for _, dt in epochs)
        print(f"rep {rep}: total_stream={t_stream:7.2f}s "
              f"epochs={len(epochs)} in_batch={in_batch:6.2f}s "
              f"machinery={t_stream - in_batch:6.2f}s "
              f"result_read={t_read:5.2f}s rows={n}")
        for eid, dt in epochs:
            print(f"    epoch {eid}: {dt:6.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
