#!/usr/bin/env python
"""$files metadata-table cost at the 1M-file shape (VERDICT r08 #7 —
"page the files metadata table").

Builds a 1M-file chunked/paged manifest with the real publish
machinery (synthetic per-file stats, clustered on `k`; no data bytes —
$files reads only metadata), then measures:

  * driver-side PLAN cost of `files_table`: wall time + peak tracemalloc
    allocation building the lazy plan (must be O(chunks), never
    O(files) — the old path's `_materialize` allocation is printed for
    contrast);
  * full listing via the distributed executor-side sidecar read
    (collect count must equal N_FILES);
  * predicate-scoped listing (`k >= hi_cut`): chunks shipped must track
    the span-surviving fraction, not the chunk total.

Usage: python scripts/stress_files_metadata.py [WORK_DIR] [N_FILES]
"""

from __future__ import annotations

import os
import shutil
import sys
import time
import tracemalloc
import uuid

WORK = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_files_meta"
N_FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
ROWS_PER_FILE = 1000


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:64s} {dt:8.3f} s", flush=True)
    return out, dt


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession

    from mc_ns_data_pipeline_spark.sinks import metadata_tables as M
    from mc_ns_data_pipeline_spark.sinks import versioned as V

    shutil.rmtree(WORK, ignore_errors=True)
    table = os.path.join(WORK, "tbl")
    os.makedirs(V._snapshots_root(table), exist_ok=True)

    files = [f"{uuid.uuid4().hex}.parquet" for _ in range(N_FILES)]
    stats = {
        f: {"k": [i * ROWS_PER_FILE, (i + 1) * ROWS_PER_FILE - 1]}
        for i, f in enumerate(files)
    }
    # realistic lineage: 10 append-shaped commits (a core carries its
    # OWN commit's new_files — O(commit), not O(table) — so building
    # by appends keeps every core small; a single 1M-file overwrite
    # would instead inline 1M new_files entries in one core)
    def build():
        step = N_FILES // 10
        parent = None
        for lo in range(0, N_FILES, step):
            part = files[lo:lo + step]
            core = (V._read_core(table, parent) if parent else None)
            parent = V._publish(
                table, part, (lo + step) * ROWS_PER_FILE, parent,
                0 if core is None else V._chunk_file_count(core),
                op="append" if core is not None else "overwrite",
                new_files=part,
                stats={f: stats[f] for f in part},
                stats_cols=["k"],
                parent_chunks=(core or {}).get("chunks"),
                parent_pages=(core or {}).get("pages"))
        return parent

    _, t_pub = timed(
        f"publish chunked manifest ({N_FILES:,} files, 10 commits)",
        build)
    snap = V.current_snapshot(table)
    core = V._read_core(table, snap)
    n_chunks = len(core.get("chunks") or []) + sum(
        pg["k"] for pg in core.get("pages") or [])
    print(f"{'chunks':64s} {n_chunks:8d}")

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # contrast: what the pre-r9 path allocated on the driver
    tracemalloc.start()
    (_, t_mat) = timed("old path: _materialize full file list (driver)",
                       lambda: V._materialize(table, core))
    _, peak_mat = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    print(f"{'  driver peak alloc (full materialize)':64s} "
          f"{peak_mat / 1e6:8.1f} MB")

    tracemalloc.start()
    plan, t_plan = timed("files_table PLAN construction (driver)",
                         lambda: M.files_table(spark, table))
    _, peak_plan = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    print(f"{'  driver peak alloc (lazy plan)':64s} "
          f"{peak_plan / 1e6:8.1f} MB")

    (n, t_list) = timed("full listing (distributed sidecar read)",
                        plan.count)
    assert n == N_FILES, (n, N_FILES)

    hi_cut = (N_FILES - N_FILES // 100) * ROWS_PER_FILE  # top 1%
    preds = [("k", ">=", hi_cut)]
    scoped, t_scope = timed("predicate-scoped listing (top 1% of keys)",
                            lambda: M.files_table(
                                spark, table, predicates=preds)
                            .count())
    print(f"{'  files listed (expect ~1%)':64s} {scoped:8d}")

    print("\nsummary (BASELINE.md row):")
    print(f"  n_files={N_FILES:,} chunks={n_chunks} "
          f"publish={t_pub:.1f}s plan={t_plan * 1000:.0f}ms "
          f"plan_alloc={peak_plan / 1e6:.1f}MB "
          f"(materialize_alloc={peak_mat / 1e6:.1f}MB) "
          f"full_list={t_list:.1f}s scoped={t_scope:.2f}s "
          f"scoped_files={scoped}")
    spark.stop()


if __name__ == "__main__":
    main()
