"""The table-maintenance loop end-to-end (VERDICT r3 #8):

  streaming appends (many small files)
    -> zone-map maintenance (xs13 machinery)
    -> order-preserving compaction (x97's plan contract, executed)
    -> zone-map refresh
    -> file skipping still effective, clustering order preserved.

One test drives the whole cycle so the pieces are proven to compose,
not just pass alone.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _parquet_files(path: str) -> list[str]:
    return sorted(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )


def _file_ts_ranges(files: list[str]) -> list[tuple]:
    """Per-file (min_ts, max_ts) straight from the parquet footers —
    the stats a scan's file pruning actually uses."""
    out = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        lo = hi = None
        idx = md.schema.names.index("ts")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((lo, hi))
    return out


def test_streaming_append_zonemap_compact_refresh_cycle(spark, tmp_path,
                                                        sf_dir):
    from mc_ns_data_pipeline_spark.catalog import load_table
    from mc_ns_data_pipeline_spark.session import scoped_conf
    from mc_ns_data_pipeline_spark.sinks.layout import compact_clustered
    from mc_ns_data_pipeline_spark.streaming.incremental import (
        run_stream_zone_maps,
    )

    events = load_table(spark, sf_dir, "events")
    n_events = events.count()

    # --- 1. streaming appends: many micro-batches -> many small files.
    # Stage the source as multiple files so maxFilesPerTrigger yields
    # several batches (one file per source batch is how a real ingest
    # stream lands).
    src = str(tmp_path / "src")
    events.repartition(12).write.parquet(src)
    tbl = str(tmp_path / "events_tbl")
    ckpt_ingest = str(tmp_path / "ckpt_ingest")
    with scoped_conf(spark, {"spark.sql.shuffle.partitions": "4"}):
        q = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 3)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", tbl)
            .option("checkpointLocation", ckpt_ingest)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    small_files = _parquet_files(tbl)
    assert len(small_files) >= 4, "ingest should land many small files"
    assert spark.read.parquet(tbl).count() == n_events

    # --- 2. zone-map maintenance over the appended table (xs13 path)
    zm_dir = str(tmp_path / "zm")
    stats1 = run_stream_zone_maps(
        spark, tbl, str(tmp_path / "ckpt_zm1"), zm_dir
    ).collect()
    assert sum(r["n_rows"] for r in stats1) == n_events

    # --- 3. order-preserving compaction (execute x97's plan contract)
    # target sized for ~8 output files at this SF so the pruning step
    # below has real granularity (at warehouse scale this is 128 MiB)
    total_bytes = sum(os.path.getsize(f) for f in small_files)
    n_after = compact_clustered(
        spark, tbl, "ts", target_file_bytes=max(1, total_bytes // 8)
    )
    big_files = _parquet_files(tbl)
    assert len(big_files) == n_after < len(small_files)
    assert spark.read.parquet(tbl).count() == n_events  # nothing lost

    # clustering order preserved: per-file ts ranges don't overlap
    ranges = sorted(_file_ts_ranges(big_files))
    for (lo_a, hi_a), (lo_b, _hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, "compacted files must cover disjoint spans"

    # --- 4. zone-map refresh from the compacted table: content is
    # unchanged, so the refreshed bucket stats must equal the originals
    zm2_dir = str(tmp_path / "zm2")
    stats2 = run_stream_zone_maps(
        spark, tbl, str(tmp_path / "ckpt_zm2"), zm2_dir
    ).collect()
    key = lambda r: r["bucket"]  # noqa: E731
    assert sorted(map(tuple, stats2), key=lambda t: t[0]) == sorted(
        map(tuple, stats1), key=lambda t: t[0]
    )

    # --- 5. file skipping still >= 50%: with disjoint per-file spans,
    # a day-sized ts predicate prunes most files on footer stats alone
    all_lo = min(lo for lo, _ in ranges)
    all_hi = max(hi for _, hi in ranges)
    span = all_hi - all_lo
    q_lo = all_lo + span * 0.4
    q_hi = all_lo + span * 0.6
    scanned = [
        1 for lo, hi in ranges if not (hi < q_lo or lo > q_hi)
    ]
    skipped_frac = 1 - len(scanned) / len(ranges)
    assert skipped_frac >= 0.5, (
        f"only {skipped_frac:.0%} of files skippable for a 20% ts "
        f"window over {len(ranges)} files"
    )
    # and Spark's own scan agrees with the pruned answer
    expected = events.filter(
        (F.col("ts") >= F.lit(q_lo)) & (F.col("ts") <= F.lit(q_hi))
    ).count()
    got = spark.read.parquet(tbl).filter(
        (F.col("ts") >= F.lit(q_lo)) & (F.col("ts") <= F.lit(q_hi))
    ).count()
    assert got == expected
