"""Physical data-layout sinks: bucketing and range clustering.

At 100 TB the dominant costs are the shuffle (joins/aggregations) and
the scan (bytes read). Both are storage-layout problems, fixed at WRITE
time:

- **Bucketing** (`write_bucketed`): hash-partition a table into a fixed
  number of buckets on its join/aggregation key. Two tables bucketed on
  the same key with the same bucket count join with NO exchange on
  either side — the scan itself reports the hash partitioning Catalyst
  needs (`test_sources_sinks.test_bucketed_join_is_shuffle_free` pins
  this). Re-used across every downstream join/groupBy on that key, the
  one-time write-side shuffle amortizes to zero.

- **Range clustering** (`write_clustered`): repartitionByRange +
  sortWithinPartitions on a filter column before writing parquet. Every
  file (and row group within it) then covers a narrow, near-disjoint
  value range, so the parquet footer min/max statistics let a
  pushed-down predicate skip whole files — the poor man's z-order, and
  the right layout for time- or id-range-scanned fact tables.

Spark cite: DataFrameWriter.bucketBy/sortBy (Spark SQL bucketing,
SPARK-15453 bucketed join elimination), repartitionByRange
(RangePartitioning) + parquet predicate pushdown.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table_name: str, bucket_col: str,
                   n_buckets: int, mode: str = "overwrite") -> None:
    """Persist as a bucketed (+ in-bucket sorted) parquet table.

    sortBy on the bucket key makes each bucket file sorted, so bucketed
    sort-merge joins skip the per-task sort too (the scan satisfies
    both the distribution AND the ordering requirement).
    """
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str | list[str], how: str = "inner") -> DataFrame:
    """Join two same-key, same-count bucketed tables co-locatedly.

    Broadcast is explicitly disabled via join hint so the co-located
    sort-merge path is taken deterministically — at warehouse scale
    neither side fits a broadcast anyway, and the point of bucketing is
    that the SMJ needs no exchange.
    """
    lhs = spark.table(left_table).hint("shuffle_merge")
    rhs = spark.table(right_table)
    return lhs.join(rhs, on, how)


def write_clustered(df: DataFrame, path: str, cluster_col: str | Column,
                    n_files: int, mode: str = "overwrite") -> None:
    """Write parquet range-clustered on `cluster_col`.

    repartitionByRange samples the column to build balanced range
    bounds (one pass, same machinery as a global sort), then each
    output file covers a disjoint slice; sortWithinPartitions tightens
    per-row-group min/max stats inside each file.
    """
    col = F.col(cluster_col) if isinstance(cluster_col, str) else cluster_col
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode(mode)
        .parquet(path)
    )


def _bucket_of(col: Column, bounds: list[float]) -> Column:
    """Map a value to its quantile-bucket id (0..len(bounds)) via a
    row-local literal-array scan — O(n_buckets) comparisons per row,
    no join, no window."""
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    return F.size(F.filter(arr, lambda b: b <= col.cast("double")))


def zorder_key(cols_with_bounds: list[tuple[Column, list[float]]],
               bits: int = 6) -> Column:
    """Morton (Z-curve) interleave of per-column quantile buckets.

    Each column is quantized to `bits` bits using its quantile bounds
    (equal-frequency, so skew can't collapse buckets), then the bucket
    ids' bits are interleaved into one integer key. Sorting by that key
    gives every file a tight min/max range on EVERY participating
    column at once — multi-dimensional data skipping from plain parquet
    footer stats, the same layout trick Delta's OPTIMIZE ZORDER BY and
    Hudi clustering use.
    """
    n = len(cols_with_bounds)
    key = F.lit(0).cast("long")
    for ci, (col, bounds) in enumerate(cols_with_bounds):
        b = _bucket_of(col, bounds).cast("long")
        for bit in range(bits):
            # earlier-listed columns take the more significant slot in
            # each interleave group, so with n_files = 2^(n*k) every
            # column contributes k bits to the file split evenly
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, bit).bitwiseAND(F.lit(1)),
                    bit * n + (n - 1 - ci),
                )
            )
    return key


def zorder_cluster(df: DataFrame, cols: list[str], bits: int = 6,
                   n_partitions: int | None = None) -> DataFrame:
    """Range-cluster `df` by the Morton key of `cols` (quantile
    bounds from ONE `approxQuantile` pass — the list form computes
    every column's bounds in a single input scan; the driver holds
    only the 2^bits boundary values per column). The quantization and
    bit-interleave are row-local expressions; the only data movement
    is the final range shuffle on the key (AQE-sized when
    ``n_partitions`` is None). Shared by `write_zordered` and the
    versioned tables' ``zorder(...)`` partition-spec transform so the
    bucketing recipe cannot drift between them."""
    import uuid

    n_buckets = 1 << bits
    qs = [i / n_buckets for i in range(1, n_buckets)]
    all_bounds = df.approxQuantile(list(cols), qs, 0.01)
    with_bounds = list(zip((F.col(c) for c in cols), all_bounds))
    key = zorder_key(with_bounds, bits=bits)
    # uuid-suffixed temp column: a user column literally named _zkey
    # must survive the round trip untouched
    tmp = f"_zkey_{uuid.uuid4().hex[:8]}"
    out = df.withColumn(tmp, key)
    out = (out.repartitionByRange(n_partitions, F.col(tmp))
           if n_partitions is not None
           else out.repartitionByRange(F.col(tmp)))
    return out.sortWithinPartitions(tmp).drop(tmp)


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   n_files: int, bits: int = 6,
                   mode: str = "overwrite") -> None:
    """Write parquet z-ordered on `cols` (see `zorder_cluster`)."""
    zorder_cluster(df, cols, bits=bits,
                   n_partitions=n_files).write.mode(mode).parquet(path)


def restore_interrupted_swap(path: str) -> bool:
    """Recover from a crash between the two renames of a staging swap
    (the pattern merge_upsert / compact_files / merge_latest_state all
    use): the table dir is missing but its `__old` backup exists.
    Swap-writers call this before touching the target — without it, the
    missing dir reads as a FRESH table and the next write silently
    drops every pre-existing row, with nothing ever restoring the
    backup. Returns True when a recovery rename happened."""
    import os

    backup = f"{path}__old"
    if not os.path.exists(path) and os.path.exists(backup):
        os.rename(backup, path)
        return True
    return False


def compact_files(spark: SparkSession, path: str,
                  target_file_bytes: int = 128 << 20,
                  partition_by: tuple[str, ...] = ()) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files. Returns the new file count.

    Streaming sinks emit one file per micro-batch per partition; at
    warehouse scale the resulting millions of KB-sized files make scan
    cost track FILE COUNT (footer reads, task scheduling), not bytes.
    Sizing walks the tree RECURSIVELY (a partitioned layout keeps its
    data under key= subdirectories — a top-level glob would see zero
    bytes and collapse the table to one file); pass `partition_by` for
    partitioned tables so the rewrite preserves the directory layout
    instead of flattening the partition column into the files.
    Written to staging and swapped in via rename so readers never
    observe a half-compacted directory; an interrupted swap is
    restored by `restore_interrupted_swap` on the next run. Run it as
    the maintenance pass after streaming appends (Delta OPTIMIZE's
    file-binpacking, minus the transaction log).
    """
    import glob
    import math
    import os
    import shutil

    from mc_ns_data_pipeline_spark.sinks.lease import table_lease

    # Maintenance races writers: a merge/replace swapping the dir
    # mid-compaction would be overwritten by the compactor's stale
    # staged copy. Same lease as the mutating sinks — the compactor
    # fails fast (or queues via wait_s at the call site) instead.
    with table_lease(path, owner="compact_files"):
        restore_interrupted_swap(path)
        files = glob.glob(
            os.path.join(path, "**", "*.parquet"), recursive=True
        )
        total = sum(os.path.getsize(f) for f in files)
        n = max(1, math.ceil(total / target_file_bytes))
        df = spark.read.parquet(path)
        staging = f"{path}__compacting"
        if partition_by:
            # Hash-colocate by the partition columns so each output task
            # holds whole partition values (≈1 file per value, not n×P).
            writer = df.repartition(n, *[F.col(c) for c in partition_by])
            writer.write.mode("overwrite").partitionBy(*partition_by) \
                .parquet(staging)
        else:
            df.repartition(n).write.mode("overwrite").parquet(staging)
        backup = f"{path}__old"
        shutil.rmtree(backup, ignore_errors=True)
        os.rename(path, backup)
        os.rename(staging, path)
        shutil.rmtree(backup)
        return len(glob.glob(
            os.path.join(path, "**", "*.parquet"), recursive=True
        ))


def compact_clustered(spark: SparkSession, path: str, cluster_col: str,
                      target_file_bytes: int = 128 << 20) -> int:
    """Order-PRESERVING compaction: execute the rewrite x97 plans.

    `compact_files` bin-packs by size with a hash repartition — right
    for unordered tables, but it destroys the clustering x87 paid for
    (each output file then spans the whole key range and zone-map
    pruning collapses to 0%). This executor keeps the layout
    investment: `repartitionByRange(n, cluster_col)` makes each output
    task own a CONTIGUOUS key span (range boundaries from a sampled
    sketch — one extra lightweight job), and `sortWithinPartitions`
    keeps rows ordered inside each file, so the compacted table has
    non-overlapping per-file min/max on the cluster key — exactly the
    x97 merge-group contract (consecutive runs, never arbitrary bins).

    Same staged-swap + single-writer lease discipline as
    `compact_files`; returns the new file count.
    """
    import glob
    import math
    import os
    import shutil

    from mc_ns_data_pipeline_spark.sinks.lease import table_lease

    with table_lease(path, owner="compact_clustered"):
        restore_interrupted_swap(path)
        files = glob.glob(
            os.path.join(path, "**", "*.parquet"), recursive=True
        )
        total = sum(os.path.getsize(f) for f in files)
        n = max(1, math.ceil(total / target_file_bytes))
        df = spark.read.parquet(path)
        staging = f"{path}__compacting"
        (
            df.repartitionByRange(n, F.col(cluster_col))
            .sortWithinPartitions(cluster_col)
            .write.mode("overwrite")
            .parquet(staging)
        )
        backup = f"{path}__old"
        shutil.rmtree(backup, ignore_errors=True)
        os.rename(path, backup)
        os.rename(staging, path)
        shutil.rmtree(backup)
        return len(glob.glob(
            os.path.join(path, "**", "*.parquet"), recursive=True
        ))


def write_shards(df: DataFrame, path: str, n_shards: int,
                 id_col: str) -> dict:
    """Training-data delivery: deterministic md5-bucket sharding with a
    JSON manifest. Returns the manifest dict (also written to
    `<path>/_MANIFEST.json`).

    Shard assignment is a pure function of the row id (same id → same
    shard across runs and engines), so downstream loaders can rely on
    shard-stable ordering guarantees and resume partial downloads. One
    hash shuffle on the shard key; each shard lands as one file via
    partitioned write. The manifest records per-shard row counts and
    bytes — the consumer-side integrity check every delivery format
    (WebDataset, Mosaic MDS, TFRecord shards) builds in.
    """
    import glob
    import json
    import os

    shard = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
               16, 10).cast("long"),
        F.lit(n_shards),
    )
    (
        df.withColumn("shard", shard)
        .repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    manifest = {"n_shards": n_shards, "shards": {}}
    total_rows = 0
    for d in sorted(glob.glob(os.path.join(path, "shard=*"))):
        sid = int(d.rsplit("=", 1)[1])
        files = glob.glob(os.path.join(d, "*.parquet"))
        import pyarrow.parquet as pq

        rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        nbytes = sum(os.path.getsize(f) for f in files)
        manifest["shards"][str(sid)] = {
            "rows": rows, "bytes": nbytes, "files": len(files),
        }
        total_rows += rows
    manifest["total_rows"] = total_rows
    with open(os.path.join(path, "_MANIFEST.json"), "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    return manifest
