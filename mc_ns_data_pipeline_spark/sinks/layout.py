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
