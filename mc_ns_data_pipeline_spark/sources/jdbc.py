"""JDBC source — SURVEY.md §2.1 S6 (full SQL pushdown + partitioned scan).

The reference pulls NetSuite data by executing whole SQL statements
remotely over a JDBC bridge and fetching all rows into Python
(inventory_data.py:29-36,67-69; sales_data.py:29-36,85-87). Spark's JDBC
source keeps the pushdown (the `query` option ships the statement to the
remote engine) and adds what the reference cannot do: a partitioned
parallel scan — `partitionColumn/lowerBound/upperBound/numPartitions`
splits the remote read across executors, and `fetchsize` batches rows.

Reader construction is a pure function (unit-tested); `.load()` is the
only call that touches the network. Spark's bundled Derby provides an
in-process JDBC engine, so the pushdown path is ALSO exercised
end-to-end (tests/test_warehouse_jdbc.py::test_jdbc_pushdown_roundtrip
— the filtered row set coming back proves the statement executed
remotely, not in Spark).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

DEFAULT_FETCHSIZE = 10_000


@dataclass(frozen=True)
class JdbcPartitioning:
    """Range-partitioned scan spec: executors read disjoint slices."""

    column: str
    lower_bound: int
    upper_bound: int
    num_partitions: int


def jdbc_options(url: str, query: str,
                 properties: dict[str, str] | None = None,
                 partitioning: JdbcPartitioning | None = None,
                 fetchsize: int = DEFAULT_FETCHSIZE) -> dict[str, str]:
    """Build the option map for a pushed-down JDBC query scan."""
    opts: dict[str, str] = {
        "url": url,
        "query": query,
        "fetchsize": str(fetchsize),
    }
    if properties:
        opts.update(properties)
    if partitioning is not None:
        # `query` + partitioning is rejected by Spark (needs a relation
        # to wrap) -> present the statement as a dbtable subquery.
        opts.pop("query")
        opts["dbtable"] = f"({query}) src"
        opts["partitionColumn"] = partitioning.column
        opts["lowerBound"] = str(partitioning.lower_bound)
        opts["upperBound"] = str(partitioning.upper_bound)
        opts["numPartitions"] = str(partitioning.num_partitions)
    return opts


def jdbc_reader(spark: SparkSession, url: str, query: str,
                properties: dict[str, str] | None = None,
                partitioning: JdbcPartitioning | None = None,
                fetchsize: int = DEFAULT_FETCHSIZE) -> DataFrameReader:
    """Configured (lazy) reader; caller invokes .load() to execute."""
    return spark.read.format("jdbc").options(
        **jdbc_options(url, query, properties, partitioning, fetchsize)
    )


def read_query(spark: SparkSession, url: str, query: str,
               properties: dict[str, str] | None = None,
               partitioning: JdbcPartitioning | None = None) -> DataFrame:
    """S6: execute `query` remotely (full pushdown), return the result."""
    return jdbc_reader(spark, url, query, properties, partitioning).load()
