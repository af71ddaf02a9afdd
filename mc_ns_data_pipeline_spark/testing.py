"""Differential oracle harness: Spark plan vs DuckDB SQL.

Mimics the driver's correctness gate: run the Spark query and the oracle
SQL over the same parquet tables, then compare row count, column names,
and an order-insensitive canonicalized value comparison.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession

from mc_ns_data_pipeline_spark.catalog import TABLES, table_path


def run_oracle(sql: str, sf_dir: str):
    """Execute oracle SQL in DuckDB with testdata tables as views."""
    import duckdb

    con = duckdb.connect()
    for name in TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    # One cursor: a second con.execute would re-run the statement —
    # double DuckDB runtime for the recursive-CTE oracles.
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return cols, rows


def _canon_value(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canonicalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_canon_value(row[i]) for i in order) for row in rows
    )


def compare_with_oracle(df: DataFrame, oracle_sql: str, sf_dir: str) -> None:
    """Assert the Spark DataFrame matches the oracle. Raises with a diff."""
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    ora_cols, ora_rows = run_oracle(oracle_sql, sf_dir)

    assert sorted(spark_cols) == sorted(ora_cols), (
        f"column mismatch: spark={sorted(spark_cols)} oracle={sorted(ora_cols)}"
    )
    assert len(spark_rows) == len(ora_rows), (
        f"row count mismatch: spark={len(spark_rows)} oracle={len(ora_rows)}"
    )
    s = canonicalize(spark_cols, spark_rows)
    o = canonicalize(ora_cols, ora_rows)
    if s != o:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s, o)) if a != b
        ][:5]
        raise AssertionError(
            f"value mismatch ({sum(1 for a, b in zip(s, o) if a != b)} rows); "
            f"first diffs (spark vs oracle):\n"
            + "\n".join(f"  row {i}:\n    {a}\n    {b}" for i, a, b in diffs)
        )


def assert_query_matches(spark: SparkSession, name: str, sf_dir: str) -> None:
    from mc_ns_data_pipeline_spark.plans import ORACLES, QUERIES

    compare_with_oracle(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)
