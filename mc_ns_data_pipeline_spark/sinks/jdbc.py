"""JDBC write sink — SURVEY.md §2.2 K5/K8 against a REMOTE warehouse.

The reference's warehouse is PostgreSQL written row-batch-wise from the
driver (operations.py:36-38 execute_values insert; inventory_data.py:
83-106 truncate-then-reload refresh). Spark's JDBC writer keeps those
semantics but executes them FROM THE EXECUTORS: each partition opens
its own connection and writes its rows in `batchsize`-sized batches
inside a per-partition transaction, so a 1000-executor cluster loads in
parallel instead of through one driver socket.

Scale notes (the knobs that matter at 100 TB):

- `num_connections` caps the writing partitions (`coalesce`, narrow —
  no shuffle) so the database sees a bounded connection count instead
  of one per shuffle partition. Size it to the warehouse's connection
  budget, not to the cluster size.
- `batchsize` is the executor-side analogue of execute_values' page
  size: rows per JDBC batch execute.
- `truncate=True` on overwrite issues TRUNCATE TABLE instead of
  DROP/CREATE, preserving remote DDL, grants, and indexes — the exact
  contract of the reference's truncate-reload
  (inventory_data.py:88-90).
- `isolation_level` defaults to READ_COMMITTED; NONE disables
  transactions for engines that lack them.

Writes are at-least-once per partition on retry (a re-run task re-inserts
its rows). For exactly-once downstream state use the staged upsert in
sinks/upsert.py (K6) or an idempotent key + per-key replace (K7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_BATCHSIZE = 10_000


def jdbc_write_options(url: str, table: str,
                       properties: dict[str, str] | None = None,
                       batchsize: int = DEFAULT_BATCHSIZE,
                       isolation_level: str = "READ_COMMITTED",
                       truncate: bool = False) -> dict[str, str]:
    """Build the option map for a JDBC table write (pure, unit-testable)."""
    opts: dict[str, str] = {
        "url": url,
        "dbtable": table,
        "batchsize": str(batchsize),
        "isolationLevel": isolation_level,
        "truncate": "true" if truncate else "false",
    }
    if properties:
        opts.update(properties)
    return opts


def _prepare(df: DataFrame, num_connections: int | None) -> DataFrame:
    if num_connections is not None:
        if num_connections < 1:
            raise ValueError("num_connections must be >= 1")
        # coalesce (narrow) — bounds the DB connection count without a
        # shuffle; repartition would pay a full exchange for nothing.
        df = df.coalesce(num_connections)
    return df


def write_append(df: DataFrame, url: str, table: str,
                 properties: dict[str, str] | None = None,
                 batchsize: int = DEFAULT_BATCHSIZE,
                 num_connections: int | None = None,
                 isolation_level: str = "READ_COMMITTED") -> None:
    """K5 batch insert: append `df` to the remote table.

    Parity: operations.py:36-38 (execute_values page-wise insert), but
    per-executor-partition instead of driver-side.
    """
    _prepare(df, num_connections).write.format("jdbc").options(
        **jdbc_write_options(url, table, properties, batchsize,
                             isolation_level)
    ).mode("append").save()


def write_truncate_reload(df: DataFrame, url: str, table: str,
                          properties: dict[str, str] | None = None,
                          batchsize: int = DEFAULT_BATCHSIZE,
                          num_connections: int | None = None,
                          isolation_level: str = "READ_COMMITTED") -> None:
    """K8 full refresh: TRUNCATE the remote table, then reload it.

    `truncate=true` keeps the remote DDL/indexes/grants intact (the
    reference's refresh truncates and re-inserts, never re-creates —
    inventory_data.py:83-106). Not atomic across the truncate+load; for
    an atomic swap, load a staging table and rename remotely, or use
    the staged upsert sink.
    """
    _prepare(df, num_connections).write.format("jdbc").options(
        **jdbc_write_options(url, table, properties, batchsize,
                             isolation_level, truncate=True)
    ).mode("overwrite").save()


def write_replace_table(df: DataFrame, url: str, table: str,
                        properties: dict[str, str] | None = None,
                        batchsize: int = DEFAULT_BATCHSIZE,
                        num_connections: int | None = None) -> None:
    """DROP/CREATE overwrite — schema evolution path (new columns reach
    the warehouse). Loses remote-side DDL extras; prefer
    write_truncate_reload for steady-state refreshes."""
    _prepare(df, num_connections).write.format("jdbc").options(
        **jdbc_write_options(url, table, properties, batchsize)
    ).mode("overwrite").save()
