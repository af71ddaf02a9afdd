"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no custom state beyond its checkpoint/status files
(SURVEY.md §2.8 T3/T5); this module is the engine's extension surface
for arbitrary per-key streaming state — the Spark-native replacement
for hand-rolled "remember things between runs" logic.

Design contract for oracle-checkable stateful ops: every emitted value
must be a monotone function of the key's full event history (counts,
maxima), so the *final* emission per key equals the batch answer no
matter how the input was micro-batched. That is what lets the driver
hash-compare a streaming run against a static DuckDB query.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# user_id -> (event count so far, max event-time so far in epoch micros)
OUTPUT_SCHEMA = "user_id bigint, n_events bigint, last_ts timestamp"
STATE_SCHEMA = "n bigint, last_us bigint"


def _update_user_activity(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, last_us = state.get if state.exists else (0, None)
    for pdf in pdfs:
        n += len(pdf)
        batch_max = pd.to_datetime(pdf["ts"]).max()
        us = int(batch_max.value // 1_000)
        last_us = us if last_us is None else max(last_us, us)
    state.update((n, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "last_ts": [pd.Timestamp(last_us * 1_000)],
        }
    )


def user_activity_updates(events: DataFrame) -> DataFrame:
    """Per-user running (count, max event-time) as a stateful stream.

    Arrow-batched state updates; state is two fixed-width fields per
    user, so state-store size is O(distinct users) regardless of event
    volume — the shape that survives an unbounded stream.
    """
    from mc_ns_data_pipeline_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_activity,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def run_stateful_user_activity(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    sink_table: str = "xs2_sink",
) -> DataFrame:
    """Run the stateful per-user aggregate to end-of-input (availableNow)
    and reduce the update stream to its final state per user.

    Emissions are monotone (see module docstring), so the final state is
    max() over updates — order- and batching-independent, hence exactly
    comparable to `SELECT user_id, count(*), max(ts) ... GROUP BY 1`.
    """
    from mc_ns_data_pipeline_spark.streaming.incremental import (
        _events_stream,
    )

    from mc_ns_data_pipeline_spark.session import scoped_conf

    updates = user_activity_updates(
        _events_stream(spark, events_path).select("user_id", "ts")
    )
    # Per-user state is low-cardinality; state-store commit cost is
    # per-partition, so pin partitions to the key scale (see scoped_conf).
    with scoped_conf(spark, {"spark.sql.shuffle.partitions": "8"}):
        q = (
            updates.writeStream.outputMode("update")
            .format("memory")
            .queryName(sink_table)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(sink_table)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("last_ts").alias("last_ts"),
        )
    )


def run_stream_dedup(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    sink_table: str = "xs3_sink",
) -> DataFrame:
    """T5 cross-run dedup as a streaming operator: dropDuplicates over
    the key columns, append-mode (each key pair emitted exactly once),
    then a static rollup of the deduped sink.

    State is the seen-key set; with a watermark the store is pruned to
    the lateness horizon — here (availableNow over finite input) it is
    simply bounded by distinct key pairs.
    """
    from mc_ns_data_pipeline_spark.streaming.incremental import (
        _events_stream,
    )

    from mc_ns_data_pipeline_spark.session import scoped_conf

    keys = _events_stream(spark, events_path).select("user_id", "event_type")
    deduped = keys.dropDuplicates(["user_id", "event_type"])
    with scoped_conf(spark, {"spark.sql.shuffle.partitions": "8"}):
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName(sink_table)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(sink_table)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique_users"))
        .orderBy("event_type")
    )
