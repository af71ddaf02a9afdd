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


def run_stream_dedup_bounded(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    sink_table: str = "xs9_sink",
    delay: str = "35 days",
    output_path: str | None = None,
) -> DataFrame:
    """Bounded-state streaming dedup: `dropDuplicatesWithinWatermark`.

    xs3's plain `dropDuplicates` keeps every key it has EVER seen — on
    an unbounded stream that state grows forever. This variant evicts
    dedup state older than the watermark horizon, so the store holds
    only keys whose duplicates can still legally arrive — the only
    dedup shape that survives an always-on 100 TB/day stream. The
    guarantee weakens correspondingly: duplicates are dropped only when
    they arrive within `delay` of the first occurrence.

    Here `delay` (35 days) covers the fixture's entire 30-day event
    span, so end-of-input output is exactly DISTINCT over the keys —
    which is what the static oracle computes. Keys are
    (user_id, event_type, event day), i.e. daily per-user-per-type
    activity dedup.
    """
    from mc_ns_data_pipeline_spark.session import scoped_conf
    from mc_ns_data_pipeline_spark.streaming.incremental import (
        _events_stream,
    )

    ev = _events_stream(spark, events_path)
    keyed = (
        ev.withWatermark("ts", delay)
        .select(
            "ts", "user_id", "event_type",
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        )
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "day"])
        .select("user_id", "event_type", "day")
    )
    # State cardinality = in-horizon distinct keys; size the store's
    # partition count to that, not the batch parallelism.
    with scoped_conf(spark, {"spark.sql.shuffle.partitions": "8"}):
        writer = keyed.writeStream.outputMode("append").option(
            "checkpointLocation", checkpoint_dir
        ).trigger(availableNow=True)
        if output_path is not None:
            # file sink: supports checkpoint recovery (restart tests /
            # real deployments); the memory sink below does not.
            q = writer.format("parquet").option("path", output_path).start()
            q.awaitTermination()
            deduped = spark.read.parquet(output_path)
        else:
            q = (
                writer.format("memory").queryName(sink_table).start()
            )
            q.awaitTermination()
            deduped = spark.table(sink_table)
    # Sink rows are unique per (user, type, day) by construction, so a
    # plain count per event_type is the distinct user-day count.
    return (
        deduped.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_user_days"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# XS7 — CEP pattern detection: purchases preceded by >= N clicks within
# a time window, per user. The walk itself is engine-agnostic; it runs
# on transformWithStateInPandas (Spark 4's arbitrary-state API) when the
# environment has google.protobuf (which that API's state protocol
# requires), else on applyInPandasWithState — identical semantics, same
# oracle.
# ---------------------------------------------------------------------------

PATTERN_WINDOW_HOURS = 24
PATTERN_MIN_CLICKS = 3
PATTERN_OUTPUT_SCHEMA = (
    "user_id bigint, event_id bigint, ts timestamp, n_recent_clicks bigint"
)
PATTERN_STATE_SCHEMA = "epochs string"


def _pattern_walk(frames: list[pd.DataFrame],
                  clicks: list[int]) -> tuple[pd.DataFrame | None, list[int]]:
    """Event-time walk shared by both stateful APIs.

    State is the comma-joined epoch-micros of clicks still inside the
    window (pruned as the event-time frontier advances), so state size
    is bounded by click rate × window, not history length. Rows are
    processed in event-time order ('click' sorts before 'purchase' on
    ties, matching the BETWEEN-inclusive oracle), which makes the
    emission set a deterministic function of per-user history — the
    monotone contract that lets the driver hash-compare the stream
    against the static SQL twin.
    """
    window_us = PATTERN_WINDOW_HOURS * 3_600 * 1_000_000
    df = pd.concat(frames, ignore_index=True)
    df["us"] = pd.to_datetime(df["ts"]).astype("int64") // 1_000
    df = df.sort_values(["us", "event_type", "event_id"])
    out_id, out_ts, out_n = [], [], []
    for r in df.itertuples():
        if r.event_type == "click":
            clicks.append(r.us)
        else:  # purchase
            lo = r.us - window_us
            clicks = [c for c in clicks if c >= lo]
            if len(clicks) >= PATTERN_MIN_CLICKS:
                out_id.append(r.event_id)
                out_ts.append(r.us)
                out_n.append(len(clicks))
    # Prune on EVERY batch, not only inside the purchase branch: a
    # browse-heavy user who never purchases would otherwise accumulate
    # every click epoch forever, unbounding per-key state. One extra
    # window of slack is kept so a purchase arriving up to a full
    # window late still sees its clicks; later than that is outside
    # the pipeline's lateness allowance (the watermark the sibling
    # streams use is far tighter).
    if len(df):
        frontier = int(df["us"].max()) - 2 * window_us
        clicks = [c for c in clicks if c >= frontier]
    out = None
    if out_id:
        out = pd.DataFrame(
            {
                "event_id": out_id,
                "ts": pd.to_datetime(pd.Series(out_ts) * 1_000),
                "n_recent_clicks": out_n,
            }
        )
    return out, clicks


def _decode_clicks(stored: str | None) -> list[int]:
    return [int(x) for x in stored.split(",") if x] if stored else []


def _update_pattern(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    clicks = _decode_clicks(state.get[0]) if state.exists else []
    out, clicks = _pattern_walk(list(pdfs), clicks)
    state.update((",".join(str(c) for c in clicks),))
    if out is not None:
        out.insert(0, "user_id", key[0])
        yield out


def has_transform_with_state_runtime() -> bool:
    """transformWithStateInPandas needs google.protobuf for its state
    protocol; absent that, the API crashes at stream start (not import
    time), so probe the real dependency."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _pattern_processor():
    """StatefulProcessor wrapper over the shared walk (Spark 4 API)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class PurchasePatternProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._clicks = handle.getValueState(
                "recent_click_us", PATTERN_STATE_SCHEMA
            )

        def handleInputRows(self, key, rows, timerValues):
            stored = self._clicks.get()
            clicks = _decode_clicks(stored[0] if stored else None)
            out, clicks = _pattern_walk(list(rows), clicks)
            self._clicks.update((",".join(str(c) for c in clicks),))
            if out is not None:
                out.insert(0, "user_id", key[0])
                yield out

        def close(self) -> None:
            pass

    return PurchasePatternProcessor()


def purchase_pattern_alerts(events: DataFrame) -> DataFrame:
    """Clicks/purchases → per-user CEP alerts.

    The click/purchase filter runs MAP-SIDE before the key shuffle, so
    state traffic carries only the two relevant event types.
    """
    from mc_ns_data_pipeline_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(events.sparkSession)
    relevant = events.filter(
        F.col("event_type").isin("click", "purchase")
    ).select("user_id", "event_id", "ts", "event_type")
    grouped = relevant.groupBy("user_id")
    if has_transform_with_state_runtime():
        return grouped.transformWithStateInPandas(
            statefulProcessor=_pattern_processor(),
            outputStructType=PATTERN_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    return grouped.applyInPandasWithState(
        _update_pattern,
        PATTERN_OUTPUT_SCHEMA,
        PATTERN_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_pattern_detect(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    sink_table: str = "xs7_sink",
) -> DataFrame:
    """Run the CEP pattern stream to end-of-input (availableNow)."""
    from mc_ns_data_pipeline_spark.session import scoped_conf
    from mc_ns_data_pipeline_spark.streaming.incremental import (
        _events_stream,
    )

    alerts = purchase_pattern_alerts(_events_stream(spark, events_path))
    with scoped_conf(spark, {"spark.sql.shuffle.partitions": "8"}):
        q = (
            alerts.writeStream.outputMode("append")
            .format("memory")
            .queryName(sink_table)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink_table).orderBy("event_id")


# ---------------------------------------------------------------------------
# XS12: streaming volume-anomaly detection (x72's z-score, incremental)
# ---------------------------------------------------------------------------

HOUR_US = 3_600_000_000
# Allowed event-time disorder: an hour h closes only once the key's
# event-time frontier (max hour ever seen) is > h + this many hours.
# For any source whose arrival disorder stays within the bound, the
# emitted rows are a pure function of the key's event history — the
# SAME rows for ANY micro-batch chunking (closure is strictly
# ascending, counts are complete at close time). This is the standard
# watermark contract (cf. xs1's withWatermark lag).
ANOMALY_DISORDER_HOURS = 3
ANOMALY_OUTPUT_SCHEMA = (
    "event_type string, hour timestamp, n_events bigint,"
    " k bigint, s1 bigint, s2 bigint"
)
# closed-history moments + pending open-hour counts + event-time
# frontier + highest closed hour (watermark bookkeeping)
ANOMALY_STATE_SCHEMA = (
    "k bigint, s1 bigint, s2 bigint, pending string,"
    " frontier bigint, last_closed bigint"
)


def _anomaly_walk(
    frames: list[pd.DataFrame],
    hist: tuple[int, int, int],
    pending: dict[int, int],
    frontier: int = -1,
    last_closed: int = -1,
    disorder: int = ANOMALY_DISORDER_HOURS,
) -> tuple[
    pd.DataFrame | None, tuple[int, int, int], dict[int, int], int, int
]:
    """Event-time hour accounting shared state walk.

    Accumulates per-hour event counts in `pending`. An hour CLOSES —
    in strictly ascending order — once the key's event-time frontier
    (max hour ever seen, monotonic across batches) has passed it by
    more than `disorder` hours; at close it is emitted with the
    history moments (k, s1, s2) of all PRIOR closed hours and folded
    into them. Events for hours at or below `last_closed` (arrival
    disorder beyond the bound) are dropped, never re-opened — so a
    closed hour's row is final and the emission set is batch-chunking
    independent whenever the source honors the disorder bound
    (tests/test_streaming.py pins this with adversarial chunkings).

    Emissions carry exact integers only — the z arithmetic happens in
    engine SQL on both sides of the oracle compare, so float parity is
    the engines' (proven for x72), never Python's.

    State is 5 ints + open-hour counts; open hours are bounded by the
    disorder bound, not history length.
    """
    df = pd.concat(frames, ignore_index=True)
    us = pd.to_datetime(df["ts"]).astype("int64") // 1_000
    for h, c in (us // HOUR_US).value_counts().items():
        h = int(h)
        if h <= last_closed:
            continue  # beyond-disorder straggler: watermark drops it
        pending[h] = pending.get(h, 0) + int(c)
    if pending:
        frontier = max(frontier, max(pending))
    close_bound = frontier - disorder  # close every hour <= this
    k, s1, s2 = hist
    out_h, out_n, out_k, out_s1, out_s2 = [], [], [], [], []
    for h in sorted(pending):
        if h > close_bound:
            break
        n = pending.pop(h)
        out_h.append(h)
        out_n.append(n)
        out_k.append(k)
        out_s1.append(s1)
        out_s2.append(s2)
        k, s1, s2 = k + 1, s1 + n, s2 + n * n
        last_closed = h
    out = None
    if out_h:
        out = pd.DataFrame(
            {
                "hour": pd.to_datetime(
                    pd.Series(out_h, dtype="int64") * HOUR_US * 1_000
                ),
                "n_events": pd.Series(out_n, dtype="int64"),
                "k": pd.Series(out_k, dtype="int64"),
                "s1": pd.Series(out_s1, dtype="int64"),
                "s2": pd.Series(out_s2, dtype="int64"),
            }
        )
    return out, (k, s1, s2), pending, frontier, last_closed


def _encode_pending(pending: dict[int, int]) -> str:
    return ",".join(f"{h}:{c}" for h, c in sorted(pending.items()))


def _decode_pending(stored: str | None) -> dict[int, int]:
    if not stored:
        return {}
    out: dict[int, int] = {}
    for part in stored.split(","):
        h, c = part.split(":")
        out[int(h)] = int(c)
    return out


def _update_anomaly(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        k0, s10, s20, pend, frontier, last_closed = state.get
        hist, pending = (k0, s10, s20), _decode_pending(pend)
    else:
        hist, pending, frontier, last_closed = (0, 0, 0), {}, -1, -1
    out, hist, pending, frontier, last_closed = _anomaly_walk(
        list(pdfs), hist, pending, frontier, last_closed
    )
    state.update((
        hist[0], hist[1], hist[2], _encode_pending(pending),
        frontier, last_closed,
    ))
    if out is not None:
        out.insert(0, "event_type", key[0])
        yield out


def hourly_anomaly_updates(events: DataFrame) -> DataFrame:
    """Per-event-type closed-hour counts with prior-history moments."""
    from mc_ns_data_pipeline_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(events.sparkSession)
    return (
        events.select("event_type", "ts")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_anomaly,
            ANOMALY_OUTPUT_SCHEMA,
            ANOMALY_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def run_stream_anomaly(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    sink_table: str = "xs12_sink",
) -> DataFrame:
    """Run the anomaly stream to end-of-input; score z in engine SQL."""
    from mc_ns_data_pipeline_spark.session import scoped_conf
    from mc_ns_data_pipeline_spark.streaming.incremental import (
        _events_stream,
    )

    updates = hourly_anomaly_updates(_events_stream(spark, events_path))
    with scoped_conf(spark, {"spark.sql.shuffle.partitions": "8"}):
        q = (
            updates.writeStream.outputMode("append")
            .format("memory")
            .queryName(sink_table)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    raw = spark.table(sink_table)
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mean = d("s1") / d("k")
    var = (d("s2") - (d("s1") * d("s1")) / d("k")) / d("k")
    std = F.sqrt(var)
    z = F.round((d("n_events") - mean) / std, 6)
    ok = (F.col("k") >= 3) & (std > 0)
    return (
        raw.select(
            "event_type",
            "hour",
            "n_events",
            F.col("k").alias("n_prior_hours"),
            F.when(ok, z).alias("z_r"),
            F.when(ok, F.abs(z) >= F.lit(2.0))
            .otherwise(F.lit(False))
            .alias("is_anomaly"),
        )
        .orderBy("event_type", "hour")
    )
