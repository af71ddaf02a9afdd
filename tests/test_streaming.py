"""Streaming semantics: QS1 vs static oracle, restart + replace idempotency."""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.streaming.incremental import (
    run_incremental,
    run_incremental_with_replace,
    windowed_event_aggregate,
)
from mc_ns_data_pipeline_spark.catalog import load_table
from mc_ns_data_pipeline_spark.testing import canonicalize


def _events_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "events.parquet")


def test_stream_matches_static(spark, sf_dir, tmp_path):
    """availableNow streaming result == same aggregation run as batch."""
    sink = f"s_{uuid.uuid4().hex[:8]}"
    streamed = run_incremental(
        spark, _events_path(sf_dir), str(tmp_path / "ckpt"), sink_table=sink
    )
    static = windowed_event_aggregate(load_table(spark, sf_dir, "events"))
    s = canonicalize(streamed.columns, [tuple(r) for r in streamed.collect()])
    t = canonicalize(static.columns, [tuple(r) for r in static.collect()])
    assert s == t and len(s) > 0


def test_stream_restart_is_exactly_once(spark, sf_dir, tmp_path):
    """Re-running with the same checkpoint reprocesses nothing (T3)."""
    ckpt = str(tmp_path / "ckpt2")
    sink1 = f"s_{uuid.uuid4().hex[:8]}"
    first = run_incremental(
        spark, _events_path(sf_dir), ckpt, sink_table=sink1
    ).collect()
    sink2 = f"s_{uuid.uuid4().hex[:8]}"
    second = run_incremental(
        spark, _events_path(sf_dir), ckpt, sink_table=sink2
    )
    # offsets exhausted -> no new batch -> empty memory sink
    assert second.count() == 0
    assert len(first) > 0


def test_session_windows_resume_merges_state(spark, sf_dir, tmp_path):
    """XS4 kill/resume: stream half the events, stop, resume from the
    same checkpoint with the rest. Sessions that straddle the split must
    merge with state restored from the checkpoint — the risky part of
    cross-batch session windows — and the final result must equal the
    static gaps-and-islands computation over all events."""
    import pyarrow.parquet as pq

    from mc_ns_data_pipeline_spark.session import scoped_conf
    from mc_ns_data_pipeline_spark.streaming.incremental import (
        session_event_aggregate,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    pdf = ev.toPandas().sort_values("ts").reset_index(drop=True)
    # µs precision so the staged files read back as Spark timestamps
    # (ns-precision parquet needs the nanosAsLong long-surface path)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    mid = len(pdf) // 2
    early, late = pdf.iloc[:mid], pdf.iloc[mid:]

    # at least one user's session must straddle the split, else this
    # test wouldn't exercise the cross-batch merge
    last_early = early.groupby("user_id")["ts"].max()
    first_late = late.groupby("user_id")["ts"].min()
    joined = last_early.to_frame("a").join(first_late.to_frame("b"), how="inner")
    straddling = (
        (joined["b"] - joined["a"]).dt.total_seconds() < 4 * 3600
    ).sum()
    assert straddling > 0, "fixture has no session straddling the split"

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_sess")
    import pyarrow as pa

    pq.write_table(pa.Table.from_pandas(early), str(src / "part1.parquet"))

    def run_once(sink: str):
        stream = spark.readStream.schema("user_id long, ts timestamp").parquet(
            str(src)
        )
        agg = session_event_aggregate(stream)
        with scoped_conf(spark, {"spark.sql.shuffle.partitions": "8"}):
            q = (
                agg.writeStream.outputMode("complete")
                .format("memory")
                .queryName(sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return spark.table(sink)

    first = run_once(f"s_{uuid.uuid4().hex[:8]}")
    n_first = first.count()
    assert n_first > 0

    # "crash" over; second file lands, resume from the same checkpoint
    pq.write_table(pa.Table.from_pandas(late), str(src / "part2.parquet"))
    second = run_once(f"s_{uuid.uuid4().hex[:8]}")

    static = session_event_aggregate(ev)
    s = canonicalize(second.columns, [tuple(r) for r in second.collect()])
    t = canonicalize(static.columns, [tuple(r) for r in static.collect()])
    assert s == t and len(s) > 0


def test_stream_stream_join_joins_across_batches(spark, sf_dir, tmp_path):
    """XS5 kill/resume: click state checkpointed in batch 1 must still
    match purchases arriving in batch 2, and the union of both runs'
    append-mode emissions must equal the static interval join."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mc_ns_data_pipeline_spark.streaming.incremental import (
        run_stream_stream_join,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    p0 = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
    )
    c0 = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
    )
    join_cond = F.expr(
        "p_user_id = c_user_id "
        "AND c_ts BETWEEN p_ts - INTERVAL 1 HOUR AND p_ts"
    )
    # choose the file split from a REAL matched pair (click strictly
    # before purchase) so at least one match must cross the batch
    # boundary — a blind median split can miss at small sf
    seed = (
        p0.join(c0, join_cond)
        .filter(F.col("c_ts") < F.col("p_ts"))
        .orderBy("p_event_id")
        .first()
    )
    assert seed is not None, "fixture has no strictly-ordered join pair"
    split_ts = seed["c_ts"]

    pdf = ev.toPandas().sort_values("ts").reset_index(drop=True)
    # µs + UTC zone: watermarks require TIMESTAMP (ltz), and naive
    # parquet timestamps surface as TIMESTAMP_NTZ
    pdf["ts"] = pdf["ts"].astype("datetime64[us]").dt.tz_localize("UTC")
    mask = pdf["ts"].dt.tz_localize(None) <= split_ts
    early, late = pdf[mask], pdf[~mask]
    early_ids = set(early["event_id"])

    src = tmp_path / "src5"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt5")
    sink_dir = str(tmp_path / "sink5")
    pq.write_table(pa.Table.from_pandas(early), str(src / "part1.parquet"))
    first = run_stream_stream_join(
        spark, str(src), ckpt, sink_dir=sink_dir
    ).collect()
    n_first = len(first)

    pq.write_table(pa.Table.from_pandas(late), str(src / "part2.parquet"))
    both = run_stream_stream_join(
        spark, str(src), ckpt, sink_dir=sink_dir
    ).collect()
    new_pairs = [r for r in both if r not in first]
    assert len(both) > n_first

    # cross-batch evidence: some pair matched a batch-1 click to a
    # batch-2 purchase via restored join state
    crossed = [
        r for r in new_pairs
        if r["c_event_id"] in early_ids and r["p_event_id"] not in early_ids
    ]
    assert crossed, "no pair used click state restored from batch 1"

    static = p0.join(c0, join_cond).select(
        "p_event_id", "p_user_id", "p_ts", "c_event_id", "c_ts"
    )
    cols = ["p_event_id", "p_user_id", "p_ts", "c_event_id", "c_ts"]
    streamed = canonicalize(cols, [tuple(r) for r in both])
    want = canonicalize(cols, [tuple(r) for r in static.collect()])
    assert streamed == want and len(streamed) > 0


def test_replace_sink_idempotent(spark, sf_dir, tmp_path):
    """T8: foreachBatch dynamic-partition overwrite; rerun from scratch
    (new checkpoint) converges to the same table state."""
    target = str(tmp_path / "sink_table")
    run_incremental_with_replace(
        spark, _events_path(sf_dir), str(tmp_path / "c1"), target
    )
    once = spark.read.parquet(target)
    rows1 = canonicalize(once.columns, [tuple(r) for r in once.collect()])

    run_incremental_with_replace(
        spark, _events_path(sf_dir), str(tmp_path / "c2"), target
    )
    twice = spark.read.parquet(target)
    rows2 = canonicalize(twice.columns, [tuple(r) for r in twice.collect()])
    assert rows1 == rows2 and len(rows1) > 0
    shutil.rmtree(target, ignore_errors=True)


def test_windowed_aggregate_is_epoch_aligned(spark, sf_dir):
    agg = windowed_event_aggregate(load_table(spark, sf_dir, "events"))
    starts = [r[0] for r in agg.select("window_start").distinct().collect()]
    assert all(
        s.hour % 6 == 0 and s.minute == 0 and s.second == 0 for s in starts
    )


def test_latest_state_merge_converges(spark, sf_dir, tmp_path):
    """Newer-wins merge is idempotent AND order-insensitive: replaying
    a batch, or applying two batches in either order, converges to the
    same per-user latest state."""
    from mc_ns_data_pipeline_spark.streaming.incremental import (
        merge_latest_state,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    older = ev.filter(F.col("event_id") % 2 == 0)
    newer = ev.filter(F.col("event_id") % 2 == 1)

    t1 = str(tmp_path / "fwd")
    merge_latest_state(spark, older, t1)
    merge_latest_state(spark, newer, t1)
    merge_latest_state(spark, newer, t1)  # replay

    t2 = str(tmp_path / "rev")
    merge_latest_state(spark, newer, t2)
    merge_latest_state(spark, older, t2)

    da = spark.read.parquet(t1)
    db = spark.read.parquet(t2)
    a = canonicalize(da.columns, [tuple(r) for r in da.collect()])
    b = canonicalize(db.columns, [tuple(r) for r in db.collect()])
    assert a == b


def test_latest_state_restart_is_noop(spark, sf_dir, tmp_path):
    """Re-starting the xs6 stream with its checkpoint and no new input
    must leave the materialized state untouched (offsets committed)."""
    from mc_ns_data_pipeline_spark.streaming.incremental import (
        run_latest_state,
    )

    ckpt = str(tmp_path / "ckpt")
    target = str(tmp_path / "state")
    d1 = run_latest_state(spark, _events_path(sf_dir), ckpt, target)
    first = canonicalize(d1.columns, [tuple(r) for r in d1.collect()])
    d2 = run_latest_state(spark, _events_path(sf_dir), ckpt, target)
    again = canonicalize(d2.columns, [tuple(r) for r in d2.collect()])
    assert first == again


def test_pattern_detect_resume_carries_click_state(spark, sf_dir, tmp_path):
    """XS7 kill/resume: stream half the events, stop, resume from the
    same checkpoint with the rest. A purchase in the late half whose
    qualifying clicks arrived in the early half must still alert — the
    pruned click-window state has to survive the restart — and the
    union of both runs' append emissions must equal the static
    interval-join computation over all events."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mc_ns_data_pipeline_spark.session import scoped_conf
    from mc_ns_data_pipeline_spark.streaming.stateful import (
        PATTERN_MIN_CLICKS,
        PATTERN_WINDOW_HOURS,
        purchase_pattern_alerts,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    pdf = ev.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")

    # split right before an alerting purchase: the purchase lands in the
    # late half while ALL its qualifying clicks are early, so the alert
    # can only fire if the click-window state survives the restart
    import pandas as pd

    w = pd.Timedelta(hours=PATTERN_WINDOW_HOURS)
    clicks = pdf[pdf["event_type"] == "click"]
    split_at = None
    for p in pdf[pdf["event_type"] == "purchase"].itertuples():
        n_all = (
            (clicks["user_id"] == p.user_id)
            & (clicks["ts"] >= p.ts - w)
            & (clicks["ts"] <= p.ts)
        ).sum()
        if n_all >= PATTERN_MIN_CLICKS and p.Index > 0:
            split_at = p.Index
            break
    assert split_at is not None, "fixture has no alerting purchase"
    early, late = pdf.iloc[:split_at], pdf.iloc[split_at:]

    src = tmp_path / "src_xs7"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_xs7")
    pq.write_table(pa.Table.from_pandas(early), str(src / "part1.parquet"))

    out = str(tmp_path / "out_xs7")

    def run_once():
        # memory sink can't recover an append checkpoint; file sink can
        stream = spark.readStream.schema(
            "user_id long, event_id long, ts timestamp, event_type string"
        ).parquet(str(src))
        alerts = purchase_pattern_alerts(stream)
        with scoped_conf(spark, {"spark.sql.shuffle.partitions": "8"}):
            q = (
                alerts.writeStream.outputMode("append")
                .format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return spark.read.parquet(out)

    n_first = run_once().count()

    pq.write_table(pa.Table.from_pandas(late), str(src / "part2.parquet"))
    merged = run_once().collect()
    assert len(merged) > n_first  # the straddling purchase alerted

    cols = ["user_id", "event_id", "ts", "n_recent_clicks"]
    streamed = canonicalize(cols, [tuple(r) for r in merged])

    e = ev.alias("p").join(
        ev.alias("c"),
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("c.event_type") == F.lit("click"))
        & (F.col("c.ts") >= F.col("p.ts") - F.expr(
            f"INTERVAL {PATTERN_WINDOW_HOURS} HOURS"))
        & (F.col("c.ts") <= F.col("p.ts")),
    ).where(F.col("p.event_type") == "purchase").groupBy(
        "p.user_id", "p.event_id", "p.ts"
    ).agg(F.count(F.lit(1)).alias("n_recent_clicks")).where(
        F.col("n_recent_clicks") >= PATTERN_MIN_CLICKS
    )
    static = canonicalize(cols, [tuple(r) for r in e.collect()])
    assert streamed == static and len(streamed) > 0


def test_stream_static_enrich_matches_static(spark, sf_dir, tmp_path):
    """XS8: stream-static broadcast join + windowed agg == batch twin."""
    from mc_ns_data_pipeline_spark.streaming.incremental import (
        dim_enriched_aggregate,
        run_stream_static_enrich,
    )

    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    sink = f"s_{uuid.uuid4().hex[:8]}"
    streamed = run_stream_static_enrich(
        spark, _events_path(sf_dir), dim, str(tmp_path / "ckpt"),
        sink_table=sink,
    )
    static = dim_enriched_aggregate(
        load_table(spark, sf_dir, "events"), dim,
        stream_key="user_id", dim_key="c_custkey",
        group_col="c_nationkey",
    )
    s = canonicalize(streamed.columns, [tuple(r) for r in streamed.collect()])
    t = canonicalize(static.columns, [tuple(r) for r in static.collect()])
    assert s == t and len(s) > 0


def test_bounded_dedup_restart_emits_nothing_new(spark, sf_dir, tmp_path):
    """XS9 kill/resume: a second run from the same checkpoint with no
    new input must re-emit nothing (dedup state + offsets both live in
    the checkpoint), and the first run must equal the static DISTINCT."""
    from mc_ns_data_pipeline_spark.streaming.stateful import (
        run_stream_dedup_bounded,
    )

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    d1 = run_stream_dedup_bounded(
        spark, _events_path(sf_dir), ckpt, output_path=out
    )
    first = canonicalize(d1.columns, [tuple(r) for r in d1.collect()])

    static = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type",
                F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"))
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_user_days"))
    )
    expected = canonicalize(
        static.columns, [tuple(r) for r in static.collect()]
    )
    assert first == expected

    n_rows_first = spark.read.parquet(out).count()
    d2 = run_stream_dedup_bounded(
        spark, _events_path(sf_dir), ckpt, output_path=out
    )
    # same checkpoint, no new input: zero re-emissions, sink unchanged
    assert spark.read.parquet(out).count() == n_rows_first
    again = canonicalize(d2.columns, [tuple(r) for r in d2.collect()])
    assert again == first


def test_stream_quality_gate_dead_letters_errors(spark, tmp_path, sf_dir):
    """The in-stream gate quarantines every 'error' event with its
    named violation, accepted+dead partitions the input, and the
    dead-letter table is replayable (re-gating it re-rejects)."""
    import pyspark.sql.functions as F

    from mc_ns_data_pipeline_spark.quality import split_valid
    from mc_ns_data_pipeline_spark.streaming.incremental import (
        event_quality_rules,
        run_stream_quality_gate,
    )

    accepted_dir = str(tmp_path / "acc")
    dead_dir = str(tmp_path / "dead")
    out = run_stream_quality_gate(
        spark, f"{sf_dir}/events.parquet", str(tmp_path / "ckpt"),
        accepted_dir, dead_dir,
    )
    n_accepted = out.agg(F.sum("n_events")).collect()[0][0]
    dead = spark.read.option("recursiveFileLookup", "true").parquet(dead_dir)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert n_accepted + dead.count() == events.count()
    # every error event is dead-lettered, and carries the rule name
    n_errors = events.filter("event_type = 'error'").count()
    assert dead.filter("event_type = 'error'").count() == n_errors
    assert dead.filter(
        F.array_contains("_violations", "known_type")
    ).count() == n_errors
    # replay: re-gating the dead rows rejects them again (same rules)
    replay_valid, replay_dead = split_valid(
        dead.drop("_violations", "_dead_lettered_at"),
        event_quality_rules(),
    )
    assert replay_valid.count() == 0
    assert replay_dead.count() == dead.count()


def test_stream_quality_gate_replayed_batch_is_idempotent(spark, tmp_path):
    """Replaying a micro-batch with the same batch id (the crash-
    between-sinks recovery path) overwrites its own output instead of
    appending a duplicate copy."""
    import pyspark.sql.functions as F

    from mc_ns_data_pipeline_spark.quality import split_valid
    from mc_ns_data_pipeline_spark.streaming.incremental import (
        event_quality_rules,
    )

    batch = spark.createDataFrame(
        [(1, "click", 1.0, 7), (2, "error", 2.0, 8), (3, "view", 3.0, 9)],
        "event_id long, event_type string, value double, user_id long",
    )
    acc = str(tmp_path / "acc")
    dead = str(tmp_path / "dead")

    def gate(batch_df, batch_id):
        valid, d = split_valid(batch_df, event_quality_rules())
        valid.write.mode("overwrite").parquet(f"{acc}/batch_{batch_id}")
        d.withColumn("_dead_lettered_at", F.current_timestamp()).write.mode(
            "overwrite"
        ).parquet(f"{dead}/batch_{batch_id}")

    gate(batch, 0)
    gate(batch, 0)  # replay after simulated crash
    acc_rows = spark.read.option("recursiveFileLookup", "true").parquet(acc)
    dead_rows = spark.read.option("recursiveFileLookup", "true").parquet(dead)
    assert acc_rows.count() == 2
    assert dead_rows.count() == 1


# ---------------------------------------------------------------------------
# XS12: anomaly walk — event-time determinism under adversarial chunking
# ---------------------------------------------------------------------------


def _walk_chunked(hours_chunks, disorder=3):
    """Drive _anomaly_walk over a sequence of micro-batches; each chunk
    is a list of (hour_index, n_events) pairs. Returns the emitted rows
    as a list of (hour, n, k, s1, s2) tuples in emission order."""
    import pandas as pd

    from mc_ns_data_pipeline_spark.streaming.stateful import (
        HOUR_US,
        _anomaly_walk,
    )

    hist, pending, frontier, last_closed = (0, 0, 0), {}, -1, -1
    rows = []
    for chunk in hours_chunks:
        ts = [
            pd.Timestamp(h * HOUR_US * 1000)
            for h, n in chunk
            for _ in range(n)
        ]
        frames = [pd.DataFrame({"ts": ts})]
        out, hist, pending, frontier, last_closed = _anomaly_walk(
            frames, hist, pending, frontier, last_closed, disorder
        )
        if out is not None:
            rows.extend(
                (
                    int(r.hour.value // (HOUR_US * 1000)),
                    int(r.n_events), int(r.k), int(r.s1), int(r.s2),
                )
                for r in out.itertuples()
            )
    return rows


def test_anomaly_walk_chunking_independent():
    """The review's counterexample: hours {10,12} then {9,13} must give
    the same emissions as one batch of {9,10,12,13} — hour 9's prior
    moments must NOT fold hour 10 in. Every chunking of a
    disorder-bounded history must agree exactly."""
    import itertools

    events = [(10, 4), (12, 2), (9, 3), (13, 5), (14, 1), (15, 2),
              (16, 7), (17, 1)]
    single = _walk_chunked([sorted(events)])
    # the walk closes hours <= frontier-3: with frontier 17 -> 9..14
    assert [r[0] for r in single] == [9, 10, 12, 13, 14]
    # hour 9 closes FIRST: zero prior history
    assert single[0] == (9, 3, 0, 0, 0)
    # hour 10's prior is exactly hour 9
    assert single[1] == (10, 4, 1, 3, 9)

    for cut1 in range(1, len(events)):
        for cut2 in range(cut1, len(events)):
            chunks = [
                events[:cut1], events[cut1:cut2], events[cut2:],
            ]
            got = _walk_chunked([c for c in chunks if c])
            assert got == single, chunks

    # the literal review scenario
    assert _walk_chunked([[(10, 4), (12, 2)], [(9, 3), (13, 5)],
                          [(14, 1), (15, 2), (16, 7), (17, 1)]]) == single

    # permuted arrival order within the bound also agrees
    for perm in itertools.permutations(events[:4]):
        got = _walk_chunked([list(perm), events[4:]])
        assert got == single


def test_anomaly_walk_drops_beyond_disorder_stragglers():
    """An hour arriving after the watermark closed past it is dropped,
    never re-opened (a closed row is final)."""
    rows = _walk_chunked([[(10, 2), (20, 1)], [(10, 9), (11, 3)],
                          [(30, 1)]])
    # frontier 20 closes 10 (n=2) and 11? 11 arrives later: batch2
    # has 11 pending; batch3 frontier 30 closes 11 and 20.
    assert [(h, n) for h, n, *_ in rows] == [(10, 2), (11, 3), (20, 1)]
    # the straggler (10, 9) after closure did not produce a second row
    assert len([r for r in rows if r[0] == 10]) == 1


def test_stream_anomaly_end_to_end_matches_static(spark, tmp_path):
    """run_stream_anomaly over a parquet file must equal the static
    window-moment computation (the xs12 oracle shape)."""
    import pandas as pd

    from mc_ns_data_pipeline_spark.streaming.stateful import (
        run_stream_anomaly,
    )

    rows = []
    eid = 0
    base = pd.Timestamp("2025-03-01T00:00:00")
    for h, n in [(0, 5), (1, 6), (2, 7), (3, 8), (4, 50), (5, 5),
                 (6, 5), (7, 5), (8, 5)]:
        for i in range(n):
            rows.append((eid, base + pd.Timedelta(hours=h, seconds=i),
                         eid % 7, "click", 1.0, "{}"))
            eid += 1
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value",
                 "props"],
    )
    src = str(tmp_path / "events.parquet")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)

    out = run_stream_anomaly(
        spark, src, str(tmp_path / "ckpt"), sink_table="xs12_test_sink"
    ).collect()
    # frontier hour 8, disorder 3 -> hours 0..5 close
    assert [r.hour.hour for r in out] == [0, 1, 2, 3, 4, 5]
    by_hour = {r.hour.hour: r for r in out}
    assert by_hour[4].n_prior_hours == 4
    assert by_hour[4].is_anomaly  # 50 vs prior mean 6.5, ~39 sigma
    assert by_hour[2].z_r is None  # k=2 < 3: not scoreable yet
    assert by_hour[0].z_r is None and not by_hour[0].is_anomaly


def test_merge_zone_maps_replay_is_exactly_once(spark, tmp_path):
    """XS13's combine-merge is sum-based, so replay safety rides on the
    epoch markers: re-applying an epoch after a simulated crash must
    not double-count, and a NEW epoch must still merge."""
    from mc_ns_data_pipeline_spark.streaming.incremental import (
        merge_zone_maps,
    )

    target = str(tmp_path / "zm")
    part = spark.createDataFrame(
        [(0, 10, "2024-01-01 00:00:00", "2024-01-01 01:00:00", 1.0, 9.0)],
        "bucket long, n_rows long, min_ts string, max_ts string,"
        " min_value double, max_value double",
    ).selectExpr(
        "bucket", "n_rows", "CAST(min_ts AS TIMESTAMP) min_ts",
        "CAST(max_ts AS TIMESTAMP) max_ts", "min_value", "max_value",
    )
    merge_zone_maps(spark, part, target, epoch_id=0)
    merge_zone_maps(spark, part, target, epoch_id=0)  # replayed batch
    got = spark.read.parquet(target).collect()
    assert len(got) == 1 and got[0].n_rows == 10

    merge_zone_maps(spark, part, target, epoch_id=1)  # genuinely new
    got = spark.read.parquet(target).collect()
    assert got[0].n_rows == 20
    assert got[0].min_value == 1.0 and got[0].max_value == 9.0


def test_stream_incremental_dedup_across_batches(spark, sf_dir, tmp_path):
    """XS14 kill/resume: half the corpus streams, the index persists,
    the second half streams against it. The union of pair emissions
    must equal the batch MinHash+LSH pairs over the WHOLE corpus, and
    crucially the second run must emit old-new pairs it can only find
    via the persisted index (its own batch lacks the old text)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mc_ns_data_pipeline_spark.operators.dedup import (
        minhash_dedup_pairs,
    )
    from mc_ns_data_pipeline_spark.streaming.incremental import (
        run_stream_incremental_dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    mid = len(pdf) // 2
    early, late = pdf.iloc[:mid], pdf.iloc[mid:]
    early_ids = set(early["doc_id"])

    src = tmp_path / "docs_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt14")
    store = str(tmp_path / "store14")
    pq.write_table(pa.Table.from_pandas(early), str(src / "p1.parquet"))
    first = run_stream_incremental_dedup(
        spark, str(src), ckpt, store
    ).collect()

    pq.write_table(pa.Table.from_pandas(late), str(src / "p2.parquet"))
    both = run_stream_incremental_dedup(
        spark, str(src), ckpt, store
    ).collect()
    assert len(both) > len(first)

    # cross-batch evidence: an old-new pair found via the stored index
    crossed = [
        r for r in both
        if (r.doc_a in early_ids) != (r.doc_b in early_ids)
    ]
    assert crossed, "no pair used the persisted LSH index"

    batch = minhash_dedup_pairs(docs, threshold=0.5).collect()
    fmt = lambda rows: sorted(  # noqa: E731
        (r.doc_a, r.doc_b, round(r.jaccard, 9)) for r in rows
    )
    assert fmt(both) == fmt(batch)


def test_stream_dedup_index_probe_stays_bounded(spark, sf_dir, tmp_path):
    """XS14 scale contract (VERDICT r07 #2): the per-batch index read
    is bounded by candidate buckets + the LSM compaction cadence, NOT
    by how many epochs the stream has lived. 12 epochs stream through;
    every probe must see at most IDX_COMPACT_EVERY delta dirs + one
    base (previously: one dir per prior epoch, linear growth), while
    the emitted pair union still reproduces the batch LSH result."""
    import json

    from mc_ns_data_pipeline_spark.operators.dedup import (
        minhash_dedup_pairs,
    )
    from mc_ns_data_pipeline_spark.streaming.incremental import (
        IDX_COMPACT_EVERY,
        _LshIndexStore,
        dedup_index_batch,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    n_epochs = 12
    step = max(1, (len(pdf) + n_epochs - 1) // n_epochs)

    store = _LshIndexStore(spark, str(tmp_path / "idx"))
    for epoch in range(n_epochs):
        chunk = pdf.iloc[epoch * step:(epoch + 1) * step]
        dedup_index_batch(
            spark, spark.createDataFrame(chunk, schema=docs.schema),
            epoch, store)

    stats = [
        json.loads(line)
        for line in open(tmp_path / "idx" / "_probe_stats.jsonl")
    ]
    assert len(stats) == n_epochs
    # structural bound: base + at-most-IDX_COMPACT_EVERY deltas per probe
    worst = max(s["bands"]["epoch_dirs"] for s in stats)
    assert worst <= IDX_COMPACT_EVERY + 1, (
        f"probe saw {worst} index dirs; compaction is not bounding reads"
    )
    # the unpruned cost (files_total) must exceed what late probes read
    late = stats[-1]["bands"]
    assert late["files_read"] <= late["files_total"]
    # compaction actually ran (a base exists) and the index is not
    # re-reading one-dir-per-epoch
    assert store._base_version("bands") is not None
    assert stats[-1]["bands"]["epoch_dirs"] < n_epochs - 1

    # parity: sequenced increments == batch MinHash+LSH over the corpus
    got = (
        spark.read.option("basePath", str(tmp_path / "idx" / "pairs"))
        .parquet(str(tmp_path / "idx" / "pairs"))
        .drop("epoch")
        .collect()
    )
    want = minhash_dedup_pairs(docs, threshold=0.5).collect()
    fmt = lambda rows: sorted(  # noqa: E731
        (r.doc_a, r.doc_b, round(r.jaccard, 9)) for r in rows
    )
    assert fmt(got) == fmt(want)


def test_stream_ann_index_across_batches(spark, sf_dir, tmp_path):
    """XS15 kill/resume: half the embeddings stream (carrying the
    codebook ids), the postings persist, the rest streams against the
    same store. The final answer must equal the BATCH ivf_topk over
    the whole corpus, and the answering read must touch only the
    probed lists' buckets (never every list)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mc_ns_data_pipeline_spark.operators.similarity import ivf_topk
    from mc_ns_data_pipeline_spark.streaming.incremental import (
        run_stream_ann_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    mid = len(pdf) // 2
    src = tmp_path / "emb_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt15")
    store = str(tmp_path / "store15")

    pq.write_table(pa.Table.from_pandas(pdf.iloc[:mid]),
                   str(src / "p1.parquet"))
    first = run_stream_ann_index(spark, str(src), ckpt, store).collect()
    assert first, "first increment answered nothing"

    pq.write_table(pa.Table.from_pandas(pdf.iloc[mid:]),
                   str(src / "p2.parquet"))
    got = run_stream_ann_index(spark, str(src), ckpt, store).collect()

    want = ivf_topk(
        emb, F.col("vec_id") < 20, k=3, n_centroids=16, n_probe=2
    ).collect()
    fmt = lambda rows: [  # noqa: E731
        (r.query_id, r.rank, r.neighbor_id, round(r.cos_r, 6))
        for r in rows
    ]
    assert fmt(got) == fmt(want)

    # probe evidence needs a query set that is NOT the centroid set
    # (queries 0..15 ARE the 16 centroids, so their top-1 probes cover
    # every list by construction): 3 non-centroid queries probe at
    # most 6 of 16 lists, and the answering read must touch only those
    got3 = run_stream_ann_index(
        spark, str(src), str(tmp_path / "ckpt15b"),
        str(tmp_path / "store15b"), query_min_id=17).collect()
    want3 = ivf_topk(
        emb, (F.col("vec_id") >= 17) & (F.col("vec_id") < 20),
        k=3, n_centroids=16, n_probe=2).collect()
    assert fmt(got3) == fmt(want3)
    stats = [
        json.loads(line)
        for line in open(tmp_path / "store15b" / "_probe_stats.jsonl")
    ]
    final = [s for s in stats if s["epoch"] == -1][-1]["postings"]
    assert final["dirs_read"] < final["dirs_total"], (
        "probe read every list; IVF pruning is not happening")
