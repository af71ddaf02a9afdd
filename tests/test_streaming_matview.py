"""Streaming incremental materialized view (streaming/incremental.py
run_stream_matview): a change feed maintains a row-level replica AND
a group-level aggregate view, exact through MOR deletes (retracted
values recovered from the replica's pre-batch state) and restarts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.sinks import versioned as V
from mc_ns_data_pipeline_spark.streaming.incremental import (
    run_stream_matview,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, g string, val double")


def _view(spark, view):
    return {(r.g, r.n, float(r.sum_value))
            for r in V.read_current(spark, view).filter("n > 0")
            .collect()}


def _want(spark, src):
    return {(r.g, r.n, float(r.sum_value))
            for r in V.read_current(spark, src)
            .groupBy("g")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("val").cast("decimal(18,4)"))
                 .alias("sum_value"))
            .collect()}


def _setup(spark, tmp_path):
    src = str(tmp_path / "src")
    rep = str(tmp_path / "rep")
    view = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")
    V.write_snapshot(_df(spark, [(1, "a", 10.0), (2, "b", 20.0),
                                 (3, "a", 30.0)]), src)
    mark = V.current_snapshot(src)
    V.write_snapshot(V.read_current(spark, src), rep)
    return src, rep, view, ckpt, mark


def test_view_tracks_inserts_upserts_deletes(spark, tmp_path):
    src, rep, view, ckpt, mark = _setup(spark, tmp_path)
    V.append_snapshot(_df(spark, [(4, "b", 40.0)]), src)
    V.delete_keys_mor(spark, src, "k",
                      _df(spark, [(1, "a", 0.0)]).select("k"))
    # upsert moves k=3 from group a to group b and changes its value
    V.merge_snapshot_mor(spark, _df(spark, [(3, "b", 35.0)]),
                         src, "k")
    run_stream_matview(spark, src, rep, view, ckpt, "k", "g", "val",
                       starting=mark)
    # replica tracks, view = direct aggregate of the net state
    assert _view(spark, view) == _want(spark, src) == {
        ("b", 3, 95.0)}
    # group 'a' emptied out: present with n=0, filtered by the reader
    zero = {(r.g, r.n) for r in
            V.read_current(spark, view).filter("n = 0").collect()}
    assert zero == {("a", 0)}


def test_view_survives_restart_and_revival(spark, tmp_path):
    src, rep, view, ckpt, mark = _setup(spark, tmp_path)
    V.delete_keys_mor(spark, src, "k",
                      _df(spark, [(2, "b", 0.0)]).select("k"))
    run_stream_matview(spark, src, rep, view, ckpt, "k", "g", "val",
                       starting=mark)
    assert _view(spark, view) == _want(spark, src)
    # more commits while down; group b revives after emptying
    V.append_snapshot(_df(spark, [(5, "b", 50.0), (6, "c", 60.0)]),
                      src)
    V.merge_snapshot_mor(spark, _df(spark, [(1, "a", 11.0)]),
                         src, "k")
    run_stream_matview(spark, src, rep, view, ckpt, "k", "g", "val",
                       starting=mark)
    assert _view(spark, view) == _want(spark, src) == {
        ("a", 2, 41.0), ("b", 1, 50.0), ("c", 1, 60.0)}
    # idle restart: view untouched
    before = V.current_snapshot(view)
    run_stream_matview(spark, src, rep, view, ckpt, "k", "g", "val",
                       starting=mark)
    assert V.current_snapshot(view) == before


def test_capped_matview_batch_bounds_broadcast_key_set(
        spark, tmp_path, monkeypatch):
    """VERDICT r10 #2: with admission control set, each matview batch
    computes its delta over ONLY the capped batch's key set — the
    F.broadcast(keys) inside matview_delta_batch is bounded by the
    cap, never by how far the consumer fell behind. 6 commits of ≤2
    keys each with max_commits_per_trigger=1 must arrive as 6
    batches whose per-batch key sets never exceed one commit's."""
    import mc_ns_data_pipeline_spark.streaming.incremental as I

    src, rep, view, ckpt, mark = _setup(spark, tmp_path)
    for i in range(6):
        V.append_snapshot(
            _df(spark, [(10 + 2 * i, "a", 1.0),
                        (11 + 2 * i, "b", 2.0)]), src)

    seen_keys: list[int] = []
    real = I.matview_delta_batch

    def probe(spark_, batch_df, *a, **kw):
        seen_keys.append(
            batch_df.select("k").distinct().count())
        return real(spark_, batch_df, *a, **kw)

    monkeypatch.setattr(I, "matview_delta_batch", probe)
    run_stream_matview(spark, src, rep, view, ckpt, "k", "g", "val",
                       starting=mark, max_commits_per_trigger=1)
    assert len(seen_keys) == 6          # ⌈6 commits / cap 1⌉
    assert max(seen_keys) <= 2          # one commit's keys per batch
    assert sum(seen_keys) == 12         # whole backlog still applied
    assert _view(spark, view) == _want(spark, src)


# ---------------------------------------------------------------------------
# minmax=True: the non-invertible aggregates (matview_minmax_batch)
# ---------------------------------------------------------------------------


def _view_mm(spark, view):
    return {(r.g, r.n, float(r.sum_value), r.min_value, r.max_value)
            for r in V.read_current(spark, view).filter("n > 0")
            .collect()}


def _want_mm(spark, src):
    return {(r.g, r.n, float(r.sum_value), r.min_value, r.max_value)
            for r in V.read_current(spark, src)
            .groupBy("g")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("val").cast("decimal(18,4)"))
                 .alias("sum_value"),
                 F.min(F.col("val").cast("double"))
                 .alias("min_value"),
                 F.max(F.col("val").cast("double"))
                 .alias("max_value"))
            .collect()}


def test_minmax_view_recomputes_lost_extrema(spark, tmp_path):
    """Deleting the row that CARRIED a group's max, and replacing
    another group's max downward, both force the recompute path — a
    monotone-only merge would keep the stale bounds. A brand-new
    group in the same batch takes the monotone path."""
    src, rep, view, ckpt, mark = _setup(spark, tmp_path)
    # group a's max is (3, 30.0): delete it
    V.delete_keys_mor(spark, src, "k",
                      _df(spark, [(3, "a", 0.0)]).select("k"))
    # group b's only row (2, 20.0): replace DOWNWARD to 5.0
    V.merge_snapshot_mor(spark, _df(spark, [(2, "b", 5.0)]),
                         src, "k")
    # brand-new group c: monotone path
    V.append_snapshot(_df(spark, [(7, "c", 70.0)]), src)
    run_stream_matview(spark, src, rep, view, ckpt, "k", "g", "val",
                       starting=mark, minmax=True)
    assert _view_mm(spark, view) == _want_mm(spark, src) == {
        ("a", 1, 10.0, 10.0, 10.0),
        ("b", 1, 5.0, 5.0, 5.0),
        ("c", 1, 70.0, 70.0, 70.0)}


def test_minmax_group_empties_then_revives(spark, tmp_path):
    """A group that loses every row stays in the view with n=0 and
    NULL bounds; a later insert revives it through the monotone
    merge (least/greatest skip the NULL old bound)."""
    src, rep, view, ckpt, mark = _setup(spark, tmp_path)
    V.delete_keys_mor(spark, src, "k",
                      _df(spark, [(2, "b", 0.0)]).select("k"))
    run_stream_matview(spark, src, rep, view, ckpt, "k", "g", "val",
                       starting=mark, minmax=True)
    zero = [(r.n, r.min_value, r.max_value) for r in
            V.read_current(spark, view).filter("g = 'b'").collect()]
    assert zero == [(0, None, None)]
    V.append_snapshot(_df(spark, [(8, "b", 80.0)]), src)
    run_stream_matview(spark, src, rep, view, ckpt, "k", "g", "val",
                       starting=mark, minmax=True)
    assert _view_mm(spark, view) == _want_mm(spark, src)
    assert ("b", 1, 80.0, 80.0, 80.0) in _view_mm(spark, view)


def test_minmax_batch_replay_is_stamp_skipped(spark, tmp_path):
    """matview_minmax_batch inherits matview_delta_batch's replay
    contract: before the replica has the batch applied, a replay
    with the same txn_id recomputes the SAME merge and the txn stamp
    skips it — the view snapshot does not move."""
    from mc_ns_data_pipeline_spark.streaming.incremental import (
        matview_minmax_batch,
    )

    rep = str(tmp_path / "rep")
    view = str(tmp_path / "view")
    V.write_snapshot(_df(spark, [(1, "a", 10.0), (2, "b", 20.0),
                                 (3, "a", 30.0)]), rep)
    V.write_snapshot(
        V.read_current(spark, rep).groupBy("g")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("val").cast("decimal(18,4)"))
             .alias("sum_value"),
             F.min(F.col("val").cast("double")).alias("min_value"),
             F.max(F.col("val").cast("double")).alias("max_value")),
        view)
    ev = spark.createDataFrame(
        [(3, None, None, "delete", 2),
         (4, "b", 40.0, "insert", 2)],
        "k int, g string, val double, _change_type string,"
        " _commit_gen long")
    matview_minmax_batch(spark, ev, rep, view, "k", "g", "val",
                         "replay:0")
    after_first = V.current_snapshot(view)
    assert _view_mm(spark, view) == {
        ("a", 1, 10.0, 10.0, 10.0),
        ("b", 2, 60.0, 20.0, 40.0)}
    matview_minmax_batch(spark, ev, rep, view, "k", "g", "val",
                         "replay:0")
    assert V.current_snapshot(view) == after_first
