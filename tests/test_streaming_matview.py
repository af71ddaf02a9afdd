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
