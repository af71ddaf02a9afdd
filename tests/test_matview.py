"""Incrementally-maintained aggregate views (sinks/matview.py).

The invariant under test everywhere: after any refresh sequence, the
view's content EQUALS a from-scratch aggregate of the source's current
snapshot — increments are an optimization, never the semantics — and
the refresh mode honestly reports whether the delta fast path ran.
"""

import pytest

from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.sinks import matview as MV
from mc_ns_data_pipeline_spark.sinks import versioned as V


def _src(spark, rows):
    return spark.createDataFrame(rows, "grp string, x int")


def _view_state(spark, view):
    return {
        (r.grp, r.n_rows, r.sum_x)
        for r in V.read_current(spark, view)
        .select("grp", "n_rows", "sum_x").collect()
    }


def _expected(spark, source):
    return {
        (r.grp, r.n_rows, r.sum_x)
        for r in V.read_current(spark, source)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.sum("x").alias("sum_x"))
        .collect()
    }


def test_bootstrap_then_incremental_refresh(spark, tmp_path):
    source, view = str(tmp_path / "src"), str(tmp_path / "mv")
    V.write_snapshot(_src(spark, [("a", 1), ("a", 2), ("b", 3)]),
                     source)
    out = MV.refresh_aggregate_view(spark, source, view, ["grp"], ["x"])
    assert out["mode"] == "bootstrap"
    assert _view_state(spark, view) == {("a", 2, 3), ("b", 1, 3)}

    # Append touching one existing group and one NEW group.
    V.append_snapshot(_src(spark, [("a", 10), ("c", 5)]), source)
    out = MV.refresh_aggregate_view(spark, source, view, ["grp"], ["x"])
    assert out["mode"] == "increment"
    assert _view_state(spark, view) == _expected(spark, source) == {
        ("a", 3, 13), ("b", 1, 3), ("c", 1, 5)}

    # Idempotent: nothing new -> noop, state unchanged.
    out = MV.refresh_aggregate_view(spark, source, view, ["grp"], ["x"])
    assert out["mode"] == "noop"
    assert _view_state(spark, view) == _expected(spark, source)


def test_increment_consumes_only_delta_files(spark, tmp_path):
    """The refresh's source-side read is the delta commits' new_files,
    never the bootstrap files — proven the blunt way: delete the
    bootstrap-era pool files and refresh anyway."""
    import os

    source, view = str(tmp_path / "src"), str(tmp_path / "mv")
    V.write_snapshot(_src(spark, [("a", 1), ("b", 2)]), source)
    MV.refresh_aggregate_view(spark, source, view, ["grp"], ["x"])
    base_files = set(
        V.read_manifest(source, V.current_snapshot(source))["files"])
    V.append_snapshot(_src(spark, [("a", 7)]), source)
    for f in base_files:  # make any base-file read fail loudly
        os.rename(os.path.join(source, "data", f),
                  os.path.join(source, "data", f + ".hidden"))
    out = MV.refresh_aggregate_view(spark, source, view, ["grp"], ["x"])
    assert out["mode"] == "increment"
    for f in base_files:
        os.rename(os.path.join(source, "data", f + ".hidden"),
                  os.path.join(source, "data", f))
    assert _view_state(spark, view) == {("a", 2, 8), ("b", 1, 2)}


def test_refresh_exactly_once_under_replay(spark, tmp_path):
    """The watermark travels IN the view commit: replaying a refresh
    whose publish already flipped must not double-fold the delta (the
    crash-after-flip-before-caller-learns case)."""
    source, view = str(tmp_path / "src"), str(tmp_path / "mv")
    V.write_snapshot(_src(spark, [("a", 1)]), source)
    MV.refresh_aggregate_view(spark, source, view, ["grp"], ["x"])
    V.append_snapshot(_src(spark, [("a", 5)]), source)
    target = V.current_snapshot(source)
    for _ in range(3):  # refresh + 2 replays
        MV.refresh_aggregate_view(spark, source, view, ["grp"], ["x"])
    assert _view_state(spark, view) == {("a", 2, 6)}
    assert MV.view_watermark(view) == target


def test_rewrite_history_falls_back_to_rebuild(spark, tmp_path):
    """A merge/delete in the source range cannot fold incrementally
    (old values unknown) — the refresh reports an honest full rebuild
    and the result still equals the from-scratch aggregate."""
    source, view = str(tmp_path / "src"), str(tmp_path / "mv")
    V.write_snapshot(_src(spark, [("a", 1), ("a", 2), ("b", 3)]),
                     source)
    MV.refresh_aggregate_view(spark, source, view, ["grp"], ["x"])
    V.delete_keys_mor(spark, source, "x",
                      spark.createDataFrame([(2,)], "x int"))
    out = MV.refresh_aggregate_view(spark, source, view, ["grp"], ["x"])
    assert out["mode"] == "rebuild"
    assert _view_state(spark, view) == _expected(spark, source) == {
        ("a", 1, 1), ("b", 1, 3)}


def test_multi_column_groups_and_null_group_values(spark, tmp_path):
    source, view = str(tmp_path / "src"), str(tmp_path / "mv")
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), (None, "x", 4), ("a", "x", 8)],
        "g1 string, g2 string, x int")
    V.write_snapshot(df, source)
    MV.refresh_aggregate_view(spark, source, view, ["g1", "g2"], ["x"])
    V.append_snapshot(
        spark.createDataFrame([(None, "x", 16)],
                              "g1 string, g2 string, x int"), source)
    MV.refresh_aggregate_view(spark, source, view, ["g1", "g2"], ["x"])
    got = {(r.g1, r.g2, r.n_rows, r.sum_x)
           for r in V.read_current(spark, view)
           .select("g1", "g2", "n_rows", "sum_x").collect()}
    assert got == {("a", "x", 2, 9), ("a", "y", 1, 2),
                   (None, "x", 2, 20)}


def test_decimal_sums_keep_their_type_across_refreshes(spark, tmp_path):
    """Spark widens decimal precision on addition; the fold must cast
    back to the view's recorded type or refresh #2 trips the
    schema-evolution type check."""
    source, view = str(tmp_path / "src"), str(tmp_path / "mv")
    df = spark.createDataFrame([("a", 1.5), ("b", 2.25)],
                               "grp string, x double").select(
        "grp", F.col("x").cast("decimal(18,4)").alias("x"))
    V.write_snapshot(df, source)
    MV.refresh_aggregate_view(spark, source, view, ["grp"], ["x"])
    t0 = V.table_schema(view, V.current_snapshot(view))
    for val in ("3.5", "4.25"):
        V.append_snapshot(
            spark.createDataFrame([("a", val)], "grp string, x string")
            .select("grp", F.col("x").cast("decimal(18,4)").alias("x")),
            source)
        out = MV.refresh_aggregate_view(spark, source, view,
                                        ["grp"], ["x"])
        assert out["mode"] == "increment"
    assert V.table_schema(view, V.current_snapshot(view)) == t0
    got = {(r.grp, str(r.sum_x)) for r in
           V.read_current(spark, view).select("grp", "sum_x").collect()}
    assert got == {("a", "9.2500"), ("b", "2.2500")}


def test_increment_is_file_granular_on_the_view(spark, tmp_path):
    """A delta touching one group must not rewrite view files holding
    only other groups — the COW reuse property carries to the view."""
    source, view = str(tmp_path / "src"), str(tmp_path / "mv")
    V.write_snapshot(
        spark.createDataFrame([(f"g{i:03d}", 1) for i in range(100)],
                              "grp string, x int"), source)
    MV.refresh_aggregate_view(spark, source, view, ["grp"], ["x"])
    # Cluster the view so groups land in disjoint files.
    V.compact_snapshot(spark, view, sort_col=MV.GROUP_KEY,
                       target_files=4)
    V.append_snapshot(_src(spark, [("g000", 9)]), source)
    MV.refresh_aggregate_view(spark, source, view, ["grp"], ["x"])
    man = V.read_manifest(view, V.current_snapshot(view))
    assert man["reused_files"] >= 3  # only g000's file rewritten
    assert _view_state(spark, view) == _expected(spark, source)


def test_refresh_unpublished_source_raises(spark, tmp_path):
    with pytest.raises(V.NoCurrentSnapshotError):
        MV.refresh_aggregate_view(spark, str(tmp_path / "nope"),
                                  str(tmp_path / "mv"), ["g"], ["x"])


def test_null_sum_values_in_delta_do_not_null_running_sum(spark,
                                                          tmp_path):
    """sum-ignoring-NULLs algebra: a delta whose rows for an existing
    group are ALL NULL in the sum column must leave the running sum
    intact (+count), and an all-NULL group stays NULL until a value
    arrives — exactly the from-scratch aggregate."""
    source, view = str(tmp_path / "src"), str(tmp_path / "mv")
    V.write_snapshot(
        spark.createDataFrame([("a", 10), ("n", None)],
                              "grp string, x int"), source)
    MV.refresh_aggregate_view(spark, source, view, ["grp"], ["x"])
    V.append_snapshot(
        spark.createDataFrame([("a", None), ("n", None)],
                              "grp string, x int"), source)
    MV.refresh_aggregate_view(spark, source, view, ["grp"], ["x"])
    assert _view_state(spark, view) == _expected(spark, source) == {
        ("a", 2, 10), ("n", 2, None)}
    V.append_snapshot(
        spark.createDataFrame([("n", 7)], "grp string, x int"), source)
    MV.refresh_aggregate_view(spark, source, view, ["grp"], ["x"])
    assert _view_state(spark, view) == {("a", 2, 10), ("n", 3, 7)}


def test_group_key_is_injective_for_adversarial_strings(spark,
                                                        tmp_path):
    """Length-prefixed encoding: values containing separators /
    markers, shifted boundaries, and NULL-vs-literal lookalikes must
    land in DISTINCT groups and fold independently."""
    source, view = str(tmp_path / "src"), str(tmp_path / "mv")
    rows = [("a\x1fb", "c", 1), ("a", "b\x1fc", 2),
            ("V1:x", "y", 4), ("V1:xy", "", 8),
            (None, "x", 16), ("\x00", "x", 32)]
    schema = "g1 string, g2 string, x int"
    V.write_snapshot(spark.createDataFrame(rows, schema), source)
    MV.refresh_aggregate_view(spark, source, view, ["g1", "g2"], ["x"])
    assert V.read_current(spark, view).count() == 6  # no collisions
    V.append_snapshot(
        spark.createDataFrame([("a\x1fb", "c", 100)], schema), source)
    MV.refresh_aggregate_view(spark, source, view, ["g1", "g2"], ["x"])
    got = {(r.g1, r.g2, r.n_rows, r.sum_x)
           for r in V.read_current(spark, view)
           .select("g1", "g2", "n_rows", "sum_x").collect()}
    assert got == {("a\x1fb", "c", 2, 101), ("a", "b\x1fc", 1, 2),
                   ("V1:x", "y", 1, 4), ("V1:xy", "", 1, 8),
                   (None, "x", 1, 16), ("\x00", "x", 1, 32)}


def test_concurrent_refresh_serializes_via_lease(spark, tmp_path):
    """Two refreshes reading the same watermark but different targets
    would double-fold the overlapping delta; the refresh-scope lease
    makes the second fail fast instead."""
    import os

    from mc_ns_data_pipeline_spark.sinks.lease import (
        TableLockedError,
        table_lease,
    )

    source, view = str(tmp_path / "src"), str(tmp_path / "mv")
    V.write_snapshot(_src(spark, [("a", 1)]), source)
    MV.refresh_aggregate_view(spark, source, view, ["grp"], ["x"])
    V.append_snapshot(_src(spark, [("a", 5)]), source)
    with table_lease(os.path.join(view, "refresh"), owner="rival"):
        with pytest.raises(TableLockedError):
            MV.refresh_aggregate_view(spark, source, view,
                                      ["grp"], ["x"])
    # Winner released: the retry folds once.
    MV.refresh_aggregate_view(spark, source, view, ["grp"], ["x"])
    assert _view_state(spark, view) == {("a", 2, 6)}


def test_stream_to_source_to_view_end_to_end(spark, sf_dir, tmp_path):
    """The full freshness loop: events stream → exactly-once versioned
    landings (run_stream_append) → incremental view refresh. The view
    equals the static per-type aggregate; a second stream run on the
    exhausted checkpoint plus a refresh is a no-op pair."""
    from mc_ns_data_pipeline_spark.catalog import load_table

    source = str(tmp_path / "events_vt")
    view = str(tmp_path / "events_mv")
    ckpt = str(tmp_path / "ckpt")
    events = f"{sf_dir}/events.parquet"

    V.run_stream_append(spark, events, source, ckpt)
    out = MV.refresh_aggregate_view(spark, source, view,
                                    ["event_type"], ["value"])
    assert out["mode"] == "bootstrap"

    static = {
        (r.event_type, r.n_rows, round(r.sum_value, 6))
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.sum("value").alias("sum_value")).collect()
    }
    got = {
        (r.event_type, r.n_rows, round(r.sum_value, 6))
        for r in V.read_current(spark, view)
        .select("event_type", "n_rows", "sum_value").collect()
    }
    assert got == static

    V.run_stream_append(spark, events, source, ckpt)  # exhausted
    out = MV.refresh_aggregate_view(spark, source, view,
                                    ["event_type"], ["value"])
    assert out["mode"] == "noop"


def test_view_refresh_cli(spark, tmp_path):
    """Operator surface: table view-refresh bootstraps then
    increments through the CLI."""
    import os

    from mc_ns_data_pipeline_spark.cli import main

    source, view = str(tmp_path / "src"), str(tmp_path / "mv")
    V.write_snapshot(_src(spark, [("a", 1), ("b", 2)]), source)
    assert main(["table", "view-refresh", "--table", source,
                 "--view", view, "--group-cols", "grp",
                 "--sum-cols", "x"]) == 0
    V.append_snapshot(_src(spark, [("a", 10)]), source)
    assert main(["table", "view-refresh", "--table", source,
                 "--view", view, "--group-cols", " grp ",
                 "--sum-cols", "x"]) == 0
    assert _view_state(spark, view) == {("a", 2, 11), ("b", 1, 2)}
    with pytest.raises(SystemExit, match="--view"):
        main(["table", "view-refresh", "--table", source,
              "--group-cols", "grp", "--sum-cols", "x"])
