"""Metadata tables: the t$snapshots / t$files / t$refs / t$history
inspection surface over versioned tables, as DataFrames + SQL views."""

from __future__ import annotations

import json

import pytest

from mc_ns_data_pipeline_spark.sinks import metadata_tables as M
from mc_ns_data_pipeline_spark.sinks import versioned as V


def _df(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema)


def test_snapshots_and_history(spark, tmp_path):
    t = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a"), (2, "b")]), t)
    V.append_snapshot(_df(spark, [(3, "c")]), t)
    snaps = M.snapshots_table(spark, t).orderBy("gen").collect()
    assert [(r.op, r.n_rows, r.is_current) for r in snaps] == [
        ("overwrite", 2, False), ("append", 3, True)]
    assert all(r.on_current_lineage for r in snaps)

    hist = M.history_table(spark, t).orderBy("steps_back").collect()
    assert [(r.steps_back, r.op, r.n_rows) for r in hist] == [
        (0, "append", 3), (1, "overwrite", 2)]

    # a rollback strands the append off-lineage but keeps it on disk
    V.rollback_table(t, snaps[0].snapshot)
    snaps2 = {r.op: r for r in M.snapshots_table(spark, t).collect()}
    assert snaps2["overwrite"].is_current
    assert not snaps2["append"].on_current_lineage


def test_files_table_stats_and_generations(spark, tmp_path):
    t = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a")], "k int, v string"), t,
                     stats_cols=["k"])
    V.append_snapshot(_df(spark, [(9, "z")], "k int, v string"), t)
    files = M.files_table(spark, t).collect()
    assert len(files) >= 2
    gens = {r.gen for r in files}
    assert len(gens) == 2, "append files must carry a newer generation"
    with_stats = [r for r in files if r.stats_json]
    assert with_stats, "opted-in stats must surface"
    payload = json.loads(with_stats[0].stats_json)
    assert "k" in payload

    with pytest.raises(V.NoCurrentSnapshotError):
        M.files_table(spark, str(tmp_path / "empty"))


def test_refs_table(spark, tmp_path):
    t = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a")]), t)
    V.tag_snapshot(t, "golden")
    V.append_snapshot(_df(spark, [(2, "b")]), t, branch="audit")
    refs = {(r.name, r.kind) for r in M.refs_table(spark, t).collect()}
    assert refs == {("golden", "tag"), ("audit", "branch")}


def test_register_metadata_views_sql(spark, tmp_path):
    t = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a")]), t)
    names = M.register_metadata_views(spark, t, prefix="mt")
    assert set(names) == {"mt_snapshots", "mt_history",
                          "mt_files", "mt_refs"}
    got = spark.sql(
        "SELECT op, n_rows FROM mt_snapshots WHERE is_current"
    ).collect()
    assert [(r.op, r.n_rows) for r in got] == [("overwrite", 1)]
    assert M.metadata_table(spark, t, "refs").count() == 0
    with pytest.raises(ValueError):
        M.metadata_table(spark, t, "nope")


def test_register_for_catalog_table(spark, tmp_path):
    from mc_ns_data_pipeline_spark.sinks import table_catalog as C

    cat = str(tmp_path / "cat")
    root = C.create_table(cat, "sales.orders")
    V.write_snapshot(_df(spark, [(1, "a")]), root)
    names = M.register_for_catalog_table(spark, cat, "sales.orders")
    assert "sales_orders_snapshots" in names
    got = spark.sql(
        "SELECT n_rows FROM sales_orders_snapshots WHERE is_current"
    ).collect()
    assert [r.n_rows for r in got] == [1]
