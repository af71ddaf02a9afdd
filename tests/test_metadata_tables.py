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


def _force_chunked(monkeypatch, n=6):
    monkeypatch.setattr(V, "_MANIFEST_CHUNK_FILES", n)


def test_files_table_chunked_matches_inline(spark, tmp_path,
                                            monkeypatch):
    """Chunked manifests serve $files through the distributed
    (executor-side sidecar read) path — same rows as the driver-side
    inline path would produce (VERDICT r08 #7)."""
    _force_chunked(monkeypatch)
    t = str(tmp_path / "t")
    df = spark.range(0, 200).selectExpr("id AS k", "id * 2 AS w")
    V.write_snapshot(df.repartitionByRange(8, "k"), t,
                     stats_cols=["k"])
    V.append_snapshot(
        spark.range(200, 300).selectExpr("id AS k", "id * 2 AS w")
        .repartition(4), t)
    core = V._read_core(t, V.current_snapshot(t))
    assert "chunks" in core, "test must exercise the chunked path"
    got = M.files_table(spark, t)
    # lazy distributed plan (executor-side sidecar reads), not a
    # driver materialization
    assert "MapInPandas" in \
        got._jdf.queryExecution().optimizedPlan().toString()
    rows = {(r.file, r.gen) for r in got.collect()}
    man = V._materialize(t, core)
    seq = man.get("file_seq") or {}
    want = {(f, int(seq.get(f, 0))) for f in man["files"]}
    assert rows == want
    # stats survive the distributed read
    with_stats = [r for r in got.collect() if r.stats_json]
    assert with_stats and "k" in json.loads(with_stats[0].stats_json)


def test_files_table_predicate_prunes_chunks(spark, tmp_path,
                                             monkeypatch):
    """A predicate on a clustered stats column rules chunks out before
    any sidecar is opened — the $files filter-pushdown contract."""
    _force_chunked(monkeypatch)
    t = str(tmp_path / "t")
    df = spark.range(0, 400).selectExpr("id AS k", "id * 2 AS w")
    V.write_snapshot(df.repartitionByRange(16, "k"), t,
                     stats_cols=["k"])
    core = V._read_core(t, V.current_snapshot(t))
    assert "chunks" in core
    reads = []
    orig = V._read_chunk

    def counting(table, cid):
        reads.append(cid)
        return orig(table, cid)

    monkeypatch.setattr(V, "_read_chunk", counting)
    preds = [("k", ">=", 390)]
    listed = M.files_table(spark, t, predicates=preds).collect()
    # driver-side planning opened no sidecars (span check only)
    assert reads == [], "driver must not load sidecars for $files"
    # and the result is exactly the files the planner would keep
    want = set(V.prune_report(t, V.current_snapshot(t), preds)["kept"])
    assert {r.file for r in listed} == want
    assert len(want) < len(V._materialize(t, core)["files"])


def test_files_table_excluded_members_stay_hidden(spark, tmp_path,
                                                  monkeypatch):
    """COW-rewritten (tombstoned) members of a reused chunk never
    surface in $files."""
    _force_chunked(monkeypatch)
    t = str(tmp_path / "t")
    df = spark.range(0, 100).selectExpr("id AS k", "id * 2 AS w")
    V.write_snapshot(df.repartitionByRange(8, "k"), t,
                     stats_cols=["k"])
    V.merge_snapshot(
        spark,
        spark.range(0, 5).selectExpr("id AS k", "id * 9 AS w"),
        t, key="k")
    man = V._materialize(t, V._read_core(t, V.current_snapshot(t)))
    got = {r.file for r in M.files_table(spark, t).collect()}
    assert got == set(man["files"])
