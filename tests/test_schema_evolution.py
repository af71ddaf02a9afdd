"""Column RENAME + DROP via field-id mapping (VERDICT r08 #5):
metadata-only ``set-schema`` commits, old-file projection through the
manifest's renames chain, the retired-name fence, and composition
with stats/bloom pruning, changelog/CDC, widening, and time travel.
Reference semantics anchor: the reference renames columns by
rewriting its SELECT list (data_processor.py) — here it is a
catalog-level evolution that never touches data."""

from __future__ import annotations

import pytest

from mc_ns_data_pipeline_spark.sinks import versioned as V


def _df(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema)


def _rows(spark, table, **kw):
    return {tuple(r) for r in V.read_current(spark, table, **kw).collect()}


def test_rename_projects_old_and_new_files(spark, tmp_path):
    """Old files (physical name `v`) and new files (physical `label`)
    read back under ONE logical name, values intact, no rewrite."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a"), (2, "b")]), table)
    before = set(V.snapshot_files(table, V.current_snapshot(table)))
    V.rename_column(table, "v", "label")
    # metadata-only: the exact same data files
    after = set(V.snapshot_files(table, V.current_snapshot(table)))
    assert after == before
    V.append_snapshot(
        _df(spark, [(3, "c")], "k int, label string"), table)
    df = V.read_current(spark, table)
    assert df.columns == ["k", "label"]
    assert _rows(spark, table) == {(1, "a"), (2, "b"), (3, "c")}


def test_rename_chain_composes(spark, tmp_path):
    """a -> b -> c: three eras of physical names, one logical column."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "era0")], "k int, a string"), table)
    V.rename_column(table, "a", "b")
    V.append_snapshot(_df(spark, [(2, "era1")], "k int, b string"), table)
    V.rename_column(table, "b", "c")
    V.append_snapshot(_df(spark, [(3, "era2")], "k int, c string"), table)
    assert V.read_current(spark, table).columns == ["k", "c"]
    assert _rows(spark, table) == {(1, "era0"), (2, "era1"), (3, "era2")}


def test_rename_composes_with_widening(spark, tmp_path):
    """Rename + type widen: old narrow files under the old name still
    up-cast and project to the new name."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, 10)], "k int, qty int"), table)
    V.rename_column(table, "qty", "quantity")
    V.append_snapshot(
        _df(spark, [(2, 3_000_000_000)], "k int, quantity long"), table)
    df = V.read_current(spark, table)
    assert dict(df.dtypes)["quantity"] == "bigint"
    assert _rows(spark, table) == {(1, 10), (2, 3_000_000_000)}


def test_retired_name_refused_in_appends_and_renames(spark, tmp_path):
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a")]), table)
    V.rename_column(table, "v", "label")
    with pytest.raises(V.SchemaEvolutionError, match="retired"):
        V.append_snapshot(_df(spark, [(9, "boom")]), table)  # has `v`
    V.append_snapshot(_df(spark, [(2, "ok")],
                          "k int, label string"), table)
    with pytest.raises(V.SchemaEvolutionError, match="retired"):
        V.rename_column(table, "label", "v")  # rename BACK refused too


def test_full_refresh_clears_the_fence(spark, tmp_path):
    """An overwrite rewrites every live file under current names, so
    the retired-name fence (and projection chains) reset."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a")]), table)
    V.rename_column(table, "v", "label")
    V.write_snapshot(_df(spark, [(5, "fresh")]), table)  # has `v` again
    assert _rows(spark, table) == {(5, "fresh")}
    core = V._read_core(table, V.current_snapshot(table))
    assert not core.get("renames") and not core.get("retired")


def test_drop_hides_without_rewrite_and_time_travel_keeps(spark, tmp_path):
    table = str(tmp_path / "t")
    s0 = V.write_snapshot(
        _df(spark, [(1, "a", 9.5)], "k int, v string, w double"), table)
    before = set(V.snapshot_files(table, s0))
    V.drop_column(table, "w")
    assert set(V.snapshot_files(table, V.current_snapshot(table))) \
        == before
    assert V.read_current(spark, table).columns == ["k", "v"]
    # time travel reads the old snapshot under ITS OWN schema
    assert V.read_snapshot(spark, table, s0).columns == ["k", "v", "w"]
    # re-adding the dropped name is refused (old bytes would leak)
    with pytest.raises(V.SchemaEvolutionError, match="retired"):
        V.append_snapshot(
            _df(spark, [(2, "b", 1.0)],
                "k int, v string, w double"), table)


def test_changelog_and_cdc_cross_set_schema(spark, tmp_path):
    """read_appended_since / read_changes_since treat set-schema as
    row-preserving and serve rows under the until-era names."""
    table = str(tmp_path / "t")
    s0 = V.write_snapshot(_df(spark, [(1, "a")]), table)
    V.rename_column(table, "v", "label")
    V.append_snapshot(_df(spark, [(2, "b")],
                          "k int, label string"), table)
    inc = V.read_appended_since(spark, table, s0)
    assert inc.columns == ["k", "label"]
    assert {tuple(r) for r in inc.collect()} == {(2, "b")}
    ch = V.read_changes_since(spark, table, s0)
    assert {tuple(r) for r in ch["inserts"].collect()} == {(2, "b")}
    assert ch["deleted_keys"] == {}


def test_rename_composes_with_stats_pruning(spark, tmp_path):
    """Per-file stats recorded under the OLD name keep pruning reads
    that filter on the NEW name (the alias chain in _prune_from_man)."""
    table = str(tmp_path / "t")
    df = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS qty")
    V.write_snapshot(df.repartitionByRange(4, "k"), table,
                     stats_cols=["k", "qty"])
    V.rename_column(table, "qty", "quantity")
    rep = V.prune_report(table, V.current_snapshot(table),
                         [("quantity", ">=", 1900)])
    assert rep["skipped"] >= 2, rep  # old-name stats still prune
    got = V.read_current(spark, table,
                         predicates=[("quantity", ">=", 1900)])
    assert {r.k for r in got.collect()} == set(range(950, 1000))


def test_rename_composes_with_bloom_pruning(spark, tmp_path):
    table = str(tmp_path / "t")
    df = spark.range(0, 400).selectExpr("id AS k", "id % 7 AS b")
    V.write_snapshot(df.repartition(4, "k"), table, bloom_cols=["k"])
    V.rename_column(table, "k", "key")
    rep = V.prune_report(table, V.current_snapshot(table),
                         [("key", "=", 123)])
    assert rep["skipped"] >= 1, rep  # old-name blooms still prune
    got = V.read_current(spark, table, predicates=[("key", "=", 123)])
    assert [tuple(r) for r in got.collect()] == [(123, 123 % 7)]


def test_rename_refused_on_pending_mor_mask_key(spark, tmp_path):
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a"), (2, "b")]), table)
    V.delete_keys_mor(spark, table, "k",
                      _df(spark, [(1, "a")]).select("k"))
    with pytest.raises(V.SchemaEvolutionError, match="delete masks"):
        V.rename_column(table, "k", "key")
    V.compact_snapshot(spark, table, target_files=1)  # applies masks
    V.rename_column(table, "k", "key")  # now fine
    assert _rows(spark, table) == {(2, "b")}


def test_rename_refused_on_partition_spec_source(spark, tmp_path):
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a")]), table)
    V.set_partition_spec(table, ["bucket(4, k)"])
    with pytest.raises(V.SchemaEvolutionError, match="partition-spec"):
        V.rename_column(table, "k", "key")
    with pytest.raises(V.SchemaEvolutionError, match="partition-spec"):
        V.drop_column(table, "k")


def test_mor_delete_after_rename_hits_old_files(spark, tmp_path):
    """A MOR delete keyed on the NEW name must mask rows living in
    OLD-name physical files — the locate/apply path reads through the
    projection chain."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a"), (2, "b")]), table)
    V.rename_column(table, "k", "key")
    V.delete_keys_mor(spark, table, "key",
                      spark.createDataFrame([(1,)], "key int"))
    assert _rows(spark, table) == {(2, "b")}


def test_cow_merge_after_rename(spark, tmp_path):
    """COW merge keyed on the renamed column locates and rewrites the
    affected old-name file correctly."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a"), (2, "b")]), table)
    V.rename_column(table, "v", "label")
    V.merge_snapshot(
        spark,
        _df(spark, [(2, "B2"), (3, "new")], "k int, label string"),
        table, key="k")
    assert _rows(spark, table) == {(1, "a"), (2, "B2"), (3, "new")}


def test_merge_ref_refuses_divergent_rename(spark, tmp_path):
    """A rename landing on CURRENT while a branch was staged is a
    schema-identity conflict — replay refuses."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a")]), table)
    V.append_snapshot(_df(spark, [(2, "br")]), table, branch="b")
    V.rename_column(table, "v", "label")  # diverge CURRENT
    with pytest.raises(V.CommitConflictError):
        V.merge_ref(table, "b")


def test_stream_fails_loudly_on_mid_stream_rename(spark, tmp_path):
    import os

    from pyspark.errors.exceptions.captured import (
        StreamingQueryException,
    )

    from mc_ns_data_pipeline_spark.streaming.table_source import (
        read_stream_table,
    )

    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a")]), table)
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")

    def drain():
        q = (read_stream_table(spark, table, starting="genesis")
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    V.rename_column(table, "v", "label")
    V.append_snapshot(_df(spark, [(2, "b")],
                          "k int, label string"), table)
    with pytest.raises(StreamingQueryException, match="schema"):
        drain()


def test_field_ids_are_stable_and_monotone(spark, tmp_path):
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a")]), table)
    core = V._read_core(table, V.current_snapshot(table))
    ids0 = core["field_ids"]
    assert set(ids0) == {"k", "v"}
    V.rename_column(table, "v", "label")
    core = V._read_core(table, V.current_snapshot(table))
    assert core["field_ids"]["label"] == ids0["v"]  # id moved, stable
    assert core["retired"]["v"] == ids0["v"]
    V.append_snapshot(
        _df(spark, [(2, "b", 1.5)],
            "k int, label string, w double"), table)
    core = V._read_core(table, V.current_snapshot(table))
    assert core["field_ids"]["w"] > max(ids0.values())  # fresh id


def test_compaction_clears_chain_and_restores_pushdown(spark, tmp_path):
    """Compaction rewrites every live file under CURRENT names, so the
    rename projection chain and the retired fence clear — and filters
    on the renamed column push down to the parquet scan again (the
    coalesce chain blocks footer pushdown while old-name files live)."""
    table = str(tmp_path / "t")
    V.write_snapshot(
        spark.range(0, 100).selectExpr("id AS k", "id * 2 AS qty"),
        table, stats_cols=["k"])
    V.rename_column(table, "qty", "quantity")
    V.compact_snapshot(spark, table, target_files=2)
    core = V._read_core(table, V.current_snapshot(table))
    assert not core.get("renames") and not core.get("retired")
    # field ids survive the clear
    assert core["field_ids"]["quantity"] > 0
    # the retired name is reusable again — genuinely fresh column
    V.append_snapshot(
        spark.createDataFrame([(200, 7, 1.0)],
                              "k int, quantity int, qty double"),
        table)
    # pushdown: the filter reaches the parquet scan as a data filter
    df = V.read_current(spark, table).filter("quantity >= 100")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "quantity" in plan.split("PushedFilters")[1][:200], plan


def test_sql_catalog_views_serve_renamed_tables(spark, tmp_path):
    """The SQL surface (table_catalog.register_views) composes with
    rename: a frozen view registered after the rename serves the new
    column name over old-era files."""
    from mc_ns_data_pipeline_spark.sinks import table_catalog as TC

    cat = str(tmp_path / "catalog")
    root = TC.create_table(cat, "sales.t")
    V.write_snapshot(_df(spark, [(1, "old-era")]), root)
    V.rename_column(root, "v", "label")
    V.append_snapshot(_df(spark, [(2, "new-era")],
                          "k int, label string"), root)
    TC.register_views(spark, cat, names=["sales.t"], prefix="evo_")
    got = {tuple(r) for r in spark.sql(
        "SELECT k, label FROM evo_sales_t ORDER BY k").collect()}
    assert got == {(1, "old-era"), (2, "new-era")}
