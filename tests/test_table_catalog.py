"""Catalog surface for versioned tables (sinks/table_catalog.py,
VERDICT r06 gap #4): durable name → table-root mapping with atomic
exclusive create, metadata-only rename, and managed/external drop
semantics."""

from __future__ import annotations

import os
import threading

import pytest

from mc_ns_data_pipeline_spark.sinks import table_catalog as C
from mc_ns_data_pipeline_spark.sinks import versioned as V


def test_create_load_roundtrip_managed(tmp_path):
    cat = str(tmp_path / "cat")
    root = C.create_table(cat, "sales.orders")
    assert os.path.isdir(root)
    assert C.load_table(cat, "sales.orders") == root
    assert C.table_exists(cat, "sales.orders")
    assert not C.table_exists(cat, "sales.other")


def test_default_namespace(tmp_path):
    cat = str(tmp_path / "cat")
    root = C.create_table(cat, "bare")
    assert C.load_table(cat, "default.bare") == root
    assert C.load_table(cat, "bare") == root


def test_create_is_exclusive(tmp_path):
    cat = str(tmp_path / "cat")
    C.create_table(cat, "ns.t")
    with pytest.raises(C.TableExistsError):
        C.create_table(cat, "ns.t")


def test_racing_creates_one_winner_no_orphan_dirs(tmp_path):
    """Two concurrent creates of the same name: exactly one wins, and
    the loser's managed dir does not leak under _data."""
    cat = str(tmp_path / "cat")
    results, errors = [], []

    def worker():
        try:
            results.append(C.create_table(cat, "ns.raced"))
        except C.TableExistsError:
            errors.append(1)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(30)
    assert len(results) == 1 and len(errors) == 7
    managed = os.path.join(cat, "_data", "ns")
    # only the winner's root remains
    assert len(os.listdir(managed)) == 1
    assert os.path.join(managed, os.listdir(managed)[0]) == results[0]


def test_external_registration(tmp_path):
    cat = str(tmp_path / "cat")
    ext = str(tmp_path / "elsewhere" / "t")
    os.makedirs(ext)
    root = C.create_table(cat, "ns.ext", root=ext)
    assert root == os.path.abspath(ext)
    # purge refuses: the catalog does not own external data
    with pytest.raises(ValueError):
        C.drop_table(cat, "ns.ext", purge=True)
    C.drop_table(cat, "ns.ext")
    assert os.path.isdir(ext)  # data untouched
    assert not C.table_exists(cat, "ns.ext")


def test_drop_purge_managed(tmp_path):
    cat = str(tmp_path / "cat")
    root = C.create_table(cat, "ns.tmp")
    C.drop_table(cat, "ns.tmp", purge=True)
    assert not os.path.exists(root)
    with pytest.raises(C.NoSuchTableError):
        C.load_table(cat, "ns.tmp")


def test_rename_is_metadata_only(tmp_path):
    cat = str(tmp_path / "cat")
    root = C.create_table(cat, "ns.old")
    marker = os.path.join(root, "marker")
    open(marker, "w").close()
    new_root = C.rename_table(cat, "ns.old", "ns2.new")
    assert new_root == root  # the data never moved
    assert os.path.exists(marker)
    assert not C.table_exists(cat, "ns.old")
    assert C.load_table(cat, "ns2.new") == root


def test_rename_refuses_taken_target(tmp_path):
    cat = str(tmp_path / "cat")
    C.create_table(cat, "a")
    C.create_table(cat, "b")
    with pytest.raises(C.TableExistsError):
        C.rename_table(cat, "a", "b")
    # source untouched by the failed rename
    assert C.table_exists(cat, "a")


def test_rename_missing_source(tmp_path):
    cat = str(tmp_path / "cat")
    with pytest.raises(C.NoSuchTableError):
        C.rename_table(cat, "ghost", "x")


def test_list_tables(tmp_path):
    cat = str(tmp_path / "cat")
    r1 = C.create_table(cat, "ns1.a")
    r2 = C.create_table(cat, "ns1.b")
    r3 = C.create_table(cat, "ns2.c")
    assert C.list_tables(cat) == {"ns1.a": r1, "ns1.b": r2,
                                  "ns2.c": r3}
    assert C.list_tables(cat, "ns2") == {"ns2.c": r3}
    assert C.list_tables(str(tmp_path / "nowhere")) == {}


@pytest.mark.parametrize("bad", [
    "", ".", "a.b.c", ".x", "x.", "a/b", "_data.t", "ns._data",
])
def test_bad_names_rejected(tmp_path, bad):
    with pytest.raises(ValueError):
        C.create_table(str(tmp_path / "cat"), bad)


def test_read_table_resolves_current_snapshot(spark, tmp_path):
    """End-to-end: versioned lifecycle addressed by catalog name."""
    cat = str(tmp_path / "cat")
    root = C.create_table(cat, "sales.t")
    V.write_snapshot(
        spark.createDataFrame([(1, "a")], "k int, v string"), root)
    V.append_snapshot(
        spark.createDataFrame([(2, "b")], "k int, v string"),
        C.load_table(cat, "sales.t"))
    C.rename_table(cat, "sales.t", "sales.live")
    got = {(r.k, r.v)
           for r in C.read_table(spark, cat, "sales.live").collect()}
    assert got == {(1, "a"), (2, "b")}
    # kwargs pass through to read_current
    one = C.read_table(spark, cat, "sales.live",
                       predicates=[("k", "=", 2)]).collect()
    assert {(r.k, r.v) for r in one} == {(2, "b")}


def test_register_views_sql_join(spark, tmp_path):
    """Catalog tables become plain-SQL-addressable temp views."""
    cat = str(tmp_path / "cat")
    a = C.create_table(cat, "ns.facts")
    b = C.create_table(cat, "ns.dim")
    V.write_snapshot(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, v double"),
        a)
    V.write_snapshot(
        spark.createDataFrame([(1, "x"), (2, "y")], "k int, label string"),
        b)
    views = C.register_views(spark, cat, names=["ns.facts", "ns.dim"])
    assert set(views) == {"ns_facts", "ns_dim"}
    got = spark.sql(
        "SELECT d.label, sum(f.v) AS s FROM ns_facts f "
        "JOIN ns_dim d ON f.k = d.k GROUP BY d.label ORDER BY d.label"
    ).collect()
    assert [(r.label, r.s) for r in got] == [("x", 10.0), ("y", 20.0)]


def test_registered_view_is_frozen_under_repin(spark, tmp_path):
    """MVCC contract: a concurrent commit + group repin must NOT move
    an already-resolved view; re-registering advances it."""
    cat = str(tmp_path / "cat")
    t = C.create_table(cat, "ns.t")
    V.write_snapshot(
        spark.createDataFrame([(i,) for i in range(5)], "k int"), t)
    C.pin_current_group(cat, "g", ["ns.t"])
    snaps = C.register_views(spark, cat, group="g")
    assert set(snaps) == {"ns_t"}
    assert spark.table("ns_t").count() == 5

    # the world moves: new commit, group repinned to it
    V.append_snapshot(
        spark.createDataFrame([(99,), (98,)], "k int"), t)
    C.pin_current_group(cat, "g", ["ns.t"])

    # frozen: the resolved view still answers at registration time
    assert spark.table("ns_t").count() == 5
    # a FRESH group read sees the repinned world
    assert C.read_group(spark, cat, "g", "ns.t").count() == 7
    # explicit refresh advances the view
    C.register_views(spark, cat, group="g")
    assert spark.table("ns_t").count() == 7


def test_register_views_errors(spark, tmp_path):
    cat = str(tmp_path / "cat")
    C.create_table(cat, "ns.t")  # no snapshot yet
    with pytest.raises(C.NoSuchTableError):
        C.register_views(spark, cat, names=["ns.t"])
    with pytest.raises(ValueError):
        C.register_views(spark, cat)
    V.write_snapshot(spark.createDataFrame([(1,)], "k int"),
                     C.load_table(cat, "ns.t"))
    C.pin_current_group(cat, "g", ["ns.t"])
    with pytest.raises(C.NoSuchTableError):
        C.register_views(spark, cat, group="g", names=["ns.other"])


def test_register_views_explicit_snapshot_time_travel(spark, tmp_path):
    """snapshots= mode: a SUPERSEDED snapshot registers as a SQL view."""
    cat = str(tmp_path / "cat")
    t = C.create_table(cat, "ns.t")
    V.write_snapshot(
        spark.createDataFrame([(1, "v1"), (2, "v1")], "k int, tag string"),
        t)
    snap1 = V.current_snapshot(t)
    V.append_snapshot(
        spark.createDataFrame([(3, "v2")], "k int, tag string"), t)
    C.register_views(spark, cat, snapshots={"ns.t": snap1})
    got = spark.sql("SELECT count(*) AS n FROM ns_t").collect()[0].n
    assert got == 2  # pristine v1, not the moved CURRENT (3 rows)
    # and the current-mode registration sees the new world
    C.register_views(spark, cat, names=["ns.t"])
    assert spark.table("ns_t").count() == 3
