"""Multi-table transactions (sinks/txn.py): staged invisibility,
all-or-nothing commit, conflict-aborts-before-any-flip, crash
roll-forward/roll-back via recover_txns."""

from __future__ import annotations

import os

import pytest

from mc_ns_data_pipeline_spark.sinks import txn as T
from mc_ns_data_pipeline_spark.sinks import versioned as V


def _df(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema)


@pytest.fixture
def two_tables(spark, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    V.write_snapshot(_df(spark, [(1, "a-base")]), a)
    V.write_snapshot(_df(spark, [(1, "b-base")]), b)
    return a, b, str(tmp_path / "txnlog")


def _rows(spark, table):
    return {(r.k, r.v)
            for r in V.read_current(spark, table).collect()}


def test_commit_is_atomic_and_staging_invisible(spark, two_tables):
    a, b, log = two_tables
    with T.multi_table_txn(log, [a, b]) as txn:
        txn.append(_df(spark, [(2, "a-txn")]), a)
        txn.append(_df(spark, [(2, "b-txn")]), b)
        # staged rows invisible to readers of either table
        assert _rows(spark, a) == {(1, "a-base")}
        assert _rows(spark, b) == {(1, "b-base")}
    assert _rows(spark, a) == {(1, "a-base"), (2, "a-txn")}
    assert _rows(spark, b) == {(1, "b-base"), (2, "b-txn")}
    assert os.listdir(log) == []  # intent consumed


def test_exception_aborts_both(spark, two_tables):
    a, b, log = two_tables
    with pytest.raises(RuntimeError, match="boom"):
        with T.multi_table_txn(log, [a, b]) as txn:
            txn.append(_df(spark, [(2, "a-txn")]), a)
            txn.append(_df(spark, [(2, "b-txn")]), b)
            raise RuntimeError("boom")
    assert _rows(spark, a) == {(1, "a-base")}
    assert _rows(spark, b) == {(1, "b-base")}
    assert V.list_refs(a) == {} and V.list_refs(b) == {}


def test_conflict_aborts_before_any_flip(spark, two_tables):
    a, b, log = two_tables
    txn = T.multi_table_txn(log, [a, b])
    txn.append(_df(spark, [(2, "a-txn")]), a)
    txn.append(_df(spark, [(2, "b-txn")]), b)
    # a direct commit lands on B after staging: the txn must abort
    V.append_snapshot(_df(spark, [(9, "b-direct")]), b)
    with pytest.raises(V.CommitConflictError):
        txn.commit()
    assert _rows(spark, a) == {(1, "a-base")}  # A never flipped
    assert _rows(spark, b) == {(1, "b-base"), (9, "b-direct")}
    assert V.list_refs(a) == {} and V.list_refs(b) == {}
    assert not os.path.isdir(log) or os.listdir(log) == []


def test_mor_verbs_stage_in_txn(spark, two_tables):
    a, b, log = two_tables
    with T.multi_table_txn(log, [a, b]) as txn:
        txn.merge_mor(spark, _df(spark, [(1, "a-upd")]), a, key="k")
        txn.delete_mor(spark, b, "k",
                       spark.createDataFrame([(1,)], "k int"))
        assert _rows(spark, a) == {(1, "a-base")}
    assert _rows(spark, a) == {(1, "a-upd")}
    assert _rows(spark, b) == set()


def test_crash_between_flips_rolls_forward(spark, two_tables,
                                           monkeypatch):
    a, b, log = two_tables
    txn = T.multi_table_txn(log, [a, b])
    txn.append(_df(spark, [(2, "a-txn")]), a)
    txn.append(_df(spark, [(2, "b-txn")]), b)

    orig = V._publish_ref_locked
    calls = []

    def crashing(table, name):
        if calls:
            raise OSError("simulated crash mid-commit")
        calls.append(table)
        return orig(table, name)

    monkeypatch.setattr(V, "_publish_ref_locked", crashing)
    with pytest.raises(OSError):
        txn.commit()
    monkeypatch.setattr(V, "_publish_ref_locked", orig)

    # intent sealed, exactly one table flipped
    assert len(os.listdir(log)) == 1
    assert len(calls) == 1
    rep = T.recover_txns(log)
    assert rep["completed"] and not rep["broken"]
    assert _rows(spark, a) == {(1, "a-base"), (2, "a-txn")}
    assert _rows(spark, b) == {(1, "b-base"), (2, "b-txn")}
    assert os.listdir(log) == []
    # idempotent
    assert T.recover_txns(log) == {"completed": [], "rolled_back": [],
                                   "broken": []}


def test_recovery_rolls_back_unflipped_stuck_txn(spark, two_tables,
                                                 monkeypatch):
    a, b, log = two_tables
    txn = T.multi_table_txn(log, [a, b])
    txn.append(_df(spark, [(2, "a-txn")]), a)
    txn.append(_df(spark, [(2, "b-txn")]), b)

    def crash_immediately(table, name):
        raise OSError("simulated crash before any flip")

    monkeypatch.setattr(V, "_publish_ref_locked", crash_immediately)
    with pytest.raises(OSError):
        txn.commit()
    monkeypatch.undo()

    # a new writer moves A past the staged lineage: roll-forward is
    # impossible, but nothing flipped — recovery must roll BACK
    V.append_snapshot(_df(spark, [(9, "a-direct")]), a)
    rep = T.recover_txns(log)
    assert rep["rolled_back"] and not rep["broken"]
    assert _rows(spark, a) == {(1, "a-base"), (9, "a-direct")}
    assert _rows(spark, b) == {(1, "b-base")}
    assert V.list_refs(a) == {} and V.list_refs(b) == {}
    assert os.listdir(log) == []


def test_undeclared_table_rejected(spark, two_tables):
    a, b, log = two_tables
    with pytest.raises(ValueError):
        with T.multi_table_txn(log, [a]) as txn:
            txn.append(_df(spark, [(2, "x")]), b)


def test_empty_txn_commits_to_nothing(spark, two_tables):
    a, b, log = two_tables
    with T.multi_table_txn(log, [a, b]):
        pass
    assert _rows(spark, a) == {(1, "a-base")}
    assert not os.path.isdir(log) or os.listdir(log) == []
