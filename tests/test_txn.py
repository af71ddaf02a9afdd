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


# ---------------------------------------------------------------------------
# catalog group pins: cross-table read isolation (table_catalog +
# catalog_txn integration)
# ---------------------------------------------------------------------------

from mc_ns_data_pipeline_spark.sinks import table_catalog as TC


@pytest.fixture
def catalog_pair(spark, tmp_path):
    cat = str(tmp_path / "catalog")
    a = TC.create_table(cat, "sales.a")
    b = TC.create_table(cat, "sales.b")
    V.write_snapshot(_df(spark, [(1, "a-base")]), a)
    V.write_snapshot(_df(spark, [(1, "b-base")]), b)
    return cat, a, b


def _grows(spark, cat, group, name):
    return {(r.k, r.v) for r in
            TC.read_group(spark, cat, group, name).collect()}


def test_group_pin_isolates_readers_from_later_commits(
        spark, catalog_pair):
    cat, a, b = catalog_pair
    TC.pin_current_group(cat, "nightly", ["sales.a", "sales.b"])
    V.append_snapshot(_df(spark, [(9, "a-later")]), a)
    # group readers still see the pinned consistent pair
    assert _grows(spark, cat, "nightly", "sales.a") == {(1, "a-base")}
    assert _grows(spark, cat, "nightly", "sales.b") == {(1, "b-base")}
    # CURRENT readers see the later commit, as they should
    assert {(r.k, r.v) for r in
            TC.read_table(spark, cat, "sales.a").collect()} \
        == {(1, "a-base"), (9, "a-later")}


def test_catalog_txn_repins_group_atomically(spark, catalog_pair):
    cat, a, b = catalog_pair
    TC.pin_current_group(cat, "nightly", ["sales.a", "sales.b"])
    with T.catalog_txn(cat, ["sales.a", "sales.b"],
                       group="nightly") as txn:
        txn.append(_df(spark, [(2, "a-txn")]), a)
        txn.append(_df(spark, [(2, "b-txn")]), b)
        # mid-txn the group still shows the OLD consistent pair
        assert _grows(spark, cat, "nightly", "sales.a") \
            == {(1, "a-base")}
    assert _grows(spark, cat, "nightly", "sales.a") \
        == {(1, "a-base"), (2, "a-txn")}
    assert _grows(spark, cat, "nightly", "sales.b") \
        == {(1, "b-base"), (2, "b-txn")}


def test_group_repin_completed_by_recovery(spark, catalog_pair,
                                           monkeypatch):
    """Crash after the flips but before the group repin: recovery
    finds every table flipped and completes the pin."""
    cat, a, b = catalog_pair
    TC.pin_current_group(cat, "nightly", ["sales.a", "sales.b"])
    txn = T.catalog_txn(cat, ["sales.a", "sales.b"], group="nightly")
    txn.append(_df(spark, [(2, "a-txn")]), a)
    txn.append(_df(spark, [(2, "b-txn")]), b)

    def crashing_pin(intent):
        if intent.get("group"):
            raise OSError("simulated crash before group pin")

    monkeypatch.setattr(T, "_pin_intent_group", crashing_pin)
    with pytest.raises(OSError):
        txn.commit()
    monkeypatch.undo()
    # group still the OLD pair — consistent, just stale
    assert _grows(spark, cat, "nightly", "sales.a") == {(1, "a-base")}
    rep = T.recover_txns(os.path.join(cat, "_txns"))
    assert rep["completed"]
    assert _grows(spark, cat, "nightly", "sales.a") \
        == {(1, "a-base"), (2, "a-txn")}
    assert _grows(spark, cat, "nightly", "sales.b") \
        == {(1, "b-base"), (2, "b-txn")}


def test_partial_group_merge_keeps_other_members(spark, catalog_pair):
    cat, a, b = catalog_pair
    TC.pin_current_group(cat, "nightly", ["sales.a", "sales.b"])
    with T.catalog_txn(cat, ["sales.a"], group="nightly") as txn:
        txn.append(_df(spark, [(2, "a-txn")]), a)
    snaps = TC.group_snapshots(cat, "nightly")
    assert set(snaps) == {"sales.a", "sales.b"}  # b's pin survived
    assert _grows(spark, cat, "nightly", "sales.b") == {(1, "b-base")}
    assert _grows(spark, cat, "nightly", "sales.a") \
        == {(1, "a-base"), (2, "a-txn")}


# ---------------------------------------------------------------------------
# review-pass regressions (r7): vacuum page strictness, group-pin
# concurrency, recovery replay ordering, REST method guards
# ---------------------------------------------------------------------------


def test_recovery_replay_never_clobbers_newer_group_pin(
        spark, catalog_pair, monkeypatch):
    """A crashed txn's sealed intent, replayed AFTER a later txn
    already committed and repinned, must not move the group's pins
    backwards (monotonic pin)."""
    cat, a, b = catalog_pair
    TC.pin_current_group(cat, "nightly", ["sales.a", "sales.b"])
    txn1 = T.catalog_txn(cat, ["sales.a", "sales.b"],
                         group="nightly")
    txn1.append(_df(spark, [(2, "a-txn1")]), a)
    txn1.append(_df(spark, [(2, "b-txn1")]), b)

    def crashing_pin(intent):
        if intent.get("group"):
            raise OSError("crash before group pin")

    monkeypatch.setattr(T, "_pin_intent_group", crashing_pin)
    with pytest.raises(OSError):
        txn1.commit()
    monkeypatch.undo()

    # a LATER txn commits and pins newer snapshots
    with T.catalog_txn(cat, ["sales.a", "sales.b"],
                       group="nightly") as txn2:
        txn2.append(_df(spark, [(3, "a-txn2")]), a)
        txn2.append(_df(spark, [(3, "b-txn2")]), b)
    newer = TC.group_snapshots(cat, "nightly")

    # replaying txn1's sealed intent must keep txn2's pins
    rep = T.recover_txns(os.path.join(cat, "_txns"))
    assert rep["completed"]
    assert TC.group_snapshots(cat, "nightly") == newer
    assert _grows(spark, cat, "nightly", "sales.a") == {
        (1, "a-base"), (2, "a-txn1"), (3, "a-txn2")}


def test_recovery_after_vacuumed_lineage_reports_completed(
        spark, two_tables, monkeypatch):
    """All flips done, intent left behind, lineage later vacuumed:
    recovery must report the txn completed, never rolled_back."""
    a, b, log = two_tables
    txn = T.multi_table_txn(log, [a, b])
    txn.append(_df(spark, [(2, "a-txn")]), a)
    txn.append(_df(spark, [(2, "b-txn")]), b)

    orig_rm = os.remove
    import builtins  # noqa: F401 - keep the patch local

    def no_intent_removal(path, *a2, **k2):
        if "txnlog" in str(path):
            raise OSError("crash before intent removal")
        return orig_rm(path, *a2, **k2)

    monkeypatch.setattr(os, "remove", no_intent_removal)
    with pytest.raises(OSError):
        txn.commit()
    monkeypatch.undo()
    # both tables ARE flipped; age the history out via more commits
    # + vacuum so the targets' lineage develops a hole
    for t in (a, b):
        V.append_snapshot(_df(spark, [(7, "later")]), t)
        V.append_snapshot(_df(spark, [(8, "later2")]), t)
        V.vacuum_snapshots(t, keep=1, min_age_seconds=None,
                           staging_age_seconds=0.0)
    rep = T.recover_txns(log)
    assert rep["completed"] and not rep["rolled_back"]
    assert not rep["broken"]
    got = _rows(spark, a)
    assert (2, "a-txn") in got  # the txn's rows are visible


def test_concurrent_disjoint_group_pins_both_land(spark,
                                                  catalog_pair):
    """Two merge-mode pinners updating DISJOINT members must both
    land (the per-group lease makes the read-modify-write safe)."""
    import threading

    cat, a, b = catalog_pair
    TC.pin_current_group(cat, "nightly", ["sales.a", "sales.b"])
    s_a = V.current_snapshot(a)
    s_b = V.current_snapshot(b)
    V.append_snapshot(_df(spark, [(2, "a2")]), a)
    V.append_snapshot(_df(spark, [(2, "b2")]), b)
    n_a = V.current_snapshot(a)
    n_b = V.current_snapshot(b)
    errs = []

    def pin(name, snap):
        try:
            TC.pin_group(cat, "nightly", {name: snap})
        except Exception as e:
            errs.append(e)

    ths = [threading.Thread(target=pin, args=("sales.a", n_a)),
           threading.Thread(target=pin, args=("sales.b", n_b))]
    for t in ths:
        t.start()
    for t in ths:
        t.join(30)
    assert not errs, errs
    snaps = TC.group_snapshots(cat, "nightly")
    assert snaps == {"sales.a": n_a, "sales.b": n_b}, (
        "a lost update reverted a member", s_a, s_b, snaps)


def test_vacuum_aborts_on_unreadable_live_page(spark, tmp_path,
                                               monkeypatch):
    """A page-read failure during the LIVENESS walk must abort the
    vacuum loudly — never silently drop a retained page's chunks
    from liveness (that would reap live data)."""
    monkeypatch.setattr(V, "_MANIFEST_CHUNK_FILES", 6)
    monkeypatch.setattr(V, "_MANIFEST_CHUNK_SIZE", 4)
    monkeypatch.setattr(V, "_CORE_PAGE_DESCS", 3)
    monkeypatch.setattr(V, "_CORE_PAGE_FOLD_AT", 4)
    V._PAGE_CACHE.clear()
    table = str(tmp_path / "t")
    V.write_snapshot(
        spark.createDataFrame([(i, f"v{i}") for i in range(400)],
                              "k int, v string")
        .repartitionByRange(40, "k"), table, stats_cols=["k"])
    V.append_snapshot(
        spark.createDataFrame([(1000, "x")], "k int, v string"),
        table)
    core = V._read_core(table, V.current_snapshot(table))
    victim = core["pages"][0]["id"]
    page_path = V._page_path(table, victim)
    data_before = set(os.listdir(os.path.join(table)))
    with open(page_path, "w") as fh:
        fh.write("{corrupt")
    V._PAGE_CACHE.clear()
    with pytest.raises(Exception):
        V.vacuum_snapshots(table, keep=1, min_age_seconds=None,
                           staging_age_seconds=0.0)
    # nothing from the data pool was reaped by the aborted run
    assert set(os.listdir(os.path.join(table))) == data_before


def test_symlinked_spellings_lease_and_abort_same_table(
        spark, two_tables, tmp_path):
    """ADVICE r10: canonicalization must resolve SYMLINKS, not just
    relative paths — a txn declared through a symlinked spelling of a
    table must (a) lease/commit the same underlying table as its real
    spelling, and (b) on abort, delete the staged ref on the spelling
    the protocol leased (no orphaned txn- branch left behind)."""
    a, b, log = two_tables
    link = str(tmp_path / "a_link")
    os.symlink(a, link)

    # commit through the SYMLINKED spelling lands on the real table
    with T.multi_table_txn(log, [link, b]) as txn:
        txn.append(_df(spark, [(2, "via-link")]), link)
    assert _rows(spark, a) == {(1, "a-base"), (2, "via-link")}

    # abort through the symlinked spelling leaves no staged ref on
    # either spelling
    with pytest.raises(RuntimeError, match="boom"):
        with T.multi_table_txn(log, [link]) as txn:
            txn.append(_df(spark, [(3, "doomed")]), link)
            raise RuntimeError("boom")
    assert V.list_refs(a) == {}
    assert V.list_refs(link) == {}
    assert _rows(spark, a) == {(1, "a-base"), (2, "via-link")}

    # two spellings of the SAME table inside one txn resolve to one
    # canonical lease path — commit_staged's sorted-order invariant
    # sees one table, so the commit cannot self-deadlock
    with T.multi_table_txn(log, [a, link]) as txn:
        txn.append(_df(spark, [(4, "both")]), a)
        txn.append(_df(spark, [(5, "both2")]), link)
    assert {(4, "both"), (5, "both2")} <= _rows(spark, a)
