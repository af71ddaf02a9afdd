"""Optimistic multi-writer commits on versioned tables (VERDICT r04
#3): appends and compaction do their expensive work with NO lease held
and take the lease only for the metadata publish, rebasing onto a
moved head when they can do so losslessly — so a streaming lander and
a maintenance OPTIMIZE running concurrently BOTH commit, with no lost
update. Rebases that would resurrect or drop rows raise
CommitConflictError instead of corrupting.

The deterministic interleavings pause a writer between its file
landing and its publish via a monkeypatched ``_land_in_pool`` (the
writer signals `landed` and blocks on `resume`), so every race below
is exact, not probabilistic; the append-vs-append hammer then runs the
real free-running race on top.
"""

from __future__ import annotations

import threading

import pytest

from mc_ns_data_pipeline_spark.sinks import versioned as V


def _df(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema)


class _Pause:
    """Arm once: the NEXT landing (Spark `_land_in_pool` OR the r12
    driver-side `_land_arrow_in_pool` fast path) signals `landed`,
    then blocks until `resume` — later calls (other writers) pass
    through."""

    def __init__(self, monkeypatch):
        self.landed = threading.Event()
        self.resume = threading.Event()
        self._armed = True
        self._orig = V._land_in_pool
        self._orig_arrow = V._land_arrow_in_pool
        monkeypatch.setattr(V, "_land_in_pool", self._land)
        monkeypatch.setattr(V, "_land_arrow_in_pool", self._land_arrow)

    def _pause_point(self):
        if self._armed:
            self._armed = False
            self.landed.set()
            assert self.resume.wait(60), "resume never signalled"

    def _land(self, df, table):
        names = self._orig(df, table)
        self._pause_point()
        return names

    def _land_arrow(self, tbl, table, spark=None):
        names = self._orig_arrow(tbl, table, spark)
        self._pause_point()
        return names


def test_append_during_compaction_both_commit(spark, tmp_path,
                                              monkeypatch):
    """The headline shape: a compaction is mid-rewrite when an append
    lands and publishes. The compaction must REBASE — compacted files
    plus the interposed append's files — and both writers' rows
    survive."""
    table = str(tmp_path / "t")
    V.write_snapshot(
        _df(spark, [(i, "base") for i in range(40)]).repartition(8),
        table, stats_cols=["k"])

    pause = _Pause(monkeypatch)
    err: list[Exception] = []

    def compactor():
        try:
            V.compact_snapshot(spark, table, sort_col="k",
                               target_files=2)
        except Exception as e:  # surface in the main thread
            err.append(e)

    t = threading.Thread(target=compactor)
    t.start()
    assert pause.landed.wait(60)  # compact rewrote, not yet published

    appended = V.append_snapshot(
        _df(spark, [(100 + i, "mid") for i in range(5)]), table)
    assert V.current_snapshot(table) == appended

    pause.resume.set()
    t.join(60)
    assert not err, err

    man = V.read_manifest(table, V.current_snapshot(table))
    assert man["op"] == "compact"
    assert man["parent"] == appended  # rebased onto the append
    assert man["rows"] == 45
    got = {(r.k, r.v) for r in V.read_current(spark, table).collect()}
    assert got == ({(i, "base") for i in range(40)}
                   | {(100 + i, "mid") for i in range(5)})
    # the interposed append's files carried their stats forward
    stats = man.get("stats") or {}
    assert all(f in stats for f in man["files"])


def test_compaction_conflicts_on_interposed_merge(spark, tmp_path,
                                                  monkeypatch):
    """A COW merge interposing mid-compaction rewrote rows the
    compaction read as inputs — rebasing would resurrect the stale
    versions, so the publish must refuse loudly and leave the merge's
    snapshot untouched."""
    table = str(tmp_path / "t")
    V.write_snapshot(
        _df(spark, [(i, "base") for i in range(20)]).repartition(4),
        table)

    pause = _Pause(monkeypatch)
    err: list[Exception] = []

    def compactor():
        try:
            V.compact_snapshot(spark, table, target_files=1)
        except Exception as e:
            err.append(e)

    t = threading.Thread(target=compactor)
    t.start()
    assert pause.landed.wait(60)

    V.merge_snapshot(spark, _df(spark, [(3, "UPDATED")]), table, "k")
    merged = V.current_snapshot(table)

    pause.resume.set()
    t.join(60)
    assert len(err) == 1 and isinstance(err[0], V.CommitConflictError)
    assert V.current_snapshot(table) == merged  # merge untouched
    got = dict((r.k, r.v) for r in V.read_current(spark, table).collect())
    assert got[3] == "UPDATED" and len(got) == 20
    # the conflicted rewrite's files are unreferenced -> vacuum fodder
    man = V.read_manifest(table, merged)
    assert len(man["files"]) > 1  # still the uncompacted layout


def test_append_rebases_over_interposed_mor_delete(spark, tmp_path,
                                                   monkeypatch):
    """An append pausing between land and publish while a MOR delete
    flips in: the append must publish on top of the delete, and its
    rows — including re-inserted deleted keys — stay live (their file
    generation is ABOVE the mask's, strict-below semantics)."""
    table = str(tmp_path / "t")
    V.write_snapshot(
        _df(spark, [(i, "base") for i in range(10)]).repartition(2),
        table)

    pause = _Pause(monkeypatch)
    out: list[str] = []
    err: list[Exception] = []

    def appender():
        try:
            out.append(V.append_snapshot(
                _df(spark, [(3, "reborn"), (50, "new")]), table))
        except Exception as e:
            err.append(e)

    t = threading.Thread(target=appender)
    t.start()
    assert pause.landed.wait(60)

    V.delete_keys_mor(spark, table, "k",
                      spark.createDataFrame([(3,)], "k int"))
    assert V.read_current(spark, table).count() == 9

    pause.resume.set()
    t.join(60)
    assert not err, err
    assert V.current_snapshot(table) == out[0]

    got = {(r.k, r.v) for r in V.read_current(spark, table).collect()}
    assert (3, "reborn") in got  # appended after the mask: survives
    assert (3, "base") not in got  # masked old version stays dead
    assert (50, "new") in got
    assert len(got) == 11
    man = V.read_manifest(table, out[0])
    assert man.get("delete_files")  # the mask rode through the rebase


def test_compaction_rebases_over_interposed_mor_delete(spark, tmp_path,
                                                       monkeypatch):
    """A MOR delete flipping in mid-compaction must KEEP masking the
    compacted output: the rewrite read the pre-delete snapshot, so its
    files still carry the doomed rows — they are stamped at the BASE
    generation, below the interposed mask's, and strict-below
    sequencing hides them. (Stamping at the publish generation instead
    would silently resurrect every row deleted mid-compaction.)"""
    table = str(tmp_path / "t")
    V.write_snapshot(
        _df(spark, [(i, "base") for i in range(20)]).repartition(5),
        table)

    pause = _Pause(monkeypatch)
    err: list[Exception] = []

    def compactor():
        try:
            V.compact_snapshot(spark, table, sort_col="k",
                               target_files=1)
        except Exception as e:
            err.append(e)

    t = threading.Thread(target=compactor)
    t.start()
    assert pause.landed.wait(60)  # rewrite landed, pre-delete rows in

    V.delete_keys_mor(spark, table, "k",
                      spark.createDataFrame([(3,), (4,)], "k int"))
    assert V.read_current(spark, table).count() == 18

    pause.resume.set()
    t.join(60)
    assert not err, err
    man = V.read_manifest(table, V.current_snapshot(table))
    assert man["op"] == "compact"
    assert man.get("delete_files")  # the interposed mask rode along
    got = {r.k for r in V.read_current(spark, table).collect()}
    assert got == set(range(20)) - {3, 4}  # NOT resurrected
    assert man["rows"] == 18


def test_compaction_rebases_over_interposed_mor_upsert(spark, tmp_path,
                                                       monkeypatch):
    """Same shape for a MOR upsert lander: its new row versions land,
    its mask keeps hiding the OLD versions inside the compacted files,
    and no key duplicates."""
    table = str(tmp_path / "t")
    V.write_snapshot(
        _df(spark, [(i, "base") for i in range(20)]).repartition(5),
        table)

    pause = _Pause(monkeypatch)
    err: list[Exception] = []

    def compactor():
        try:
            V.compact_snapshot(spark, table, target_files=1)
        except Exception as e:
            err.append(e)

    t = threading.Thread(target=compactor)
    t.start()
    assert pause.landed.wait(60)

    V.merge_snapshot_mor(
        spark, _df(spark, [(5, "UPD"), (100, "new")]), table, "k")

    pause.resume.set()
    t.join(60)
    assert not err, err
    got = dict((r.k, r.v) for r in V.read_current(spark, table).collect())
    assert got[5] == "UPD" and got[100] == "new"
    assert len(got) == 21  # no duplicate key 5
    man = V.read_manifest(table, V.current_snapshot(table))
    assert man["op"] == "compact" and man["rows"] == 21


def test_concurrent_appends_hammer_no_lost_update(spark, tmp_path):
    """Free-running race: four appenders, three batches each, no
    orchestration. Every commit must land (no failures), the final
    row count must be exact, and the manifest chain must be linear —
    each snapshot's parent is the previous head."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(0, "base")]), table)

    errs: list[Exception] = []

    def appender(tid: int):
        for b in range(3):
            try:
                V.append_snapshot(
                    _df(spark, [(1000 * tid + 10 * b + j, f"t{tid}b{b}")
                                for j in range(5)]), table)
            except Exception as e:
                errs.append(e)

    threads = [threading.Thread(target=appender, args=(i,))
               for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(300)
    assert not errs, errs

    assert V.read_current(spark, table).count() == 1 + 4 * 3 * 5
    man = V.read_manifest(table, V.current_snapshot(table))
    assert man["rows"] == 61
    # linear history: walking parents visits every commit exactly once
    seen = []
    snap = V.current_snapshot(table)
    while snap is not None:
        m = V.read_manifest(table, snap)
        seen.append(snap)
        snap = m.get("parent")
    assert len(seen) == 1 + 12  # base + every append committed


def test_append_during_compaction_on_chunked_table(spark, tmp_path,
                                                   monkeypatch):
    """The optimistic interleavings compose with chunked manifests:
    an append lands mid-compaction on a chunked table, the compaction
    rebases, and the rebased publish re-chunks (or inlines) correctly
    — no row lost, planning still sound."""
    monkeypatch.setattr(V, "_MANIFEST_CHUNK_FILES", 6)
    monkeypatch.setattr(V, "_MANIFEST_CHUNK_SIZE", 4)
    table = str(tmp_path / "t")
    V.write_snapshot(
        _df(spark, [(i, "base") for i in range(40)])
        .repartitionByRange(10, "k"), table, stats_cols=["k"])
    assert "chunks" in V._read_core(table, V.current_snapshot(table))

    pause = _Pause(monkeypatch)
    err: list[Exception] = []

    def compactor():
        try:
            V.compact_snapshot(spark, table, sort_col="k",
                               target_files=8)
        except Exception as e:
            err.append(e)

    t = threading.Thread(target=compactor)
    t.start()
    assert pause.landed.wait(60)
    V.append_snapshot(_df(spark, [(100, "mid")]), table)
    pause.resume.set()
    t.join(60)
    assert not err, err
    got = {(r.k, r.v) for r in V.read_current(spark, table).collect()}
    assert got == ({(i, "base") for i in range(40)} | {(100, "mid")})
    # pruned read still exact after the rebased re-chunk
    assert [r.v for r in V.read_current(
        spark, table, predicates=[("k", "=", 100)]).collect()] == ["mid"]
    assert V.read_current(
        spark, table, predicates=[("k", "=", 7)]).count() == 1


def test_append_txn_idempotent_across_interleaving(spark, tmp_path,
                                                   monkeypatch):
    """The txn stamp must stay exactly-once even when the replay lands
    its files while the original's commit already published: the
    second attempt's publish-lease re-check finds the stamp and
    returns the existing snapshot (its files become vacuum orphans)."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(0, "base")]), table)
    first = V.append_snapshot(_df(spark, [(1, "x")]), table,
                              txn_id="job:7")
    again = V.append_snapshot(_df(spark, [(1, "x")]), table,
                              txn_id="job:7")
    assert again == first
    assert V.read_current(spark, table).count() == 2


def test_optimize_compacts_through_interposed_append(spark, tmp_path,
                                                     monkeypatch):
    """optimize_table's compaction uses the same optimistic publish:
    an append interposing mid-OPTIMIZE does not fail the maintenance
    pass, and nothing is lost."""
    table = str(tmp_path / "t")
    V.write_snapshot(
        _df(spark, [(i, "base") for i in range(30)]).repartition(10),
        table)

    pause = _Pause(monkeypatch)
    res: list[dict] = []
    err: list[Exception] = []

    def optimizer():
        try:
            res.append(V.optimize_table(
                spark, table, target_file_rows=100,
                vacuum_min_age_seconds=None))
        except Exception as e:
            err.append(e)

    t = threading.Thread(target=optimizer)
    t.start()
    assert pause.landed.wait(60)
    V.append_snapshot(_df(spark, [(99, "mid")]), table)
    pause.resume.set()
    t.join(60)
    assert not err, err
    assert res and res[0]["compacted"]
    assert V.read_current(spark, table).count() == 31


def test_mor_upsert_and_cow_merge_different_keys_both_commit(
        spark, tmp_path, monkeypatch):
    """r5 verdict #3, the Done shape: a MOR upsert stages its files
    with NO lease held, so a concurrent COW merge (which holds the
    lease for its whole mutation) on different keys proceeds
    unblocked; the upsert's publish then REBASES over the interposed
    merge — one recount against the new head — and BOTH commit."""
    table = str(tmp_path / "t")
    V.write_snapshot(
        _df(spark, [(i, "base") for i in range(40)]).repartition(8),
        table, stats_cols=["k"])

    pause = _Pause(monkeypatch)
    err: list[Exception] = []
    done: list[str] = []

    def upserter():
        try:
            done.append(V.merge_snapshot_mor(
                spark, _df(spark, [(1, "mor"), (100, "mor")]),
                table, "k"))
        except Exception as e:
            err.append(e)

    t = threading.Thread(target=upserter)
    t.start()
    assert pause.landed.wait(60)  # upsert staged files, NO lease held

    # COW merge on DIFFERENT keys runs to completion while the MOR
    # writer is mid-staging — it would deadlock here if the upsert
    # still held the lease through its landing.
    merged = V.merge_snapshot(
        spark, _df(spark, [(2, "cow")]), table, "k")
    assert V.current_snapshot(table) == merged

    pause.resume.set()
    t.join(60)
    assert not err, err
    assert done and V.current_snapshot(table) == done[0]

    man = V.read_manifest(table, done[0])
    assert man["op"] == "merge-mor"
    assert man["parent"] == merged  # rebased onto the COW merge
    got = {(r.k, r.v) for r in V.read_current(spark, table).collect()}
    expect = {(i, "base") for i in range(40) if i not in (1, 2)}
    expect |= {(1, "mor"), (2, "cow"), (100, "mor")}
    assert got == expect
    assert man["rows"] == len(expect)  # decrement recounted at head


def test_mor_delete_rebases_over_interposed_matching_append(
        spark, tmp_path, monkeypatch):
    """A MOR delete staged before an append of the SAME key must still
    mask the appended row (the mask sequences at the PUBLISH
    generation) and its row accounting must include it (the
    incremental recount over just the appended files)."""
    table = str(tmp_path / "t")
    V.write_snapshot(
        _df(spark, [(i, "base") for i in range(10)]), table,
        stats_cols=["k"])

    pause = _Pause(monkeypatch)
    err: list[Exception] = []

    def deleter():
        try:
            V.delete_keys_mor(spark, table, "k",
                              _df(spark, [(3, "x")]))
        except Exception as e:
            err.append(e)

    t = threading.Thread(target=deleter)
    t.start()
    assert pause.landed.wait(60)  # delete file landed, lease-free

    V.append_snapshot(_df(spark, [(3, "late"), (77, "late")]), table)

    pause.resume.set()
    t.join(60)
    assert not err, err

    got = {(r.k, r.v) for r in V.read_current(spark, table).collect()}
    expect = ({(i, "base") for i in range(10) if i != 3}
              | {(77, "late")})
    assert got == expect, "appended k=3 must be masked too"
    man = V.read_manifest(table, V.current_snapshot(table))
    assert man["op"] == "delete-mor"
    assert man["rows"] == len(expect)  # both copies of k=3 decremented


def test_mor_upsert_conflicts_on_interposed_full_refresh(
        spark, tmp_path, monkeypatch):
    """A full refresh is a semantic barrier: the staged batch was
    computed against content that no longer exists — conflict, never
    a silent apply onto the new table."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "base")]), table)

    pause = _Pause(monkeypatch)
    err: list[Exception] = []

    def upserter():
        try:
            V.merge_snapshot_mor(
                spark, _df(spark, [(1, "mor")]), table, "k")
        except Exception as e:
            err.append(e)

    t = threading.Thread(target=upserter)
    t.start()
    assert pause.landed.wait(60)

    V.write_snapshot(_df(spark, [(9, "refreshed")]), table)

    pause.resume.set()
    t.join(60)
    assert err and isinstance(err[0], V.CommitConflictError), err
    got = {(r.k, r.v) for r in V.read_current(spark, table).collect()}
    assert got == {(9, "refreshed")}


def test_cow_merge_rebases_over_disjoint_append(spark, tmp_path,
                                                monkeypatch):
    """r6: a COW merge stages lease-free; an append of PROVABLY
    key-disjoint rows (manifest spans rule them out) lands mid-rewrite
    and the merge REBASES — both commit, appended rows survive."""
    table = str(tmp_path / "t")
    V.write_snapshot(
        _df(spark, [(i, "base") for i in range(40)]).repartition(8),
        table, stats_cols=["k"])

    pause = _Pause(monkeypatch)
    err: list[Exception] = []
    done: list[str] = []

    def merger():
        try:
            done.append(V.merge_snapshot(
                spark, _df(spark, [(3, "UPD")]), table, "k"))
        except Exception as e:
            err.append(e)

    t = threading.Thread(target=merger)
    t.start()
    assert pause.landed.wait(60)  # rewrite landed, NO lease held

    appended = V.append_snapshot(
        _df(spark, [(500 + i, "mid") for i in range(3)]), table)
    assert V.current_snapshot(table) == appended

    pause.resume.set()
    t.join(60)
    assert not err, err
    man = V.read_manifest(table, done[0])
    assert man["op"] == "merge" and man["parent"] == appended
    got = {(r.k, r.v) for r in V.read_current(spark, table).collect()}
    expect = ({(i, "base") for i in range(40) if i != 3}
              | {(3, "UPD")} | {(500 + i, "mid") for i in range(3)})
    assert got == expect
    assert man["rows"] == len(expect)


def test_cow_merge_conflicts_on_overlapping_append(spark, tmp_path,
                                                   monkeypatch):
    """An interposed append whose span CAN contain a merge key makes
    the located affected set stale — the merge must conflict, never
    silently drop the appended row's update."""
    table = str(tmp_path / "t")
    V.write_snapshot(
        _df(spark, [(i, "base") for i in range(40)]).repartition(8),
        table, stats_cols=["k"])

    pause = _Pause(monkeypatch)
    err: list[Exception] = []

    def merger():
        try:
            V.merge_snapshot(spark, _df(spark, [(3, "UPD")]),
                             table, "k")
        except Exception as e:
            err.append(e)

    t = threading.Thread(target=merger)
    t.start()
    assert pause.landed.wait(60)

    V.append_snapshot(_df(spark, [(3, "dup")]), table)  # same key!

    pause.resume.set()
    t.join(60)
    assert err and isinstance(err[0], V.CommitConflictError), err
    # the table still holds the append's row; re-running the merge
    # against the new head converges
    V.merge_snapshot(spark, _df(spark, [(3, "UPD")]), table, "k")
    got = {(r.k, r.v) for r in V.read_current(spark, table).collect()}
    assert got == ({(i, "base") for i in range(40) if i != 3}
                   | {(3, "UPD")})


def test_cow_delete_conflicts_on_interposed_mor(spark, tmp_path,
                                                monkeypatch):
    """A COW delete racing a MOR commit conflicts (the rewrite's
    mask-applied inputs are stale) instead of resurrecting rows."""
    table = str(tmp_path / "t")
    V.write_snapshot(
        _df(spark, [(i, "base") for i in range(20)]).repartition(4),
        table, stats_cols=["k"])

    pause = _Pause(monkeypatch)
    err: list[Exception] = []

    def deleter():
        try:
            V.delete_keys_snapshot(spark, table, "k",
                                   _df(spark, [(3, "x")]))
        except Exception as e:
            err.append(e)

    t = threading.Thread(target=deleter)
    t.start()
    assert pause.landed.wait(60)

    V.delete_keys_mor(spark, table, "k", _df(spark, [(7, "x")]))

    pause.resume.set()
    t.join(60)
    assert err and isinstance(err[0], V.CommitConflictError), err
    got = {r.k for r in V.read_current(spark, table).collect()}
    assert got == set(range(20)) - {7}  # MOR delete intact


def test_chunked_cow_merge_rebases_over_disjoint_append(
        spark, tmp_path, monkeypatch):
    """Same rebase contract through the CHUNKED COW engine: the
    publish reuses the head's descriptors (including the interposed
    append's new sidecar) with the rewritten members tombstoned."""
    monkeypatch.setattr(V, "_MANIFEST_CHUNK_FILES", 6)
    monkeypatch.setattr(V, "_MANIFEST_CHUNK_SIZE", 4)
    table = str(tmp_path / "t")
    V.write_snapshot(
        _df(spark, [(i, "base") for i in range(40)])
        .repartitionByRange(8, "k"), table, stats_cols=["k"])

    pause = _Pause(monkeypatch)
    err: list[Exception] = []
    done: list[str] = []

    def merger():
        try:
            done.append(V.merge_snapshot(
                spark, _df(spark, [(3, "UPD")]), table, "k"))
        except Exception as e:
            err.append(e)

    t = threading.Thread(target=merger)
    t.start()
    assert pause.landed.wait(60)

    appended = V.append_snapshot(
        _df(spark, [(900, "mid")]), table)

    pause.resume.set()
    t.join(60)
    assert not err, err
    core = V._read_core(table, done[0])
    assert core["op"] == "merge" and core["parent"] == appended
    got = {(r.k, r.v) for r in V.read_current(spark, table).collect()}
    expect = ({(i, "base") for i in range(40) if i != 3}
              | {(3, "UPD"), (900, "mid")})
    assert got == expect
    assert core["rows"] == len(expect)


def test_cow_delete_rebase_keeps_widened_schema(spark, tmp_path,
                                                monkeypatch):
    """Review finding (r6): a COW delete rebasing over a key-disjoint
    SCHEMA-WIDENING append must publish the head's widened schema —
    narrowing it would silently drop the appended column from every
    later read."""
    table = str(tmp_path / "t")
    V.write_snapshot(
        _df(spark, [(i, "base") for i in range(20)]).repartition(4),
        table, stats_cols=["k"])

    pause = _Pause(monkeypatch)
    err: list[Exception] = []

    def deleter():
        try:
            V.delete_keys_snapshot(spark, table, "k",
                                   _df(spark, [(3, "x")]))
        except Exception as e:
            err.append(e)

    t = threading.Thread(target=deleter)
    t.start()
    assert pause.landed.wait(60)

    V.append_snapshot(  # key-disjoint AND adds column w
        spark.createDataFrame([(900, "mid", 1.5)],
                              "k int, v string, w double"), table)

    pause.resume.set()
    t.join(60)
    assert not err, err
    got = V.read_current(spark, table)
    assert "w" in got.columns, "widened column lost in the rebase"
    rows = {(r.k, r.v, r.w) for r in got.collect()}
    assert (900, "mid", 1.5) in rows
    assert all(r.w is None for r in got.collect() if r.k != 900)
    assert not any(k == 3 for (k, _, _) in rows)


def test_set_spec_interposes_without_conflicts(spark, tmp_path,
                                               monkeypatch):
    """set-spec is row- and file-preserving metadata: compaction, MOR,
    and COW writers staged across it all rebase instead of
    conflicting, and incremental changelog readers skip it."""
    import datetime as dt

    table = str(tmp_path / "t")
    V.write_snapshot(
        spark.createDataFrame(
            [(i, dt.datetime(2024, 1, 1 + i % 3), f"v{i}")
             for i in range(40)],
            "k long, ts timestamp, v string").repartition(8),
        table, stats_cols=["k"])
    cursor = V.current_snapshot(table)

    # COW merge staged across an interposed set-spec: rebases
    pause = _Pause(monkeypatch)
    err: list[Exception] = []

    def merger():
        try:
            V.merge_snapshot(
                spark,
                spark.createDataFrame(
                    [(3, dt.datetime(2024, 1, 1), "UPD")],
                    "k long, ts timestamp, v string"),
                table, "k")
        except Exception as e:
            err.append(e)

    t = threading.Thread(target=merger)
    t.start()
    assert pause.landed.wait(60)
    V.set_partition_spec(table, ["days(ts)"])
    pause.resume.set()
    t.join(60)
    assert not err, err
    man = V._read_core(table, V.current_snapshot(table))
    assert man["partition_spec"] is not None  # spec inherited
    assert [r.v for r in V.read_current(
        spark, table, predicates=[("k", "=", 3)]).collect()] == ["UPD"]

    # incremental readers cross the set-spec commit without error
    V.append_snapshot(
        spark.createDataFrame([(100, dt.datetime(2024, 1, 2), "new")],
                              "k long, ts timestamp, v string"),
        table)
    # (the merge interposed, so the appended-files fast path refuses
    # on the MERGE, not the set-spec; check from just before set-spec)
    chg = V.read_changes_since(spark, table,
                               V._read_core(
                                   table, V.current_snapshot(table)
                               )["parent"])
    assert chg["inserts"].count() == 1

    # compaction staged across a set-spec: rebases, no conflict
    pause2 = _Pause(monkeypatch)
    err2: list[Exception] = []

    def compactor():
        try:
            V.compact_snapshot(spark, table, target_files=2)
        except Exception as e:
            err2.append(e)

    t2 = threading.Thread(target=compactor)
    t2.start()
    assert pause2.landed.wait(60)
    V.set_partition_spec(table, ["days(ts)", "bucket(4, k)"])
    pause2.resume.set()
    t2.join(60)
    assert not err2, err2
    core = V._read_core(table, V.current_snapshot(table))
    assert core["op"] == "compact"
    assert core["partition_spec"] == [
        {"transform": "days", "col": "ts"},
        {"transform": "bucket", "n": 4, "col": "k"}]
    assert V.read_current(spark, table).count() == 41


def test_mixed_verb_hammer_no_lost_update(spark, tmp_path):
    """Free-running mixed-writer race over the FULLY optimistic
    matrix: two appenders, one MOR upserter, and one OPTIMIZE run
    concurrently with no coordination. All of them must commit (these
    verbs rebase over each other by design) and the final table must
    contain every appender's rows plus the upserter's last values —
    no lost update, exact row accounting."""
    table = str(tmp_path / "t")
    V.write_snapshot(
        _df(spark, [(i, "base") for i in range(50)]).repartition(4),
        table, stats_cols=["k"])

    errs: list[Exception] = []

    def appender(base_key):
        try:
            for i in range(4):
                V.append_snapshot(
                    _df(spark, [(base_key + i, "app")]), table)
        except Exception as e:
            errs.append(e)

    def upserter():
        try:
            for i in range(3):
                V.merge_snapshot_mor(
                    spark, _df(spark, [(7, f"u{i}"), (9, f"u{i}")]),
                    table, "k")
        except Exception as e:
            errs.append(e)

    def optimizer():
        try:
            # vacuum_keep high: reaping a mid-flight writer's BASE
            # manifest is a legitimate conflict ("re-run"), but this
            # hammer asserts the no-conflict matrix
            V.optimize_table(spark, table, max_small_files=1,
                             max_delete_files=0, vacuum_keep=100,
                             vacuum_min_age_seconds=None)
        except V.CommitConflictError:
            pass  # one retry already happened inside; next pass wins
        except Exception as e:
            errs.append(e)

    threads = [threading.Thread(target=appender, args=(1000,)),
               threading.Thread(target=appender, args=(2000,)),
               threading.Thread(target=upserter),
               threading.Thread(target=optimizer)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(180)
    assert not errs, errs

    got = {(r.k, r.v) for r in V.read_current(spark, table).collect()}
    expect_keys = (set(range(50))
                   | {1000 + i for i in range(4)}
                   | {2000 + i for i in range(4)})
    assert {k for k, _ in got} == expect_keys, "lost or duplicated keys"
    assert len(got) == len(expect_keys), "duplicate row versions leaked"
    by_key = dict(got)
    assert by_key[7] == "u2" and by_key[9] == "u2", (
        "upserter's last write must win")
    man = V.read_manifest(table, V.current_snapshot(table))
    assert man["rows"] == len(expect_keys)  # accounting stayed exact


def test_full_refresh_conflicts_on_interposed_append(
        spark, tmp_path, monkeypatch):
    """r7: write_snapshot stages lease-free (land + scans outside the
    lease) but cannot REBASE — an overwrite published over an
    interposed append would silently orphan that append's rows. So a
    refresh whose head moved mid-staging must conflict, and the
    interposed append's data must survive."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "base")]), table)

    pause = _Pause(monkeypatch)
    err: list[Exception] = []

    def refresher():
        try:
            V.write_snapshot(_df(spark, [(9, "refreshed")]), table)
        except Exception as e:
            err.append(e)

    t = threading.Thread(target=refresher)
    t.start()
    assert pause.landed.wait(60)  # refresh landed, not yet published

    V.append_snapshot(_df(spark, [(2, "mid")]), table)

    pause.resume.set()
    t.join(60)
    assert err and isinstance(err[0], V.CommitConflictError), err
    got = {(r.k, r.v) for r in V.read_current(spark, table).collect()}
    assert got == {(1, "base"), (2, "mid")}, (
        "interposed append must survive a conflicted refresh")


def test_full_refresh_racing_full_refresh_second_conflicts(
        spark, tmp_path, monkeypatch):
    """Two refreshes race: the first to publish wins; the second sees
    a moved head and conflicts instead of silently last-writer-winning
    over state it never saw."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "base")]), table)

    pause = _Pause(monkeypatch)
    err: list[Exception] = []

    def refresher():
        try:
            V.write_snapshot(_df(spark, [(5, "slow")]), table)
        except Exception as e:
            err.append(e)

    t = threading.Thread(target=refresher)
    t.start()
    assert pause.landed.wait(60)

    V.write_snapshot(_df(spark, [(7, "fast")]), table)

    pause.resume.set()
    t.join(60)
    assert err and isinstance(err[0], V.CommitConflictError), err
    got = {(r.k, r.v) for r in V.read_current(spark, table).collect()}
    assert got == {(7, "fast")}


def test_full_refresh_clean_path_publishes_optimistically(
        spark, tmp_path, monkeypatch):
    """No interposition → the staged refresh publishes normally, and
    the lease was never held during the landing (another writer's
    publish proceeds while the refresh is paused mid-staging)."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "base")]), table)

    pause = _Pause(monkeypatch)
    err: list[Exception] = []

    def refresher():
        try:
            V.write_snapshot(_df(spark, [(9, "refreshed")]), table)
        except Exception as e:
            err.append(e)

    t = threading.Thread(target=refresher)
    t.start()
    assert pause.landed.wait(60)
    # while the refresh is staged-but-unpublished, the table lease is
    # free: a concurrent writer can take it and release it
    from mc_ns_data_pipeline_spark.sinks.lease import table_lease
    with table_lease(table, owner="probe", ttl_s=5):
        pass
    pause.resume.set()
    t.join(60)
    assert not err, err
    got = {(r.k, r.v) for r in V.read_current(spark, table).collect()}
    assert got == {(9, "refreshed")}
