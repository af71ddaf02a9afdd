"""Named refs on versioned tables: tags (vacuum-safe audit/rollback
anchors), branches (write-audit-publish staging), fast-forward
publish, and rollback. A ref is a pointer file beside CURRENT riding
the same atomic-rename primitive, so staged commits are invisible to
table readers until the audited publish — the Iceberg WAP / tag /
rollback verbs on the manifest-pointer pattern."""

from __future__ import annotations

import os

import pytest

from mc_ns_data_pipeline_spark.sinks import versioned as V


def _df(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema)


def test_tag_pins_snapshot_through_vacuum(spark, tmp_path):
    table = str(tmp_path / "t")
    s0 = V.write_snapshot(_df(spark, [(1, "a"), (2, "b")]), table)
    V.tag_snapshot(table, "golden")  # defaults to CURRENT
    for i in range(3):
        V.write_snapshot(_df(spark, [(10 + i, "x")]), table)

    # the tag still reads the ORIGINAL rows after 3 overwrites
    got = {(r.k, r.v) for r in V.read_ref(spark, table, "golden").collect()}
    assert got == {(1, "a"), (2, "b")}
    # vacuum keep=1 would normally reap s0 — the tag pins it AND its files
    out = V.vacuum_snapshots(table, keep=1)
    assert s0 not in out["snapshots"]
    got = {(r.k, r.v) for r in V.read_ref(spark, table, "golden").collect()}
    assert got == {(1, "a"), (2, "b")}
    assert V.list_refs(table) == {"golden": s0}
    # deleting the tag releases the pin: next vacuum reaps
    V.delete_ref(table, "golden")
    out = V.vacuum_snapshots(table, keep=1)
    assert s0 in out["snapshots"]


def test_write_audit_publish_flow(spark, tmp_path):
    """Stage two appends on a branch, audit them, publish: CURRENT
    never shows staged rows until the fast-forward, then shows all."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "base")]), table)
    cur0 = V.current_snapshot(table)

    V.append_snapshot(_df(spark, [(2, "staged1")]), table,
                      branch="audit")
    V.append_snapshot(_df(spark, [(3, "staged2")]), table,
                      branch="audit")
    # CURRENT untouched; the branch sees base + both staged batches
    assert V.current_snapshot(table) == cur0
    assert V.read_current(spark, table).count() == 1
    staged = {r.k for r in V.read_ref(spark, table, "audit").collect()}
    assert staged == {1, 2, 3}

    # audit passes -> publish fast-forwards in one flip
    head = V.ref_snapshot(table, "audit")
    assert V.publish_ref(table, "audit") == head
    assert V.current_snapshot(table) == head
    assert {r.k for r in V.read_current(spark, table).collect()} \
        == {1, 2, 3}
    assert V.list_refs(table) == {}  # branch consumed


def test_publish_ref_conflicts_when_table_moved(spark, tmp_path):
    """A direct commit landing after the branch staged makes the
    staged lineage stale: publish must refuse, and a re-staged branch
    from the new head publishes fine."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "base")]), table)
    V.append_snapshot(_df(spark, [(2, "staged")]), table,
                      branch="audit")
    V.append_snapshot(_df(spark, [(9, "direct")]), table)  # interloper
    with pytest.raises(V.CommitConflictError, match="re-stage"):
        V.publish_ref(table, "audit")
    assert {r.k for r in V.read_current(spark, table).collect()} \
        == {1, 9}
    # re-stage from the new head and publish
    V.delete_ref(table, "audit")
    V.append_snapshot(_df(spark, [(2, "staged")]), table,
                      branch="audit")
    V.publish_ref(table, "audit")
    assert {r.k for r in V.read_current(spark, table).collect()} \
        == {1, 2, 9}


def test_branch_txn_idempotence(spark, tmp_path):
    """Exactly-once stamps walk the BRANCH lineage: a replayed staged
    batch is a no-op on the branch, and the stamp survives publish."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "base")]), table)
    first = V.append_snapshot(_df(spark, [(2, "s")]), table,
                              txn_id="job:1", branch="audit")
    again = V.append_snapshot(_df(spark, [(2, "s")]), table,
                              txn_id="job:1", branch="audit")
    assert again == first
    V.publish_ref(table, "audit")
    assert V.read_current(spark, table).count() == 2


def test_rollback_to_tag_and_rebuild(spark, tmp_path):
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "v1")]), table)
    V.tag_snapshot(table, "pre-deploy")
    V.merge_snapshot(spark, _df(spark, [(1, "BAD"), (2, "BAD")]),
                     table, "k")
    assert V.read_current(spark, table).count() == 2

    V.rollback_table(table, "pre-deploy")  # tag name resolves
    got = {(r.k, r.v) for r in V.read_current(spark, table).collect()}
    assert got == {(1, "v1")}
    # the table keeps working after rollback; history stays linear
    V.append_snapshot(_df(spark, [(3, "v3")]), table)
    got = {(r.k, r.v) for r in V.read_current(spark, table).collect()}
    assert got == {(1, "v1"), (3, "v3")}
    # rolling back to a non-ancestor refuses
    with pytest.raises(V.CommitConflictError):
        V.rollback_table(table, "00009999-nonsense")


def test_ref_name_validation(tmp_path):
    table = str(tmp_path / "t")
    for bad in ("", "a/b", "..", ".hidden", "CURRENT"):
        with pytest.raises(ValueError):
            V._ref_path(table, bad)


def test_staged_branch_on_chunked_table(spark, tmp_path, monkeypatch):
    """Branch staging composes with chunked manifests: staged appends
    reuse the parent's sidecars, and publish flips them in."""
    monkeypatch.setattr(V, "_MANIFEST_CHUNK_FILES", 6)
    monkeypatch.setattr(V, "_MANIFEST_CHUNK_SIZE", 4)
    table = str(tmp_path / "t")
    V.write_snapshot(
        _df(spark, [(i, "base") for i in range(40)])
        .repartitionByRange(10, "k"), table, stats_cols=["k"])
    V.append_snapshot(_df(spark, [(100, "staged")]), table,
                      branch="audit")
    assert V.read_current(spark, table).count() == 40
    assert V.read_ref(spark, table, "audit").count() == 41
    V.publish_ref(table, "audit")
    assert V.read_current(
        spark, table, predicates=[("k", "=", 100)]).count() == 1


def test_vacuum_retains_staged_branch_lineage(spark, tmp_path):
    """Review finding (r5): vacuum used to retain only the ref TARGET,
    severing the staged chain publish_ref must walk — a routine vacuum
    bricked the branch with a spurious re-stage conflict."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "base")]), table)
    V.append_snapshot(_df(spark, [(2, "s1")]), table, branch="audit")
    V.append_snapshot(_df(spark, [(3, "s2")]), table, branch="audit")

    out = V.vacuum_snapshots(table, keep=1)
    # the intermediate staged manifest survived (nothing reaped here)
    assert out["snapshots"] == []
    V.publish_ref(table, "audit")  # must NOT raise
    assert {r.k for r in V.read_current(spark, table).collect()} \
        == {1, 2, 3}


def test_vacuum_does_not_pin_pre_tag_history(spark, tmp_path):
    """The branch-lineage walk must NOT extend to tags: retaining a
    tag's ancestors would pin all pre-tag history forever. Deep
    rollback past vacuumed lineage refuses loudly (documented bound);
    the tag itself stays readable."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "v1")]), table)
    V.tag_snapshot(table, "old")
    for i in range(3):
        V.write_snapshot(_df(spark, [(10 + i, "x")]), table)
    out = V.vacuum_snapshots(table, keep=1)
    assert len(out["snapshots"]) == 2  # intermediates reaped
    assert {r.k for r in V.read_ref(spark, table, "old").collect()} \
        == {1}  # tag still readable
    with pytest.raises(V.CommitConflictError):
        V.rollback_table(table, "old")  # lineage gone: loud, not wrong


def test_tag_on_rolled_back_head_does_not_pin_undone_lineage(
        spark, tmp_path):
    """Review finding (r5, pass 2): the lineage pin is structural to
    BRANCHES (refs/heads/) — a tag on the rolled-back-from head pins
    only its own snapshot, so the undone intermediate history stays
    vacuum-reapable as rollback_table promises."""
    table = str(tmp_path / "t")
    s1 = V.write_snapshot(_df(spark, [(1, "v1")]), table)
    V.write_snapshot(_df(spark, [(2, "v2")]), table)  # s2: undone
    s3 = V.write_snapshot(_df(spark, [(3, "v3")]), table)
    V.tag_snapshot(table, "bad-head", s3)  # tag the head...
    V.rollback_table(table, s1)  # ...then roll all the way back

    out = V.vacuum_snapshots(table, keep=1)
    # the intermediate undone commit is reaped despite the tag's
    # generation being above CURRENT's; the tag itself stays readable
    assert len(out["snapshots"]) == 1
    assert {r.k for r in V.read_ref(spark, table, "bad-head").collect()} \
        == {3}
    assert {r.k for r in V.read_current(spark, table).collect()} == {1}


def test_same_named_tag_and_branch_coexist(spark, tmp_path):
    """Review finding (r5, pass 3): every path must respect the
    structural kind split when one NAME exists as both a tag and a
    branch — the tag's pin, the branch's fork point, publish's
    cleanup, and rollback's resolution all stay unambiguous."""
    table = str(tmp_path / "t")
    s1 = V.write_snapshot(_df(spark, [(1, "v1")]), table)
    V.tag_snapshot(table, "x", s1)  # permanent anchor named 'x'
    V.write_snapshot(_df(spark, [(2, "v2")]), table)  # CURRENT moves

    # staging on branch 'x' forks from CURRENT, not from the tag
    V.append_snapshot(_df(spark, [(3, "staged")]), table, branch="x")
    assert {r.k for r in V.read_ref(spark, table, "x").collect()} \
        == {2, 3}  # heads shadow tags in reads (resolution order)

    # vacuum retains BOTH the tag's snapshot and the branch lineage
    V.vacuum_snapshots(table, keep=1)
    assert V._ref_read(V._ref_path(table, "x", "tags")) == s1
    assert V.read_snapshot(spark, table, s1).count() == 1

    # publish consumes only the branch; the tag survives
    V.publish_ref(table, "x")
    assert {r.k for r in V.read_current(spark, table).collect()} \
        == {2, 3}
    assert V._ref_read(V._ref_path(table, "x", "heads")) is None
    assert {r.k for r in V.read_ref(spark, table, "x").collect()} \
        == {1}  # now resolves to the tag again

    # rollback resolves the TAG even while a branch shadows reads
    V.append_snapshot(_df(spark, [(9, "later")]), table, branch="x")
    V.rollback_table(table, "x")  # must hit the tag (s1), not the
    assert {r.k for r in V.read_current(  # descendant branch head
        spark, table).collect()} == {1}


def test_tag_snapshot_serializes_with_vacuum(spark, tmp_path):
    """ADVICE r5-medium: tag_snapshot runs under the table lease, so a
    tag can never be written between vacuum's ref listing and its
    deletes (which would leave it dangling at a reaped snapshot)."""
    from mc_ns_data_pipeline_spark.sinks.lease import (
        TableLockedError,
        table_lease,
    )

    table = str(tmp_path / "tbl")
    df = spark.range(5).withColumnRenamed("id", "k")
    V.write_snapshot(df, table)
    with table_lease(table, owner="vacuum"):
        with pytest.raises(TableLockedError, match="vacuum"):
            V.tag_snapshot(table, "pin", wait_s=0.0)
    # lease released: the tag lands and pins as usual
    snap = V.tag_snapshot(table, "pin", wait_s=0.0)
    assert V.ref_snapshot(table, "pin") == snap


def test_wap_staged_upsert_and_delete_publish_as_one_unit(
        spark, tmp_path):
    """r5 verdict #5: a WAP audit can quarantine MUTATIONS, not just
    appends — merge_snapshot_mor(branch=) and delete_keys_mor(branch=)
    stage on the ref, table readers see nothing (rows OR masks) until
    publish_ref flips the pointer once."""
    table = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "k int, v string")
    V.write_snapshot(df, table)

    V.merge_snapshot_mor(
        spark,
        spark.createDataFrame([(3, "UPD"), (42, "NEW")],
                              "k int, v string"),
        table, "k", branch="audit")
    V.delete_keys_mor(
        spark, table, "k",
        spark.createDataFrame([(7,)], "k int"), branch="audit")

    # table readers: pristine — neither new rows nor masks leak
    got = {(r.k, r.v) for r in V.read_current(spark, table).collect()}
    assert got == {(i, f"v{i}") for i in range(10)}

    # audit read: upsert + delete applied on the branch head
    staged = {(r.k, r.v)
              for r in V.read_ref(spark, table, "audit").collect()}
    expect = ({(i, f"v{i}") for i in range(10) if i not in (3, 7)}
              | {(3, "UPD"), (42, "NEW")})
    assert staged == expect

    V.publish_ref(table, "audit")
    got = {(r.k, r.v) for r in V.read_current(spark, table).collect()}
    assert got == expect
    man = V.read_manifest(table, V.current_snapshot(table))
    assert man["rows"] == len(expect)


def test_merge_ref_fast_forward(spark, tmp_path):
    """Un-diverged branch: merge_ref == publish_ref (one pointer flip)."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a")]), table)
    V.append_snapshot(_df(spark, [(2, "b")]), table, branch="audit")
    head = V.ref_snapshot(table, "audit")
    assert V.merge_ref(table, "audit") == head
    assert V.current_snapshot(table) == head
    got = {(r.k, r.v) for r in V.read_current(spark, table).collect()}
    assert got == {(1, "a"), (2, "b")}
    assert "audit" not in V.list_refs(table)  # branch consumed


def test_merge_ref_replays_diverged_appends_metadata_only(spark, tmp_path):
    """Diverged append-only branch: replay onto the moved head reusing
    the branch's data files verbatim — nothing lands twice."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "base")]), table)
    V.append_snapshot(_df(spark, [(2, "br1")]), table, branch="b")
    V.append_snapshot(_df(spark, [(3, "br2")]), table, branch="b")
    head = V.ref_snapshot(table, "b")
    branch_new = []
    snap, stop = head, V.current_snapshot(table)
    while snap != stop:
        core = V._read_core(table, snap)
        branch_new += core["new_files"]
        snap = core["parent"]

    # the table moves: publish_ref now refuses, merge_ref replays
    V.append_snapshot(_df(spark, [(4, "direct")]), table)
    with pytest.raises(V.CommitConflictError):
        V.publish_ref(table, "b")
    merged = V.merge_ref(table, "b")
    assert V.current_snapshot(table) == merged
    got = {(r.k, r.v) for r in V.read_current(spark, table).collect()}
    assert got == {(1, "base"), (2, "br1"), (3, "br2"), (4, "direct")}
    # metadata-only: the final manifest names the branch's ORIGINAL
    # data files — no re-landing, no rewrite
    final_files = set(V._materialize(table, V._read_core(table, merged))["files"])
    assert set(branch_new) <= final_files
    assert "b" not in V.list_refs(table)


def test_merge_ref_refuses_non_append_divergence(spark, tmp_path):
    """A diverged branch carrying a non-append commit is a true
    conflict: replay could resurrect rows CURRENT removed."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a"), (2, "b")]), table)
    V.append_snapshot(_df(spark, [(3, "c")]), table, branch="b")
    V.delete_keys_mor(spark, table, "k",
                      _df(spark, [(1, "a")]).select("k"), branch="b")
    V.append_snapshot(_df(spark, [(9, "direct")]), table)  # diverge
    with pytest.raises(V.CommitConflictError, match="non-append"):
        V.merge_ref(table, "b")


def test_merge_ref_replay_respects_current_side_deletes(spark, tmp_path):
    """MOR masks published on CURRENT while the branch was staged stay
    effective for old files and do NOT mask the replayed rows."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "old"), (2, "old")]), table)
    V.append_snapshot(_df(spark, [(1, "branch-new")]), table, branch="b")
    # CURRENT-side MOR delete of k=1 (the old row) diverges the table
    V.delete_keys_mor(spark, table, "k", _df(spark, [(1, "x")]).select("k"))
    V.merge_ref(table, "b")
    got = {(r.k, r.v) for r in V.read_current(spark, table).collect()}
    # old k=1 masked; the branch's k=1 row is NEWER than the mask
    assert got == {(2, "old"), (1, "branch-new")}


def test_merge_ref_crash_mid_replay_is_atomic(spark, tmp_path,
                                              monkeypatch):
    """A crash between replayed commits must leave CURRENT untouched
    (the replay stages on <name>__rebase; CURRENT flips once at the
    end), and the retry must merge cleanly with no duplicated rows."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "base")]), table)
    V.append_snapshot(_df(spark, [(2, "br1")]), table, branch="b")
    V.append_snapshot(_df(spark, [(3, "br2")]), table, branch="b")
    V.append_snapshot(_df(spark, [(4, "direct")]), table)  # diverge
    pre_cur = V.current_snapshot(table)

    real_publish = V._publish
    calls = {"n": 0}

    def exploding_publish(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 2:  # first replayed commit lands, second dies
            raise OSError("injected crash mid-replay")
        return real_publish(*args, **kwargs)

    monkeypatch.setattr(V, "_publish", exploding_publish)
    with pytest.raises(OSError, match="injected"):
        V.merge_ref(table, "b")
    monkeypatch.setattr(V, "_publish", real_publish)

    # CURRENT never moved; readers saw nothing of the half-replay
    assert V.current_snapshot(table) == pre_cur
    assert {r.k for r in V.read_current(spark, table).collect()} \
        == {1, 4}
    # the branch survives, and the retry merges with NO duplication
    merged = V.merge_ref(table, "b")
    assert V.current_snapshot(table) == merged
    got = sorted(
        (r.k, r.v) for r in V.read_current(spark, table).collect())
    assert got == [(1, "base"), (2, "br1"), (3, "br2"), (4, "direct")]


def test_merge_ref_with_vacuumed_deep_history(spark, tmp_path):
    """A vacuumed deep lineage below the fork point must not break a
    mergeable branch: the ancestry walk stops at the vacuum horizon."""
    table = str(tmp_path / "t")
    for i in range(5):
        V.write_snapshot(_df(spark, [(i, f"v{i}")]), table)
    V.vacuum_snapshots(table, keep=1, min_age_seconds=0)
    V.append_snapshot(_df(spark, [(100, "staged")]), table, branch="b")
    V.append_snapshot(_df(spark, [(200, "direct")]), table)  # diverge
    V.merge_ref(table, "b")
    got = {r.k for r in V.read_current(spark, table).collect()}
    assert got == {4, 100, 200}


def test_merge_ref_fork_below_vacuum_horizon_conflicts_cleanly(
        spark, tmp_path):
    """A branch forking exactly at the vacuum horizon (fork-point
    manifest gone — external cleanup / partial loss) must surface the
    documented CommitConflictError('re-stage'), never a raw
    FileNotFoundError from the replay loop (ADVICE r8)."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a")]), table)
    fork = V.current_snapshot(table)
    V.append_snapshot(_df(spark, [(2, "br")]), table, branch="b")
    V.append_snapshot(_df(spark, [(3, "direct")]), table)  # diverge
    os.remove(V._manifest_path(table, fork))  # simulate external loss
    with pytest.raises(V.CommitConflictError, match="re-stage"):
        V.merge_ref(table, "b")
    # CURRENT untouched by the failed merge
    got = {(r.k, r.v) for r in V.read_current(spark, table).collect()}
    assert got == {(1, "a"), (3, "direct")}


def test_merge_ref_cycle_is_typed_and_loud(spark, tmp_path):
    """A corrupted parent cycle raises the typed LineageCycleError —
    routed by class, not message substring (ADVICE r8) — and is never
    treated as ordinary divergence."""
    import json

    assert issubclass(V.LineageCycleError, V.CommitConflictError)
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a")]), table)
    a = V.current_snapshot(table)
    V.append_snapshot(_df(spark, [(2, "br")]), table, branch="b")
    b_head = V.ref_snapshot(table, "b")
    V.append_snapshot(_df(spark, [(3, "direct")]), table)  # diverge
    core = V._read_core(table, a)
    core["parent"] = b_head  # corrupt: ancestor points at descendant
    V._atomic_write_text(V._manifest_path(table, a), json.dumps(core))
    with pytest.raises(V.LineageCycleError):
        V.merge_ref(table, "b")
