"""Versioned table as a Structured Streaming source (streaming/
table_source.py): exactly-once offsets over the append lineage,
genesis bootstrap, compaction transparency, loud refusal of rewritten
history — the Delta-CDF-shaped consumer of the changelog contract
(reference anchor: incremental_fetch.py:129-155, resume after last
high-water mark)."""

from __future__ import annotations

import os

import pytest

from mc_ns_data_pipeline_spark.sinks import versioned as V
from mc_ns_data_pipeline_spark.streaming.table_source import (
    read_stream_table,
)


def _df(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema)


def _drain(spark, table, tmp, starting="genesis", name="s"):
    """One availableNow pass into a parquet sink; returns all rows
    accumulated in the sink so far. Sharing `name` shares the
    checkpoint — successive calls are stream RESTARTS."""
    out = os.path.join(str(tmp), f"{name}_out")
    ckpt = os.path.join(str(tmp), f"{name}_ckpt")
    q = (read_stream_table(spark, table, starting=starting)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return {tuple(r) for r in spark.read.parquet(out).collect()}


def test_genesis_bootstrap_matches_read_current(spark, tmp_path):
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a"), (2, "b")]), table)
    V.append_snapshot(_df(spark, [(3, "c")]), table)
    got = _drain(spark, table, tmp_path)
    want = {tuple(r) for r in V.read_current(spark, table).collect()}
    assert got == want == {(1, "a"), (2, "b"), (3, "c")}


def test_restart_consumes_exactly_once(spark, tmp_path):
    """Two availableNow runs over one checkpoint: the second emits
    ONLY the appends that landed in between — no replays, no gaps."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a")]), table)
    assert _drain(spark, table, tmp_path) == {(1, "a")}
    V.append_snapshot(_df(spark, [(2, "b")]), table)
    V.append_snapshot(_df(spark, [(3, "c")]), table)
    assert _drain(spark, table, tmp_path) == {
        (1, "a"), (2, "b"), (3, "c")}
    # idle restart: nothing new, nothing re-emitted
    assert _drain(spark, table, tmp_path) == {
        (1, "a"), (2, "b"), (3, "c")}


def test_starting_current_sees_only_later_appends(spark, tmp_path):
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "pre")]), table)
    assert _drain(spark, table, tmp_path, starting="current") == set()
    V.append_snapshot(_df(spark, [(2, "post")]), table)
    assert _drain(spark, table, tmp_path,
                  starting="current") == {(2, "post")}


def test_explicit_snapshot_resume_point(spark, tmp_path):
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a")]), table)
    mark = V.current_snapshot(table)
    V.append_snapshot(_df(spark, [(2, "b")]), table)
    assert _drain(spark, table, tmp_path, starting=mark) == {(2, "b")}


def test_compaction_is_transparent(spark, tmp_path):
    """A compact commit between appends contributes no input rows —
    maintenance never double-feeds the stream."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a")]), table)
    assert _drain(spark, table, tmp_path) == {(1, "a")}
    V.append_snapshot(_df(spark, [(2, "b")]), table)
    V.compact_snapshot(spark, table, target_files=1)
    V.append_snapshot(_df(spark, [(3, "c")]), table)
    assert _drain(spark, table, tmp_path) == {
        (1, "a"), (2, "b"), (3, "c")}


def test_rewritten_history_fails_loudly(spark, tmp_path):
    """A COW rewrite in range must error the stream, never silently
    double-read — same contract as the batch changelog."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a")]), table)
    assert _drain(spark, table, tmp_path) == {(1, "a")}
    V.write_snapshot(_df(spark, [(9, "rewrite")]), table)  # overwrite
    with pytest.raises(StreamingQueryException,
                       match="not append-only|Re-bootstrap"):
        _drain(spark, table, tmp_path)


def test_genesis_refuses_mor_masked_snapshot(spark, tmp_path):
    """Bootstrap reads pool files raw, so a snapshot carrying MOR
    delete masks is refused (masked rows would resurrect)."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a"), (2, "b")]), table)
    V.delete_keys_mor(spark, table, "k",
                      _df(spark, [(1, "a")]).select("k"))
    with pytest.raises(StreamingQueryException, match="delete masks"):
        _drain(spark, table, tmp_path)
    # after compaction applies the masks, bootstrap works again
    V.compact_snapshot(spark, table, target_files=1)
    assert _drain(spark, table, tmp_path, name="s2") == {(2, "b")}


def test_pre_evolution_files_project_null(spark, tmp_path):
    """Additive schema evolution BEFORE stream definition: the stream
    pins the evolved schema; pre-evolution pool files project NULL for
    the later-added column (the _read_pool contract)."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a")]), table)
    V.append_snapshot(
        _df(spark, [(2, "b", 7.5)], "k int, v string, w double"), table)
    got = _drain(spark, table, tmp_path)
    assert got == {(1, "a", None), (2, "b", 7.5)}


def test_files_per_partition_batches(spark, tmp_path):
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a")]), table)
    for i in range(2, 6):
        V.append_snapshot(_df(spark, [(i, f"v{i}")]), table)
    out = os.path.join(str(tmp_path), "o")
    ckpt = os.path.join(str(tmp_path), "c")
    q = (read_stream_table(spark, table, starting="genesis",
                           files_per_partition=4)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert got == {(i, f"v{i}") if i > 1 else (1, "a")
                   for i in range(1, 6)}


def test_vacuumed_range_resume_refuses_loudly(spark, tmp_path):
    """A consumer so far behind that its offset's lineage was vacuumed
    must FAIL the stream (NonIncrementalHistoryError surfaced), never
    silently skip rows — vacuum retention must cover consumer lag."""
    from pyspark.errors.exceptions.captured import (
        StreamingQueryException,
    )

    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a")]), table)
    assert _drain(spark, table, tmp_path) == {(1, "a")}
    # two compactions supersede the old lineage, then vacuum reaps it
    V.append_snapshot(_df(spark, [(2, "b")]), table)
    V.compact_snapshot(spark, table, target_files=1)
    V.compact_snapshot(spark, table, target_files=1)
    out = V.vacuum_snapshots(table, keep=1, min_age_seconds=0.0)
    assert len(out["snapshots"]) >= 1, out
    with pytest.raises(StreamingQueryException,
                       match="vacuumed|not an ancestor|missing"):
        _drain(spark, table, tmp_path)


def test_genesis_bootstrap_projects_renamed_columns(spark, tmp_path):
    """A rename BEFORE stream definition: the bootstrap batch must
    project old-era files (physical old name) under the current name
    with real values — never silent NULLs (r9 review finding)."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "old-era")]), table)
    V.rename_column(table, "v", "label")
    V.append_snapshot(_df(spark, [(2, "new-era")],
                          "k int, label string"), table)
    got = _drain(spark, table, tmp_path)
    assert got == {(1, "old-era"), (2, "new-era")}


def _drain_changes(spark, table, tmp, starting="genesis", name="cdc"):
    from mc_ns_data_pipeline_spark.streaming.table_source import (
        read_stream_changes,
    )

    out = os.path.join(str(tmp), f"{name}_out")
    ckpt = os.path.join(str(tmp), f"{name}_ckpt")
    q = (read_stream_changes(spark, table, starting=starting)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return {tuple(r) for r in spark.read.parquet(out).collect()}


def _apply(events):
    """The documented consumer rule: order by _commit_gen, deletes
    before inserts at equal gen; the last event per key decides."""
    state = {}
    # rows: (k, v, change_type, gen); sort inserts AFTER deletes at gen
    for k, v, typ, gen in sorted(events,
                                 key=lambda e: (e[3], e[2] == "insert")):
        if typ == "insert":
            state[k] = v
        else:
            state.pop(k, None)
    return set(state.items())


def test_change_feed_appends_and_mor_deletes(spark, tmp_path):
    """Inserts from appends, delete events from MOR delete entries —
    applying the feed reproduces the table's net state."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a"), (2, "b")]), table)
    mark = V.current_snapshot(table)
    V.append_snapshot(_df(spark, [(3, "c")]), table)
    V.delete_keys_mor(spark, table, "k",
                      _df(spark, [(1, "a")]).select("k"))
    got = _drain_changes(spark, table, tmp_path, starting=mark)
    types = {}
    for k, v, typ, gen in got:
        types.setdefault(typ, set()).add(k)
        if typ == "delete":
            assert v is None  # key-only event
    assert types == {"insert": {3}, "delete": {1}}
    # net state over the pre-stream base
    base = {(1, "a"), (2, "b")}
    applied = _apply({(k, v, t, g) for k, v, t, g in got}
                     | {(k, v, "insert", 0) for k, v in base})
    want = {tuple(r) for r in V.read_current(spark, table).collect()}
    assert applied == want == {(2, "b"), (3, "c")}


def test_change_feed_mor_upsert_retraction_order(spark, tmp_path):
    """A merge-on-read upsert emits its retraction (delete) and its
    new rows (insert) at the SAME generation — the documented apply
    rule (deletes first at equal gen) keeps the upserted value."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "old"), (2, "keep")]), table)
    mark = V.current_snapshot(table)
    V.merge_snapshot_mor(spark, _df(spark, [(1, "NEW")]), table, "k")
    got = _drain_changes(spark, table, tmp_path, starting=mark)
    gens = {g for (_, _, _, g) in got}
    assert len(gens) == 1  # one commit: retraction + insert together
    assert {(k, v, t) for (k, v, t, _) in got} == {
        (1, None, "delete"), (1, "NEW", "insert")}
    applied = _apply(got | {(1, "old", "insert", 0),
                            (2, "keep", "insert", 0)})
    assert applied == {(1, "NEW"), (2, "keep")}


def test_change_feed_genesis_bootstrap_gens(spark, tmp_path):
    """Genesis bootstrap emits every live row as an insert at its
    file's recorded generation (so later incremental deletes sequence
    correctly against bootstrapped rows)."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a")]), table)
    V.append_snapshot(_df(spark, [(2, "b")]), table)
    got = _drain_changes(spark, table, tmp_path)
    assert {(k, v, t) for (k, v, t, _) in got} == {
        (1, "a", "insert"), (2, "b", "insert")}
    by_key = {k: g for (k, _, _, g) in got}
    assert by_key[1] < by_key[2]  # per-file gens, not one constant


def test_change_feed_exactly_once_across_restart(spark, tmp_path):
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a")]), table)
    got1 = _drain_changes(spark, table, tmp_path)
    assert {(k, t) for (k, _, t, _) in got1} == {(1, "insert")}
    V.delete_keys_mor(spark, table, "k",
                      _df(spark, [(1, "a")]).select("k"))
    V.append_snapshot(_df(spark, [(5, "e")]), table)
    got2 = _drain_changes(spark, table, tmp_path)
    # second drain ADDED only the delete + the new insert
    assert {(k, t) for (k, _, t, _) in got2} == {
        (1, "insert"), (1, "delete"), (5, "insert")}


def test_change_feed_cow_rewrite_refuses(spark, tmp_path):
    from pyspark.errors.exceptions.captured import (
        StreamingQueryException,
    )

    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a"), (2, "b")]), table)
    mark = V.current_snapshot(table)
    V.merge_snapshot(spark, _df(spark, [(1, "NEW")]), table, key="k")
    with pytest.raises(StreamingQueryException,
                       match="COW|does not decompose|re-bootstrap"):
        _drain_changes(spark, table, tmp_path, starting=mark)


def test_change_feed_compaction_transparent(spark, tmp_path):
    """Compaction applies pending masks and rewrites files but emits
    NO events — already-delivered inserts/deletes never repeat."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a"), (2, "b")]), table)
    got1 = _drain_changes(spark, table, tmp_path)
    V.delete_keys_mor(spark, table, "k",
                      _df(spark, [(1, "a")]).select("k"))
    V.compact_snapshot(spark, table, target_files=1)
    V.append_snapshot(_df(spark, [(3, "c")]), table)
    got2 = _drain_changes(spark, table, tmp_path)
    new = {(k, t) for (k, _, t, _) in got2 - got1}
    assert new == {(1, "delete"), (3, "insert")}


# --- admission control (VERDICT r09 #3) -------------------------------
#
# Trigger semantics (pinned by these tests): a CONTINUOUS trigger
# consults latestOffset every micro-batch, so a behind consumer or a
# genesis bootstrap drains as ceil(N/cap) checkpointed batches within
# one query lifecycle. Trigger.AvailableNow captures the FIRST offer
# as the run's end (the Python DataSource API has no per-batch
# admission hook for the availableNow wrapper), so a capped
# availableNow run admits exactly ONE bounded batch and repeated runs
# converge — in both modes no single micro-batch ever exceeds the cap,
# which is the 100 TB property (an unbounded batch has no intermediate
# checkpoints and must fit the backlog in one shot).

def _n_batches(tmp, name):
    d = os.path.join(str(tmp), f"{name}_ckpt", "commits")
    return len([f for f in os.listdir(d) if f.isdigit()])


def _sink_rows(spark, tmp, name):
    out = os.path.join(str(tmp), f"{name}_out")
    try:
        return {tuple(r) for r in spark.read.parquet(out).collect()}
    except Exception:
        return set()


def _drain_capped(spark, table, tmp, name, starting="genesis",
                  **caps):
    """One capped availableNow pass (ONE bounded batch per run)."""
    out = os.path.join(str(tmp), f"{name}_out")
    ckpt = os.path.join(str(tmp), f"{name}_ckpt")
    q = (read_stream_table(spark, table, starting=starting,
                           checkpoint=ckpt, **caps)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return _sink_rows(spark, tmp, name)


def _run_capped_continuous(spark, table, tmp, name, want_rows,
                           timeout_s=120, **caps):
    """Continuous-trigger drain: run until the sink holds want_rows,
    then stop — the mode where the cap yields multiple batches per
    lifecycle."""
    import time

    out = os.path.join(str(tmp), f"{name}_out")
    ckpt = os.path.join(str(tmp), f"{name}_ckpt")
    q = (read_stream_table(spark, table, starting="genesis",
                           checkpoint=ckpt, **caps)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(processingTime="50 milliseconds").start())
    try:
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            if len(_sink_rows(spark, tmp, name)) >= want_rows:
                break
            time.sleep(0.3)
    finally:
        q.stop()
        q.awaitTermination()
    return _sink_rows(spark, tmp, name)


def test_capped_bootstrap_drains_in_bounded_batches(spark, tmp_path):
    """max_commits_per_trigger=2 over a 6-commit genesis bootstrap
    under a continuous trigger: the backlog drains as ceil(6/2)=3
    checkpointed batches in ONE query lifetime — never one unbounded
    batch — and the union of batches is exactly the table."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "c1")]), table)
    for i in range(2, 7):
        V.append_snapshot(_df(spark, [(i, f"c{i}")]), table)
    want = {(i, f"c{i}") for i in range(1, 7)}
    got = _run_capped_continuous(spark, table, tmp_path, "cap", 6,
                                 max_commits_per_trigger=2)
    assert got == want
    assert _n_batches(tmp_path, "cap") == 3
    # same table, uncapped availableNow: one batch (prior default)
    got2 = _drain_capped(spark, table, tmp_path, "uncap")
    assert got2 == want
    assert _n_batches(tmp_path, "uncap") == 1


def test_capped_files_per_trigger(spark, tmp_path):
    """max_files_per_trigger bounds by pool-file count: 6 commits of
    2 files each (12 files), cap 4 -> 3 continuous batches of 2
    commits each."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a"), (2, "b")]).repartition(2),
                     table)
    for i in range(2, 7):
        V.append_snapshot(
            _df(spark, [(10 * i, "x"), (10 * i + 1, "y")])
            .repartition(2), table)
    got = _run_capped_continuous(spark, table, tmp_path, "fcap", 12,
                                 max_files_per_trigger=4)
    assert len(got) == 12
    assert _n_batches(tmp_path, "fcap") == 3


def test_capped_availablenow_admits_one_bounded_batch(spark,
                                                      tmp_path):
    """A capped availableNow run admits exactly one bounded batch
    (the wrapper pins the run to the first offer); repeated runs over
    one checkpoint — kill/resume cycles — converge with no replay and
    no gap."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "c1")]), table)
    for i in range(2, 10):
        V.append_snapshot(_df(spark, [(i, f"c{i}")]), table)
    want = {(i, f"c{i}") for i in range(1, 10)}
    seen = set()
    sizes = []
    for _ in range(6):
        got = _drain_capped(spark, table, tmp_path, "resume",
                            max_commits_per_trigger=3)
        assert seen <= got  # no loss across restarts
        sizes.append(len(got) - len(seen))
        seen = got
        if got == want:
            break
    assert seen == want
    assert sizes == [3, 3, 3]  # ceil(9/3) runs, each capped
    out = os.path.join(str(tmp_path), "resume_out")
    assert spark.read.parquet(out).count() == 9  # exactly-once


def test_capped_catchup_after_idle_checkpoint(spark, tmp_path):
    """A consumer that fell behind 6 commits while stopped: on
    restart the admission floor re-seeds from Spark's own offset log
    (the `checkpoint` option), so the FIRST post-restart batch is
    already capped — the backlog drains 2 commits per run, never in
    one unbounded batch."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "c1")]), table)
    _drain_capped(spark, table, tmp_path, "lag",
                  max_commits_per_trigger=2)
    for i in range(2, 8):  # falls 6 commits behind while stopped
        V.append_snapshot(_df(spark, [(i, f"c{i}")]), table)
    want = {(i, f"c{i}") for i in range(1, 8)}
    sizes = []
    seen = {(1, "c1")}
    for _ in range(4):
        got = _drain_capped(spark, table, tmp_path, "lag",
                            max_commits_per_trigger=2)
        sizes.append(len(got) - len(seen))
        seen = got
        if got == want:
            break
    assert seen == want
    assert sizes == [2, 2, 2]  # capped from the FIRST restart batch


def test_capped_genesis_covers_rewrites_and_masks(spark, tmp_path):
    """Genesis flooring: the bootstrap point advances past rewrite
    commits and mask-carrying snapshots, so a capped genesis works
    wherever the uncapped one does. Lineage: write, append, MOR
    delete (masks), compact (clears masks), then 2 appends — cap 1
    bootstraps AT the compact, then one append per batch."""
    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a"), (2, "b")]), table)
    V.append_snapshot(_df(spark, [(3, "c")]), table)
    V.delete_keys_mor(spark, table, "k",
                      _df(spark, [(2, "b")]).select("k"))
    V.compact_snapshot(spark, table)
    V.append_snapshot(_df(spark, [(4, "d")]), table)
    V.append_snapshot(_df(spark, [(5, "e")]), table)
    want = {tuple(r) for r in V.read_current(spark, table).collect()}
    got = _run_capped_continuous(spark, table, tmp_path, "gfloor",
                                 len(want), max_commits_per_trigger=1)
    assert got == want == {(1, "a"), (3, "c"), (4, "d"), (5, "e")}
    # bootstrap-at-compact + one append per batch = 3 batches
    assert _n_batches(tmp_path, "gfloor") == 3


def test_capped_change_feed_bounded_batches(spark, tmp_path):
    """The CHANGE FEED honors the same admission caps (shared
    _bounded_end): a 6-commit event backlog behind a mark drains as
    3 continuous batches at max_commits_per_trigger=2, with the net
    algebra intact."""
    import time

    from mc_ns_data_pipeline_spark.streaming.table_source import (
        read_stream_changes,
    )

    table = str(tmp_path / "t")
    V.write_snapshot(_df(spark, [(1, "a"), (2, "b")]), table)
    mark = V.current_snapshot(table)
    for i in range(3, 7):
        V.append_snapshot(_df(spark, [(i, f"c{i}")]), table)
    V.delete_keys_mor(spark, table, "k",
                      _df(spark, [(2, "b")]).select("k"))
    V.merge_snapshot_mor(spark, _df(spark, [(3, "c3x")]), table, "k")

    out = os.path.join(str(tmp_path), "cdc_out")
    ckpt = os.path.join(str(tmp_path), "cdc_ckpt")
    q = (read_stream_changes(spark, table, starting=mark,
                             max_commits_per_trigger=2,
                             checkpoint=ckpt)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(processingTime="50 milliseconds").start())
    try:
        deadline = time.time() + 120
        want_events = 4 + 1 + 2  # 4 appends + 1 delete + retract+ins
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= want_events:
                    break
            except Exception:
                pass
            time.sleep(0.3)
    finally:
        q.stop()
        q.awaitTermination()
    ev = spark.read.parquet(out)
    assert ev.count() == want_events
    assert ev.filter("_change_type = 'delete'").count() == 2
    assert _n_batches(tmp_path, "cdc") == 3  # ceil(6 commits / 2)


def test_capped_oversized_commit_still_admits(spark, tmp_path):
    """Progress guarantee: a single commit larger than
    max_files_per_trigger is never split — it admits whole, so every
    trigger makes progress instead of stalling forever."""
    table = str(tmp_path / "t")
    V.write_snapshot(
        _df(spark, [(i, f"v{i}") for i in range(12)]).repartition(6),
        table)
    V.append_snapshot(_df(spark, [(100, "tail")]), table)
    got = _run_capped_continuous(spark, table, tmp_path, "big", 13,
                                 max_files_per_trigger=2)
    assert len(got) == 13
    # batch 1 = the whole 6-file genesis commit (oversized), batch 2
    # = the tail append
    assert _n_batches(tmp_path, "big") == 2


def test_committed_end_offset_ignores_planned_uncommitted(tmp_path):
    """committed_end_offset consults commits/ FIRST: a batch that was
    planned (offsets/N written) but never committed (commits/N
    absent — the crash window Spark replays) must NOT count as drain
    progress, or the runner's caught-up check would return with the
    last batch unapplied. _floor_from_offset_log (the admission
    floor) deliberately DOES count it — the offer bound may cap from
    a planned position; exactly-once stays with the commit log."""
    import json

    from mc_ns_data_pipeline_spark.streaming.table_source import (
        _floor_from_offset_log,
        committed_end_offset,
    )

    ckpt = str(tmp_path / "ckpt")
    os.makedirs(os.path.join(ckpt, "offsets"))
    os.makedirs(os.path.join(ckpt, "commits"))

    def write_offset(bid, snap):
        with open(os.path.join(ckpt, "offsets", str(bid)), "w") as fh:
            fh.write("v1\n{}\n" + json.dumps({"snapshot": snap}))

    def write_commit(bid):
        with open(os.path.join(ckpt, "commits", str(bid)), "w") as fh:
            fh.write("v1\n{}")

    assert committed_end_offset(ckpt) is None  # empty logs
    write_offset(0, "000-aaa")
    assert committed_end_offset(ckpt) is None  # planned, uncommitted
    assert _floor_from_offset_log(ckpt) == "000-aaa"
    write_commit(0)
    assert committed_end_offset(ckpt) == "000-aaa"
    write_offset(1, "001-bbb")  # next batch planned, not committed
    assert committed_end_offset(ckpt) == "000-aaa"
    assert _floor_from_offset_log(ckpt) == "001-bbb"
    write_commit(1)
    assert committed_end_offset(ckpt) == "001-bbb"
