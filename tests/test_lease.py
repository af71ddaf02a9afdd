"""Single-writer lease semantics for the staged-swap sinks
(VERDICT r3 #6): a second concurrent writer fails fast or queues —
never corrupts — and crashed holders are reclaimed by TTL."""

from __future__ import annotations

import json
import os
import threading
import time

import pytest

from mc_ns_data_pipeline_spark.sinks.lease import (
    TableLockedError,
    read_lease,
    table_lease,
)


def test_lease_exclusive_then_released(tmp_path):
    path = str(tmp_path / "tbl")
    with table_lease(path, owner="w1"):
        assert read_lease(path)["owner"] == "w1"
        with pytest.raises(TableLockedError, match="w1"):
            with table_lease(path, owner="w2"):
                pass
    assert read_lease(path) is None
    with table_lease(path, owner="w2"):  # acquirable after release
        assert read_lease(path)["owner"] == "w2"


def test_lease_queues_within_wait_budget(tmp_path):
    path = str(tmp_path / "tbl")
    release_at = time.monotonic() + 0.5

    def holder():
        with table_lease(path, owner="slow"):
            while time.monotonic() < release_at:
                time.sleep(0.02)

    t = threading.Thread(target=holder)
    t.start()
    time.sleep(0.1)  # let the holder acquire
    with table_lease(path, owner="patient", wait_s=5.0):
        assert read_lease(path)["owner"] == "patient"
    t.join()


def test_lease_reclaims_expired_holder(tmp_path):
    path = str(tmp_path / "tbl")
    lease_file = f"{path}__lease"
    with open(lease_file, "w") as fh:
        json.dump({"owner": "crashed", "token": "x", "ttl_s": 0.05}, fh)
    old = time.time() - 10
    os.utime(lease_file, (old, old))
    with table_lease(path, owner="reclaimer"):
        assert read_lease(path)["owner"] == "reclaimer"


def test_heartbeat_keeps_slow_holder_alive_past_ttl(tmp_path):
    """ADVICE r4-medium: a live writer whose mutation outlasts ttl_s
    must NOT be evicted — the holder heartbeats the lease mtime, so a
    second writer keeps failing fast for the whole mutation."""
    path = str(tmp_path / "tbl")
    done = threading.Event()

    def slow_holder():
        with table_lease(path, owner="slow", ttl_s=0.2):
            # hold for 4× the TTL: without the heartbeat this lease
            # would be reclaimable after 0.2 s
            time.sleep(0.8)
        done.set()

    t = threading.Thread(target=slow_holder)
    t.start()
    time.sleep(0.4)  # well past ttl_s; heartbeat must have refreshed
    assert read_lease(path)["owner"] == "slow"
    with pytest.raises(TableLockedError, match="slow"):
        with table_lease(path, owner="evictor"):
            pass
    t.join()
    assert done.is_set()
    with table_lease(path, owner="after"):  # free once released
        assert read_lease(path)["owner"] == "after"


def test_stale_lease_of_live_samehost_pid_not_reclaimed(tmp_path):
    """Even with a stale mtime (suspended holder: no heartbeat), a
    lease whose pid is a live same-host process incarnation is NOT
    reclaimed while inside the pid-alive grace window."""
    import socket

    from mc_ns_data_pipeline_spark.sinks.lease import _pid_start

    path = str(tmp_path / "tbl")
    lease_file = f"{path}__lease"
    with open(lease_file, "w") as fh:
        # age 10 s: past ttl_s=5 (stale) but inside 4x ttl grace
        json.dump({"owner": "paused", "token": "x", "ttl_s": 5,
                   "pid": os.getpid(),  # provably alive
                   "pid_start": _pid_start(os.getpid()),
                   "host": socket.gethostname()}, fh)
    old = time.time() - 10
    os.utime(lease_file, (old, old))
    with pytest.raises(TableLockedError, match="paused"):
        with table_lease(path, owner="reclaimer"):
            pass


def test_wedged_live_holder_evicted_past_grace_cap(tmp_path):
    """ADVICE r5-low: the pid-alive override is BOUNDED — a live but
    wedged holder (no heartbeat for > 4x its TTL) is evicted, so TTL
    stays a guaranteed-progress backstop."""
    import socket

    from mc_ns_data_pipeline_spark.sinks.lease import _pid_start

    path = str(tmp_path / "tbl")
    lease_file = f"{path}__lease"
    with open(lease_file, "w") as fh:
        # age 10 s: past 4 x ttl_s=0.5 — grace exhausted
        json.dump({"owner": "wedged", "token": "x", "ttl_s": 0.5,
                   "pid": os.getpid(),
                   "pid_start": _pid_start(os.getpid()),
                   "host": socket.gethostname()}, fh)
    old = time.time() - 10
    os.utime(lease_file, (old, old))
    with table_lease(path, owner="reclaimer"):
        assert read_lease(path)["owner"] == "reclaimer"


def test_recycled_pid_does_not_hold_dead_writers_lease(tmp_path):
    """ADVICE r5-low: the pid-alive override requires the recorded
    process START TIME to match — a recycled pid (live process, wrong
    incarnation) cannot keep a crashed writer's lease alive."""
    import socket

    path = str(tmp_path / "tbl")
    lease_file = f"{path}__lease"
    with open(lease_file, "w") as fh:
        # pid is alive (ours) but the recorded start time is from the
        # "previous incarnation" — impossible value, never matches
        json.dump({"owner": "crashed", "token": "x", "ttl_s": 0.05,
                   "pid": os.getpid(), "pid_start": "-1",
                   "host": socket.gethostname()}, fh)
    old = time.time() - 10
    os.utime(lease_file, (old, old))
    with table_lease(path, owner="reclaimer"):
        assert read_lease(path)["owner"] == "reclaimer"


def test_stale_lease_of_dead_pid_is_reclaimed(tmp_path):
    """A crashed holder (dead pid, stale mtime) is reclaimed."""
    import socket
    import subprocess

    proc = subprocess.Popen(["true"])
    proc.wait()  # a pid that existed and is now certainly dead
    path = str(tmp_path / "tbl")
    lease_file = f"{path}__lease"
    with open(lease_file, "w") as fh:
        json.dump({"owner": "crashed", "token": "x", "ttl_s": 0.05,
                   "pid": proc.pid, "host": socket.gethostname()}, fh)
    old = time.time() - 10
    os.utime(lease_file, (old, old))
    with table_lease(path, owner="reclaimer"):
        assert read_lease(path)["owner"] == "reclaimer"


def test_release_checks_token(tmp_path):
    """A crashed-then-reclaimed writer must not release the
    reclaimer's lease on its way out."""
    path = str(tmp_path / "tbl")
    lease_file = f"{path}__lease"
    with table_lease(path, owner="old"):
        # simulate: old's lease expired mid-write and was reclaimed
        with open(lease_file, "w") as fh:
            json.dump({"owner": "new", "token": "other"}, fh)
    assert read_lease(path)["owner"] == "new"  # untouched by old's exit


def test_merge_upsert_fails_fast_under_held_lease(spark, tmp_path):
    from mc_ns_data_pipeline_spark.sinks.upsert import merge_upsert

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    merge_upsert(spark, base, path, "k")

    upd = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    with table_lease(path, owner="other-pipeline"):
        t0 = time.monotonic()
        with pytest.raises(TableLockedError, match="other-pipeline"):
            merge_upsert(spark, upd, path, "k")
        assert time.monotonic() - t0 < 5.0  # fail fast, no spark job
    # table unchanged by the refused writer
    assert sorted(
        map(tuple, spark.read.parquet(path).collect())
    ) == [(1, "a"), (2, "b")]
    # and the merge goes through once the lease is free
    merge_upsert(spark, upd, path, "k")
    assert sorted(
        map(tuple, spark.read.parquet(path).collect())
    ) == [(1, "a"), (2, "B"), (3, "c")]


def test_compact_refused_while_writer_active(spark, tmp_path):
    from mc_ns_data_pipeline_spark.sinks.layout import compact_files
    from mc_ns_data_pipeline_spark.sinks.upsert import full_refresh

    path = str(tmp_path / "tbl")
    full_refresh(
        spark.createDataFrame([(i,) for i in range(100)], "k int"), path
    )
    with table_lease(path, owner="writer"):
        with pytest.raises(TableLockedError, match="writer"):
            compact_files(spark, path)
    assert compact_files(spark, path) >= 1  # succeeds after release


def test_concurrent_merges_one_wins_one_fails_no_corruption(spark,
                                                            tmp_path):
    """Two threads race merge_upsert on one table. Every thread either
    succeeds or fails with TableLockedError; the final table contains
    the base rows plus each SUCCESSFUL thread's updates — nothing is
    lost, nothing half-written."""
    from mc_ns_data_pipeline_spark.sinks.upsert import merge_upsert

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, "base") for i in range(10)], "k int, v string"
    )
    merge_upsert(spark, base, path, "k")

    outcomes: dict[int, str] = {}

    def writer(tid: int):
        upd = spark.createDataFrame(
            [(100 + tid, f"t{tid}")], "k int, v string"
        )
        try:
            merge_upsert(spark, upd, path, "k")
            outcomes[tid] = "ok"
        except TableLockedError:
            outcomes[tid] = "locked"

    threads = [threading.Thread(target=writer, args=(i,))
               for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert set(outcomes.values()) <= {"ok", "locked"}
    assert "ok" in outcomes.values(), "somebody must win"
    rows = dict(
        (r["k"], r["v"]) for r in spark.read.parquet(path).collect()
    )
    for i in range(10):
        assert rows[i] == "base"  # base rows survived every outcome
    for tid, result in outcomes.items():
        if result == "ok":
            assert rows[100 + tid] == f"t{tid}"


def test_full_refresh_refused_while_writer_active(spark, tmp_path):
    from mc_ns_data_pipeline_spark.sinks.upsert import full_refresh

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1,)], "k int")
    full_refresh(df, path)
    with table_lease(path, owner="other"):
        with pytest.raises(TableLockedError, match="other"):
            full_refresh(df, path)
    full_refresh(df, path)  # fine after release
    assert spark.read.parquet(path).count() == 1
