"""Manifest-versioned parquet tables — lock-free reader MVCC and
file-granular copy-on-write commits.

The staged-swap sinks (sinks/upsert.py) are crash-safe and, with
sinks/lease, single-WRITER safe — but a concurrent READER still races
the directory-rename swap: a scan that listed the table's files before
the swap reads files the swap is about to delete, and fails. The
reference never hits this because PostgreSQL gives its readers MVCC
for free (file_processor.py:111 — reads ride transactions).

This module is the Spark-native answer: the manifest-pointer pattern
that Delta/Iceberg commits reduce to, expressed directly on a
filesystem with atomic rename.

Layout::

    <table>/data/<uuid>.parquet           shared immutable file pool
    <table>/snapshots/<gen>-<uuid>.json   manifest: file list + lineage
    <table>/CURRENT                       pointer file (atomic replace)

* Data files and manifests are write-once. Publishing a snapshot =
  land new data files in the pool, write a manifest naming the exact
  file set, then atomically flip CURRENT via ``os.replace``
  (POSIX-atomic). There is no intermediate state.
* Readers take NO lock: resolve CURRENT once, scan the immutable
  files its manifest names. A reader that resolved the pointer before
  a flip keeps a fully consistent view for as long as it runs (MVCC);
  vacuum's ``keep`` back-versions bound how long that is safe.
* Commits are COPY-ON-WRITE AT FILE GRANULARITY: ``merge_snapshot``
  locates the files that actually contain an updated key (one
  key-column scan + broadcast semi join — footer stats prune most
  files on clustered layouts, sinks/layout), rewrites only those, and
  the new manifest REUSES every untouched file. Write amplification
  is bounded by files hit, not table size — on a 100 TB table a
  1000-row update batch rewrites a handful of files while the other
  ~100k are shared with the previous snapshot byte-identically.
* Writers serialize through sinks/lease (single-writer publication);
  ``vacuum_snapshots`` reference-counts pool files across retained
  manifests before deleting.
* Crash safety: a crash before the flip leaves orphan pool files / an
  orphan manifest (CURRENT still names the last good snapshot; vacuum
  reaps unreferenced files once the orphan leaves the keep window). A
  crash after the flip is a completed commit.

At 100 TB this is the difference between "readers must quiesce during
maintenance" and "merge/compaction/GDPR-delete publish while
dashboards keep reading". On an object store without atomic rename,
swap this module for a real transaction log (Delta/Iceberg) — call
sites keep the same shape.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.sinks.lease import table_lease

_DATADIR = "data"
_SNAPDIR = "snapshots"
_POINTER = "CURRENT"


class NoCurrentSnapshotError(RuntimeError):
    """The table has no published snapshot (never written, or the
    pointer was deleted)."""


def _data_root(table: str) -> str:
    return os.path.join(table, _DATADIR)


def _snapshots_root(table: str) -> str:
    return os.path.join(table, _SNAPDIR)


def _pointer_path(table: str) -> str:
    return os.path.join(table, _POINTER)


def _manifest_path(table: str, snapshot: str) -> str:
    return os.path.join(_snapshots_root(table), f"{snapshot}.json")


def current_snapshot(table: str) -> str | None:
    """Name of the published snapshot, or None if never published."""
    try:
        with open(_pointer_path(table)) as fh:
            return fh.read().strip() or None
    except FileNotFoundError:
        return None


def list_snapshots(table: str) -> list[str]:
    """All snapshot names on disk (published or orphaned), oldest
    first — names order by generation via the zero-padded prefix."""
    root = _snapshots_root(table)
    try:
        return sorted(
            f[:-len(".json")] for f in os.listdir(root)
            if f.endswith(".json")
        )
    except FileNotFoundError:
        return []


def read_manifest(table: str, snapshot: str) -> dict:
    with open(_manifest_path(table, snapshot)) as fh:
        return json.load(fh)


def snapshot_files(table: str, snapshot: str) -> list[str]:
    """Absolute paths of the data files a snapshot scans."""
    root = _data_root(table)
    return [os.path.join(root, f)
            for f in read_manifest(table, snapshot)["files"]]


def read_snapshot(spark: SparkSession, table: str,
                  snapshot: str) -> DataFrame:
    """Time travel: scan an explicit (possibly superseded) snapshot."""
    return spark.read.parquet(*snapshot_files(table, snapshot))


def read_current(spark: SparkSession, table: str) -> DataFrame:
    """Scan the published snapshot. Lock-free: one atomic pointer
    read, then immutable files — no writer can invalidate what this
    DataFrame will scan (until vacuum passes ``keep`` versions)."""
    snap = current_snapshot(table)
    if snap is None:
        raise NoCurrentSnapshotError(table)
    return read_snapshot(spark, table, snap)


def _next_snapshot_name(table: str) -> str:
    snaps = list_snapshots(table)
    gen = 1 + max((int(s.split("-", 1)[0]) for s in snaps), default=0)
    return f"{gen:08d}-{uuid.uuid4().hex[:8]}"


def _land_in_pool(df: DataFrame, table: str) -> list[str]:
    """Write `df`'s rows as new immutable pool files; return their
    pool-relative names. Staging-dir write, then per-file move into
    the pool under fresh uuid names (never overwrites; a crash leaves
    only unreferenced files for vacuum)."""
    staging = os.path.join(table, f"__staging-{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(staging)
    pool = _data_root(table)
    os.makedirs(pool, exist_ok=True)
    names = []
    for part in sorted(os.listdir(staging)):
        if part.endswith(".parquet"):
            name = f"{uuid.uuid4().hex}.parquet"
            shutil.move(os.path.join(staging, part),
                        os.path.join(pool, name))
            names.append(name)
    shutil.rmtree(staging)
    return names


def _publish(table: str, files: list[str], rows: int,
             parent: str | None, reused: int,
             txn_id: str | None = None) -> str:
    """Write the manifest, then atomically flip the pointer. Caller
    holds the table lease."""
    name = _next_snapshot_name(table)
    os.makedirs(_snapshots_root(table), exist_ok=True)
    manifest = {
        "snapshot": name,
        "parent": parent,
        "rows": rows,
        "files": files,
        "reused_files": reused,
        "txn_id": txn_id,
    }
    mpath = _manifest_path(table, name)
    with open(mpath, "w") as fh:
        json.dump(manifest, fh)
        fh.flush()
        os.fsync(fh.fileno())

    pointer = _pointer_path(table)
    tmp = f"{pointer}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        fh.write(name)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, pointer)  # the commit: one atomic rename
    return name


def _count_pool_rows(spark: SparkSession, table: str,
                     files: list[str]) -> int:
    if not files:
        return 0
    root = _data_root(table)
    return spark.read.parquet(
        *(os.path.join(root, f) for f in files)).count()


def write_snapshot(df: DataFrame, table: str) -> str:
    """Full-refresh publish (K8 semantics, reader-safe): the new state
    becomes visible in one atomic pointer flip; in-flight readers keep
    the old snapshot's files, which this write never touches."""
    os.makedirs(table, exist_ok=True)
    with table_lease(table, owner="write_snapshot"):
        files = _land_in_pool(df, table)
        rows = _count_pool_rows(df.sparkSession, table, files)
        return _publish(table, files, rows, current_snapshot(table), 0)


def _txn_already_applied(table: str, txn_id: str) -> str | None:
    """Walk the manifest parent chain from CURRENT looking for a
    commit stamped with `txn_id`; returns that snapshot's name, or
    None. The walk stops at a vacuumed-away parent — retention
    (vacuum `keep`) must therefore cover the longest plausible replay
    gap, which for streaming retries (the next micro-batch after a
    crash) is one commit."""
    snap = current_snapshot(table)
    while snap is not None:
        try:
            man = read_manifest(table, snap)
        except FileNotFoundError:
            return None
        if man.get("txn_id") == txn_id:
            return snap
        snap = man.get("parent")
    return None


def append_snapshot(df: DataFrame, table: str,
                    txn_id: str | None = None) -> str:
    """Zero-rewrite append (K5 semantics, reader-safe): land the new
    rows as fresh pool files and publish a manifest that is the parent
    file list PLUS the new files — nothing existing is read or
    rewritten, so micro-batch/streaming landers pay only for their own
    rows (the foreachBatch sink shape at 100 TB).

    Exactly-once under micro-batch replay: pass a deterministic
    ``txn_id`` (e.g. ``f"{query_name}:{batch_id}"`` from foreachBatch)
    and a replayed batch whose commit already published is a no-op
    returning the existing snapshot — the Delta txnAppId/txnVersion
    idempotence contract, here as a manifest stamp. A batch that
    crashed BEFORE its pointer flip left only unreferenced pool files
    (vacuum reaps them) and the replay commits normally."""
    os.makedirs(table, exist_ok=True)
    with table_lease(table, owner="append_snapshot"):
        if txn_id is not None:
            applied = _txn_already_applied(table, txn_id)
            if applied is not None:
                return applied
        parent = current_snapshot(table)
        old_files = (read_manifest(table, parent)["files"]
                     if parent else [])
        old_rows = (read_manifest(table, parent)["rows"]
                    if parent else 0)
        new_files = _land_in_pool(df, table)
        rows = old_rows + _count_pool_rows(df.sparkSession, table,
                                           new_files)
        return _publish(table, old_files + new_files, rows, parent,
                        len(old_files), txn_id=txn_id)


def compact_snapshot(spark: SparkSession, table: str,
                     sort_col: str | None = None,
                     target_files: int = 1) -> str:
    """Maintenance publish: rewrite the current snapshot's (typically
    many small, append-landed) files into ``target_files``
    range-clustered ones and publish the result as a NEW snapshot —
    concurrent readers keep scanning the old files throughout, so
    compaction needs no quiesce window (the x97/compact_clustered
    rewrite, made reader-safe by MVCC). With ``sort_col`` the rewrite
    is repartitionByRange + sortWithinPartitions, preserving the
    clustering that zone-map pruning (sinks/layout) depends on."""
    with table_lease(table, owner="compact_snapshot"):
        parent = current_snapshot(table)
        if parent is None:
            raise NoCurrentSnapshotError(table)
        cur = read_snapshot(spark, table, parent)
        if sort_col is not None:
            cur = cur.repartitionByRange(
                target_files, sort_col).sortWithinPartitions(sort_col)
        else:
            cur = cur.coalesce(target_files)
        files = _land_in_pool(cur, table)
        rows = read_manifest(table, parent)["rows"]
        return _publish(table, files, rows, parent, 0)


def _locate_affected(spark: SparkSession, table: str, parent: str,
                     key: str, keys_df: DataFrame
                     ) -> tuple[list[str], list[str]]:
    """Which of `parent`'s files contain one of `keys_df`'s keys —
    a key-column + input_file_name scan semi-joined against the
    broadcast key set (column-pruned; footer stats prune clustered
    layouts before rows are read). Returns (affected absolute paths,
    untouched pool-relative names)."""
    old_files = read_manifest(table, parent)["files"]
    root = _data_root(table)
    affected_uris = {
        r["_file"]
        for r in (
            spark.read.parquet(
                *(os.path.join(root, f) for f in old_files))
            .select(key, F.input_file_name().alias("_file"))
            .join(F.broadcast(keys_df), key, "left_semi")
            .select("_file").distinct().collect()
        )
    }
    affected = {
        os.path.basename(
            u[len("file://"):] if u.startswith("file://") else u)
        for u in affected_uris
    }
    untouched = [f for f in old_files if f not in affected]
    return ([os.path.join(root, f) for f in sorted(affected)],
            untouched)


def merge_snapshot(spark: SparkSession, updates: DataFrame, table: str,
                   key: str) -> str:
    """MVCC upsert (K6 semantics, reader-safe, file-granular COW):
    updated keys win, unmatched target rows survive — the
    upsert.merge_upsert contract — but only the files that actually
    contain an updated key are rewritten; every other file is REUSED
    by name in the new manifest. The commit is one pointer flip, so
    concurrent readers never observe the swap.
    """
    os.makedirs(table, exist_ok=True)
    with table_lease(table, owner=f"merge_snapshot:{key}"):
        parent = current_snapshot(table)
        if parent is None:
            files = _land_in_pool(updates, table)
            rows = _count_pool_rows(spark, table, files)
            return _publish(table, files, rows, None, 0)

        keys = updates.select(key).distinct()
        affected_paths, untouched = _locate_affected(
            spark, table, parent, key, keys)

        # Rewrite: survivors of ONLY the affected files, plus updates.
        if affected_paths:
            affected_rows = spark.read.parquet(*affected_paths).count()
            survivors = (
                spark.read.parquet(*affected_paths)
                .join(F.broadcast(keys), key, "left_anti")
                .unionByName(updates)
            )
        else:
            affected_rows = 0
            survivors = updates
        new_files = _land_in_pool(survivors, table)

        # Row count maintained incrementally — metadata upkeep scans
        # only the touched files, never the whole table.
        rows = (read_manifest(table, parent)["rows"] - affected_rows
                + _count_pool_rows(spark, table, new_files))
        return _publish(table, untouched + new_files, rows, parent,
                        len(untouched))


def vacuum_snapshots(table: str, keep: int = 2) -> dict:
    """Reap history no in-flight reader should still need: drop every
    manifest except the current snapshot and the newest ``keep - 1``
    others, then delete pool files referenced by NO retained manifest
    (reference-counted — files shared forward by COW commits survive).
    Orphans from pre-flip crashes age out of the keep window like any
    superseded snapshot. Returns ``{"snapshots": [...], "files": n}``.
    """
    if keep < 1:
        raise ValueError("keep must be >= 1")
    with table_lease(table, owner="vacuum"):
        current = current_snapshot(table)
        snaps = list_snapshots(table)
        retained = set(snaps[-keep:])
        if current is not None:
            retained.add(current)
        doomed = [s for s in snaps if s not in retained]
        for s in doomed:
            os.remove(_manifest_path(table, s))

        live: set[str] = set()
        for s in retained:
            live.update(read_manifest(table, s)["files"])
        removed_files = 0
        root = _data_root(table)
        if os.path.isdir(root):
            for f in os.listdir(root):
                if f.endswith(".parquet") and f not in live:
                    os.remove(os.path.join(root, f))
                    removed_files += 1
        return {"snapshots": doomed, "files": removed_files}


def run_stream_append(spark: SparkSession, events_path: str,
                      table: str, checkpoint_dir: str,
                      app_id: str = "stream_append") -> None:
    """Land a stream into a versioned table, exactly-once: foreachBatch
    → ``append_snapshot`` stamped ``f"{app_id}:{batch_id}"``. The
    streaming checkpoint dedups offsets ACROSS restarts; the txn stamp
    dedups the one batch a crash can replay AFTER its commit already
    flipped the pointer (checkpoint not yet advanced) — together the
    table sees each micro-batch exactly once. Readers meanwhile get
    lock-free consistent snapshots between every batch (T6/T8 made
    reader-safe; reference anchor: the per-file transaction
    file_processor.py:111 gives its readers the same guarantee)."""
    from mc_ns_data_pipeline_spark.streaming.incremental import (
        _events_stream,
    )

    q = (
        _events_stream(spark, events_path)
        .writeStream.outputMode("append")
        .foreachBatch(
            lambda df, bid: append_snapshot(
                df, table, txn_id=f"{app_id}:{bid}")
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def delete_keys_snapshot(spark: SparkSession, table: str, key: str,
                         doomed: DataFrame) -> str:
    """Right-to-be-forgotten as a COW snapshot commit: rewrite ONLY
    the files containing a doomed key (same locate/rewrite dataflow as
    ``upsert.delete_keys_targeted``), publish survivors + untouched
    files as a NEW snapshot. Unlike the in-place variant, readers
    never race the per-file removal — the old snapshot stays intact
    until vacuum, and the deletion "takes effect" atomically at the
    pointer flip. (Compliance note: the doomed rows' bytes leave disk
    when vacuum reaps the superseded snapshots, so retention `keep`
    bounds the erasure latency.)"""
    with table_lease(table, owner=f"delete_keys:{key}"):
        parent = current_snapshot(table)
        if parent is None:
            raise NoCurrentSnapshotError(table)
        doomed_keys = doomed.select(key).distinct()
        affected_paths, untouched = _locate_affected(
            spark, table, parent, key, doomed_keys)
        if not affected_paths:
            return parent  # nothing to forget: current stays
        affected_rows = spark.read.parquet(*affected_paths).count()
        survivors = (
            spark.read.parquet(*affected_paths)
            .join(F.broadcast(doomed_keys), key, "left_anti")
        )
        new_files = _land_in_pool(survivors, table)
        rows = (read_manifest(table, parent)["rows"] - affected_rows
                + _count_pool_rows(spark, table, new_files))
        return _publish(table, untouched + new_files, rows, parent,
                        len(untouched))
