"""Chunked manifests (VERDICT r04 #6): past `_MANIFEST_CHUNK_FILES`
the per-file metadata (file list, stats, blooms, generations) moves
into immutable sidecars shared across commits, and the core manifest
keeps only per-chunk spans. Planning reads the core plus ONLY the
sidecars a predicate's span check cannot rule out; appends write one
new sidecar and reuse the parent's — O(commit) metadata at any table
size. These tests force chunking at toy thresholds and assert the
exact same answers as the inline path, plus the metadata-cost
contracts (sidecar reads counted via a patched `_read_chunk`)."""

from __future__ import annotations

import os

import pytest

from mc_ns_data_pipeline_spark.sinks import versioned as V


@pytest.fixture
def tiny_chunks(monkeypatch):
    """Chunk everything: manifests of >=6 files chunk at 4 files per
    sidecar, so a 3-partition toy table exercises the real machinery."""
    monkeypatch.setattr(V, "_MANIFEST_CHUNK_FILES", 6)
    monkeypatch.setattr(V, "_MANIFEST_CHUNK_SIZE", 4)


class _ChunkReadCounter:
    def __init__(self, monkeypatch):
        self.count = 0
        orig = V._read_chunk

        def counting(table, cid):
            self.count += 1
            return orig(table, cid)

        monkeypatch.setattr(V, "_read_chunk", counting)


def _clustered(spark, n=200, parts=10):
    return (
        spark.createDataFrame([(i, f"v{i}") for i in range(n)],
                              "k int, v string")
        .repartitionByRange(parts, "k")
    )


def test_chunked_write_roundtrip_and_pruning(spark, tmp_path,
                                             tiny_chunks):
    table = str(tmp_path / "t")
    snap = V.write_snapshot(_clustered(spark), table,
                            stats_cols=["k"], bloom_cols=["k"])
    core = V._read_core(table, snap)
    assert "chunks" in core and "files" not in core
    assert sum(ch["n"] for ch in core["chunks"]) == 10
    assert all(ch["spans"] and "k" in ch["spans"]
               for ch in core["chunks"])

    # materialized view equals the table
    man = V.read_manifest(table, snap)
    assert len(man["files"]) == 10
    assert set(man["stats"]) == set(man["files"])
    assert set(man["blooms"]) == set(man["files"])
    assert V.read_current(spark, table).count() == 200

    # pruned read == scan + filter, and planning skipped whole chunks
    got = V.read_current(spark, table, predicates=[("k", "=", 7)])
    assert [r.v for r in got.collect()] == ["v7"]
    rep = V.prune_report(table, snap, [("k", "=", 7)])
    assert rep["kept"] and rep["skipped"] >= 8
    assert rep["chunks_loaded"] < rep["chunks_total"]
    # range predicate across a chunk boundary
    got = V.read_current(spark, table,
                         predicates=[("k", ">=", 195)])
    assert sorted(r.k for r in got.collect()) == list(range(195, 200))


def test_chunked_append_is_o_commit_metadata(spark, tmp_path,
                                             tiny_chunks, monkeypatch):
    table = str(tmp_path / "t")
    V.write_snapshot(_clustered(spark), table, stats_cols=["k"])
    counter = _ChunkReadCounter(monkeypatch)
    V.append_snapshot(
        spark.createDataFrame([(1000, "new")], "k int, v string"),
        table)
    assert counter.count == 0, (
        "append on a chunked table must not load any parent sidecar")
    core = V._read_core(table, V.current_snapshot(table))
    assert core["op"] == "append" and "chunks" in core
    assert V.read_current(spark, table).count() == 201
    got = V.read_current(spark, table, predicates=[("k", "=", 1000)])
    assert [r.v for r in got.collect()] == ["new"]
    # the parent's sidecars are REUSED byte-identically (shared ids)
    parent_core = V._read_core(table, core["parent"])
    parent_ids = [ch["id"] for ch in parent_core["chunks"]]
    child_ids = [ch["id"] for ch in core["chunks"]]
    assert child_ids[:len(parent_ids)] == parent_ids
    assert len(child_ids) == len(parent_ids) + 1


def test_chunked_point_lookup_loads_one_sidecar(spark, tmp_path,
                                                tiny_chunks,
                                                monkeypatch):
    table = str(tmp_path / "t")
    snap = V.write_snapshot(_clustered(spark), table, stats_cols=["k"])
    counter = _ChunkReadCounter(monkeypatch)
    rep = V.prune_report(table, snap, [("k", "=", 42)])
    assert counter.count == 1, (
        "clustered point lookup must load exactly the one sidecar "
        "whose span contains the key")
    assert rep["chunks_loaded"] == 1


def test_chunked_merge_delete_and_mor_masks(spark, tmp_path,
                                            tiny_chunks):
    """COW merge, MOR delete, and the masked read all behave
    identically on chunked tables (the mutation paths materialize,
    correctness first)."""
    table = str(tmp_path / "t")
    V.write_snapshot(_clustered(spark), table, stats_cols=["k"])
    V.merge_snapshot(
        spark, spark.createDataFrame([(7, "UPD")], "k int, v string"),
        table, "k")
    got = dict((r.k, r.v) for r in V.read_current(spark, table).collect())
    assert got[7] == "UPD" and len(got) == 200

    V.delete_keys_mor(spark, table, "k",
                      spark.createDataFrame([(8,), (9,)], "k int"))
    assert V.read_current(spark, table).count() == 198
    # pruned read honors the mask through the chunked fast path
    assert V.read_current(spark, table,
                          predicates=[("k", "=", 8)]).count() == 0
    assert V.read_current(spark, table,
                          predicates=[("k", "=", 7)]).count() == 1


def test_chunked_merge_is_o_chunks_hit(spark, tmp_path, tiny_chunks,
                                       monkeypatch):
    """A COW merge on a chunked table loads ONLY the sidecars the key
    batch can hit, and the publish reuses every untouched sidecar by
    id with the rewritten members tombstoned."""
    table = str(tmp_path / "t")
    V.write_snapshot(_clustered(spark), table, stats_cols=["k"])
    parent_core = V._read_core(table, V.current_snapshot(table))
    parent_ids = [ch["id"] for ch in parent_core["chunks"]]

    counter = _ChunkReadCounter(monkeypatch)
    V.merge_snapshot(
        spark, spark.createDataFrame([(3, "UPD")], "k int, v string"),
        table, "k")
    assert counter.count == 1, (
        "a 1-key clustered merge must load exactly one sidecar")

    core = V._read_core(table, V.current_snapshot(table))
    assert "chunks" in core
    kept_ids = [ch["id"] for ch in core["chunks"]]
    assert set(kept_ids) <= set(parent_ids) | {core["chunks"][-1]["id"]}
    reused = [ch for ch in core["chunks"] if ch["id"] in parent_ids]
    assert len(reused) == len(parent_ids)  # every sidecar reused
    tombstoned = [ch for ch in reused if ch.get("exclude")]
    assert len(tombstoned) == 1  # only the hit chunk gained excludes

    got = dict((r.k, r.v) for r in V.read_current(spark, table).collect())
    assert got[3] == "UPD" and len(got) == 200
    assert V.read_current(
        spark, table, predicates=[("k", "=", 3)]).collect()[0].v == "UPD"


def test_chunked_mor_commits_reuse_sidecars(spark, tmp_path,
                                            tiny_chunks, monkeypatch):
    """MOR delete and upsert on a chunked table: the decrement count
    loads only the sidecars the key batch can hit, the publish reuses
    every parent sidecar by id, and masks + sequencing behave exactly
    as inline."""
    table = str(tmp_path / "t")
    V.write_snapshot(_clustered(spark), table, stats_cols=["k"])
    parent_ids = [ch["id"] for ch in
                  V._read_core(table, V.current_snapshot(table))["chunks"]]

    counter = _ChunkReadCounter(monkeypatch)
    V.delete_keys_mor(spark, table, "k",
                      spark.createDataFrame([(5,)], "k int"))
    assert counter.count == 1  # one clustered key: one sidecar
    core = V._read_core(table, V.current_snapshot(table))
    assert [ch["id"] for ch in core["chunks"]] == parent_ids  # reused
    assert core["rows"] == 199
    assert V.read_current(spark, table).count() == 199
    assert V.read_current(spark, table,
                          predicates=[("k", "=", 5)]).count() == 0

    V.merge_snapshot_mor(
        spark, spark.createDataFrame([(5, "reborn"), (7, "UPD")],
                                     "k int, v string"), table, "k")
    core = V._read_core(table, V.current_snapshot(table))
    assert [ch["id"] for ch in core["chunks"][:len(parent_ids)]] \
        == parent_ids
    assert len(core["chunks"]) == len(parent_ids) + 1
    got = dict((r.k, r.v) for r in V.read_current(spark, table).collect())
    assert got[5] == "reborn" and got[7] == "UPD" and len(got) == 200
    # compaction applies everything and stays correct
    V.compact_snapshot(spark, table, sort_col="k", target_files=2)
    got2 = dict((r.k, r.v)
                for r in V.read_current(spark, table).collect())
    assert got2 == got


def test_chunked_delete_drops_fully_consumed_chunks(spark, tmp_path,
                                                    tiny_chunks):
    """Deleting every key of one file range tombstones it; a chunk
    whose every member is consumed disappears from the descriptors."""
    table = str(tmp_path / "t")
    V.write_snapshot(_clustered(spark, n=40, parts=10), table,
                     stats_cols=["k"])  # 10 files of 4 keys, 3 chunks
    # doom the whole first chunk's key range (files are 4-key ranges,
    # chunks are 4 files -> keys 0..15)
    V.delete_keys_snapshot(
        spark, table, "k",
        spark.createDataFrame([(i,) for i in range(16)], "k int"))
    core = V._read_core(table, V.current_snapshot(table))
    assert V.read_current(spark, table).count() == 24
    assert sorted(r.k for r in V.read_current(
        spark, table, predicates=[("k", "<", 18)]).collect()) == [16, 17]
    # every original descriptor either dropped or tombstone-complete
    live = V._chunk_file_count(core)
    new_chunk_files = core["chunks"][-1]["n"] if core["chunks"] else 0
    assert live == len(V.read_manifest(
        table, core["snapshot"])["files"])


def test_chunked_compact_changelog_and_vacuum(spark, tmp_path,
                                              tiny_chunks):
    table = str(tmp_path / "t")
    s0 = V.write_snapshot(_clustered(spark), table, stats_cols=["k"])
    V.append_snapshot(
        spark.createDataFrame([(500, "a"), (501, "b")],
                              "k int, v string").repartition(1), table)
    # changelog stays O(increment): only the appended files
    inc = V.read_appended_since(spark, table, s0)
    assert sorted(r.k for r in inc.collect()) == [500, 501]

    V.compact_snapshot(spark, table, sort_col="k", target_files=2)
    assert V.read_current(spark, table).count() == 202
    out = V.vacuum_snapshots(table, keep=1)
    assert out["chunks"] > 0  # superseded sidecars reaped
    assert V.read_current(spark, table).count() == 202
    # every surviving chunk id is referenced by the current core
    core = V._read_core(table, V.current_snapshot(table))
    ids = {ch["id"] for ch in core.get("chunks") or []}
    on_disk = {f[:-5] for f in os.listdir(V._chunks_root(table))}
    assert on_disk == ids


def test_chunked_txn_idempotence_and_time_travel(spark, tmp_path,
                                                 tiny_chunks):
    table = str(tmp_path / "t")
    s0 = V.write_snapshot(_clustered(spark), table)
    first = V.append_snapshot(
        spark.createDataFrame([(999, "x")], "k int, v string"),
        table, txn_id="j:1")
    again = V.append_snapshot(
        spark.createDataFrame([(999, "x")], "k int, v string"),
        table, txn_id="j:1")
    assert again == first
    assert V.read_snapshot(spark, table, s0).count() == 200  # MVCC
    assert V.read_current(spark, table).count() == 201


def test_chunk_span_soundness_property():
    """Chunk-level pruning must never drop a chunk containing a file
    an individual check would keep — randomized over stats shapes."""
    import random

    from mc_ns_data_pipeline_spark.sinks.versioned import (
        _chunk_spans,
        _chunk_survives,
        _file_survives,
    )

    rng = random.Random(7)
    for _ in range(300):
        files = [f"f{i}" for i in range(rng.randint(1, 8))]
        stats = {}
        for f in files:
            roll = rng.random()
            if roll < 0.15:
                stats[f] = {}  # unstatable for the column
            elif roll < 0.3:
                stats[f] = {"k": [None, None]}  # all-NULL file
            else:
                lo = rng.randint(-50, 50)
                stats[f] = {"k": [lo, lo + rng.randint(0, 30)]}
        spans = _chunk_spans(files, stats, ["k"])
        ch = {"n": len(files), "spans": spans}
        for op in ("<", "<=", ">", ">=", "="):
            v = rng.randint(-60, 60)
            preds = [("k", op, v)]
            if not _chunk_survives(ch, preds):
                for f in files:
                    assert not _file_survives(stats, f, "k", op, v), (
                        f"chunk-pruned but {f} with {stats[f]} "
                        f"survives k {op} {v}")


def _unclustered(spark, n=200, parts=10):
    """Keys scattered across every partition file: spans all overlap,
    so only blooms can prune a point lookup."""
    return (
        spark.createDataFrame([(i, f"v{i}") for i in range(n)],
                              "k int, v string")
        .repartition(parts)  # round-robin: every file spans keyspace
    )


def test_chunked_blm_point_lookup_skips_all_sidecars(
        spark, tmp_path, tiny_chunks, monkeypatch):
    """r5 verdict #2: on an UNCLUSTERED chunked table a point lookup
    on a bloom column plans from the bit-sliced chunk blooms alone —
    zero sidecar JSON loads — and still never misses the true file."""
    table = str(tmp_path / "t")
    snap = V.write_snapshot(_unclustered(spark), table,
                            stats_cols=["k"], bloom_cols=["k"])
    counter = _ChunkReadCounter(monkeypatch)
    rep = V.prune_report(table, snap, [("k", "=", 42)])
    assert counter.count == 0, (
        "pure-equality planning must not parse any sidecar")
    assert rep["chunks_blm_probed"] == rep["chunks_total"] > 1
    assert rep["chunks_loaded"] == 0
    # soundness end-to-end: the pruned read still finds the row
    got = V.read_snapshot(spark, table, snap,
                          predicates=[("k", "=", 42)]).collect()
    assert [(r.k, r.v) for r in got] == [(42, "v42")]
    # and prunes: far fewer files kept than total
    assert len(rep["kept"]) < rep["total"]


def test_chunked_blm_respects_mor_masks_and_cow_excludes(
        spark, tmp_path, tiny_chunks):
    """Tombstoned (COW-rewritten) members never resurface from the
    .blm fast path, and MOR delete masks still apply above it."""
    table = str(tmp_path / "t")
    V.write_snapshot(_unclustered(spark), table,
                     stats_cols=["k"], bloom_cols=["k"])
    V.merge_snapshot(
        spark, spark.createDataFrame([(7, "UPD")], "k int, v string"),
        table, "k")
    assert [(r.k, r.v) for r in V.read_current(
        spark, table, predicates=[("k", "=", 7)]).collect()] \
        == [(7, "UPD")]
    V.delete_keys_mor(spark, table, "k",
                      spark.createDataFrame([(8,)], "k int"))
    assert V.read_current(spark, table,
                          predicates=[("k", "=", 8)]).count() == 0
    assert V.read_current(spark, table).count() == 199


def test_chunked_blm_mixed_predicates_refine_from_sidecar(
        spark, tmp_path, tiny_chunks, monkeypatch):
    """Equality + range together: the .blm cuts chunks first, the
    surviving chunks' sidecars refine with stats — same answers."""
    table = str(tmp_path / "t")
    snap = V.write_snapshot(_unclustered(spark), table,
                            stats_cols=["k"], bloom_cols=["k"])
    got = V.read_snapshot(
        spark, table, snap,
        predicates=[("k", "=", 42), ("k", "<=", 100)]).collect()
    assert [(r.k, r.v) for r in got] == [(42, "v42")]
    assert V.read_snapshot(
        spark, table, snap,
        predicates=[("k", "=", 42), ("k", "<=", 10)]).count() == 0


def test_chunk_blm_fold_soundness_property():
    """Hypothesis: for ANY member value sets (mixed sizes, so folding
    kicks in) and any probed present value, the bit-sliced probe must
    keep the member that holds it — chunk blooms never false-negative,
    the prune-property contract extended to the .blm layout."""
    import shutil
    import tempfile

    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        member_vals=st.lists(
            st.lists(st.one_of(st.integers(-2**62, 2**62),
                               st.text(max_size=12)),
                     min_size=0, max_size=30),
            min_size=1, max_size=6),
    )
    def check(member_vals):
        work = tempfile.mkdtemp()
        try:
            table = os.path.join(work, "t")
            os.makedirs(V._chunks_root(table), exist_ok=True)
            part = [f"f{i}.parquet" for i in range(len(member_vals))]
            blooms = {
                f: {"k": V._bloom_b64(
                    pd.Series(vals, dtype="object").astype(str),
                    integral=False)}
                for f, vals in zip(part, member_vals)
            }
            wrote = V._write_chunk_blm(table, "c1", part, blooms,
                                       {f: 1 for f in part})
            assert wrote
            ch = {"id": "c1", "n": len(part)}
            for f, vals in zip(part, member_vals):
                for v in vals:
                    hp = V._blm_hash_preds([("k", "=", v)])
                    assert hp is not None
                    got = V._blm_probe(table, ch, hp)
                    assert got is not None
                    assert f in got[0], (
                        f"chunk-bloom false negative: {v!r} in {f}")
        finally:
            shutil.rmtree(work, ignore_errors=True)

    check()


def test_vacuum_sidecar_reads_are_o_distinct_chunks(
        spark, tmp_path, tiny_chunks, monkeypatch):
    """r5 verdict #7: vacuum's refcounting reads CORES plus each
    DISTINCT sidecar once — pinning many tags/branches at the same
    history must not multiply sidecar loads (the old
    read_manifest-per-snapshot materialization was O(refs x chunks))."""
    table = str(tmp_path / "t")
    V.write_snapshot(_clustered(spark), table, stats_cols=["k"])
    for i in range(4):
        V.append_snapshot(
            spark.createDataFrame([(1000 + i, "a")], "k int, v string"),
            table)
        V.tag_snapshot(table, f"tag{i}")  # pins every snapshot
    V.append_snapshot(
        spark.createDataFrame([(2000, "b")], "k int, v string"),
        table, branch="stage")  # plus a staged branch head

    croot = V._chunks_root(table)
    distinct = len([f for f in os.listdir(croot)
                    if f.endswith(".json")])
    counter = _ChunkReadCounter(monkeypatch)
    V.vacuum_snapshots(table, keep=1)
    assert counter.count <= distinct, (
        f"vacuum loaded {counter.count} sidecars with only {distinct} "
        "distinct chunks on disk — refs multiplied the loads")
    # and nothing pinned was harmed: every tag still reads
    for i in range(4):
        assert V.read_ref(spark, table, f"tag{i}").count() > 0
    assert V.read_ref(spark, table, "stage").count() == 200 + 4 + 1


def test_chunked_blm_non_canonical_literal_falls_back(
        spark, tmp_path, tiny_chunks):
    """A float/bool equality literal on a bloom column must fall back
    to the sidecar path (blooms only answer int/str membership), never
    crash the planner or skip a matching file."""
    table = str(tmp_path / "t")
    snap = V.write_snapshot(_unclustered(spark), table,
                            stats_cols=["k"], bloom_cols=["k"])
    # float literal: k = 42.0 matches int 42 in Spark semantics
    got = V.read_snapshot(spark, table, snap,
                          predicates=[("k", "=", 42.0)]).collect()
    assert [(r.k, r.v) for r in got] == [(42, "v42")]
    # and planning stayed conservative: a non-canonical literal can't
    # probe blooms, so NOTHING may be pruned (spans are unclustered)
    rep = V.prune_report(table, snap, [("k", "=", 42.0)])
    assert len(rep["kept"]) == rep["total"]
