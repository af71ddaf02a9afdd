#!/usr/bin/env python
"""Vacuum/retention cost at the 1M-file + many-refs shape (round-6
follow-up to the round-5 refs/WAP layer): the branch-lineage walk and
the sidecar refcounting both grew in r5 — prove they stay
O(refs + distinct chunks), never O(refs x chunks) or O(files).

Driver-only, no Spark: synthesizes a 1M-file CHUNKED table's metadata
with the real machinery, then layers on a realistic ref load — a
lineage of appends, ~50 tags pinning assorted snapshots, and staged
branches whose lineage vacuum must walk — and times
``vacuum_snapshots`` plus counts its actual sidecar loads.

Usage: python scripts/stress_vacuum_refs.py [WORK_DIR] [N_FILES] [TAGS]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

WORK = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_vacuum"
N_FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
N_TAGS = int(sys.argv[3]) if len(sys.argv) > 3 else 50
N_APPENDS = 60  # lineage depth: tagged snapshots spread across it
N_BRANCHES = 5  # staged WAP branches, 3 commits deep each


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:68s} {dt:8.3f} s")
    return out, dt


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from mc_ns_data_pipeline_spark.sinks import versioned as V

    shutil.rmtree(WORK, ignore_errors=True)
    table = os.path.join(WORK, "tbl")
    os.makedirs(V._snapshots_root(table), exist_ok=True)
    os.makedirs(V._data_root(table), exist_ok=True)

    # Base: a 1M-file chunked snapshot (metadata only; pool files are
    # zero-byte placeholders so refcount deletes have something real).
    files = [f"{uuid.uuid4().hex}.parquet" for _ in range(N_FILES)]
    stats = {f: {"k": [i * 1000, (i + 1) * 1000 - 1]}
             for i, f in enumerate(files)}
    file_seq = {f: 1 for f in files}
    chunks = V._write_chunks(table, files, stats, None, file_seq,
                             ["k"])

    def publish(name, parent, op, new, parent_chunks):
        core = {
            "snapshot": name, "parent": parent, "rows": 0,
            "reused_files": N_FILES, "txn_id": None, "op": op,
            "new_files": new, "schema": None, "stats_cols": ["k"],
            "bloom_cols": None, "delete_files": None,
            "partition_spec": None,
            "chunks": parent_chunks + V._write_chunks(
                table, new, {f: {"k": [0, 1]} for f in new},
                None, {f: 1 for f in new}, ["k"]),
        }
        V._atomic_write_json(V._manifest_path(table, name), core)
        V._atomic_write_text(V._pointer_path(table), name)
        return core["chunks"]

    def synth_history():
        cur_chunks = chunks
        snaps = []
        for g in range(1, N_APPENDS + 1):
            name = f"{g:08d}-{uuid.uuid4().hex[:8]}"
            new = [f"{uuid.uuid4().hex}.parquet" for _ in range(2)]
            for f in new:
                open(os.path.join(V._data_root(table), f), "w").close()
            cur_chunks = publish(
                name, snaps[-1] if snaps else None, "append", new,
                cur_chunks)
            snaps.append(name)
        return snaps, cur_chunks

    (hist, cur_chunks), t_hist = timed(
        f"synthesize {N_APPENDS}-append lineage on the 1M-file table",
        synth_history)

    def add_refs():
        for i in range(N_TAGS):  # tags spread across the lineage
            V.tag_snapshot(table, f"tag{i:03d}",
                           snapshot=hist[i % len(hist)])
        ch = cur_chunks
        head = hist[-1]
        for b in range(N_BRANCHES):  # staged branches, 3 deep
            parent = head
            for d in range(3):
                g = N_APPENDS + 1 + b * 3 + d
                name = f"{g:08d}-{uuid.uuid4().hex[:8]}"
                new = [f"{uuid.uuid4().hex}.parquet"]
                for f in new:
                    open(os.path.join(V._data_root(table), f),
                         "w").close()
                core = {
                    "snapshot": name, "parent": parent, "rows": 0,
                    "reused_files": N_FILES, "txn_id": None,
                    "op": "append", "new_files": new, "schema": None,
                    "stats_cols": ["k"], "bloom_cols": None,
                    "delete_files": None, "partition_spec": None,
                    "chunks": ch + V._write_chunks(
                        table, new, None, None, {f: 1 for f in new},
                        None),
                }
                V._atomic_write_json(
                    V._manifest_path(table, name), core)
                parent = name
            ref = V._ref_path(table, f"stage{b}", "heads")
            os.makedirs(os.path.dirname(ref), exist_ok=True)
            V._atomic_write_text(ref, parent)

    _, t_refs = timed(
        f"pin {N_TAGS} tags + {N_BRANCHES} staged branches (3 deep)",
        add_refs)

    reads = {"core": 0, "chunk": 0}
    orig_core, orig_chunk = V._read_core, V._read_chunk

    def counting_core(t, s):
        reads["core"] += 1
        return orig_core(t, s)

    def counting_chunk(t, c):
        reads["chunk"] += 1
        return orig_chunk(t, c)

    V._read_core, V._read_chunk = counting_core, counting_chunk
    try:
        vac, t_vac = timed(
            f"vacuum keep=2 over 1M files, {N_TAGS} tags, "
            f"{N_BRANCHES} branches",
            lambda: V.vacuum_snapshots(table, keep=2))
    finally:
        V._read_core, V._read_chunk = orig_core, orig_chunk

    n_sidecars = len([f for f in os.listdir(V._chunks_root(table))
                      if f.endswith(".json")])
    print(f"    -> reaped {len(vac['snapshots'])} snapshots, "
          f"{vac['files']} files, {vac['chunks']} chunk sidecars")
    print(f"    -> manifest-core reads {reads['core']}, sidecar "
          f"reads {reads['chunk']} (distinct sidecars on disk after: "
          f"{n_sidecars})")

    # every tag must still resolve to a readable manifest
    bad = [n for n, s in V.list_refs(table).items()
           if not os.path.exists(V._manifest_path(table, s))]
    assert not bad, f"dangling refs after vacuum: {bad}"

    print()
    print(json.dumps({
        "n_files": N_FILES, "n_tags": N_TAGS,
        "n_branches": N_BRANCHES, "lineage": N_APPENDS,
        "t_vacuum_s": round(t_vac, 3),
        "core_reads": reads["core"],
        "sidecar_reads": reads["chunk"],
        "snapshots_reaped": len(vac["snapshots"]),
    }))


if __name__ == "__main__":
    main()
