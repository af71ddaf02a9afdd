#!/usr/bin/env python
"""Planning-cost measurement for CHUNKED manifests at the 1M-file
shape (round-5 follow-up to the round-4 100k-file study, which showed
the monolithic manifest's linear growth — 159 MB at 100k files —
made manifest partitioning the next lever).

Driver-only, no Spark: builds a synthetic 1M-file chunked table's
metadata with the REAL machinery (`_write_chunks`, `_publish`-shaped
core manifest, `prune_report`, `append_snapshot`'s publish path), then
times:

  * core manifest read (what EVERY planning pass pays);
  * clustered point/range planning — span check + only the surviving
    sidecar loads (the sub-2 s contract);
  * unclustered planning (spans useless, every sidecar loads) — the
    honest worst case;
  * appending one commit's metadata at 1M files (one new sidecar +
    core rewrite, never the table);
  * the monolithic-inline comparison at the same metadata.

Usage: python scripts/stress_manifest_chunks.py [WORK_DIR] [N_FILES]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

WORK = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_chunks"
N_FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
ROWS_PER_FILE = 1000  # clustered: file i covers [i*1000, i*1000+999]


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

    files = [f"{uuid.uuid4().hex}.parquet" for _ in range(N_FILES)]
    stats = {
        f: {"k": [i * ROWS_PER_FILE, (i + 1) * ROWS_PER_FILE - 1]}
        for i, f in enumerate(files)
    }
    file_seq = {f: 1 for f in files}

    _, t_build = timed(
        f"chunkify {N_FILES} files (one-time, write all sidecars)",
        lambda: V._write_chunks(table, files, stats, None, file_seq,
                                ["k"]))
    chunks = _
    core = {
        "snapshot": "00000001-stress", "parent": None,
        "rows": N_FILES * ROWS_PER_FILE, "reused_files": 0,
        "txn_id": None, "op": "overwrite", "new_files": [],
        "schema": None, "stats_cols": ["k"], "bloom_cols": None,
        "delete_files": None, "chunks": chunks,
    }
    V._atomic_write_json(V._manifest_path(table, core["snapshot"]),
                         core)
    with open(V._pointer_path(table), "w") as fh:
        fh.write(core["snapshot"])
    core_bytes = os.path.getsize(
        V._manifest_path(table, core["snapshot"]))
    side_bytes = sum(
        os.path.getsize(os.path.join(V._chunks_root(table), f))
        for f in os.listdir(V._chunks_root(table)))
    print(f"{'core manifest size':68s} {core_bytes/1e6:8.2f} MB")
    print(f"{'sidecar metadata total':68s} {side_bytes/1e6:8.2f} MB")
    print(f"{'chunks':68s} {len(chunks):8d}")

    _, t_core = timed("core manifest read (every planning pass)",
                      lambda: V._read_core(table, core["snapshot"]))

    key = (N_FILES // 2) * ROWS_PER_FILE + 17
    rep, t_point = timed(
        "CLUSTERED point-lookup planning (span check + loaded chunks)",
        lambda: V.prune_report(table, core["snapshot"],
                               [("k", "=", key)]))
    print(f"    -> kept {len(rep['kept'])}/{rep['total']} files, "
          f"loaded {rep['chunks_loaded']}/{rep['chunks_total']} chunks")

    rep, t_range = timed(
        "CLUSTERED range planning (~0.1% of the keyspace)",
        lambda: V.prune_report(
            table, core["snapshot"],
            [("k", ">=", key), ("k", "<=", key + N_FILES)]))
    print(f"    -> kept {len(rep['kept'])}/{rep['total']} files, "
          f"loaded {rep['chunks_loaded']}/{rep['chunks_total']} chunks")

    # Unclustered: every file spans the whole keyspace -> spans can't
    # rule any chunk out; planning degenerates to loading everything.
    unc_stats = {f: {"k": [0, N_FILES * ROWS_PER_FILE]} for f in files}
    unc_chunks = V._write_chunks(table, files, unc_stats, None,
                                 file_seq, ["k"])
    unc = dict(core, snapshot="00000002-stress", chunks=unc_chunks)
    V._atomic_write_json(V._manifest_path(table, unc["snapshot"]), unc)
    rep, t_unc = timed(
        "UNCLUSTERED point planning (spans useless: all chunks load)",
        lambda: V.prune_report(table, unc["snapshot"],
                               [("k", "=", key)]))
    print(f"    -> kept {len(rep['kept'])}/{rep['total']} files, "
          f"loaded {rep['chunks_loaded']}/{rep['chunks_total']} chunks")

    # Unclustered WITH per-file blooms: the r6 fix. Per-file blooms
    # ride the sidecars (as production _scan_blooms records them) and
    # each chunk gets the bit-sliced .blm matrix; a point probe reads
    # K=3 rows per chunk instead of parsing sidecar JSON. Blooms are
    # synthesized vectorized (same hash/canonical text as _bloom_b64 —
    # equivalence asserted below) so the script stays driver-only.
    import base64

    import numpy as np
    import pandas as pd

    KEYS_PER_FILE = 50
    M_BITS = 4096  # _bloom_m_bits(50)
    rng = np.random.default_rng(42)
    keyspace = N_FILES * ROWS_PER_FILE
    keymat = rng.integers(0, keyspace, size=(N_FILES, KEYS_PER_FILE))

    def synth_blooms():
        s = pd.Series(keymat.ravel()).astype(str)
        h = pd.util.hash_pandas_object(
            s, index=False, categorize=False).to_numpy(dtype=np.uint64)
        h1 = h & np.uint64(0xFFFFFFFF)
        h2 = (h >> np.uint64(32)) | np.uint64(1)
        big = np.zeros((N_FILES, M_BITS // 8), dtype=np.uint8)
        rows = np.repeat(np.arange(N_FILES, dtype=np.int64),
                         KEYS_PER_FILE)
        for i in range(V._BLOOM_K):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(M_BITS)
            np.bitwise_or.at(
                big, (rows, (pos // 8).astype(np.int64)),
                np.left_shift(np.uint8(1),
                              (pos % 8).astype(np.uint8)))
        return {
            f: {"k": base64.b64encode(big[j].tobytes()).decode()}
            for j, f in enumerate(files)
        }

    blooms, t_synth = timed(
        f"synthesize {N_FILES} per-file blooms "
        f"({KEYS_PER_FILE} keys/file, vectorized)", synth_blooms)
    # equivalence spot-check vs the real builder
    ref = V._bloom_b64(pd.Series(keymat[0]).astype(str), False)
    assert blooms[files[0]]["k"] == ref, "synthetic bloom diverged"

    blm_chunks, t_blm_build = timed(
        "chunkify with blooms (sidecars + bit-sliced .blm, one-time)",
        lambda: V._write_chunks(table, files, unc_stats, blooms,
                                file_seq, ["k"]))
    blm = dict(core, snapshot="00000004-stress", chunks=blm_chunks,
               bloom_cols=["k"])
    V._atomic_write_json(V._manifest_path(table, blm["snapshot"]), blm)
    blm_bytes = sum(
        os.path.getsize(os.path.join(V._chunks_root(table), f))
        for f in os.listdir(V._chunks_root(table))
        if f.endswith(".blm"))
    print(f"{'bit-sliced .blm total':68s} {blm_bytes/1e6:8.2f} MB")

    probe_key = int(keymat[N_FILES // 2, 0])
    rep, t_unc_blm = timed(
        "UNCLUSTERED point planning, bit-sliced chunk blooms (r6)",
        lambda: V.prune_report(table, blm["snapshot"],
                               [("k", "=", probe_key)]))
    print(f"    -> kept {len(rep['kept'])}/{rep['total']} files, "
          f"loaded {rep['chunks_loaded']} sidecars, probed "
          f"{rep['chunks_blm_probed']}/{rep['chunks_total']} .blm")
    assert files[N_FILES // 2] in rep["kept"], "probe missed true file"
    kept_point_blm = len(rep["kept"])

    batch = [int(keymat[j, 0]) for j in range(0, N_FILES,
                                              max(1, N_FILES // 8))][:8]
    rep, t_unc_blm_in = timed(
        "UNCLUSTERED 8-key IN planning, bit-sliced chunk blooms",
        lambda: V.prune_report(table, blm["snapshot"],
                               [("k", "in", batch)]))
    print(f"    -> kept {len(rep['kept'])}/{rep['total']} files, "
          f"loaded {rep['chunks_loaded']} sidecars")

    # Append metadata cost at 1M files: one sidecar + core rewrite.
    new = [f"{uuid.uuid4().hex}.parquet" for _ in range(4)]
    _, t_append = timed(
        "append publish metadata at 1M files (chunk-reuse fast path)",
        lambda: V._publish(
            table, new, core["rows"] + 4000, core["snapshot"],
            N_FILES, op="append", new_files=new,
            stats={f: {"k": [0, 10]} for f in new},
            stats_cols=["k"], parent_chunks=core["chunks"]))

    # Monolithic comparison: the same metadata inline, as round 4
    # shipped it — parse + prune cost at 1M files.
    mono = dict(core, snapshot="00000003-stress")
    mono.pop("chunks")
    mono.update({"files": files, "stats": stats, "blooms": None,
                 "file_seq": file_seq})
    V._atomic_write_json(V._manifest_path(table, mono["snapshot"]),
                         mono)
    mono_bytes = os.path.getsize(
        V._manifest_path(table, mono["snapshot"]))
    print(f"{'monolithic manifest size (r4 format)':68s} "
          f"{mono_bytes/1e6:8.2f} MB")
    rep, t_mono = timed(
        "monolithic point planning (parse whole manifest + prune)",
        lambda: V.prune_report(table, mono["snapshot"],
                               [("k", "=", key)]))

    print()
    print(json.dumps({
        "n_files": N_FILES,
        "chunk_size": V._MANIFEST_CHUNK_SIZE,
        "core_mb": round(core_bytes / 1e6, 2),
        "sidecars_mb": round(side_bytes / 1e6, 2),
        "monolithic_mb": round(mono_bytes / 1e6, 2),
        "t_build_s": round(t_build, 3),
        "t_core_read_s": round(t_core, 3),
        "t_point_clustered_s": round(t_point, 3),
        "t_range_clustered_s": round(t_range, 3),
        "t_point_unclustered_s": round(t_unc, 3),
        "blm_mb": round(blm_bytes / 1e6, 2),
        "t_point_unclustered_blm_s": round(t_unc_blm, 3),
        "t_in8_unclustered_blm_s": round(t_unc_blm_in, 3),
        "kept_point_unclustered_blm": kept_point_blm,
        "t_append_publish_s": round(t_append, 3),
        "t_point_monolithic_s": round(t_mono, 3),
    }))


if __name__ == "__main__":
    main()
