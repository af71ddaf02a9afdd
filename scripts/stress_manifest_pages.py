#!/usr/bin/env python
"""Paged-core planning cost at the 4M-file shape (VERDICT r06 #4 —
"manifest partitioning past ~1M files").

Driver-only, no Spark: builds ONE set of 4M synthetic per-file
metadata (clustered stats + per-file blooms) with the real machinery,
then publishes it twice over the SAME chunk sidecars —

  * FLAT: the r5/r6 core shape, every descriptor inline;
  * PAGED: `_fold_pages` folds descriptors into immutable page files,
    the core keeps page refs + a loose tail (the r7 shape that
    activates automatically past `_CORE_PAGE_FOLD_AT` descriptors)

— and times planning on both, plus the paged append / tombstone
publish costs. The questions the verdict asks at this scale:
does planning stay sub-second, and how do metadata bytes grow?

Usage: python scripts/stress_manifest_pages.py [WORK_DIR] [N_FILES]
"""

from __future__ import annotations

import base64
import json
import os
import shutil
import sys
import time
import uuid

WORK = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_pages"
N_FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
ROWS_PER_FILE = 1000
KEYS_PER_FILE = 50
M_BITS = 4096  # _bloom_m_bits(50)
SLAB = 250_000  # bloom-synthesis slab (bounds peak memory)


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:68s} {dt:8.3f} s", flush=True)
    return out, dt


def main() -> None:
    sys.path.insert(0, "/root/repo")
    import numpy as np
    import pandas as pd

    from mc_ns_data_pipeline_spark.sinks import versioned as V

    # smoke-scale override: force folding at toy descriptor counts
    if os.environ.get("STRESS_PAGE_DESCS"):
        V._CORE_PAGE_DESCS = int(os.environ["STRESS_PAGE_DESCS"])
        V._CORE_PAGE_FOLD_AT = V._CORE_PAGE_DESCS + 1

    shutil.rmtree(WORK, ignore_errors=True)
    table = os.path.join(WORK, "tbl")
    os.makedirs(V._snapshots_root(table), exist_ok=True)

    files = [f"{uuid.uuid4().hex}.parquet" for _ in range(N_FILES)]
    # clustered stats: file i covers [i*1000, i*1000+999]
    stats = {
        f: {"k": [i * ROWS_PER_FILE, (i + 1) * ROWS_PER_FILE - 1]}
        for i, f in enumerate(files)
    }
    file_seq = {f: 1 for f in files}

    # per-file blooms over UNCLUSTERED keys, synthesized in slabs
    # (same hash/canonical text as _bloom_b64; equivalence asserted)
    rng = np.random.default_rng(42)
    keyspace = N_FILES * ROWS_PER_FILE
    first_keys = np.zeros(N_FILES, dtype=np.int64)
    file0_keys: list = []

    def synth_blooms():
        out = {}
        for lo in range(0, N_FILES, SLAB):
            hi = min(lo + SLAB, N_FILES)
            n = hi - lo
            keymat = rng.integers(0, keyspace,
                                  size=(n, KEYS_PER_FILE))
            # keep blooms CONSISTENT with the clustered stats: each
            # file's bloom also holds its own range's probe key, so
            # the clustered point study (span cut -> sidecar prune,
            # blooms consulted) still keeps its true file
            keymat[:, -1] = (np.arange(lo, hi, dtype=np.int64)
                             * ROWS_PER_FILE + 17)
            if lo == 0:
                file0_keys.extend(keymat[0].tolist())
            first_keys[lo:hi] = keymat[:, 0]
            s = pd.Series(keymat.ravel()).astype(str)
            h = pd.util.hash_pandas_object(
                s, index=False,
                categorize=False).to_numpy(dtype=np.uint64)
            h1 = h & np.uint64(0xFFFFFFFF)
            h2 = (h >> np.uint64(32)) | np.uint64(1)
            big = np.zeros((n, M_BITS // 8), dtype=np.uint8)
            rows = np.repeat(np.arange(n, dtype=np.int64),
                             KEYS_PER_FILE)
            for i in range(V._BLOOM_K):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(M_BITS)
                np.bitwise_or.at(
                    big, (rows, (pos // 8).astype(np.int64)),
                    np.left_shift(np.uint8(1),
                                  (pos % 8).astype(np.uint8)))
            for j in range(n):
                out[files[lo + j]] = {
                    "k": base64.b64encode(big[j].tobytes()).decode()}
        return out

    blooms, t_synth = timed(
        f"synthesize {N_FILES} per-file blooms (slabbed)", synth_blooms)
    ref = V._bloom_b64(pd.Series(file0_keys).astype(str), False)
    assert blooms[files[0]]["k"] == ref, "synthetic bloom diverged"

    descs, t_build = timed(
        f"chunkify {N_FILES} files (sidecars + .blm, one-time)",
        lambda: V._write_chunks(table, files, stats, blooms,
                                file_seq, ["k"]))
    print(f"{'chunk descriptors':68s} {len(descs):8d}")
    side_bytes = sum(
        os.path.getsize(os.path.join(V._chunks_root(table), f))
        for f in os.listdir(V._chunks_root(table))
        if f.endswith(".json"))
    blm_bytes = sum(
        os.path.getsize(os.path.join(V._chunks_root(table), f))
        for f in os.listdir(V._chunks_root(table))
        if f.endswith(".blm"))
    print(f"{'sidecar JSON total':68s} {side_bytes/1e6:8.2f} MB")
    print(f"{'bit-sliced .blm total':68s} {blm_bytes/1e6:8.2f} MB")

    # The synthetic stats are CLUSTERED ranges while the synthetic
    # blooms hold UNCLUSTERED random keys (two independent studies
    # over one set of sidecars): span planning runs with bloom_cols
    # off, .blm planning with it on — a real table's metadata is
    # consistent and planning composes both cuts.
    base = {
        "parent": None, "rows": N_FILES * ROWS_PER_FILE,
        "reused_files": 0, "txn_id": None, "op": "overwrite",
        "new_files": [], "schema": None, "stats_cols": ["k"],
        "bloom_cols": None, "delete_files": None,
    }

    # FLAT core (r6 shape): every descriptor inline
    flat = dict(base, snapshot="00000001-flat", chunks=descs)
    V._atomic_write_json(V._manifest_path(table, flat["snapshot"]),
                         flat)
    # the .blm study strips spans (an unclustered table's spans are
    # useless) — descriptors share the SAME sidecars/.blm by chunk id
    blm_descs = [{**ch, "spans": None} for ch in descs]
    flat_blm = dict(base, snapshot="00000003-flatblm",
                    chunks=blm_descs, bloom_cols=["k"])
    V._atomic_write_json(
        V._manifest_path(table, flat_blm["snapshot"]), flat_blm)
    flat_bytes = os.path.getsize(
        V._manifest_path(table, flat["snapshot"]))

    # PAGED core (r7 shape): fold through the real publish helper
    (pages, tail), t_fold = timed(
        "fold descriptors into pages (one-time)",
        lambda: V._fold_pages(table, [], list(descs)))
    paged = dict(base, snapshot="00000002-paged", chunks=tail,
                 pages=pages)
    V._atomic_write_json(V._manifest_path(table, paged["snapshot"]),
                         paged)
    blm_pages, blm_tail = V._fold_pages(table, [], list(blm_descs))
    paged_blm = dict(base, snapshot="00000004-pagedblm",
                     chunks=blm_tail, pages=blm_pages,
                     bloom_cols=["k"])
    V._atomic_write_json(
        V._manifest_path(table, paged_blm["snapshot"]), paged_blm)
    with open(V._pointer_path(table), "w") as fh:
        fh.write(paged["snapshot"])
    paged_bytes = os.path.getsize(
        V._manifest_path(table, paged["snapshot"]))
    page_bytes = (sum(
        os.path.getsize(os.path.join(V._pages_root(table), f))
        for f in os.listdir(V._pages_root(table)))
        if os.path.isdir(V._pages_root(table)) else 0)
    print(f"{'FLAT core size':68s} {flat_bytes/1e6:8.2f} MB")
    print(f"{'PAGED core size':68s} {paged_bytes/1e6:8.4f} MB")
    print(f"{'page files total':68s} {page_bytes/1e6:8.2f} MB "
          f"({len(pages)} pages + {len(tail)} tail descs)")

    results = {"n_files": N_FILES, "chunks": len(descs),
               "pages": len(pages),
               "flat_core_mb": round(flat_bytes / 1e6, 2),
               "paged_core_mb": round(paged_bytes / 1e6, 4),
               "pages_mb": round(page_bytes / 1e6, 2),
               "sidecars_mb": round(side_bytes / 1e6, 2),
               "blm_mb": round(blm_bytes / 1e6, 2)}

    key = (N_FILES // 2) * ROWS_PER_FILE + 17
    for name, snap, blm_snap in (
            ("flat", flat["snapshot"], flat_blm["snapshot"]),
            ("paged", paged["snapshot"], paged_blm["snapshot"])):
        V._PAGE_CACHE.clear()
        _, t_core = timed(f"[{name}] core read (every planning pass)",
                          lambda: V._read_core(table, snap))
        V._PAGE_CACHE.clear()
        rep, t_point = timed(
            f"[{name}] CLUSTERED point planning (cold page cache)",
            lambda: V.prune_report(table, snap, [("k", "=", key)]))
        print(f"    -> kept {len(rep['kept'])}/{rep['total']}, "
              f"pages {rep.get('pages_loaded', '-')}/"
              f"{rep.get('pages_total', '-')}, sidecars "
              f"{rep['chunks_loaded']}/{rep['chunks_total']}")
        assert files[N_FILES // 2] in rep["kept"]
        rep, t_range = timed(
            f"[{name}] CLUSTERED range planning (~0.1% keyspace)",
            lambda: V.prune_report(
                table, snap,
                [("k", ">=", key), ("k", "<=", key + N_FILES)]))
        print(f"    -> kept {len(rep['kept'])}/{rep['total']}, "
              f"pages {rep.get('pages_loaded', '-')}/"
              f"{rep.get('pages_total', '-')}, sidecars "
              f"{rep['chunks_loaded']}/{rep['chunks_total']}")
        probe_key = int(first_keys[N_FILES // 2])
        rep, t_blm = timed(
            f"[{name}] UNCLUSTERED-key point planning (.blm probes)",
            lambda: V.prune_report(table, blm_snap,
                                   [("k", "=", probe_key)]))
        print(f"    -> kept {len(rep['kept'])}/{rep['total']}, "
              f"probed {rep['chunks_blm_probed']}, sidecars "
              f"{rep['chunks_loaded']}")
        results[f"{name}_core_read_s"] = round(t_core, 3)
        results[f"{name}_point_clustered_s"] = round(t_point, 3)
        results[f"{name}_range_clustered_s"] = round(t_range, 3)
        results[f"{name}_point_blm_s"] = round(t_blm, 3)

    # warm-cache repeat on the paged core (steady-state planner)
    rep, t_warm = timed(
        "[paged] CLUSTERED point planning (warm page cache)",
        lambda: V.prune_report(table, paged["snapshot"],
                               [("k", "=", key)]))
    results["paged_point_clustered_warm_s"] = round(t_warm, 3)

    # append publish at 4M files: page refs reused verbatim
    new = [f"{uuid.uuid4().hex}.parquet" for _ in range(4)]
    _, t_append = timed(
        "[paged] append publish metadata (page-ref reuse fast path)",
        lambda: V._publish(
            table, new, paged["rows"] + 4000, paged["snapshot"],
            N_FILES, op="append", new_files=new,
            stats={f: {"k": [0, 10]} for f in new},
            stats_cols=["k"], parent_chunks=tail,
            parent_pages=pages))
    results["paged_append_publish_s"] = round(t_append, 3)

    print()
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
