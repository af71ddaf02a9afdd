"""Paged cores (VERDICT r06 #4): past `_CORE_PAGE_FOLD_AT` chunk
descriptors the core manifest folds runs of `_CORE_PAGE_DESCS`
descriptors into immutable PAGE files and keeps only page refs (id,
live count, union span per stats column) plus a loose tail. This is
the manifest-list level above the chunk sidecars: the core stays
KB-sized at any file count, planning's span check rules whole PAGES
out before a descriptor is parsed, appends reuse page refs with zero
loads, COW tombstones dissolve only the pages holding an affected
chunk, and vacuum refcounts page files like chunk sidecars. These
tests force paging at toy thresholds and assert identical answers to
the flat path plus the metadata-cost contracts."""

from __future__ import annotations

import os
import threading

import pytest

from mc_ns_data_pipeline_spark.sinks import versioned as V


@pytest.fixture
def tiny_pages(monkeypatch):
    """Page everything: chunk at 4 files/sidecar past 6 files, fold
    the descriptor tail into 3-descriptor pages past 4 descriptors —
    a 40-file toy table then exercises the real two-level machinery."""
    monkeypatch.setattr(V, "_MANIFEST_CHUNK_FILES", 6)
    monkeypatch.setattr(V, "_MANIFEST_CHUNK_SIZE", 4)
    monkeypatch.setattr(V, "_CORE_PAGE_DESCS", 3)
    monkeypatch.setattr(V, "_CORE_PAGE_FOLD_AT", 4)


class _Reads:
    """Count chunk-sidecar and page loads through the module seams."""

    def __init__(self, monkeypatch):
        self.chunks = 0
        self.pages = 0
        oc, op_ = V._read_chunk, V._read_page

        def c(table, cid):
            self.chunks += 1
            return oc(table, cid)

        def p(table, pid):
            self.pages += 1
            return op_(table, pid)

        monkeypatch.setattr(V, "_read_chunk", c)
        monkeypatch.setattr(V, "_read_page", p)


def _clustered(spark, n=200, parts=10, base=0, tag="v"):
    return (
        spark.createDataFrame(
            [(base + i, f"{tag}{base + i}") for i in range(n)],
            "k int, v string")
        .repartitionByRange(parts, "k")
    )


def _fresh_cache():
    V._PAGE_CACHE.clear()


def test_fold_activates_and_roundtrips(spark, tmp_path, tiny_pages):
    _fresh_cache()
    table = str(tmp_path / "t")
    # 40 files -> 10 chunk descriptors -> fold: 3 pages of 3 + tail 1
    snap = V.write_snapshot(_clustered(spark, 400, 40), table,
                            stats_cols=["k"])
    core = V._read_core(table, snap)
    assert "pages" in core and "chunks" in core
    assert [pg["k"] for pg in core["pages"]] == [3, 3, 3]
    assert len(core["chunks"]) == 1  # loose tail
    assert all(pg["spans"] and "k" in pg["spans"]
               for pg in core["pages"])
    assert V._chunk_file_count(core) == 40
    man = V.read_manifest(table, snap)
    assert len(man["files"]) == 40
    assert set(man["stats"]) == set(man["files"])
    assert V.read_current(spark, table).count() == 400
    # page files exist on disk and are refcounted by id
    proot = V._pages_root(table)
    assert sorted(f"{pg['id']}.json" for pg in core["pages"]) == \
        sorted(os.listdir(proot))


def test_page_span_prune_loads_one_page(spark, tmp_path, tiny_pages,
                                        monkeypatch):
    _fresh_cache()
    table = str(tmp_path / "t")
    snap = V.write_snapshot(_clustered(spark, 400, 40), table,
                            stats_cols=["k"])
    reads = _Reads(monkeypatch)
    rep = V.prune_report(table, snap, [("k", "=", 7)])
    assert rep["pages_total"] == 3
    assert rep["pages_loaded"] == 1  # clustered: one page survives
    assert reads.pages == 1
    assert rep["chunks_loaded"] == 1  # ... and one sidecar inside it
    got = V.read_current(spark, table, predicates=[("k", "=", 7)])
    assert [r.v for r in got.collect()] == ["v7"]
    # range across a page boundary still exact
    got = V.read_current(spark, table, predicates=[("k", ">=", 395)])
    assert sorted(r.k for r in got.collect()) == list(range(395, 400))


def test_append_reuses_page_refs_zero_loads(spark, tmp_path,
                                            tiny_pages, monkeypatch):
    _fresh_cache()
    table = str(tmp_path / "t")
    snap = V.write_snapshot(_clustered(spark, 400, 40), table,
                            stats_cols=["k"])
    before = V._read_core(table, snap)
    reads = _Reads(monkeypatch)
    V.append_snapshot(_clustered(spark, 4, 1, base=1000), table)
    assert reads.chunks == 0 and reads.pages == 0, (
        "append on a paged table must not load any page or sidecar")
    after = V._read_core(table, V.current_snapshot(table))
    assert [pg["id"] for pg in after["pages"]] == \
        [pg["id"] for pg in before["pages"]]  # refs verbatim
    assert len(after["chunks"]) == len(before["chunks"]) + 1
    assert V.read_current(spark, table).count() == 404


def test_append_folds_overflowing_tail(spark, tmp_path, tiny_pages):
    _fresh_cache()
    table = str(tmp_path / "t")
    V.write_snapshot(_clustered(spark, 400, 40), table,
                     stats_cols=["k"])  # 3 pages + tail of 1
    for j in range(4):  # tail grows 2..5 -> fold fires past 4
        V.append_snapshot(
            _clustered(spark, 8, 2, base=1000 + 100 * j), table)
    core = V._read_core(table, V.current_snapshot(table))
    assert len(core["pages"]) > 3  # the tail refolded
    assert len(core["chunks"]) <= 4
    assert V._chunk_file_count(core) == 40 + 4 * 2
    assert V.read_current(spark, table).count() == 400 + 4 * 8


def test_cow_merge_dissolves_only_affected_page(spark, tmp_path,
                                                tiny_pages):
    _fresh_cache()
    table = str(tmp_path / "t")
    snap = V.write_snapshot(_clustered(spark, 400, 40), table,
                            stats_cols=["k"])
    before = {pg["id"] for pg in V._read_core(table, snap)["pages"]}
    # keys 0..9 live in the first page's chunks only
    V.merge_snapshot(
        spark,
        spark.createDataFrame([(i, "upd") for i in range(10)],
                              "k int, v string"),
        table, key="k")
    core = V._read_core(table, V.current_snapshot(table))
    after = {pg["id"] for pg in core.get("pages") or []}
    # the affected page dissolved (its descs refold under fresh ids);
    # every other page ref is reused verbatim — never the whole table
    assert len(before - after) >= 1
    assert len(before & after) >= len(before) - 2
    got = {r.k: r.v for r in V.read_current(spark, table).collect()}
    assert len(got) == 400
    assert all(got[i] == "upd" for i in range(10))
    assert got[399] == "v399"
    assert V._chunk_file_count(core) == len(
        V.read_manifest(table, V.current_snapshot(table))["files"])


def test_vacuum_reaps_unreferenced_pages(spark, tmp_path, tiny_pages):
    _fresh_cache()
    table = str(tmp_path / "t")
    V.write_snapshot(_clustered(spark, 400, 40), table,
                     stats_cols=["k"])
    V.merge_snapshot(
        spark,
        spark.createDataFrame([(i, "upd") for i in range(10)],
                              "k int, v string"),
        table, key="k")
    live = {pg["id"] for pg in V._read_core(
        table, V.current_snapshot(table)).get("pages") or []}
    rep = V.vacuum_snapshots(table, keep=1, min_age_seconds=None,
                             staging_age_seconds=0.0)
    assert rep["pages"] >= 1  # the dissolved page's file reaped
    proot = V._pages_root(table)
    assert {f[:-5] for f in os.listdir(proot)
            if f.endswith(".json")} == live
    got = {r.k: r.v for r in V.read_current(spark, table).collect()}
    assert len(got) == 400 and got[0] == "upd"


def test_optimistic_cow_rebases_over_folded_append(spark, tmp_path,
                                                   tiny_pages,
                                                   monkeypatch):
    """A COW delete stages against a paged base; an append that
    triggers a FOLD interposes before the publish. The rebase guard
    must find the interposed append's files inside the NEW page (not
    only the tail) — key-disjoint: rides along; overlapping: would
    conflict (covered by the flat-path suite)."""
    _fresh_cache()
    table = str(tmp_path / "t")
    V.write_snapshot(_clustered(spark, 400, 40), table,
                     stats_cols=["k"])
    # grow the tail to the fold boundary so the interposed append folds
    for j in range(3):
        V.append_snapshot(
            _clustered(spark, 4, 1, base=1000 + 100 * j), table)

    landed = threading.Event()
    resume = threading.Event()
    orig = V._land_in_pool
    armed = [True]

    def pausing(df, t):
        names = orig(df, t)
        if armed[0]:
            armed[0] = False
            landed.set()
            assert resume.wait(60)
        return names

    monkeypatch.setattr(V, "_land_in_pool", pausing)
    err: list[Exception] = []

    def deleter():
        try:
            V.delete_keys_snapshot(
                spark, table, "k",
                spark.createDataFrame([(i,) for i in range(5)],
                                      "k int"))
        except Exception as e:
            err.append(e)

    t = threading.Thread(target=deleter)
    t.start()
    assert landed.wait(60)
    pre = V._read_core(table, V.current_snapshot(table))
    V.append_snapshot(_clustered(spark, 4, 1, base=5000), table)
    mid = V._read_core(table, V.current_snapshot(table))
    assert len(mid.get("pages") or []) > len(pre.get("pages") or []), (
        "test setup: the interposed append was supposed to fold")
    resume.set()
    t.join(60)
    assert not err, err
    got = {r.k for r in V.read_current(spark, table).collect()}
    assert not (got & set(range(5)))
    assert {5000, 5001, 5002, 5003} <= got  # interposed rows rode along
    assert len(got) == 400 - 5 + 12 + 4


def test_union_spans_algebra():
    u = V._union_spans
    assert u([{"spans": {"k": [1, 5]}}, {"spans": {"k": [3, 9]}}]) \
        == {"k": [1, 9]}
    # any member without spans: page never skippable
    assert u([{"spans": None}, {"spans": {"k": [1, 2]}}]) is None
    # a member missing the column, or with span None: column dead
    assert u([{"spans": {"k": [1, 2]}}, {"spans": {}}]) == {"k": None}
    assert u([{"spans": {"k": None}}, {"spans": {"k": [1, 2]}}]) \
        == {"k": None}
    # all-NULL members contribute nothing; an all-NULL page skippable
    assert u([{"spans": {"k": [None, None]}},
              {"spans": {"k": [None, None]}}]) == {"k": [None, None]}
    assert u([{"spans": {"k": [None, None]}},
              {"spans": {"k": [4, 6]}}]) == {"k": [4, 6]}
    # mixed-type bounds stay conservative
    assert u([{"spans": {"k": [1, 2]}}, {"spans": {"k": ["a", "b"]}}]
             ) == {"k": None}


def test_page_span_soundness_property():
    """If any member chunk survives a predicate, the page must. Tiny
    randomized net over int spans and point/range predicates."""
    import random
    rnd = random.Random(7)
    for _ in range(300):
        descs = []
        for _ in range(rnd.randint(1, 6)):
            lo = rnd.randint(-20, 20)
            hi = lo + rnd.randint(0, 15)
            descs.append({"spans": {"k": [lo, hi]},
                          "n": 1, "id": "x"})
        pg = {"spans": V._union_spans(descs)}
        op = rnd.choice(["=", "<", "<=", ">", ">="])
        val = rnd.randint(-25, 25)
        preds = [("k", op, val)]
        member_alive = any(V._chunk_survives(ch, preds)
                           for ch in descs)
        if member_alive:
            assert V._page_survives(pg, preds), (descs, preds)


def test_paged_blm_point_plan_no_sidecar_loads(spark, tmp_path,
                                               tiny_pages,
                                               monkeypatch):
    """Pure-equality planning on a paged UNCLUSTERED table: the .blm
    row reads decide every chunk, no sidecar JSON is parsed, and the
    page cut still reports its counters."""
    _fresh_cache()
    table = str(tmp_path / "t")
    df = (spark.createDataFrame(
        [(i, f"v{i}") for i in range(400)], "k int, v string")
        .repartition(40))  # arrival-order: spans can't prune
    snap = V.write_snapshot(df, table, stats_cols=["k"],
                            bloom_cols=["k"])
    core = V._read_core(table, snap)
    assert "pages" in core
    reads = _Reads(monkeypatch)
    rep = V.prune_report(table, snap, [("k", "=", 7)])
    assert reads.chunks == 0, "pure-eq plan must not parse sidecars"
    assert rep["pages_loaded"] == rep["pages_total"]  # unclustered
    assert rep["chunks_blm_probed"] >= 1
    got = V.read_current(spark, table, predicates=[("k", "=", 7)])
    assert [r.v for r in got.collect()] == ["v7"]


def test_mixed_predicate_plan_still_counts_blm_probes(
        spark, tmp_path, tiny_pages):
    """chunks_blm_probed must count conclusive probes on the
    RESIDUAL-predicate path too (r7 review regression: the refactor
    returned did_probe=0 whenever a sidecar was also loaded)."""
    _fresh_cache()
    table = str(tmp_path / "t")
    df = (spark.createDataFrame(
        [(i, i % 7, f"v{i}") for i in range(400)],
        "k int, grp int, v string").repartition(40))
    snap = V.write_snapshot(df, table, stats_cols=["k", "grp"],
                            bloom_cols=["k"])
    rep = V.prune_report(table, snap,
                         [("k", "=", 7), ("grp", ">=", 0)])
    assert rep["chunks_blm_probed"] >= 1
    got = V.read_current(spark, table,
                         predicates=[("k", "=", 7),
                                     ("grp", ">=", 0)])
    assert [r.v for r in got.collect()] == ["v7"]
