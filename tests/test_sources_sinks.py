"""Sources/sinks/operators unit tests (S1-S9, K1-K11, J9 semantics)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mc_ns_data_pipeline_spark.operators.joins import anti_join_processed
from mc_ns_data_pipeline_spark.operators.projections import (
    contract_project,
    id_range,
)
from mc_ns_data_pipeline_spark.sinks.files import write_per_lot, write_report
from mc_ns_data_pipeline_spark.sources import rest
from mc_ns_data_pipeline_spark.sources.state import (
    last_processed_epoch,
    read_checkpoint,
    read_status_log,
    write_checkpoint,
)

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
])

_PAGES = [
    {"content": [{"id": i, "name": f"r{i}"} for i in range(1000)]},
    {"pageResult": {"content": [{"id": 1000, "name": "r1000"}]}, "last": True},
]


def _fetch_page(page: int) -> dict:
    return _PAGES[page] if page < len(_PAGES) else {"content": []}


def test_fetch_paginated_both_shapes():
    rows = rest.fetch_paginated(_fetch_page)
    assert len(rows) == 1001
    assert rows[-1] == {"id": 1000, "name": "r1000"}


def test_fetch_paginated_nested_last_stops():
    """`last` inside pageResult must terminate pagination — a server
    that 404s past the end would otherwise lose the accumulated rows."""
    calls = {"n": 0}

    def nested(page: int) -> dict:
        calls["n"] += 1
        if page > 0:
            raise FileNotFoundError("404 past the end")
        return {
            "pageResult": {
                "content": [{"id": i, "name": f"r{i}"} for i in range(1000)],
                "last": True,
            }
        }

    rows = rest.fetch_paginated(nested)
    assert len(rows) == 1000
    assert calls["n"] == 1  # stopped on nested last, no extra fetch


def test_fetch_paginated_small_page_server_not_truncated():
    """A server paging at fewer items than the reference's 1000 (and
    sending no `last` flag) must still return every record: a
    hard-coded short-page heuristic would stop after page 0. The
    short-page shortcut only applies when the caller declares the
    server's page size."""
    from mc_ns_data_pipeline_spark.sources.rest_fixture import fetch_page

    rows = rest.fetch_paginated(fetch_page)  # fixture pages at 5
    assert len(rows) == 57

    calls = {"n": 0}

    def counted(page: int) -> dict:
        calls["n"] += 1
        return fetch_page(page)

    # declaring the page size enables the short-page early stop: the
    # final short page (57 = 11*5 + 2) terminates without probing 12
    assert len(rest.fetch_paginated(counted, page_size=5)) == 57
    assert calls["n"] == 12


def test_fetch_retries():
    calls = {"n": 0}

    def flaky(page: int) -> dict:
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("boom")
        return {"content": [], "last": True}

    assert rest.fetch_paginated(flaky) == []
    assert calls["n"] == 3

    def always_fails(page: int) -> dict:
        raise ConnectionError("down")

    with pytest.raises(ConnectionError):
        rest.with_retries(always_fails, 0, delay_s=0.0)


def test_retries_fail_fast_on_signature_mismatch():
    """A sort param pushed at a plain (page)->dict fetcher is a
    programming error — surface the TypeError on attempt 1 instead of
    sleeping through retries (ADVICE r3)."""
    calls = {"n": 0}

    def plain(page: int) -> dict:
        calls["n"] += 1
        return {"content": [], "last": True}

    with pytest.raises(TypeError):
        rest.with_retries(plain, 0, sortColumn="create_date")
    assert calls["n"] == 0  # raised at call binding, never retried


def test_fetch_distributed(spark):
    pages = _PAGES  # captured by value (cloudpickle) for executors
    df = rest.fetch_distributed(
        spark, n_pages=2,
        fetch_page=lambda p: pages[p] if p < len(pages) else {"content": []},
        schema=SCHEMA,
    )
    assert df.count() == 1001
    assert df.schema == SCHEMA
    assert df.agg(F.max("id")).first()[0] == 1000


def test_records_to_df_empty_and_nested(spark):
    assert rest.records_to_df(spark, [], SCHEMA).count() == 0
    df = rest.records_to_df(spark, [{"id": 1, "name": "x", "extra": True}], SCHEMA)
    assert [tuple(r) for r in df.collect()] == [(1, "x")]


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt.json")
    assert read_checkpoint(path) == {"last_processed_id": -1, "timestamp": None}
    write_checkpoint(path, 42, "2026-01-01T00:00:00")
    assert read_checkpoint(path)["last_processed_id"] == 42


def test_status_log_fallback_and_anti_join(spark, tmp_path):
    log = read_status_log(spark, str(tmp_path / "nope.csv"))
    assert log.count() == 0  # empty-with-schema fallback
    status = spark.createDataFrame(
        [(1, "L1", "Success", ""), (2, "L2", "Fail", "err"), (3, "L3", "Success", "")],
        "production_record_id long, lot_number string, status string, reason string",
    )
    ids = id_range(spark, 1, 5, "production_record_id")
    remaining = anti_join_processed(ids, status)
    assert sorted(r[0] for r in remaining.collect()) == [2, 4, 5]


def test_window_log_epoch(spark, tmp_path):
    assert last_processed_epoch(spark, str(tmp_path / "nope.csv"), 1741564801) \
        == 1741564801
    p = tmp_path / "win.csv"
    p.write_text(
        "start_datetime,end_datetime,start_epoch,end_epoch\n"
        "a,b,100,200\nc,d,200,300\n"
    )
    assert last_processed_epoch(spark, str(p), 0) == 300


def test_write_per_lot_partitions(spark, tmp_path):
    df = spark.createDataFrame(
        [("L1", "x"), ("L2", "y")], "`Lot Number` string, v string"
    )
    out = str(tmp_path / "lots_out")
    write_per_lot(df, out)
    dirs = {d for d in os.listdir(out) if d.startswith("lot_number=")}
    assert dirs == {"lot_number=L1", "lot_number=L2"}


def test_write_report_sanitizes(spark, tmp_path):
    df = spark.createDataFrame([("a,b", 1)], "msg string, n int")
    out = str(tmp_path / "report")
    write_report([df], out)
    files = [f for f in os.listdir(f"{out}/section_0") if f.endswith(".csv")]
    body = open(f"{out}/section_0/{files[0]}").read()
    assert "a;b" in body and "a,b" not in body


def test_recent_report_window_and_order(spark, tmp_path):
    """P14+O2: 7-day as_of window + desc order, wired through the K11
    report sink (reference reporting.py: GET_RECENT_PROCESSING_HISTORY
    -> CSV report)."""
    from datetime import datetime

    from mc_ns_data_pipeline_spark.sinks.audit import recent_report

    df = spark.createDataFrame(
        [
            ("old", datetime(2024, 1, 1, 12)),
            ("edge_out", datetime(2024, 1, 8, 12)),   # exactly 7d before
            ("in_a", datetime(2024, 1, 10, 0)),
            ("in_b", datetime(2024, 1, 15, 11)),
        ],
        "name string, processed_at timestamp",
    )
    rep = recent_report(
        df, as_of=F.lit(datetime(2024, 1, 15, 12)).cast("timestamp")
    )
    rows = [r["name"] for r in rep.collect()]
    assert rows == ["in_b", "in_a"]  # > (not >=) cutoff, desc order

    out = str(tmp_path / "recent_report")
    write_report([rep], out)
    files = [f for f in os.listdir(f"{out}/section_0") if f.endswith(".csv")]
    body = open(f"{out}/section_0/{files[0]}").read()
    assert "in_b" in body and "old" not in body


def test_contract_project_padding(spark):
    df = spark.createDataFrame([("x",)], "a string")
    out = contract_project(df, ("a", "b", "c"), pad="")
    assert [tuple(r) for r in out.collect()] == [("x", "", "")]
    out_null = contract_project(df, ("a", "b"), pad=None)
    assert [tuple(r) for r in out_null.collect()] == [("x", None)]


def test_archive_processed_bookkeeping(tmp_path):
    """K12: processed copy + dated archive copy + optional delete."""
    from datetime import datetime

    from mc_ns_data_pipeline_spark.sinks.files import archive_processed

    src = tmp_path / "LOT-1.csv"
    src.write_text("a,b\n1,2\n")
    when = datetime(2026, 8, 13, 12, 34, 56)
    processed, archived = archive_processed(
        str(src), str(tmp_path / "processed"), str(tmp_path / "archive"),
        delete_original=True, now=when,
    )
    assert (tmp_path / "processed" / "LOT-1.csv").read_text().startswith("a,b")
    assert archived.endswith("archive/2026-08-13/LOT-1.123456.csv")
    assert not src.exists()


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Two tables bucketed on the same key with the same bucket count
    must sort-merge-join with ZERO exchanges — the scans themselves
    satisfy the join's distribution requirement (this is the point of
    paying the write-side shuffle once)."""
    import io
    from contextlib import redirect_stdout

    from mc_ns_data_pipeline_spark.catalog import load_table
    from mc_ns_data_pipeline_spark.sinks.layout import (
        bucketed_join,
        write_bucketed,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "t_bkt_lineitem", "l_orderkey", 8)
    write_bucketed(orders, "t_bkt_orders", "l_orderkey", 8)
    try:
        joined = bucketed_join(
            spark, "t_bkt_lineitem", "t_bkt_orders", "l_orderkey"
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == li.join(orders, "l_orderkey").count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_lineitem")
        spark.sql("DROP TABLE IF EXISTS t_bkt_orders")


def test_clustered_write_enables_file_skipping(spark, sf_dir, tmp_path):
    """Range-clustered parquet: per-file min/max footer stats must be
    DISJOINT (repartitionByRange keeps equal keys together), so a
    pushed-down point/range predicate can skip every other file."""
    import glob

    import pyarrow.parquet as pq

    from mc_ns_data_pipeline_spark.catalog import load_table
    from mc_ns_data_pipeline_spark.sinks.layout import write_clustered

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    path = str(tmp_path / "clustered")
    write_clustered(ev, path, "user_id", 8)

    spans = []
    for f in sorted(glob.glob(path + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        ci = names.index("user_id")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    assert len(spans) >= 4  # range split actually produced many files
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo  # disjoint (equal keys never straddle files)

    # the skipping predicate reaches the parquet reader
    probe = spans[0][1]  # a key guaranteed inside exactly one span
    df = spark.read.parquet(path).filter(F.col("user_id") == probe)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    assert "PushedFilters: [IsNotNull(user_id), EqualTo(user_id," in buf.getvalue()
    assert df.count() > 0


def test_zorder_skips_on_both_columns(spark, sf_dir, tmp_path):
    """Z-ordered layout must give TIGHT per-file min/max on every
    participating column simultaneously: a median point-probe on either
    column alone must be skippable for at least half the files (plain
    single-column clustering gives the second column no skipping at
    all)."""
    import glob

    import pyarrow.parquet as pq

    from mc_ns_data_pipeline_spark.catalog import load_table
    from mc_ns_data_pipeline_spark.sinks.layout import write_zordered

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    path = str(tmp_path / "zordered")
    write_zordered(ev, path, ["user_id", "value"], n_files=16, bits=4)

    def file_spans(colname):
        spans = []
        for f in sorted(glob.glob(path + "/*.parquet")):
            md = pq.ParquetFile(f).metadata
            names = [
                md.schema.column(i).name for i in range(md.num_columns)
            ]
            ci = names.index(colname)
            spans.append((
                min(md.row_group(r).column(ci).statistics.min
                    for r in range(md.num_row_groups)),
                max(md.row_group(r).column(ci).statistics.max
                    for r in range(md.num_row_groups)),
            ))
        return spans

    for colname in ("user_id", "value"):
        spans = file_spans(colname)
        assert len(spans) >= 8
        lo = min(s[0] for s in spans)
        hi = max(s[1] for s in spans)
        probe = (lo + hi) / 2
        containing = sum(1 for mn, mx in spans if mn <= probe <= mx)
        assert containing <= len(spans) // 2, (colname, containing)


def test_compact_files_preserves_content(spark, sf_dir, tmp_path):
    """Compaction must collapse a many-small-files table to the computed
    file count without changing a single row."""
    from mc_ns_data_pipeline_spark.catalog import load_table
    from mc_ns_data_pipeline_spark.sinks.layout import compact_files
    from mc_ns_data_pipeline_spark.testing import canonicalize

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    path = str(tmp_path / "fragmented")
    ev.repartition(64).write.parquet(path)
    import glob

    assert len(glob.glob(path + "/*.parquet")) == 64
    before = canonicalize(ev.columns, [tuple(r) for r in ev.collect()])

    n_after = compact_files(spark, path, target_file_bytes=1 << 30)
    assert n_after == 1
    got = spark.read.parquet(path)
    after = canonicalize(got.columns, [tuple(r) for r in got.collect()])
    assert before == after


def test_jsonl_source_quarantines_corrupt_lines(spark, tmp_path):
    """PERMISSIVE JSONL read: good rows parse to the declared schema,
    malformed lines survive byte-for-byte in the quarantine."""
    from mc_ns_data_pipeline_spark.sources.jsonl import (
        read_jsonl_with_quarantine,
    )

    src = tmp_path / "corpus.jsonl"
    src.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        '{"doc_id": 2, "text": "ok"}\n'
        'this is not json at all\n'
        '{"doc_id": 3, "text": 42broken\n'
        '{"doc_id": 4, "text": "fine"}\n'
    )
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    qdir = str(tmp_path / "quarantine")
    good = read_jsonl_with_quarantine(spark, str(src), schema, qdir)
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2, 4]
    bad = {r[0] for r in spark.read.text(qdir).collect()}
    assert "this is not json at all" in bad
    assert '{"doc_id": 3, "text": 42broken' in bad
    assert len(bad) == 2


def test_write_shards_manifest_consistent(spark, sf_dir, tmp_path):
    """Sharding must be deterministic by id, lose no rows, and the
    manifest must agree with both the files on disk and the data."""
    from mc_ns_data_pipeline_spark.catalog import load_table
    from mc_ns_data_pipeline_spark.sinks.layout import write_shards

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "shards")
    manifest = write_shards(docs, path, n_shards=4, id_col="doc_id")
    n_docs = docs.count()
    assert manifest["total_rows"] == n_docs
    assert sorted(manifest["shards"]) == ["0", "1", "2", "3"]
    back = spark.read.parquet(path)
    assert back.count() == n_docs
    assert back.select("doc_id").distinct().count() == n_docs
    # determinism: a second write assigns identical shards
    path2 = str(tmp_path / "shards2")
    write_shards(docs, path2, n_shards=4, id_col="doc_id")
    a = {(r["doc_id"], r["shard"]) for r in back.collect()}
    b = {(r["doc_id"], r["shard"])
         for r in spark.read.parquet(path2).collect()}
    assert a == b


def test_delete_keys_targeted_rewrites_only_affected_files(
    spark, sf_dir, tmp_path
):
    """GDPR delete: only files containing a doomed key are rewritten;
    the rest stay byte-identical (same inode content, same mtime)."""
    import os

    from mc_ns_data_pipeline_spark.catalog import load_table
    from mc_ns_data_pipeline_spark.sinks.upsert import delete_keys_targeted

    target = str(tmp_path / "orders_tbl")
    orders = load_table(spark, sf_dir, "orders")
    # range-clustered layout: each file owns a disjoint o_orderkey range
    orders.repartitionByRange(4, "o_orderkey").write.parquet(target)

    before = {
        f: os.stat(os.path.join(target, f)).st_mtime_ns
        for f in os.listdir(target) if f.endswith(".parquet")
    }
    # doom three keys from the LOW end: they live in exactly one file
    low_keys = [r[0] for r in (
        orders.select("o_orderkey").orderBy("o_orderkey").limit(3).collect()
    )]
    doomed = spark.createDataFrame(
        [(k,) for k in low_keys], "o_orderkey bigint"
    )

    n_rewritten = delete_keys_targeted(spark, target, "o_orderkey", doomed)
    assert n_rewritten == 1

    after = {
        f: os.stat(os.path.join(target, f)).st_mtime_ns
        for f in os.listdir(target) if f.endswith(".parquet")
    }
    untouched = set(before) & set(after)
    assert len(untouched) == len(before) - 1
    for f in untouched:
        assert before[f] == after[f], f"{f} was rewritten needlessly"

    remaining = spark.read.parquet(target)
    assert remaining.count() == orders.count() - 3
    assert remaining.filter(
        F.col("o_orderkey").isin(*low_keys)
    ).count() == 0


def test_export_roundtrip_all_formats(spark, tmp_path):
    """export_table/read_export round-trips the same rows through
    parquet, ORC, JSON-lines, and CSV."""
    from mc_ns_data_pipeline_spark.sinks.files import (
        EXPORT_FORMATS,
        export_table,
        read_export,
    )

    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", -2.25), (3, "komma, kommt", 0.0)],
        "id long, name string, score double",
    )
    expected = sorted(map(tuple, df.collect()))
    for fmt in EXPORT_FORMATS:
        out = str(tmp_path / f"exp_{fmt}")
        export_table(df, out, fmt=fmt)
        back = read_export(spark, out, fmt=fmt, schema=df.schema)
        assert sorted(map(tuple, back.collect())) == expected, fmt


def test_compact_files_partitioned_layout(spark, sf_dir, tmp_path):
    """Partitioned tables: sizing must see the files under key=
    subdirectories (a top-level glob sees zero bytes) and the rewrite
    must preserve the partition-directory layout, not flatten it."""
    import glob
    import os

    from mc_ns_data_pipeline_spark.catalog import load_table
    from mc_ns_data_pipeline_spark.sinks.layout import compact_files
    from mc_ns_data_pipeline_spark.testing import canonicalize

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = str(tmp_path / "parts")
    ev.repartition(16).write.partitionBy("event_type").parquet(path)
    n_frag = len(glob.glob(path + "/**/*.parquet", recursive=True))
    assert n_frag > 16  # one file per task per partition value
    before = canonicalize(ev.columns, [tuple(r) for r in ev.collect()])

    n_after = compact_files(
        spark, path, target_file_bytes=1 << 30,
        partition_by=("event_type",),
    )
    assert n_after < n_frag
    # partition layout survived
    assert [d for d in os.listdir(path) if d.startswith("event_type=")]
    got = spark.read.parquet(path)
    after = canonicalize(got.columns, [tuple(r) for r in got.collect()])
    assert before == after


def test_interrupted_swap_recovers_instead_of_dropping_table(
    spark, tmp_path
):
    """Crash between the swap's two renames (target gone, __old backup
    present): the next merge must restore the backup and merge into it
    — NOT treat the path as a fresh table and drop every old row."""
    import os

    from mc_ns_data_pipeline_spark.sinks.upsert import merge_upsert

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    merge_upsert(spark, base, path, key="id")
    # simulate the mid-swap crash
    os.rename(path, f"{path}__old")

    upd = spark.createDataFrame([(3, "C"), (4, "d")], "id long, v string")
    merge_upsert(spark, upd, path, key="id")
    got = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "b", 3: "C", 4: "d"}


def test_read_jsonl_does_not_mutate_caller_schema(spark, tmp_path):
    """StructType.add mutates in place; read_jsonl must copy, so the
    same schema object can drive two reads."""
    from mc_ns_data_pipeline_spark.sources.jsonl import read_jsonl

    src = tmp_path / "a.jsonl"
    src.write_text('{"doc_id": 1, "text": "x"}\n')
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    good1, _ = read_jsonl(spark, str(src), schema)
    assert len(schema.fields) == 2
    good2, _ = read_jsonl(spark, str(src), schema)  # would raise on dup
    assert good1.count() == good2.count() == 1


def test_alert_rules_fire_and_deliver(spark, tmp_path):
    """README-promised alerting, implemented: dead-letter metrics feed
    threshold rules; firing alerts append JSONL and reach the injected
    transport; a quiet batch delivers nothing."""
    import json

    from mc_ns_data_pipeline_spark.sinks.alerts import (
        dead_letter_metrics,
        default_rules,
        deliver,
        evaluate_alerts,
    )

    accepted = spark.range(90)
    dead = spark.range(10)
    metrics = dead_letter_metrics(accepted, dead)
    assert metrics["dead_letter_rate"] == 0.1
    alerts = evaluate_alerts(metrics, default_rules(),
                             context={"batch": "b1"})
    assert [a["alert"] for a in alerts] == ["dead_letter_rate_high"]

    seen = []
    log = str(tmp_path / "alerts" / "alerts.jsonl")
    n = deliver(alerts, log, transport=seen.append)
    assert n == 1 and len(seen) == 1
    rec = json.loads(open(log).read().strip())
    assert rec["batch"] == "b1" and rec["severity"] == "warning"

    # quiet batch: nothing fires, nothing delivered, log unchanged
    quiet = evaluate_alerts(
        dead_letter_metrics(spark.range(100), spark.range(0)),
        default_rules(),
    )
    assert quiet == []
    assert deliver(quiet, log) == 0
    assert len(open(log).read().strip().splitlines()) == 1

    # total rejection escalates to critical
    crit = evaluate_alerts(
        dead_letter_metrics(spark.range(0), spark.range(5)),
        default_rules(),
    )
    # both rules fire (rate 1.0 > 0.05 AND zero accepted); the
    # escalation is the critical row
    assert {a["severity"] for a in crit} == {"warning", "critical"}


def test_cli_load_to_jdbc_mirrors_warehouse(spark, tmp_path, monkeypatch):
    """`load --bulk --to-jdbc` with DB_CONFIG must land lots/lot_data
    in the JDBC warehouse (Derby), twice idempotently (truncate-reload)."""
    import json
    import os

    from mc_ns_data_pipeline_spark.cli import main
    from mc_ns_data_pipeline_spark.sources.jdbc import read_query

    fx = "mc_ns_data_pipeline_spark.sources.rest_fixture"
    out = str(tmp_path / "exchange")
    state = str(tmp_path / "state")
    wh = str(tmp_path / "warehouse")
    assert main([
        "fetch-bulk", "--n-pages", "4",
        "--captures-fetcher", f"{fx}:fetch_captures_page",
        "--meta-fetcher", f"{fx}:batch_meta_records",
        "--structures-fetcher", f"{fx}:structure_records",
        "--out-dir", out, "--state-dir", state,
    ]) == 0

    url = "jdbc:derby:memory:climirror;create=true"
    monkeypatch.setenv("DB_CONFIG", json.dumps({"url": url}))
    assert main([
        "load", "--bulk", "--input-dir", out, "--warehouse-dir", wh,
        "--to-jdbc",
    ]) == 0
    n1 = read_query(spark, url, "SELECT * FROM lot_data").count()
    assert 0 < n1 < 37
    assert read_query(spark, url, "SELECT * FROM lots").count() == 1

    # re-mirror without reloading: truncate-reload keeps the remote an
    # exact copy of the (unchanged) parquet warehouse, not an append
    assert main(["load", "--warehouse-dir", wh, "--to-jdbc"]) == 0
    assert read_query(
        spark, url, "SELECT * FROM lot_data"
    ).count() == n1
