"""End-to-end CLI parity: fetch-bulk -> load --bulk -> load --report,
checkpoint resume, and incremental window accounting — all against the
deterministic fixture transport (no network)."""

from __future__ import annotations

import json
import os

from mc_ns_data_pipeline_spark.cli import main

FETCHERS = [
    "--captures-fetcher",
    "mc_ns_data_pipeline_spark.sources.rest_fixture:fetch_captures_page",
    "--meta-fetcher",
    "mc_ns_data_pipeline_spark.sources.rest_fixture:batch_meta_records",
    "--structures-fetcher",
    "mc_ns_data_pipeline_spark.sources.rest_fixture:structure_records",
]


def test_fetch_bulk_then_load_then_report(spark, tmp_path):
    out = str(tmp_path / "exchange")
    state = str(tmp_path / "state")
    wh = str(tmp_path / "warehouse")
    rep = str(tmp_path / "reports")

    assert main([
        "fetch-bulk", "--n-pages", "4", "--start", "0", "--end", "60000",
        *FETCHERS, "--out-dir", out, "--state-dir", state,
    ]) == 0
    ckpt = json.load(open(os.path.join(state, "checkpoint.json")))
    assert ckpt["last_processed_id"] == 36

    # per-lot partitioned CSV landed inside the batch-scoped subdir
    batch_dirs = [d for d in os.listdir(out) if d.startswith("batch_from_")]
    assert batch_dirs, os.listdir(out)
    lots = [
        d for d in os.listdir(os.path.join(out, batch_dirs[0]))
        if d.startswith("lot_number=")
    ]
    assert lots

    assert main([
        "load", "--bulk", "--input-dir", out, "--warehouse-dir", wh,
    ]) == 0
    lot_data = spark.read.parquet(f"{wh}/lot_data")
    # VOD_ rows are excluded by the merge (every 5th record)
    assert 0 < lot_data.count() < 37
    assert spark.read.parquet(f"{wh}/lots").count() == 1

    assert main([
        "load", "--report", "--warehouse-dir", wh, "--report-dir", rep,
    ]) == 0
    assert os.path.isdir(os.path.join(rep, "section_0"))


def test_fetch_bulk_checkpoint_resume(spark, tmp_path):
    out = str(tmp_path / "exchange")
    state = str(tmp_path / "state")
    args = [
        "fetch-bulk", "--n-pages", "4", *FETCHERS,
        "--out-dir", out, "--state-dir", state,
    ]
    assert main([*args, "--start", "0", "--end", "19"]) == 0
    first = json.load(open(os.path.join(state, "checkpoint.json")))
    assert first["last_processed_id"] == 19
    # second run resumes past the checkpoint even with --start 0
    assert main([*args, "--start", "0", "--end", "60000"]) == 0
    second = json.load(open(os.path.join(state, "checkpoint.json")))
    assert second["last_processed_id"] == 36
    # status log accumulated both runs without rewrites
    status = spark.read.parquet(os.path.join(state, "status_log"))
    assert status.count() == 37
    # delivery accumulated BOTH batches (append, not overwrite): every
    # non-VOD record id's row is present exactly once
    delivered = spark.read.option("header", True).option(
        "recursiveFileLookup", True
    ).csv(out)
    n_expected = len([i for i in range(37) if i % 5 != 0])
    assert delivered.count() == n_expected


def test_fetch_incremental_windows_and_high_water_mark(spark, tmp_path):
    out = str(tmp_path / "exchange")
    state = str(tmp_path / "state")
    first_run = 1741564801  # cli.FIRST_RUN_EPOCH
    # now = first_run + 3 windows + lag -> exactly 3 complete windows
    now = first_run + 4 * 6 * 3600
    args = [
        "fetch-incremental", "--n-pages", "4", *FETCHERS,
        "--out-dir", out, "--state-dir", state,
        "--now-epoch", str(now),
    ]
    assert main(args) == 0
    log = spark.read.csv(
        os.path.join(state, "window_log.csv"), header=True,
        inferSchema=True,
    )
    assert log.count() == 3
    # re-run at the same now: nothing new to process
    assert main(args) == 0
    log2 = spark.read.csv(
        os.path.join(state, "window_log.csv"), header=True,
        inferSchema=True,
    )
    assert log2.count() == 3


def test_fetch_bulk_rerun_after_lost_checkpoint_is_idempotent(spark, tmp_path):
    """Crash between delivery and checkpoint write: the re-run
    overwrites its own batch directory instead of appending a
    duplicate copy (exactly-once delivery per batch)."""
    out = str(tmp_path / "exchange")
    state = str(tmp_path / "state")
    args = [
        "fetch-bulk", "--n-pages", "4", *FETCHERS,
        "--out-dir", out, "--state-dir", state,
        "--start", "0", "--end", "60000",
    ]
    assert main(args) == 0
    # simulate the crash: delivery landed but the checkpoint write
    # never happened
    os.remove(os.path.join(state, "checkpoint.json"))
    assert main(args) == 0
    delivered = spark.read.option("header", True).option(
        "recursiveFileLookup", True
    ).csv(out)
    n_expected = len([i for i in range(37) if i % 5 != 0])
    assert delivered.count() == n_expected


def test_fetch_refuses_underprovisioned_page_budget(spark, tmp_path):
    """Coverage gate: when --n-pages does not reach the end of the
    dataset (the fixture has 4 pages), both fetch commands refuse to
    deliver or advance any state — advancing the checkpoint/window log
    past unfetched records would lose them silently and forever."""
    out = str(tmp_path / "exchange")
    state = str(tmp_path / "state")
    assert main([
        "fetch-bulk", "--n-pages", "2", *FETCHERS,
        "--out-dir", out, "--state-dir", state,
        "--start", "0", "--end", "60000",
    ]) == 2
    assert not os.path.exists(os.path.join(state, "checkpoint.json"))
    assert not os.path.exists(out)

    now = 1741564801 + 4 * 6 * 3600
    assert main([
        "fetch-incremental", "--n-pages", "2", *FETCHERS,
        "--out-dir", out, "--state-dir", state,
        "--now-epoch", str(now),
    ]) == 2
    assert not os.path.exists(os.path.join(state, "window_log.csv"))
    assert not os.path.exists(out)


def test_fetch_incremental_rerun_at_later_time_is_exactly_once(
    spark, tmp_path
):
    """Crash between delivery and the window-log append, rerun hours
    later: the horizon has grown, but the delivery dir is keyed on the
    resume point alone, so the rerun's superset span OVERWRITES the
    orphaned first delivery instead of leaving two overlapping span
    dirs that `load` would ingest twice."""
    out = str(tmp_path / "exchange")
    state = str(tmp_path / "state")
    t0 = 1741564801
    args = lambda now: [  # noqa: E731
        "fetch-incremental", "--n-pages", "4", *FETCHERS,
        "--out-dir", out, "--state-dir", state,
        "--now-epoch", str(now),
    ]
    assert main(args(t0 + 4 * 6 * 3600)) == 0  # 3 complete windows
    # simulate the crash: delivery landed, window log never written
    os.remove(os.path.join(state, "window_log.csv"))
    # rerun two windows later: same lo, larger hi
    assert main(args(t0 + 6 * 6 * 3600)) == 0
    span_dirs = [d for d in os.listdir(out) if d.startswith("windows_")]
    assert len(span_dirs) == 1, span_dirs
    delivered = spark.read.option("header", True).option(
        "recursiveFileLookup", True
    ).csv(out)
    assert delivered.count() == delivered.dropDuplicates().count()


def test_env_only_run_and_precedence(spark, tmp_path, monkeypatch):
    """Operational parity (settings.py:1-34): a run driven PURELY from
    the environment — no fetch/load flags — plus the precedence
    contract (flag > env)."""
    out = str(tmp_path / "exchange")
    state = str(tmp_path / "state")
    wh = str(tmp_path / "warehouse")
    fx = "mc_ns_data_pipeline_spark.sources.rest_fixture"
    # monkeypatch.setenv restores on teardown, so the env never leaks
    monkeypatch.setenv("OUTPUT_DATA_DIR", out)
    monkeypatch.setenv("CHECKPOINT_FILE_PATH", f"{state}/checkpoint.json")
    monkeypatch.setenv("N_PAGES", "4")
    monkeypatch.setenv("BATCH_SIZE", "4")
    monkeypatch.setenv("CAPTURES_FETCHER", f"{fx}:fetch_captures_page")
    monkeypatch.setenv("META_FETCHER", f"{fx}:batch_meta_records")
    monkeypatch.setenv("STRUCTURES_FETCHER", f"{fx}:structure_records")
    monkeypatch.setenv("WAREHOUSE_DIR", wh)

    assert main(["fetch-bulk"]) == 0
    ckpt = json.load(open(os.path.join(state, "checkpoint.json")))
    assert ckpt["last_processed_id"] == 36

    assert main(["load", "--bulk"]) == 0  # input dir from OUTPUT_DATA_DIR
    assert 0 < spark.read.parquet(f"{wh}/lot_data").count() < 37

    # precedence: an explicit flag overrides the env var
    out2 = str(tmp_path / "exchange2")
    state2 = str(tmp_path / "state2")
    assert main([
        "fetch-bulk", "--out-dir", out2, "--state-dir", state2,
    ]) == 0
    assert os.path.exists(os.path.join(state2, "checkpoint.json"))


def test_env_file_loading_and_missing_required(tmp_path, monkeypatch):
    """The .env file supplies what the process env lacks; process env
    wins over the file; a setting nobody supplies fails with a message
    naming both the flag and the variable."""
    from mc_ns_data_pipeline_spark.config import env_config, load_env_file

    envfile = tmp_path / "pipeline.env"
    envfile.write_text(
        "# deployment config\n"
        "BATCH_SIZE=9\n"
        'WAREHOUSE_DIR="/data/wh"\n'
        "N_PAGES=7\n"
    )
    env: dict[str, str] = {"BATCH_SIZE": "2"}  # pre-existing wins
    applied = load_env_file(envfile, env)
    assert env["BATCH_SIZE"] == "2"
    assert env["WAREHOUSE_DIR"] == "/data/wh"  # quotes stripped
    assert "BATCH_SIZE" not in applied
    cfg = env_config(env)
    assert cfg.batch_size == 2
    assert cfg.n_pages == 7

    # required setting absent everywhere -> SystemExit naming both
    monkeypatch.delenv("WAREHOUSE_DIR", raising=False)
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="WAREHOUSE_DIR"):
        main(["--env-file", str(tmp_path / "absent"), "load", "--bulk"])


def test_db_config_json_to_jdbc_properties():
    from mc_ns_data_pipeline_spark.config import env_config, jdbc_properties

    cfg = env_config({
        "DB_CONFIG": '{"url": "jdbc:postgresql://h/db", "user": "u",'
                     ' "password": "p"}'
    })
    props = jdbc_properties(cfg)
    assert props == {
        "url": "jdbc:postgresql://h/db", "user": "u", "password": "p"
    }


def test_fetch_bulk_sort_pushdown_reaches_transport(spark, tmp_path):
    """O3 through the CLI: --sort-column/--sort-direction must reach
    the captures fetcher as sortColumn/sortDirection (the fixture
    stamps what it received into every record)."""
    out = str(tmp_path / "exchange")
    state = str(tmp_path / "state")
    fx = "mc_ns_data_pipeline_spark.sources.rest_fixture"
    assert main([
        "fetch-bulk", "--n-pages", "4",
        "--captures-fetcher", f"{fx}:fetch_captures_page_sortable",
        "--meta-fetcher", f"{fx}:batch_meta_records",
        "--structures-fetcher", f"{fx}:structure_records",
        "--out-dir", out, "--state-dir", state,
        "--sort-column", "dateTime", "--sort-direction", "desc",
    ]) == 0
    delivered = spark.read.option("header", True).option(
        "recursiveFileLookup", True
    ).csv(out)
    col = "Captured Data Type"  # merge_lot_data maps dataCaptureName here
    stamps = {r[col] for r in delivered.select(col).distinct().collect()}
    assert stamps == {"sort=dateTime:desc"}


def test_table_lifecycle_cli(spark, tmp_path):
    """Operator surface for versioned tables: write -> append (txn
    stamp) -> merge -> delete-keys -> compact -> consume increments ->
    vacuum -> history, end-to-end through the CLI with parquet
    inputs."""
    from mc_ns_data_pipeline_spark.sinks import versioned as V

    def land(rows, name):
        p = str(tmp_path / name)
        spark.createDataFrame(rows, "k int, v string").write.parquet(p)
        return p

    table = str(tmp_path / "vtbl")
    cursor = str(tmp_path / "cursor.json")
    inc_out = str(tmp_path / "increments")

    base = land([(1, "a"), (2, "b"), (3, "c")], "base")
    # whitespace in --stats-cols is stripped; typos fail fast
    import pytest as _pytest
    with _pytest.raises(SystemExit, match="nope"):
        main(["table", "write", "--table", table, "--input", base,
              "--stats-cols", "k, nope"])
    assert main(["table", "write", "--table", table, "--input", base,
                 "--stats-cols", " k "]) == 0
    from mc_ns_data_pipeline_spark.sinks import versioned as V2
    assert V2.read_manifest(
        table, V2.current_snapshot(table))["stats_cols"] == ["k"]
    # consume bootstraps on the full snapshot
    assert main(["table", "consume", "--table", table,
                 "--cursor", cursor, "--out-dir", inc_out]) == 0
    assert os.path.isdir(os.path.join(inc_out, "inc-bootstrap"))
    assert spark.read.parquet(
        os.path.join(inc_out, "inc-bootstrap")).count() == 3

    b1 = land([(4, "d")], "b1")
    assert main(["table", "append", "--table", table, "--input", b1,
                 "--txn-id", "cli:1"]) == 0
    # replayed txn is a no-op commit
    assert main(["table", "append", "--table", table, "--input", b1,
                 "--txn-id", "cli:1"]) == 0
    assert V.read_current(spark, table).count() == 4

    # increment consumption sees ONLY the appended rows; the landing
    # dir is keyed on the FROM snapshot (stable across retries)
    assert main(["table", "consume", "--table", table,
                 "--cursor", cursor, "--out-dir", inc_out]) == 0
    incs = sorted(d for d in os.listdir(inc_out) if d.startswith("inc-"))
    assert len(incs) == 2
    newest = next(d for d in incs if d != "inc-bootstrap")
    got = spark.read.parquet(os.path.join(inc_out, newest))
    assert [(r.k, r.v) for r in got.collect()] == [(4, "d")]
    # a cursor pointed at the wrong table fails precisely
    with _pytest.raises(ValueError, match="belongs to table"):
        from mc_ns_data_pipeline_spark.sinks import versioned as V3
        other = str(tmp_path / "other_tbl")
        V3.write_snapshot(
            spark.createDataFrame([(1, "z")], "k int, v string"), other)
        V3.consume_appends(spark, other, cursor, lambda df: None)

    upd = land([(2, "B"), (5, "e")], "upd")
    assert main(["table", "merge", "--table", table, "--input", upd,
                 "--key", "k"]) == 0
    # merge-on-read shape: batch + mask in one commit, no rewrite
    upd2 = land([(4, "D")], "upd2")
    assert main(["table", "merge", "--table", table, "--input", upd2,
                 "--key", "k", "--mor"]) == 0
    man = V.read_manifest(table, V.current_snapshot(table))
    assert man["op"] == "merge-mor"
    assert {(r.k, r.v) for r in V.read_current(spark, table)
            .filter("k = 4").collect()} == {(4, "D")}
    doom = land([(3, "x")], "doom")
    assert main(["table", "delete-keys", "--table", table,
                 "--input", doom, "--key", "k"]) == 0
    # merge-on-read shape: masks without rewriting, compact applies it
    doom2 = land([(1, "x")], "doom2")
    assert main(["table", "delete-keys", "--table", table,
                 "--input", doom2, "--key", "k", "--mor"]) == 0
    man = V.read_manifest(table, V.current_snapshot(table))
    # two masks pending: the merge-mor batch's + this delete's
    assert man["op"] == "delete-mor" and len(man["delete_files"]) == 2
    assert main(["table", "compact", "--table", table,
                 "--sort-col", "k", "--target-files", "1"]) == 0
    man = V.read_manifest(table, V.current_snapshot(table))
    assert not man.get("delete_files")
    got = {(r.k, r.v) for r in V.read_current(spark, table).collect()}
    assert got == {(2, "B"), (4, "D"), (5, "e")}

    assert main(["table", "vacuum", "--table", table,
                 "--keep", "1"]) == 0
    assert len(V.list_snapshots(table)) == 1
    assert main(["table", "history", "--table", table]) == 0

    # missing required flag fails fast with a named message
    import pytest as _pytest
    with _pytest.raises(SystemExit, match="--key"):
        main(["table", "merge", "--table", table, "--input", upd])


def test_table_wap_and_rollback_cli(spark, tmp_path):
    """Write-audit-publish + tag/rollback through the CLI: stage on a
    branch, inspect refs, publish the audited head, tag, roll back."""
    from mc_ns_data_pipeline_spark.sinks import versioned as V

    def land(rows, name):
        p = str(tmp_path / name)
        spark.createDataFrame(rows, "k int, v string").write.parquet(p)
        return p

    table = str(tmp_path / "vtbl")
    assert main(["table", "write", "--table", table,
                 "--input", land([(1, "a")], "base")]) == 0
    assert main(["table", "tag", "--table", table,
                 "--name", "pre-deploy"]) == 0

    # stage two batches on a branch: CURRENT stays put
    assert main(["table", "append", "--table", table,
                 "--input", land([(2, "s1")], "b1"),
                 "--branch", "audit"]) == 0
    assert main(["table", "append", "--table", table,
                 "--input", land([(3, "s2")], "b2"),
                 "--branch", "audit"]) == 0
    assert V.read_current(spark, table).count() == 1
    assert V.read_ref(spark, table, "audit").count() == 3
    assert main(["table", "refs", "--table", table]) == 0

    assert main(["table", "publish", "--table", table,
                 "--name", "audit"]) == 0
    assert V.read_current(spark, table).count() == 3

    # bad deploy -> roll back to the tag; table keeps working
    assert main(["table", "rollback", "--table", table,
                 "--snapshot", "pre-deploy"]) == 0
    assert {r.k for r in V.read_current(spark, table).collect()} == {1}
    assert main(["table", "append", "--table", table,
                 "--input", land([(7, "post")], "b3")]) == 0
    assert {r.k for r in V.read_current(spark, table).collect()} \
        == {1, 7}


def test_table_write_partition_spec_cli(spark, tmp_path):
    """`table write --partition-spec` declares hidden partitioning;
    a later CLI append inherits it with no extra flags."""
    import datetime as dt

    from mc_ns_data_pipeline_spark.cli import main
    from mc_ns_data_pipeline_spark.sinks import versioned as V

    base = str(tmp_path / "in")
    spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1 + i % 3), i % 11)
         for i in range(300)],
        "k long, ts timestamp, user_id long").write.parquet(base)
    table = str(tmp_path / "tbl")
    assert main(["table", "write", "--table", table, "--input", base,
                 "--partition-spec",
                 "days(ts);bucket(4, user_id)"]) == 0
    man = V.read_manifest(table, V.current_snapshot(table))
    assert man["partition_spec"] == [
        {"transform": "days", "col": "ts"},
        {"transform": "bucket", "n": 4, "col": "user_id"}]
    assert main(["table", "append", "--table", table,
                 "--input", base]) == 0
    man = V.read_manifest(table, V.current_snapshot(table))
    assert man["partition_spec"] is not None
    assert V.read_current(spark, table).count() == 600


def test_cli_branch_rejected_for_cow_ops(spark, tmp_path):
    """--branch on a COW op must fail fast — silently publishing to
    CURRENT would defeat the quarantine the flag promises."""
    import pytest

    from mc_ns_data_pipeline_spark.cli import main

    base = str(tmp_path / "in")
    spark.createDataFrame([(1, "a")], "k long, v string") \
        .write.parquet(base)
    with pytest.raises(SystemExit, match="stageable"):
        main(["table", "write", "--table", str(tmp_path / "t"),
              "--input", base, "--branch", "q"])
    with pytest.raises(SystemExit, match="stageable"):
        main(["table", "merge", "--table", str(tmp_path / "t"),
              "--input", base, "--key", "k", "--branch", "q"])


def test_cli_set_spec_verb(spark, tmp_path):
    from mc_ns_data_pipeline_spark.cli import main
    from mc_ns_data_pipeline_spark.sinks import versioned as V

    base = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "a")], "k long, v string").write.parquet(base)
    table = str(tmp_path / "tbl")
    assert main(["table", "write", "--table", table,
                 "--input", base]) == 0
    assert main(["table", "set-spec", "--table", table,
                 "--partition-spec", "bucket(4, k)"]) == 0
    core = V._read_core(table, V.current_snapshot(table))
    assert core["partition_spec"] == [
        {"transform": "bucket", "n": 4, "col": "k"}]
    assert main(["table", "set-spec", "--table", table]) == 0  # drop
    core = V._read_core(table, V.current_snapshot(table))
    assert core["partition_spec"] is None


def test_catalog_cli_and_name_addressed_table_ops(spark, tmp_path,
                                                  capsys):
    """Catalog verbs (create/list/resolve/rename/drop) plus the
    --catalog flag on table ops: the whole versioned lifecycle
    addressed by 'namespace.name' instead of a path."""
    from mc_ns_data_pipeline_spark.sinks import table_catalog as TC
    from mc_ns_data_pipeline_spark.sinks import versioned as V

    cat = str(tmp_path / "cat")
    assert main(["catalog", "create", "--catalog", cat,
                 "--name", "sales.orders"]) == 0
    root = TC.load_table(cat, "sales.orders")

    base = str(tmp_path / "base")
    spark.createDataFrame([(1, "a"), (2, "b")],
                          "k int, v string").write.parquet(base)
    assert main(["table", "write", "--catalog", cat,
                 "--table", "sales.orders", "--input", base]) == 0
    b1 = str(tmp_path / "b1")
    spark.createDataFrame([(3, "c")],
                          "k int, v string").write.parquet(b1)
    assert main(["table", "append", "--catalog", cat,
                 "--table", "sales.orders", "--input", b1]) == 0
    assert V.read_current(spark, root).count() == 3

    # rename is metadata-only: same root, old name gone, reads follow
    assert main(["catalog", "rename", "--catalog", cat,
                 "--name", "sales.orders", "--to", "sales.live"]) == 0
    assert TC.load_table(cat, "sales.live") == root
    assert main(["table", "history", "--catalog", cat,
                 "--table", "sales.live"]) == 0

    # unknown name fails fast with the catalog named
    import pytest as _pytest
    with _pytest.raises(SystemExit, match="not in catalog"):
        main(["table", "history", "--catalog", cat,
              "--table", "sales.orders"])

    capsys.readouterr()
    assert main(["catalog", "list", "--catalog", cat]) == 0
    out = capsys.readouterr().out
    assert "sales.live" in out and root in out
    assert main(["catalog", "resolve", "--catalog", cat,
                 "--name", "sales.live"]) == 0
    assert capsys.readouterr().out.strip() == root

    with _pytest.raises(SystemExit, match="--name is required"):
        main(["catalog", "drop", "--catalog", cat])
    assert main(["catalog", "drop", "--catalog", cat,
                 "--name", "sales.live", "--purge"]) == 0
    assert not os.path.exists(root)


def test_catalog_group_and_txn_recover_cli(spark, tmp_path, capsys):
    """Group verbs (pin-group/group-show/drop-group) and txn-recover:
    pin a two-table group at CURRENT, show it, recover an empty log,
    drop it."""
    from mc_ns_data_pipeline_spark.sinks import table_catalog as TC
    from mc_ns_data_pipeline_spark.sinks import versioned as V

    cat = str(tmp_path / "cat")
    for name in ("sales.a", "sales.b"):
        assert main(["catalog", "create", "--catalog", cat,
                     "--name", name]) == 0
        V.write_snapshot(
            spark.createDataFrame([(1, name)], "k int, v string"),
            TC.load_table(cat, name))

    assert main(["catalog", "pin-group", "--catalog", cat,
                 "--group", "nightly",
                 "--names", "sales.a,sales.b"]) == 0
    out = capsys.readouterr().out
    assert "sales.a @" in out and "sales.b @" in out

    assert main(["catalog", "group-show", "--catalog", cat,
                 "--group", "nightly"]) == 0
    assert set(TC.group_snapshots(cat, "nightly")) == {"sales.a",
                                                       "sales.b"}
    # group survives a later commit; read_group sees the pinned state
    V.append_snapshot(
        spark.createDataFrame([(9, "later")], "k int, v string"),
        TC.load_table(cat, "sales.a"))
    assert TC.read_group(spark, cat, "nightly",
                         "sales.a").count() == 1

    assert main(["txn-recover", "--catalog", cat]) == 0
    assert "recovered 0" in capsys.readouterr().out

    assert main(["catalog", "drop-group", "--catalog", cat,
                 "--group", "nightly"]) == 0
    import pytest as _pytest
    with _pytest.raises(TC.NoSuchTableError):
        TC.group_snapshots(cat, "nightly")


def test_table_merge_ref_cli(spark, tmp_path):
    """Diverged-branch merge through the CLI: the staged appends
    replay onto the moved head and CURRENT holds the union."""
    from mc_ns_data_pipeline_spark.sinks import versioned as V

    def land(rows, name):
        p = str(tmp_path / name)
        spark.createDataFrame(rows, "k int, v string").write.parquet(p)
        return p

    table = str(tmp_path / "vtbl")
    assert main(["table", "write", "--table", table,
                 "--input", land([(1, "base")], "base")]) == 0
    assert main(["table", "append", "--table", table,
                 "--input", land([(2, "staged")], "b1"),
                 "--branch", "audit"]) == 0
    # the table moves: fast-forward publish is impossible
    assert main(["table", "append", "--table", table,
                 "--input", land([(3, "direct")], "b2")]) == 0
    assert main(["table", "merge-ref", "--table", table,
                 "--name", "audit"]) == 0
    assert {(r.k, r.v) for r in V.read_current(spark, table).collect()} \
        == {(1, "base"), (2, "staged"), (3, "direct")}


def test_cdc_apply_cli(spark, tmp_path):
    """The cdc-apply verb drains a capped backlog through the public
    runner: replica ≡ source after one invocation, and a --view run
    maintains the aggregate view too."""
    from pyspark.sql import functions as F

    from mc_ns_data_pipeline_spark.sinks import versioned as V

    def df(rows):
        return spark.createDataFrame(rows, "k int, g string, v double")

    src = str(tmp_path / "src")
    rep = str(tmp_path / "rep")
    view = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")
    V.write_snapshot(df([(1, "a", 10.0), (2, "b", 20.0)]), src)
    mark = V.current_snapshot(src)
    V.write_snapshot(V.read_current(spark, src), rep)
    V.append_snapshot(df([(3, "a", 30.0)]), src)
    V.delete_keys_mor(spark, src, "k",
                      df([(2, "b", 0.0)]).select("k"))
    V.merge_snapshot_mor(spark, df([(1, "a", 11.0)]), src, "k")

    assert main(["cdc-apply", "--source", src, "--replica", rep,
                 "--checkpoint", ckpt, "--key", "k",
                 "--starting", mark, "--view", view,
                 "--group-col", "g", "--value-col", "v",
                 "--max-commits-per-trigger", "1"]) == 0
    got = {tuple(r) for r in V.read_current(spark, rep).collect()}
    want = {tuple(r) for r in V.read_current(spark, src).collect()}
    assert got == want == {(1, "a", 11.0), (3, "a", 30.0)}
    vrows = {(r.g, r.n, float(r.sum_value)) for r in
             V.read_current(spark, view).filter(F.col("n") > 0)
             .collect()}
    assert vrows == {("a", 2, 41.0)}
