"""The footer-metadata commit fast path (OPTIMIZATION_r11): the
versioned sink's row accounting + manifest column stats must come out
VALUE-IDENTICAL whether computed by the Spark data scan or read from
the landed files' parquet footers — the fast path replaces a whole
Spark job per commit, never the numbers."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.sinks import versioned as V


def _scan_via_spark(spark, table, files, stats_cols, monkeypatch):
    """The pre-r11 path: force the footer fast path off."""
    monkeypatch.setattr(V, "_footer_rows_and_stats",
                        lambda *a, **k: None)
    try:
        return V._scan_new_files(spark, table, files, stats_cols)
    finally:
        monkeypatch.undo()


@pytest.fixture()
def landed(spark, tmp_path):
    """A landing with every stats-relevant shape: NULLs in a stat
    column, an all-NULL column, a NaN-carrying double, strings, and
    multiple files."""
    table = str(tmp_path / "tbl")
    os.makedirs(table)
    df = spark.createDataFrame(
        [(1, 2.5, "alpha", None),
         (9, float("nan"), "Omega" * 40, None),
         (None, -1e300, "", None),
         (-3, 7.0, "zz", None)],
        "k long, price double, name string, dead string",
    ).repartition(2)
    files = V._land_in_pool(df, table)
    return table, files


def test_footer_rows_match_scan(spark, landed, monkeypatch):
    table, files = landed
    fast = V._scan_new_files(spark, table, files, None)
    slow = _scan_via_spark(spark, table, files, None, monkeypatch)
    assert fast == slow
    assert fast[0] == 4 and fast[1] is None


def test_footer_stats_match_scan(spark, landed, monkeypatch):
    table, files = landed
    cols = ["k", "price", "name", "dead", "ghost"]
    fast = V._scan_new_files(spark, table, files, cols)
    slow = _scan_via_spark(spark, table, files, cols, monkeypatch)
    assert fast == slow
    rows, stats = fast
    assert rows == 4 and set(stats) == set(files)
    merged_k = [b for f in files for b in [stats[f].get("k")] if b]
    assert any(b != [None, None] for b in merged_k)
    for f in files:
        assert "price" not in stats[f] or not any(
            isinstance(x, float) and x != x
            for x in stats[f]["price"])  # NaN never recorded
        assert "ghost" not in stats[f]  # absent column: never keyed


def test_footer_stats_empty_and_missing_cols(spark, tmp_path,
                                             monkeypatch):
    table = str(tmp_path / "tbl2")
    os.makedirs(table)
    df = spark.createDataFrame([], "k long, s string")
    files = V._land_in_pool(df.coalesce(1), table)
    for cols in (None, ["k"], ["nope"]):
        fast = V._scan_new_files(spark, table, files, cols)
        slow = _scan_via_spark(spark, table, files, cols, monkeypatch)
        assert fast == slow, cols


def test_footer_falls_back_on_decimal(spark, tmp_path):
    """Decimal stats are outside pyarrow's extractable envelope — the
    fast path must punt (return None), and the public scan must still
    produce the decimal bounds via Spark."""
    table = str(tmp_path / "tbl3")
    os.makedirs(table)
    df = spark.range(4).select(
        F.col("id").alias("k"),
        F.col("id").cast("decimal(18,4)").alias("d"))
    files = V._land_in_pool(df.coalesce(1), table)
    assert V._footer_rows_and_stats(table, files, ["d"]) is None
    rows, stats = V._scan_new_files(spark, table, files, ["d"])
    assert rows == 4
    (entry,) = stats.values()
    assert entry["d"] == [pytest.approx(0.0), pytest.approx(3.0)]


def test_count_pool_rows_footer(spark, tmp_path):
    table = str(tmp_path / "tbl4")
    os.makedirs(table)
    files = V._land_in_pool(spark.range(37).coalesce(2), table)
    fast = V._footer_rows_and_stats(table, files, None)
    assert fast == (37, None)  # the count comes from footers alone
    assert V._count_pool_rows(spark, table, files) == 37


def test_commit_stats_identical_through_write_snapshot(
        spark, tmp_path, monkeypatch):
    """End to end: a write_snapshot publishes the SAME manifest stats
    with the fast path on and off."""
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
        F.concat(F.lit("s"), F.col("id")).alias("s"))

    t_fast = str(tmp_path / "fast")
    V.write_snapshot(df, t_fast, stats_cols=["k", "v", "s"])
    man_fast = V.read_manifest(t_fast, V.current_snapshot(t_fast))

    monkeypatch.setattr(V, "_footer_rows_and_stats",
                        lambda *a, **k: None)
    t_slow = str(tmp_path / "slow")
    V.write_snapshot(df, t_slow, stats_cols=["k", "v", "s"])
    man_slow = V.read_manifest(t_slow, V.current_snapshot(t_slow))

    assert man_fast["rows"] == man_slow["rows"] == 100
    fast_stats = sorted(man_fast["stats"].values(),
                        key=lambda e: str(e))
    slow_stats = sorted(man_slow["stats"].values(),
                        key=lambda e: str(e))
    assert fast_stats == slow_stats


def test_footer_folds_multi_row_group_stats(spark, tmp_path):
    """A landed file with SEVERAL row groups folds per-group min/max
    into covering file bounds (the bounds live in different groups)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = str(tmp_path / "tblrg")
    os.makedirs(os.path.join(table, "data"))
    name = "manual.parquet"
    t = pa.table({"k": pa.array([5, 9, 1, 3], pa.int64()),
                  "s": pa.array(["mm", "zz", "aa", "bb"])})
    pq.write_table(t, os.path.join(table, "data", name),
                   row_group_size=2)  # groups: [5,9|mm,zz] [1,3|aa,bb]
    fast = V._footer_rows_and_stats(table, [name], ["k", "s"])
    assert fast is not None
    rows, stats = fast
    assert rows == 4
    assert stats[name]["k"] == [1, 9]
    assert stats[name]["s"] == ["aa", "zz"]


def test_footer_unorderable_stats_fall_back_to_scan(
        spark, tmp_path, monkeypatch):
    """When per-group stat values cannot be ordered, the fold must NOT
    keep the first group's (possibly non-covering) bound — the whole
    landing falls back to the Spark scan (ADVICE r11). Pre-fix, the
    old `TypeError -> False` punt would have recorded k=[5, 9] here —
    a bound that wrongly excludes rows 1 and 3."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = str(tmp_path / "tblux")
    os.makedirs(os.path.join(table, "data"))
    name = "manual.parquet"
    t = pa.table({"k": pa.array([5, 9, 1, 3], pa.int64())})
    pq.write_table(t, os.path.join(table, "data", name),
                   row_group_size=2)

    real_lt = V._stat_lt

    def unorderable(a, b):
        raise V._UnorderableStats("forced: mixed decoded types")

    monkeypatch.setattr(V, "_stat_lt", unorderable)
    assert V._footer_rows_and_stats(table, [name], ["k"]) is None
    monkeypatch.setattr(V, "_stat_lt", real_lt)
    # the public scan path still produces the covering bounds
    rows, stats = V._scan_new_files(spark, table, [name], ["k"])
    assert rows == 4 and stats[name]["k"] == [1, 9]


def test_stat_lt_raises_on_unorderable():
    with pytest.raises(V._UnorderableStats):
        V._stat_lt(b"bytes", "str")
    assert V._stat_lt(1, 2) and not V._stat_lt("b", "a")
