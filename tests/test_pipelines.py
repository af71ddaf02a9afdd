"""Unit tests for the reference-parity pipeline layer: edge semantics
mined from the reference (SURVEY.md §5.2)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.pipelines.fetch import merge_lot_data
from mc_ns_data_pipeline_spark.pipelines.load import (
    load_exchange,
    to_lot_data,
)
from mc_ns_data_pipeline_spark.schemas import (
    BATCH_RECORDS_SCHEMA,
    DATA_CAPTURES_SCHEMA,
    OUTPUT_COLUMNS,
    STRUCTURES_SCHEMA,
)


@pytest.fixture()
def captures(spark):
    rows = [
        # current row, joins to all levels, DST-summer instant
        (1, "10", 5, 6, 7, 8, "Step A", " v1 ", "alice", "2024-07-01T12:00:00Z",
         "entry", "TEMP", True, 2),
        # current=False -> dropped
        (1, "11", 5, 6, 7, 8, "Step B", "v2", "bob", "2024-07-01T12:00:00Z",
         "entry", "TEMP", False, 1),
        # VOD_ user -> dropped
        (1, "12", 5, 6, 7, 8, "Step C", "v3", "VOD_sys", "2024-07-01T12:00:00Z",
         "entry", "TEMP", True, 1),
        # orderLabel '0' guard + NULL iteration -> sentinel, no concat;
        # winter instant (EST), structure ids miss the dims -> '' labels
        (1, "0", 5, 6, None, None, "Step D", "v4", "carol",
         "2024-01-15T12:00:00Z", "entry", "PRESSURE", True, None),
        # unparseable timestamp -> passthrough
        (1, "13", 5, 6, 7, 8, "Step E", "v5", "dave", "not-a-date",
         "entry", "TEMP", True, 1),
    ]
    return spark.createDataFrame(rows, DATA_CAPTURES_SCHEMA)


@pytest.fixture()
def batch_meta(spark):
    return spark.createDataFrame(
        [("LOT-001", "P-9", "Widget", "Released")], BATCH_RECORDS_SCHEMA
    )


@pytest.fixture()
def structures(spark):
    rows = [
        ("Unit U1", "UNIT_PROCEDURE", 5, 6, None, None),
        ("Op O1", "OPERATION", 5, 6, 7, None),
        ("Phase P1", "PHASE", 5, 6, 7, 8),
        ("Ignored", "OTHER_LEVEL", 5, 6, 7, 8),
    ]
    return spark.createDataFrame(rows, STRUCTURES_SCHEMA)


def test_merge_contract(spark, captures, batch_meta, structures):
    out = merge_lot_data(captures, batch_meta, structures)
    assert tuple(out.columns) == OUTPUT_COLUMNS
    rows = {r["Captured Data Type"] + "|" + r["Structure Label"]: r
            for r in out.collect()}
    # current=False and VOD_ rows are gone
    assert len(rows) == 3
    full = rows["TEMP|10 - 2"]
    # scalar enrich + structure joins + trim + Eastern summer time (EDT=UTC-4)
    assert full["Lot Number"] == "LOT-001"
    assert full["Master Template Name"] == "Widget"
    assert full["Unit"] == "Unit U1"
    assert full["Operation"] == "Op O1"
    assert full["Phase"] == "Phase P1"
    assert full["Input Data Value"] == "v1"  # trimmed
    assert full["Data Capture Time"] == "7/1/2024 8:00"
    # '0' label guard: no concat; missing dims -> ''; winter EST=UTC-5
    guarded = rows["PRESSURE|0"]
    assert guarded["Operation"] == "" and guarded["Phase"] == ""
    assert guarded["Unit"] == "Unit U1"
    assert guarded["Data Capture Time"] == "1/15/2024 7:00"
    # unparseable ts passes through unchanged
    assert rows["TEMP|13 - 1"]["Data Capture Time"] == "not-a-date"


def test_merge_all_dims_missing(spark, captures, batch_meta):
    """J4 empty-structure fallback: all labels '' (bulk_fetch.py:133-137)."""
    empty = spark.createDataFrame([], STRUCTURES_SCHEMA)
    out = merge_lot_data(captures, batch_meta, empty)
    vals = out.select("Unit", "Operation", "Phase").distinct().collect()
    assert [tuple(v) for v in vals] == [("", "", "")]


def test_row_hash_contract(spark, captures, batch_meta, structures):
    """F6: md5('label|desc|value|time'), NULLs coalesced to ''."""
    exchange = merge_lot_data(captures, batch_meta, structures)
    row = to_lot_data(exchange).filter(F.col("structure_label") == "10 - 2").first()
    expected = hashlib.md5(
        "10 - 2|Step A|v1|7/1/2024 8:00".encode()
    ).hexdigest()
    assert row["data_hash"] == expected
    assert row["data_capture_time"] is not None


def test_load_incremental_replace_idempotent(spark, tmp_path, captures,
                                             batch_meta, structures):
    """K6 upsert + K7 per-key replace: loading twice converges."""
    wh = str(tmp_path / "wh")
    exchange = merge_lot_data(captures, batch_meta, structures)
    load_exchange(spark, exchange, wh, incremental=True)
    first = spark.read.parquet(f"{wh}/lot_data")
    n1 = first.count()
    load_exchange(spark, exchange, wh, incremental=True)
    second = spark.read.parquet(f"{wh}/lot_data")
    assert second.count() == n1
    lots = spark.read.parquet(f"{wh}/lots")
    assert lots.count() == 1
    assert lots.first()["status"] == "Released"


def test_load_bulk_appends(spark, tmp_path, captures, batch_meta, structures):
    wh = str(tmp_path / "wh2")
    exchange = merge_lot_data(captures, batch_meta, structures)
    load_exchange(spark, exchange, wh, incremental=False)
    load_exchange(spark, exchange, wh, incremental=False)
    assert spark.read.parquet(f"{wh}/lot_data").count() == 2 * exchange.count()
    # lots upsert stays deduped even under bulk re-runs
    assert spark.read.parquet(f"{wh}/lots").count() == 1
