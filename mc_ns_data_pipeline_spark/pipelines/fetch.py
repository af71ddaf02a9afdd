"""Fetch pipeline: API-shaped records -> the 14-column exchange contract.

Spark re-expression of the reference's `_merge_data`
(bulk_fetch.py:101-160): scalar metadata enrich (J5), the
unit/operation/phase left-join chain with per-level '' fallback
(J1-J4), derived order label (F2/F3), trim (F4), VOD_ filter (P6),
Eastern-time formatting (F1), and the final 14-column projection (P10).

Everything is one logical plan per lot batch — at scale this runs over
ALL lots at once (the reference looped lot-by-lot on one thread).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.functions.scalar import (
    conditional_concat,
    format_eastern,
    sentinel_fill_int,
    trim_all_strings,
)
from mc_ns_data_pipeline_spark.operators.joins import (
    enrich_with_structure,
    scalar_enrich,
)
from mc_ns_data_pipeline_spark.operators.projections import (
    contract_project,
    exclude_prefix,
    filter_current,
    split_by_level,
)
from mc_ns_data_pipeline_spark.schemas import OUTPUT_COLUMNS


def prepare_captures(captures: DataFrame) -> DataFrame:
    """data_processor.py:48-95: keep current rows, sentinel-fill
    iterationNumber, derive the guarded order label."""
    cur = filter_current(captures)
    it = sentinel_fill_int(F.col("iterationNumber"))
    return cur.withColumn("iterationNumber", it).withColumn(
        "orderLabel",
        conditional_concat(F.col("orderLabel"), F.col("iterationNumber")),
    )


def merge_lot_data(captures: DataFrame, batch_meta: DataFrame,
                   structures: DataFrame) -> DataFrame:
    """The full merge: captures + lot metadata + structure dims -> the
    14-column contract (all-string, ''-padded at this boundary)."""
    dims = split_by_level(structures)
    facts = enrich_with_structure(
        prepare_captures(captures),
        dims.get("UNIT_PROCEDURE"),
        dims.get("OPERATION"),
        dims.get("PHASE"),
    )
    enriched = scalar_enrich(
        facts,
        batch_meta,
        {
            "Master Template Name": "productName",
            "Lot Number": "lotNumber",
            "Product ID": "productId",
            "Production Record Status": "status",
        },
    )
    shaped = enriched.select(
        F.col("Master Template Name"),
        F.col("Lot Number"),
        F.col("Product ID"),
        F.col("Unit"),
        F.col("Operation"),
        F.col("Phase"),
        # F1 failure-passthrough: unparseable timestamps keep the raw
        # string (reference utils.py:30-32)
        F.coalesce(
            format_eastern(F.try_to_timestamp(F.col("dateTime"))),
            F.col("dateTime"),
        ).alias("Data Capture Time"),
        F.col("Production Record Status"),
        F.col("orderLabel").cast("string").alias("Structure Label"),
        F.col("title").alias("Description"),
        F.col("value").alias("Input Data Value"),
        F.col("userName").alias("Performed By"),
        F.col("actionTaken").alias("Action Performed"),
        F.col("dataCaptureName").alias("Captured Data Type"),
    )
    trimmed = trim_all_strings(shaped)
    filtered = exclude_prefix(trimmed, "Performed By")
    return contract_project(filtered, OUTPUT_COLUMNS, pad="")
