"""Projection / filter operators — SURVEY.md §2.3 (P1-P15).

The load-bearing one is the column contract (P1): the reference pads
missing columns with EMPTY STRING, not NULL (reference: utils.py:35-41),
then projects an ordered subset. Internally this engine uses proper
NULLs; `contract_project(..., pad="")` reproduces the ''-padding only at
the CSV-compat boundary (decision recorded in SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def contract_project(df: DataFrame, columns: tuple[str, ...],
                     pad: str | None = "") -> DataFrame:
    """P1: ensure `columns` exist (padding absent ones) and project in order.

    pad="" reproduces the reference's empty-string padding
    (utils.py:35-41); pad=None pads with NULL (internal default).
    """
    existing = set(df.columns)
    fill = F.lit(pad) if pad is not None else F.lit(None).cast("string")
    return df.select(*[
        F.col(c) if c in existing else fill.alias(c) for c in columns
    ])


def rename_positional(df: DataFrame, names: tuple[str, ...]) -> DataFrame:
    """P8: positional rename (`df.columns = [...]` in the reference)."""
    if len(names) != len(df.columns):
        raise ValueError(
            f"positional rename needs {len(df.columns)} names, got {len(names)}"
        )
    return df.toDF(*names)


def rename_mapped(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P9: mapped rename (fallback-API schema alignment,
    reference data_processor.py:142-145)."""
    return df.withColumnsRenamed(mapping)


def filter_current(df: DataFrame, col: str = "current") -> DataFrame:
    """P2: keep only current captures (data_processor.py:68)."""
    return df.filter(F.col(col) == F.lit(True))


def filter_levels(df: DataFrame, levels: tuple[str, ...] = (
        "UNIT_PROCEDURE", "OPERATION", "PHASE"), col: str = "level") -> DataFrame:
    """P3: IN-list level filter (data_processor.py:170)."""
    return df.filter(F.col(col).isin(*levels))


def split_by_level(df: DataFrame, col: str = "level") -> dict[str, DataFrame]:
    """P5: partition structures into unit/operation/phase dims.

    One cached scan feeding three filters (the reference re-filtered the
    same frame three times; caching keeps it one job at scale).
    """
    cached = df.cache()
    return {
        level: cached.filter(F.col(col) == level)
        for level in ("UNIT_PROCEDURE", "OPERATION", "PHASE")
    }


def exclude_prefix(df: DataFrame, col: str, prefix: str = "VOD_") -> DataFrame:
    """P6: NOT-LIKE prefix filter (bulk_fetch.py:158 — drop VOD_ users)."""
    return df.filter(~F.col(col).startswith(prefix))


def id_range(spark, start_id: int, end_id: int,
             col: str = "productionRecordId") -> DataFrame:
    """P15: the bulk driver's ID space as a distributed range scan.

    `spark.range` partitions the ID space across executors — the scale
    replacement for the reference's sequential `for id in range(...)`
    (bulk_fetch.py:168-178).
    """
    return spark.range(start_id, end_id + 1).withColumnRenamed("id", col)
