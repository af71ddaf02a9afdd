"""Data-quality gate + dead-letter policy — SURVEY.md §2.8 T7.

The reference logs failures as reason strings and skips the record
forever (bulk_fetch.py:56-81; incremental_fetch.py:59-68) — the
dead-letter decision is buried in imperative control flow. Here it is a
relational operator: declare named boolean rules, split the batch into
(valid, dead) in one pass, and append dead rows with their violation
list + timestamp to an audit table. Replay = re-reading the dead-letter
table once the rule or upstream data is fixed, which the reference
cannot do (its failures leave no row behind).

Scale: the rule battery is a map-only projection; the split is two
filters over one cached/materialized pass (Catalyst shares the scan);
dead-letter writes are append-mode partitioned parquet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VIOLATIONS_COL = "_violations"


def with_violations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Append an array column naming every failed rule (empty = valid).

    A rule PASSES when its predicate is true; NULL predicate results
    count as failures (unknown is not valid) — hence the explicit
    coalesce instead of relying on three-valued logic.
    """
    checks = [
        F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
        for name, pred in rules.items()
    ]
    return df.withColumn(
        VIOLATIONS_COL,
        F.array_compact(F.array(*checks)) if checks else F.array(),
    )


def split_valid(df: DataFrame,
                rules: dict[str, Column]) -> tuple[DataFrame, DataFrame]:
    """(valid rows without the marker column, dead rows with it)."""
    marked = with_violations(df, rules)
    valid = marked.filter(F.size(VIOLATIONS_COL) == 0).drop(VIOLATIONS_COL)
    dead = marked.filter(F.size(VIOLATIONS_COL) > 0)
    return valid, dead


def write_dead_letter(dead: DataFrame, path: str,
                      mode: str = "append") -> None:
    """T7: failed rows + violations + timestamp for replay.

    `mode="overwrite"` with a run-scoped path (batch id, window span)
    gives reruns exactly-once quarantine — a crash-rerun overwrites its
    own rejects instead of appending a duplicate copy (the streaming
    gate's `batch_{id}` idiom); plain append is at-least-once.
    """
    (
        dead.withColumn("_dead_lettered_at", F.current_timestamp())
        .write.mode(mode)
        .parquet(path)
    )


def apply_gate(df: DataFrame, rules: dict[str, Column],
               dead_letter_path: str | None = None) -> DataFrame:
    """Gate a batch: optionally persist rejects, return only valid rows.

    With a dead-letter path the input is materialized once
    (localCheckpoint): the reject write and the returned valid frame
    are two consumers of the same plan, and re-running a
    non-idempotent upstream (a REST fetch) for each evaluation could
    put a row in both outputs or in neither — the lossless-split
    contract requires one physical pass.
    """
    if dead_letter_path is not None:
        df = df.localCheckpoint(eager=False)
    valid, dead = split_valid(df, rules)
    if dead_letter_path is not None:
        write_dead_letter(dead, dead_letter_path)
    return valid
