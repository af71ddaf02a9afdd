"""JSONL corpus source with corrupt-record quarantine.

LLM training corpora overwhelmingly ship as JSON-Lines; at crawl scale
some fraction of lines is always malformed (truncated writes, encoding
damage, schema drift). The read must not fail the job OR silently drop
data: good rows flow on, bad RAW LINES are captured for replay — the
dead-letter pattern applied at the source boundary, complementing
quality.py's row-rule gate downstream.

Spark cite: DataFrameReader.json PERMISSIVE mode +
columnNameOfCorruptRecord (the corrupt column must be part of the
user-supplied schema, and a known engine limitation means a query may
not reference ONLY the corrupt column from the unmaterialized scan —
hence the split happens after a persist fence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType) -> tuple[DataFrame, DataFrame]:
    """Read JSONL with `schema`; returns (good_rows, corrupt_lines).

    Good rows have the declared schema; corrupt lines come back as one
    `raw` string column preserving the original bytes for replay after
    an upstream fix. The scan stays a single pass: one PERMISSIVE read,
    split post-persist (the persist is also what makes referencing the
    corrupt column legal — Spark refuses corrupt-only projections on a
    raw json scan).
    """
    # Copy, don't .add(): StructType.add mutates the receiver in place
    # and returns self, so the CALLER's schema object would grow a
    # _corrupt_record field per call (a second read with the same
    # module-level schema then fails on the duplicate column).
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    df = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .localCheckpoint(eager=False)
    )
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return good, bad


def read_jsonl_with_quarantine(spark: SparkSession, path: str,
                               schema: T.StructType,
                               quarantine_dir: str) -> DataFrame:
    """read_jsonl + persist the corrupt lines to a replayable text
    quarantine (append — reruns accumulate, dedup happens at replay)."""
    good, bad = read_jsonl(spark, path, schema)
    bad.write.mode("append").text(quarantine_dir)
    return good
