"""Semi-structured (JSON column) extraction.

Event streams routinely carry a free-form JSON properties column; the
engine needs typed extraction without a Python stage. `from_json` is a
JVM-side expression (whole-stage codegen, no Arrow hop), so parsing a
100 TB event table stays map-only with zero shuffles — the schema is
declared, Catalyst prunes unreferenced JSON fields at parse time.

Malformed-input contract: PERMISSIVE `from_json` does NOT null the
struct on parse failure — it returns an all-null row, indistinguishable
from a valid-but-empty document. `parse_json_col` therefore threads a
corrupt-record column through the parse and surfaces an explicit
`<col>_valid` flag, so a quality gate (quality.py) can quarantine bad
rows rather than lose them. (Reference's loaders assume well-formed
payloads; SURVEY §2.1 S4 covers the REST JSON flatten — this is the
column-level analogue.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_CORRUPT = "_corrupt_record"


def parse_json_col(df: DataFrame, col: str, schema: StructType,
                   keep_raw: bool = False) -> DataFrame:
    """Parse a JSON string column into typed top-level columns.

    Adds one column per schema field plus `<col>_valid`; drops the raw
    JSON unless `keep_raw`. Fields missing from a valid document come
    out NULL (JSON semantics); NULL input or documents that fail to
    parse set `<col>_valid = false` with all fields NULL. A document
    whose field exists but cannot coerce to the declared type is also
    flagged invalid (Spark routes it to the corrupt-record column).
    """
    aug = StructType(
        list(schema.fields) + [StructField(_CORRUPT, StringType())]
    )
    parsed = F.from_json(
        F.col(col), aug, {"columnNameOfCorruptRecord": _CORRUPT}
    )
    out = df.withColumn("_parsed", parsed).withColumn(
        f"{col}_valid",
        F.col("_parsed").isNotNull() & F.col(f"_parsed.{_CORRUPT}").isNull(),
    )
    for field in schema.fields:
        out = out.withColumn(field.name, F.col(f"_parsed.{field.name}"))
    out = out.drop("_parsed")
    return out if keep_raw else out.drop(col)


def json_get_int(col: Column, path: str) -> Column:
    """Single-path integer extraction (`get_json_object` — for ad-hoc
    pulls where declaring a full schema is overkill)."""
    return F.get_json_object(col, f"$.{path}").cast("int")
