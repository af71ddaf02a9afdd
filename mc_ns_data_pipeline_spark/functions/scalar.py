"""Scalar expression library — SURVEY.md §2.7 (F1-F14), Spark-native.

Every function here is a pure Column expression (JVM-side, whole-stage
codegen) — the reference applied equivalent logic row-at-a-time with
pandas `.apply` (reference: mastercontrol_pipeline/data_fetch_system/
utils.py:11-32, data_load_system/processors/file_processor.py:14-17).
No Python UDFs: at 100 TB the hot path must stay inside Tungsten.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference renders timestamps in US-Eastern local time with
# non-zero-padded month/day/hour (reference utils.py:29: '%-m/%-d/%Y %-H:%M').
EASTERN_TZ = "America/New_York"
EASTERN_FMT = "M/d/yyyy H:mm"

# Sentinel for missing iteration numbers (reference data_processor.py:71-74).
ITERATION_SENTINEL = -99999


def epoch_micros(ts: Column | str) -> Column:
    """Microsecond epoch of a timestamp column of EITHER flavor.

    Parquet files annotate timestamps as LTZ (isAdjustedToUTC=true) or
    NTZ; Spark's `unix_micros` only accepts TIMESTAMP (LTZ) and raises
    DATATYPE_MISMATCH on TIMESTAMP_NTZ. Sessions here pin
    spark.sql.session.timeZone=UTC (session.py), so the NTZ->LTZ cast
    is the identity on the wall-clock value and this stays exact and
    monotone for both source annotations.
    """
    c = ts if isinstance(ts, Column) else F.col(ts)
    return F.unix_micros(c.cast("timestamp_ltz"))


def epoch_seconds(ts: Column | str) -> Column:
    """Second epoch (floored) of a timestamp of either flavor; see
    `epoch_micros` for why the LTZ cast is required and exact."""
    c = ts if isinstance(ts, Column) else F.col(ts)
    return F.unix_timestamp(c.cast("timestamp_ltz"))


def eastern_local(ts: Column) -> Column:
    """F1 (part): UTC timestamp -> America/New_York local wall-clock time.

    DST-correct via the JVM tz database. Reference: utils.py:11-32.
    """
    return F.from_utc_timestamp(ts, EASTERN_TZ)


def format_eastern(ts: Column) -> Column:
    """F1: format as non-padded `M/d/yyyy H:mm` in Eastern local time."""
    return F.date_format(eastern_local(ts), EASTERN_FMT)


def parse_report_ts(s: Column) -> Column:
    """F7: parse `M/d/yyyy H:mm` report strings; NULL on failure.

    Reference: file_processor.py:82-83 (`pd.to_datetime(errors='coerce')`).
    """
    return F.try_to_timestamp(s, F.lit(EASTERN_FMT))


def conditional_concat(label: Column, iteration: Column,
                       sep: str = " - ") -> Column:
    """F2: `label - iteration` unless label=='0' or iteration is the sentinel.

    Reference: data_processor.py:76-80.
    """
    cond = (label != F.lit("0")) & (iteration != F.lit(ITERATION_SENTINEL))
    return F.when(cond, F.concat_ws(sep, label, iteration.cast("string"))) \
            .otherwise(label)


def sentinel_fill_int(c: Column) -> Column:
    """F3: NULL -> -99999, cast int. Reference: data_processor.py:74."""
    return F.coalesce(c, F.lit(ITERATION_SENTINEL)).cast("int")


def trim_all_strings(df, exclude: tuple[str, ...] = ()):
    """F4: trim every string column. Reference: bulk_fetch.py:154."""
    return df.select(*[
        F.trim(F.col(f.name)).alias(f.name)
        if f.dataType.simpleString() == "string" and f.name not in exclude
        else F.col(f.name)
        for f in df.schema.fields
    ])


def md5_row_hash(*cols: Column, sep: str = "|") -> Column:
    """F6: md5 over `|`-joined columns — the change-detection row hash.

    Null contract (SURVEY.md §7.3): each column is coalesced to '' before
    joining, so NULL and '' hash identically and the oracle can reproduce
    the digest byte-for-byte. Reference: file_processor.py:14-17.
    """
    padded = [F.coalesce(c.cast("string"), F.lit("")) for c in cols]
    return F.md5(F.concat_ws(sep, *padded))


def strip_suffix(c: Column, suffix: str) -> Column:
    """F10: drop a literal suffix if present (company-name cleanup).

    Reference: netsuite_pipeline/sales_data.py:115-124 (CASE WHEN LIKE).
    """
    return F.when(
        c.endswith(suffix),
        F.substring(c, 1, F.length(c) - len(suffix)),
    ).otherwise(c)


def sanitize_commas(c: Column) -> Column:
    """F12: `,` -> `;` for CSV-report safety. Reference: reporting.py:36,41."""
    return F.regexp_replace(c.cast("string"), ",", ";")


def window_start_6h(ts: Column) -> Column:
    """F8: epoch-aligned 6-hour tumbling window start.

    Reference windows are hour-aligned epoch ranges of 21600s
    (incremental_fetch.py:129-155); Spark's F.window is epoch-aligned, so
    `window(ts, '6 hours').start` gives identical buckets.
    """
    return F.window(ts, "6 hours").getField("start")
