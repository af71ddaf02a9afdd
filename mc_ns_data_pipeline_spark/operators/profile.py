"""Column profiling: per-column null/distinct/min/max statistics.

Data-quality profiling is the first pass any large ingest runs —
schema drift, null explosions, and cardinality blow-ups show up here
before they corrupt a training mix. The reference has no profiler
(its quality checks are per-pipeline assertions, e.g.
data_load_system/pipelines/inventory_data.py's row-count guards);
this generalizes them into one declarative operator.

Scale shape: ONE aggregation pass over the table computes every
column's statistics simultaneously (map-side partial aggregation
applies to all of them), then a `stack` unpivots the single result
row into one row per column — driver-sized, no second scan. The
only scale caveat is exact=True's distinct counts: k exact
count-distincts plan an Expand that replicates every input row k
times before the shuffle. At 100 TB use exact=False, which swaps in
approx_count_distinct (HyperLogLog++, relativeSD=0.01) — single
pass, no Expand, fixed sketch memory per column (tolerance-tested
against exact in tests/test_properties.py). The gate-declared query
(x38) runs `profile_columns_checked`: the sketch plan plus an exact
witness per column, hash-stable via the oracle-witness pattern and
plan-pinned Expand-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _fmt(dt: T.DataType, col: Column) -> Column:
    """Render a typed extremum as a deterministic string — the same
    rendering DuckDB produces, so profiles hash-match the oracle.

    Doubles round-trip through DECIMAL(18,4) (fixed-point, no
    scientific notation); timestamps through a second-precision
    format; everything else is a plain string cast.
    """
    if isinstance(dt, T.DoubleType):
        return col.cast("decimal(18,4)").cast("string")
    if isinstance(dt, T.TimestampType):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col.cast("string")


def profile_columns(df: DataFrame, columns: list[str] | None = None,
                    exact: bool = True) -> DataFrame:
    """(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)
    — one row per profiled column, ordered by column_name.
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        distinct = (
            F.count_distinct(F.col(c)) if exact
            else F.approx_count_distinct(c, rsd=0.01)
        )
        dt = df.schema[c].dataType
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            distinct.alias(f"{c}__distinct"),
            _fmt(dt, F.min(c)).alias(f"{c}__min"),
            _fmt(dt, F.max(c)).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', `{c}__nulls`, `{c}__distinct`, `{c}__min`, `{c}__max`"
        for c in cols
    )
    return (
        wide.select(
            "n_rows",
            F.expr(
                f"stack({len(cols)}, {stacked}) AS "
                "(column_name, n_nulls, n_distinct, min_value, max_value)"
            ),
        )
        .select("column_name", "n_rows", "n_nulls", "n_distinct",
                "min_value", "max_value")
        .orderBy("column_name")
    )


def profile_columns_checked(df: DataFrame,
                            columns: list[str] | None = None,
                            rsd: float = 0.01) -> DataFrame:
    """The sketch profile with an exact witness (oracle-witness
    pattern, as x21/x30): the profile row's statistics come from the
    single-pass HLL++ plan — the one you would run at 100 TB, with NO
    count-distinct Expand — and the declared output carries the exact
    distinct count plus `within_tol`, a boolean computed in-query from
    the sketch estimate (|est - exact| <= 5·rsd·exact). The oracle
    recomputes the exact count and literal TRUE, so the driver hash
    verifies the tolerance CLAIM while the hot plan is the sketch one.

    The exact witnesses deliberately run as k SEPARATE single-distinct
    aggregates (each plans as a two-phase distinct aggregate, still no
    Expand) rather than one k-distinct pass: k extra scans are the
    gate-scale price of hash-stability, and at 100 TB the witness is
    dropped entirely — the profile row alone IS the product."""
    cols = columns or df.columns
    prof = profile_columns(df, cols, exact=False).withColumnRenamed(
        "n_distinct", "_est")
    exacts = _exact_distincts(df, cols)
    return (
        prof.join(F.broadcast(exacts), "column_name", "left")
        .select(
            "column_name", "n_rows", "n_nulls",
            F.coalesce(F.col("_exact"), F.lit(0)).alias("n_distinct"),
            "min_value", "max_value",
            (F.abs(F.col("_est")
                   - F.coalesce(F.col("_exact"), F.lit(0)))
             <= F.lit(5 * rsd)
             * F.coalesce(F.col("_exact"), F.lit(0)))
            .alias("within_tol"),
        )
        .orderBy("column_name")
    )


#: Types whose string rendering is INJECTIVE (two distinct values never
#: render the same text), so a text-stacked distinct count equals the
#: per-column one. Floats qualify after `+ 0.0` normalizes -0.0 (both
#: Spark's aggregation keys and SQL equality treat ±0.0 as one value).
_TEXT_DISTINCT_TYPES = (
    T.StringType, T.LongType, T.IntegerType, T.ShortType, T.ByteType,
    T.BooleanType, T.DateType, T.TimestampType, T.TimestampNTZType,
    T.DoubleType, T.FloatType, T.DecimalType,
)


def _exact_distincts(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column_name, _exact) for every profiled column in ONE pass
    (r11: was k separate full-table aggregates): stack the columns
    into (column_name, value_text) rows — `stack` plans as a Generate,
    never a count-distinct Expand, so the x38 plan pin holds — and run
    a single two-phase distinct aggregate grouped by column_name.
    count_distinct ignores the NULLs stack emits for null cells,
    matching the per-column counts exactly. Columns outside the
    injective-text envelope (binary, nested) keep their own
    full-table aggregate — exactness over speed."""
    safe = [c for c in cols
            if isinstance(df.schema[c].dataType, _TEXT_DISTINCT_TYPES)]
    exacts = None
    if safe:
        pairs = []
        for c in safe:
            v = F.col(c)
            if isinstance(df.schema[c].dataType,
                          (T.DoubleType, T.FloatType)):
                v = v + F.lit(0.0)  # -0.0 -> +0.0; NaN stays one NaN
            pairs += [F.lit(c), v.cast("string")]
        stacked = (
            df.select(*[p.alias(f"_stk{i}")
                        for i, p in enumerate(pairs)])
            .select(F.expr("stack({}, {}) AS (column_name, _v)".format(
                len(safe),
                ", ".join(f"`_stk{i}`" for i in range(2 * len(safe))))))
        )
        exacts = (stacked.groupBy("column_name")
                  .agg(F.count_distinct(F.col("_v")).alias("_exact")))
    for c in cols:
        if c in safe:
            continue
        e = df.agg(
            F.count_distinct(F.col(c)).alias("_exact")
        ).select(F.lit(c).alias("column_name"), "_exact")
        exacts = e if exacts is None else exacts.unionByName(e)
    return exacts
