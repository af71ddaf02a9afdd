"""Exact percentiles without per-group value buffering.

`F.percentile` (and any sort-based exact percentile) buffers EVERY
value of a group inside the aggregation state — the 10× stress run
needed a 24 GiB heap for lineitem and still spent most of its time in
GC. This operator computes the SAME percentile_cont semantics from
order statistics over the DISTINCT-VALUE relation instead:

  1. (group, value) -> count        — partial-aggregable groupBy: the
     shuffle carries one row per distinct value with a merged count,
     never the raw rows;
  2. cumulative counts over the value order — a window whose partition
     holds one row per distinct value (sort-based, spill-safe, bounded
     by value cardinality rather than row count);
  3. percentile_cont's definition applied literally: for target p,
     pos = p·(n-1), k = floor(pos); the bracketing order statistics
     v_lo (rank k+1) and v_hi (rank k+2) are the rows whose cumulative
     range covers those ranks, and the result is
     v_lo + (pos - k)·(v_hi - v_lo).

The arithmetic is plain double expressions, so results agree with
DuckDB's quantile_cont the same way F.percentile does (both engines
interpolate identical operands; outputs are rounded by callers per the
suite's float contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def percentiles_by_counts(df: DataFrame, group_col: str, value_col: str,
                          targets: dict[str, float]) -> DataFrame:
    """One row per group with a column per named target percentile.

    `targets` maps output column name -> percentage in [0, 1].

    NULL handling matches percentile_cont: NULL values are ignored
    (filtered before the count aggregate, so they neither enter `_n`
    nor shift ranks). A group whose values are ALL NULL is absent from
    the output — callers needing a NULL row for such groups should
    left-join this result back onto the group relation.
    """
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = Window.partitionBy(group_col).orderBy(value_col)
    cum = counts.select(
        group_col,
        F.col(value_col).alias("_v"),
        F.sum("_c").over(w).alias("_C"),
        (F.sum("_c").over(w) - F.col("_c")).alias("_Cp"),
    )
    totals = counts.groupBy(group_col).agg(F.sum("_c").alias("_n"))
    j = cum.join(F.broadcast(totals), group_col)
    aggs = []
    for name, p in targets.items():
        pos = F.lit(p) * (F.col("_n") - 1).cast("double")
        k = F.floor(pos)
        lo = F.max(
            F.when((F.col("_Cp") <= k) & (F.col("_C") >= k + 1), F.col("_v"))
        ).alias(f"_{name}_lo")
        hi = F.max(
            F.when(
                (F.col("_Cp") <= k + 1) & (F.col("_C") >= k + 2), F.col("_v")
            )
        ).alias(f"_{name}_hi")
        aggs.extend([lo, hi])
    g = j.groupBy(group_col, "_n").agg(*aggs)
    out_cols = [F.col(group_col)]
    for name, p in targets.items():
        pos = F.lit(p) * (F.col("_n") - 1).cast("double")
        frac = pos - F.floor(pos)
        v_lo = F.col(f"_{name}_lo").cast("double")
        v_hi = F.coalesce(F.col(f"_{name}_hi"), F.col(f"_{name}_lo")).cast(
            "double"
        )
        out_cols.append((v_lo + frac * (v_hi - v_lo)).alias(name))
    return g.select(*out_cols)
