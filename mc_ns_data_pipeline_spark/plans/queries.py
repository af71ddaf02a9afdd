"""Declared query suite Q1-Q14 (SURVEY.md §2) as Spark DataFrame plans.

Each query re-expresses an operator composition from the reference
pipeline (file:line cited per function) over the driver's synthetic
TPC-H-ish tables. Every computed column is explicitly aliased to match
the DuckDB oracle in `plans/oracles.py` (the driver's correctness gate
hash-compares values column-by-name).

Numeric determinism contract: any SUM over a double column is computed
over DECIMAL(18,4)-cast inputs (exact, order-independent — safe under
Spark's parallel partial aggregation) and cast back to double at the
end. Both engines round-trip the same decimal to the same double, so
hashes match bit-for-bit regardless of row order or partitioning.

Scale notes are inline: which side broadcasts, where the shuffles are,
and why the plan survives 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.catalog import load_table
from mc_ns_data_pipeline_spark.functions.scalar import (
    EASTERN_FMT,
    conditional_concat,
    format_eastern,
    md5_row_hash,
    strip_suffix,
)


def _dec(c: Column) -> Column:
    """Exact-aggregation cast: double -> DECIMAL(18,4)."""
    return c.cast("decimal(18,4)")


def _dec_zero() -> Column:
    return F.lit(0).cast("decimal(18,4)")


def q01_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 — filter + IN-list + NOT-startswith + projection/rename.

    Composition P2+P3+P6+P10 (reference: data_processor.py:68,170;
    bulk_fetch.py:140-158). Scale: single scan, all predicates push to
    parquet; no shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("value") > F.lit(5.0))
            & F.col("event_type").isin("click", "view", "purchase", "error", "signup")
            & ~F.col("event_type").startswith("err")
        )
        .select(
            F.col("event_id"),
            F.col("ts").alias("event_time"),
            F.col("user_id"),
            F.col("event_type").alias("action"),
            F.col("value"),
        )
    )


def q02_left_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 — left-join dimension chain with ''-fallback on misses.

    J1-J4 (reference: bulk_fetch.py:114-137 — facts left-joined to
    unit/operation/phase dims, missing dims coalesced to ''). Scale:
    nation is bounded -> explicit broadcast; part/supplier are small
    relative to lineitem -> AQE/auto-broadcast keeps the fact table
    shuffle-free.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(part, li.l_partkey == part.p_partkey, "left")
        .join(supp, li.l_suppkey == supp.s_suppkey, "left")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey, "left")
    )
    return joined.select(
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.coalesce(F.col("p_name"), F.lit("")).alias("part_name"),
        F.coalesce(F.col("p_brand"), F.lit("")).alias("part_brand"),
        F.coalesce(F.col("s_name"), F.lit("")).alias("supplier_name"),
        F.coalesce(F.col("n_name"), F.lit("")).alias("nation_name"),
    )


def q03_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 — multi-way inner join with a double-aliased dimension.

    J7 shape (reference: sales_data.py:66-73 — entitysubsidiaryrelationship
    joined twice under aliases e/cust). Here `nation` plays that role:
    customer-nation and supplier-nation. Scale: the only big-big join is
    orders⋈lineitem (shuffle on orderkey); every dim broadcasts.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.alias("cn")
    sn = nation.alias("sn")
    revenue = _dec(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn.n_nationkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn.n_nationkey"))
        .filter(F.col("cn.n_name") != F.col("sn.n_name"))
        .groupBy(
            F.col("cn.n_name").alias("cust_nation"),
            F.col("sn.n_name").alias("supp_nation"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(revenue).cast("double").alias("revenue"),
        )
        .orderBy("cust_nation", "supp_nation")
    )


def q04_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 — left-anti join: skip already-processed keys.

    J9 (reference: status_tracker.py:34-41 — `is_already_processed`
    filters out record IDs whose status log row says Success). Scale:
    the filtered key set is small -> broadcast anti-join, no shuffle of
    the fact side.
    """
    orders = load_table(spark, sf_dir, "orders")
    done = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select(F.col("event_id"))
        .distinct()
    )
    return (
        orders.join(
            F.broadcast(done), orders.o_orderkey == done.event_id, "left_anti"
        ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )


def q05_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 — broadcast inner enrichment against a small mapping table.

    J8 (reference: inventory_data.py:119-124 — inner join to the
    `dashboard_products` mapping; partial coverage drops rows). Scale:
    mapping side is filtered small -> broadcast; fact scan stays
    shuffle-free and the p_size filter pushes down.
    """
    li = load_table(spark, sf_dir, "lineitem")
    small = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= F.lit(5))
    return (
        li.join(F.broadcast(small), li.l_partkey == small.p_partkey, "inner")
        .select(
            F.col("l_orderkey"),
            F.col("l_linenumber"),
            F.col("p_name").alias("part_name"),
            F.col("p_brand").alias("part_brand"),
            F.col("p_retailprice").alias("retail_price"),
        )
    )


def q06_sales_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 — the flagship: join + wide groupBy + conditional/negated SUMs.

    A4-A7 as one statement (reference: sales_data.py:49-83 — 10-column
    GROUP BY over Transaction⋈transactionLine with sign-flipped and
    CASE-filtered SUMs, TO_CHAR date, ORDER BY). Scale: one shuffle for
    the orderkey join, one for the groupBy; partial aggregation happens
    map-side; AQE coalesces the small post-agg partitions.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem", fan_out=True)
    ext = _dec(F.col("l_extendedprice"))
    net = _dec(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
    disc = _dec(F.col("l_extendedprice") * F.col("l_discount"))
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .filter(~F.col("o_orderstatus").isin("P") & (F.col("l_quantity") > F.lit(0)))
        .groupBy(
            F.col("o_orderkey"),
            F.col("o_custkey"),
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.col("l_returnflag"),
            F.col("l_linestatus"),
        )
        .agg(
            (-F.sum(_dec(F.col("l_quantity")))).cast("double").alias("neg_total_qty"),
            F.sum(F.when(F.col("l_returnflag") == "N", ext).otherwise(_dec_zero()))
            .cast("double")
            .alias("inv_amount"),
            (-F.sum(F.when(F.col("l_returnflag") == "R", ext).otherwise(_dec_zero())))
            .cast("double")
            .alias("credit_amount"),
            (-F.sum(
                F.when(F.col("l_returnflag").isin("N", "R"), net).otherwise(_dec_zero())
            ))
            .cast("double")
            .alias("net_sales"),
            F.sum(disc).cast("double").alias("discount_amount"),
        )
        .orderBy("order_date", "o_orderkey", "l_returnflag", "l_linestatus")
    )


def q07_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 — distinct + count-distinct diagnostics.

    A1/A2 (reference: data_processor.py:35 set-dedup of record IDs;
    :120-121 `nunique()` multi-status check). Scale: count-distinct is
    a two-stage hash aggregation; no driver-side set.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec(F.col("value"))).cast("double").alias("total_value"),
        )
        .orderBy("event_type")
    )


def q08_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 — latest-row-per-key via row_number.

    The reference's `.unique()[0]`-after-sorted-fetch idiom (O3+A3,
    data_processor.py:99-105 + bulk_fetch.py:106-109) expressed
    deterministically. Scale: one shuffle on the partition key; the
    window is rank-only so it streams without buffering whole groups.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "o_orderstatus")
    )


def q09_ts_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 — timezone convert + non-padded format + parse round-trip.

    F1+F7 (reference: utils.py:11-32 UTC->America/New_York `M/d/yyyy
    H:mm`; file_processor.py:82-83 parse-back with coerce). The
    round-trip truncates to the minute — the oracle derives the same
    value via date_trunc instead of parsing, pinning both directions.
    """
    ev = load_table(spark, sf_dir, "events")
    formatted = format_eastern(F.col("ts"))
    return ev.select(
        F.col("event_id"),
        formatted.alias("formatted"),
        F.to_timestamp(formatted, EASTERN_FMT).alias("round_trip"),
    )


def q10_row_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 — md5 change-detection row hash.

    F6 (reference: file_processor.py:14-17 — md5 over '|'-joined
    columns). Doubles go through DECIMAL(18,2) before stringification so
    both engines render identical text. Scale: pure map-side expression,
    no shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        md5_row_hash(
            F.col("l_orderkey"),
            F.col("l_linenumber"),
            F.col("l_returnflag"),
            F.col("l_linestatus"),
            F.col("l_quantity").cast("decimal(18,2)"),
            F.date_format("l_shipdate", "yyyy-MM-dd"),
        ).alias("row_hash"),
    )


def q11_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 — trim / startswith / guarded-concat / suffix-strip battery.

    F2+F3+F4+F5+F10 (reference: bulk_fetch.py:154-158 trim + VOD_
    prefix; data_processor.py:76-80 orderLabel guard; sales_data.py:
    115-124 suffix strip). Scale: map-only.
    """
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        F.col("c_custkey"),
        F.trim(F.col("c_name")).alias("name_trimmed"),
        F.col("c_mktsegment").startswith("BU").alias("is_building"),
        conditional_concat(
            F.col("c_mktsegment"),
            F.coalesce(F.col("c_nationkey"), F.lit(-99999)).cast("int"),
        ).alias("segment_label"),
        strip_suffix(F.col("c_name"), "0").alias("name_stripped"),
        F.regexp_replace(F.col("c_name"), ",", ";").alias("sanitized"),
    )


def q12_enrich_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 — the INSERT…SELECT enrichment shape (select side).

    K10 (reference: sales_data.py:106-137 — dashboard table populated
    from SELECT with mapping join + CASE suffix-strip + date filter).
    Scale: customer broadcasts; orderdate filter pushes to parquet.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "inner")
        .filter(F.col("o_orderdate") > F.to_timestamp(F.lit("1998-12-31")))
        .select(
            F.col("o_orderkey"),
            F.col("c_custkey"),
            strip_suffix(F.col("c_name"), "5").alias("customer_label"),
            F.upper(F.col("c_mktsegment")).alias("segment"),
            F.col("o_totalprice").alias("total_price"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
    )


def q13_inventory_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 — 3-table inner join + literal equality filter.

    The inventory extract shape (reference: inventory_data.py:49-65 —
    inventoryitemlocations ⋈ location ⋈ item with
    `fullname = '2100 Warehouse Inventory'`). Scale: nation/region are
    bounded dims -> broadcast; the literal filter prunes before the join.
    """
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select(
            F.col("s_suppkey"),
            F.col("s_name"),
            F.col("n_name").alias("nation"),
            F.col("s_acctbal").alias("account_balance"),
        )
        .orderBy("s_suppkey")
    )


def q14_sales_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 — the full sales extract: 6-way join + conditional aggs + 3-key sort.

    J7+A4-A7+P12+F9+O1 in one statement (reference: sales_data.py:49-83).
    `nation` is joined twice (customer-side and supplier-side) mirroring
    the double-aliased entitysubsidiaryrelationship. Scale: one
    orderkey shuffle for orders⋈lineitem; every dimension broadcasts;
    group-by keys include the order key so partial aggregation is
    effective.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem", fan_out=True)
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.alias("cn")
    sn = nation.alias("sn")
    ext = _dec(F.col("l_extendedprice"))
    net = _dec(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn.n_nationkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn.n_nationkey"))
        .filter(
            ~F.col("o_orderstatus").isin("P")
            & F.col("c_mktsegment").isin(
                "BUILDING", "MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "FURNITURE"
            )
            & F.col("l_linestatus").isin("O", "F")
        )
        .groupBy(
            F.col("o_orderkey"),
            F.col("o_orderpriority"),
            F.col("c_name"),
            F.col("cn.n_name").alias("cust_nation"),
            F.col("sn.n_name").alias("supp_nation"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .agg(
            (-F.sum(_dec(F.col("l_quantity")))).cast("double").alias("neg_total_qty"),
            F.sum(F.when(F.col("l_returnflag") == "N", ext).otherwise(_dec_zero()))
            .cast("double")
            .alias("inv_amount"),
            (-F.sum(F.when(F.col("l_returnflag") == "R", ext).otherwise(_dec_zero())))
            .cast("double")
            .alias("credit_amount"),
            (-F.sum(
                F.when(F.col("l_returnflag").isin("N", "R"), net).otherwise(_dec_zero())
            ))
            .cast("double")
            .alias("net_sales"),
            F.sum(net).cast("double").alias("est_profit"),
        )
        .orderBy("order_date", "c_name", "supp_nation")
    )


def q15_rollup_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 — ROLLUP grouping sets: subtotals + grand total in one pass.

    The reference has no grouping sets (SURVEY.md §2.5 confirms by
    grep); this extends the aggregate family with the standard
    subtotal/grand-total report shape. Scale: Catalyst expands rollup
    into one Expand + single hash aggregate — one shuffle, not one scan
    per grouping set.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec(F.col("o_totalprice")))
            .cast("double")
            .alias("total_price"),
        )
    )


def q16_recent_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 — seven-day activity report (P14 timestamp-interval filter +
    O2 ORDER BY desc; reference sql/queries.py:45-56 + reporting.py).

    `events` stands in for the file_processing_history audit table.
    The reference anchors the window at CURRENT_TIMESTAMP (not
    oracle-checkable); here as_of = max(ts), computed as a tiny
    aggregate broadcast back over the scan — the standard Spark shape
    for a scalar subquery. Scale: one map-only scan + one 1-row
    broadcast; the window filter pushes to parquet row-group stats once
    as_of is resolved at runtime by AQE's subquery reuse.
    """
    from mc_ns_data_pipeline_spark.sinks.audit import recent_report

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value",
        F.col("ts").alias("processed_at"),
    )
    as_of = ev.agg(F.max("processed_at").alias("_as_of"))
    return recent_report(
        ev.crossJoin(F.broadcast(as_of)), as_of=F.col("_as_of")
    ).drop("_as_of")


QUERIES = {
    "q01_filter_project": q01_filter_project,
    "q02_left_join_chain": q02_left_join_chain,
    "q03_multiway_join": q03_multiway_join,
    "q04_anti_join": q04_anti_join,
    "q05_broadcast_enrich": q05_broadcast_enrich,
    "q06_sales_aggregate": q06_sales_aggregate,
    "q07_distinct_counts": q07_distinct_counts,
    "q08_latest_per_key": q08_latest_per_key,
    "q09_ts_roundtrip": q09_ts_roundtrip,
    "q10_row_hash": q10_row_hash,
    "q11_string_battery": q11_string_battery,
    "q12_enrich_select": q12_enrich_select,
    "q13_inventory_extract": q13_inventory_extract,
    "q14_sales_extract": q14_sales_extract,
    "q15_rollup_aggregate": q15_rollup_aggregate,
    "q16_recent_report": q16_recent_report,
}
