"""DuckDB oracle SQL for each declared query in plans/queries.py.

Each statement is the ANSI-SQL twin of the Spark plan with identical
column names and the same numeric-determinism contract (DECIMAL(18,4)
sums cast back to DOUBLE). Tables `region nation customer supplier part
orders lineitem events documents embeddings` are pre-registered views.
"""

from __future__ import annotations

# Eastern local wall-clock derivation, session-timezone independent:
# inner timezone() interprets the naive ts as UTC, outer converts to NY.
_NY = "timezone('America/New_York', timezone('UTC', ts))"

ORACLES: dict[str, str] = {
    "q01_filter_project": """
        SELECT event_id,
               ts AS event_time,
               user_id,
               event_type AS action,
               value
        FROM events
        WHERE value > 5.0
          AND event_type IN ('click','view','purchase','error','signup')
          AND event_type NOT LIKE 'err%'
    """,
    "q02_left_join_chain": """
        SELECT l.l_orderkey,
               l.l_linenumber,
               COALESCE(p.p_name, '')  AS part_name,
               COALESCE(p.p_brand, '') AS part_brand,
               COALESCE(s.s_name, '')  AS supplier_name,
               COALESCE(n.n_name, '')  AS nation_name
        FROM lineitem l
        LEFT JOIN part     p ON l.l_partkey = p.p_partkey
        LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
        LEFT JOIN nation   n ON s.s_nationkey = n.n_nationkey
    """,
    "q03_multiway_join": """
        SELECT cn.n_name AS cust_nation,
               sn.n_name AS supp_nation,
               COUNT(*)  AS n_items,
               CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                        AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM orders o
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation  cn ON c.c_nationkey = cn.n_nationkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation  sn ON s.s_nationkey = sn.n_nationkey
        WHERE cn.n_name <> sn.n_name
        GROUP BY cn.n_name, sn.n_name
        ORDER BY cust_nation, supp_nation
    """,
    "q04_anti_join": """
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM events e
            WHERE e.event_type = 'error' AND e.event_id = o.o_orderkey
        )
    """,
    "q05_broadcast_enrich": """
        SELECT l.l_orderkey,
               l.l_linenumber,
               p.p_name AS part_name,
               p.p_brand AS part_brand,
               p.p_retailprice AS retail_price
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_size <= 5
    """,
    "q06_sales_aggregate": """
        SELECT o.o_orderkey,
               o.o_custkey,
               o.o_orderstatus,
               o.o_orderpriority,
               strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
               l.l_returnflag,
               l.l_linestatus,
               CAST(-SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                   AS neg_total_qty,
               CAST(SUM(CASE WHEN l.l_returnflag = 'N'
                             THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                   AS inv_amount,
               CAST(-SUM(CASE WHEN l.l_returnflag = 'R'
                              THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                              ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                   AS credit_amount,
               CAST(-SUM(CASE WHEN l.l_returnflag IN ('N','R')
                              THEN CAST(l.l_extendedprice * (1.0 - l.l_discount)
                                        AS DECIMAL(18,4))
                              ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                   AS net_sales,
               CAST(SUM(CAST(l.l_extendedprice * l.l_discount
                             AS DECIMAL(18,4))) AS DOUBLE)
                   AS discount_amount
        FROM orders o
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus NOT IN ('P') AND l.l_quantity > 0
        GROUP BY o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_orderpriority,
                 strftime(o.o_orderdate, '%Y-%m-%d'),
                 l.l_returnflag, l.l_linestatus
        ORDER BY order_date, o.o_orderkey, l.l_returnflag, l.l_linestatus
    """,
    "q07_distinct_counts": """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q08_latest_per_key": """
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice, o_orderstatus
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders
        )
        WHERE rn = 1
    """,
    "q09_ts_roundtrip": f"""
        SELECT event_id,
               strftime({_NY}, '%-m/%-d/%Y %-H:%M') AS formatted,
               date_trunc('minute', {_NY}) AS round_trip
        FROM events
    """,
    "q10_row_hash": """
        SELECT l_orderkey,
               l_linenumber,
               md5(concat_ws('|',
                   CAST(l_orderkey AS VARCHAR),
                   CAST(l_linenumber AS VARCHAR),
                   l_returnflag,
                   l_linestatus,
                   CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR),
                   strftime(l_shipdate, '%Y-%m-%d'))) AS row_hash
        FROM lineitem
    """,
    "q11_string_battery": """
        SELECT c_custkey,
               trim(c_name) AS name_trimmed,
               (c_mktsegment LIKE 'BU%') AS is_building,
               CASE WHEN c_mktsegment <> '0'
                         AND CAST(COALESCE(c_nationkey, -99999) AS INTEGER) <> -99999
                    THEN concat_ws(' - ', c_mktsegment,
                         CAST(CAST(COALESCE(c_nationkey, -99999) AS INTEGER) AS VARCHAR))
                    ELSE c_mktsegment END AS segment_label,
               CASE WHEN c_name LIKE '%0'
                    THEN left(c_name, length(c_name) - 1)
                    ELSE c_name END AS name_stripped,
               replace(c_name, ',', ';') AS sanitized
        FROM customer
    """,
    "q12_enrich_select": """
        SELECT o.o_orderkey,
               c.c_custkey,
               CASE WHEN c.c_name LIKE '%5'
                    THEN left(c.c_name, length(c.c_name) - 1)
                    ELSE c.c_name END AS customer_label,
               upper(c.c_mktsegment) AS segment,
               o.o_totalprice AS total_price,
               strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderdate > TIMESTAMP '1998-12-31 00:00:00'
    """,
    "q13_inventory_extract": """
        SELECT s.s_suppkey,
               s.s_name,
               n.n_name AS nation,
               s.s_acctbal AS account_balance
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        ORDER BY s_suppkey
    """,
    "q14_sales_extract": """
        SELECT o.o_orderkey,
               o.o_orderpriority,
               c.c_name,
               cn.n_name AS cust_nation,
               sn.n_name AS supp_nation,
               strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
               CAST(-SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                   AS neg_total_qty,
               CAST(SUM(CASE WHEN l.l_returnflag = 'N'
                             THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                   AS inv_amount,
               CAST(-SUM(CASE WHEN l.l_returnflag = 'R'
                              THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                              ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                   AS credit_amount,
               CAST(-SUM(CASE WHEN l.l_returnflag IN ('N','R')
                              THEN CAST(l.l_extendedprice * (1.0 - l.l_discount)
                                        AS DECIMAL(18,4))
                              ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                   AS net_sales,
               CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE)
                   AS est_profit
        FROM orders o
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation  cn ON c.c_nationkey = cn.n_nationkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation  sn ON s.s_nationkey = sn.n_nationkey
        WHERE o.o_orderstatus NOT IN ('P')
          AND c.c_mktsegment IN ('BUILDING','MACHINERY','AUTOMOBILE',
                                 'HOUSEHOLD','FURNITURE')
          AND l.l_linestatus IN ('O','F')
        GROUP BY o.o_orderkey, o.o_orderpriority, c.c_name, cn.n_name, sn.n_name,
                 strftime(o.o_orderdate, '%Y-%m-%d')
        ORDER BY order_date, c_name, supp_nation
    """,
    "q15_rollup_aggregate": """
        SELECT o_orderstatus,
               o_orderpriority,
               count(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS total_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    # q16: seven-day report window anchored at max(ts) (deterministic
    # stand-in for the reference's CURRENT_TIMESTAMP anchor).
    "q16_recent_report": """
        WITH mx AS (SELECT max(ts) AS as_of FROM events)
        SELECT event_id, user_id, event_type, value,
               ts AS processed_at
        FROM events, mx
        WHERE ts > mx.as_of - INTERVAL 7 DAY
        ORDER BY processed_at DESC
    """,
}
