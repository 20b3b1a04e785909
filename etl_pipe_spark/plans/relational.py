"""Core relational operators (SURVEY.md §2.2-§2.7) on the test catalog.

Each query re-expresses one reference operator family against the
TPC-H-ish driver tables.  All plans are declarative DataFrame
transformations: Catalyst pushes the filters into the parquet scan,
prunes columns, and picks broadcast-hash joins for the small dimension
sides (checked via .explain in tests/bench).

Numeric parity with the DuckDB oracle uses functions.parity: decimal
arithmetic before aggregation, one final round, stable DOUBLE output.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.parity import davg, dsum, money
from ..sources.catalog import load_table
from .catalog import register

# --------------------------------------------------------------------------
# Flagship: per-order run-summary rollup.
# Reference shape: run ⟕ branch ⟕ calc feeding a grouped multi-aggregate
# with COUNT(DISTINCT), conditional SUM(CASE...), duration arithmetic and
# ROUND (reference extract.py:164-190 J3+A1+A2).  Here: orders ⟕ lineitem.
# --------------------------------------------------------------------------

_RUN_SUMMARY_ORACLE = """
SELECT
  o.o_orderkey,
  o.o_orderstatus,
  o.o_orderpriority,
  o.o_orderdate,
  count(DISTINCT l.l_suppkey) AS supplier_count,
  count(l.l_linenumber) AS line_count,
  CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS lines_returned,
  CAST(sum(CASE WHEN l.l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS lines_finished,
  CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS net_revenue,
  CAST(datediff('day', CAST(o.o_orderdate AS DATE), CAST(max(l.l_shipdate) AS DATE)) AS BIGINT)
    AS fulfillment_days
FROM orders o
LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2, 3, 4
ORDER BY net_revenue DESC NULLS LAST, o_orderkey
LIMIT 100
"""


@register("run_summary_rollup", oracle=_RUN_SUMMARY_ORACLE)
def run_summary_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped multi-aggregate over a LEFT join (reference extract.py:164-190).

    Orders with zero lineitems survive the left join with zero counts
    and NULL revenue/duration — the reference's runs-with-zero-branches
    semantics (SURVEY §2.4 A1).  Top-100 by revenue exercises the
    ordered-limit (O2/O3) as TakeOrderedAndProject.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    net = money(F.col("l_extendedprice")) * (F.lit(1) - money(F.col("l_discount")))
    # Pre-aggregate lineitem by orderkey BEFORE the join: Catalyst
    # doesn't push aggregates below joins, and doing it by hand shrinks
    # the join input ~4x and keeps the count_distinct expand off the
    # joined width — the shape that survives 100 TB (both sides then
    # shuffle-partition on the same key).
    # size(collect_set), not count_distinct: the distinct aggregate
    # plans an Expand that doubles every shuffled row for ONE column's
    # distinctness (the approx_aggregates pathology).  Per-order
    # supplier sets are tiny and bounded (lineitems per order <= 7),
    # so a set accumulator is a plain map-combinable aggregate.
    per_order = li.groupBy("l_orderkey").agg(
        F.size(F.collect_set("l_suppkey")).cast("long").alias("supplier_count"),
        F.count("l_linenumber").alias("line_count"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long").alias("lines_returned"),
        F.sum(F.when(F.col("l_linestatus") == "F", 1).otherwise(0))
        .cast("long").alias("lines_finished"),
        dsum(net).alias("net_revenue"),
        F.max("l_shipdate").alias("max_shipdate"),
    )
    return (
        orders.join(per_order, F.col("l_orderkey") == F.col("o_orderkey"), "left")
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_orderpriority",
            "o_orderdate",
            F.coalesce(F.col("supplier_count"), F.lit(0)).alias("supplier_count"),
            F.coalesce(F.col("line_count"), F.lit(0)).alias("line_count"),
            F.coalesce(F.col("lines_returned"), F.lit(0)).alias("lines_returned"),
            F.coalesce(F.col("lines_finished"), F.lit(0)).alias("lines_finished"),
            F.col("net_revenue"),
            F.datediff(F.col("max_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
            .cast("long").alias("fulfillment_days"),
        )
        .orderBy(F.col("net_revenue").desc_nulls_last(), F.col("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# P1 — incremental predicate scan (reference extract.py:101-105).
# --------------------------------------------------------------------------

_INCR_SINCE = "2024-01-20 00:00:00"

_INCREMENTAL_ORACLE = f"""
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE ts >= TIMESTAMP '{_INCR_SINCE}'
   OR (event_type = 'error' AND value >= 50)
"""


@register("incremental_scan", oracle=_INCREMENTAL_ORACLE)
def incremental_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-predicates watermark scan (reference extract.py:101-105 P1).

    The filter is a pure column predicate, so Catalyst pushes it into
    the parquet scan (row-group skipping on ts statistics) — the Spark
    analogue of shipping the WHERE clause to the source database.
    """
    from ..sources.catalog import watermark_predicate

    ev = load_table(spark, sf_dir, "events")
    # compare the column that is verbatim in the file, not its derived
    # twin: an expression-wrapped column defeats parquet pushdown (the
    # plan gate in tests/test_physical_plans.py pins this)
    return ev.filter(
        watermark_predicate(ev, _INCR_SINCE)
        | ((F.col("event_type") == "error") & (F.col("value") >= 50))
    ).select("event_id", "ts", "user_id", "event_type", "value")


# --------------------------------------------------------------------------
# P2/P3 — wide projection + rename (reference extract.py:59-97).
# --------------------------------------------------------------------------

_WIDE_PROJ_ORACLE = """
SELECT
  l_orderkey AS order_key,
  l_linenumber AS line_number,
  l_partkey AS part_key,
  l_suppkey AS supplier_key,
  l_quantity AS quantity,
  l_extendedprice AS extended_price,
  CAST(round(CAST(l_extendedprice AS DECIMAL(18,4))
             * (1 - CAST(l_discount AS DECIMAL(18,4)))
             * (1 + CAST(l_tax AS DECIMAL(18,4))), 2) AS DOUBLE) AS charged_price,
  l_returnflag = 'R' AS is_returned,
  l_shipdate AS ship_date
FROM lineitem
WHERE l_shipdate IS NOT NULL
"""


@register("wide_projection", oracle=_WIDE_PROJ_ORACLE)
def wide_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide SELECT ... AS rename with derived columns (P2/P3/P4/P5).

    Mirrors the reference's 36-column renamed projection
    (extract.py:59-97) plus the derived boolean flag pattern
    (transform.py:167 is_current_version).
    """
    li = load_table(spark, sf_dir, "lineitem")
    charged = (
        money(F.col("l_extendedprice"))
        * (F.lit(1) - money(F.col("l_discount")))
        * (F.lit(1) + money(F.col("l_tax")))
    )
    return li.filter(F.col("l_shipdate").isNotNull()).select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_number"),
        F.col("l_partkey").alias("part_key"),
        F.col("l_suppkey").alias("supplier_key"),
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("extended_price"),
        F.round(charged, 2).cast("double").alias("charged_price"),
        (F.col("l_returnflag") == "R").alias("is_returned"),
        F.col("l_shipdate").alias("ship_date"),
    )


# --------------------------------------------------------------------------
# J1/J2 — multi-dimension denormalizing join chain
# (reference extract.py:98-100, 144-147).
# --------------------------------------------------------------------------

_DENORM_ORACLE = """
SELECT
  c.c_custkey AS customer_key,
  c.c_name AS customer_name,
  c.c_mktsegment AS market_segment,
  n.n_name AS nation_name,
  r.r_name AS region_name,
  c.c_acctbal AS account_balance
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
"""


@register("denorm_join", oracle=_DENORM_ORACLE)
def denorm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-table denormalizing hierarchy flatten (J1/J2, extract.py:98-100).

    Both dimension sides are broadcast — at 100 TB the fact side never
    shuffles for dimensions this small.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            F.col("c_custkey").alias("customer_key"),
            F.col("c_name").alias("customer_name"),
            F.col("c_mktsegment").alias("market_segment"),
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
            F.col("c_acctbal").alias("account_balance"),
        )
    )


# --------------------------------------------------------------------------
# J6 — the same dimension joined twice under different roles
# (reference extract.py:259-260: population node / parent product node).
# --------------------------------------------------------------------------

_DOUBLE_ROLE_ORACLE = """
SELECT
  l.l_orderkey AS order_key,
  l.l_linenumber AS line_number,
  cn.n_name AS customer_nation,
  sn.n_name AS supplier_nation,
  cn.n_name = sn.n_name AS is_domestic
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation cn ON c.c_nationkey = cn.n_nationkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
LEFT JOIN nation sn ON s.s_nationkey = sn.n_nationkey
"""


@register("double_role_dim_join", oracle=_DOUBLE_ROLE_ORACLE)
def double_role_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One dim table joined twice under different roles (J6).

    The reference left-joins fc_model_node twice as population /
    parent-product lookups (extract.py:259-260); here nation plays the
    customer-nation and supplier-nation roles via two aliased
    broadcast joins.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.alias("cn")
    sn = nation.alias("sn")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer scales with the fact side — no broadcast hint; AQE
        # downgrades the shuffle join to broadcast while it fits
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn.n_nationkey"), "left")
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn.n_nationkey"), "left")
        .select(
            F.col("l_orderkey").alias("order_key"),
            F.col("l_linenumber").alias("line_number"),
            F.col("cn.n_name").alias("customer_nation"),
            F.col("sn.n_name").alias("supplier_nation"),
            (F.col("cn.n_name") == F.col("sn.n_name")).alias("is_domestic"),
        )
    )


# --------------------------------------------------------------------------
# A1/F3 — grouped conditional aggregation (TPC-H Q1 shape;
# reference extract.py:177-188).
# --------------------------------------------------------------------------

_PRICING_SUMMARY_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE)
    / CAST(count(l_quantity) AS DOUBLE) AS avg_qty,
  CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS high_discount_lines,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("pricing_summary", oracle=_PRICING_SUMMARY_ORACLE)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped multi-aggregate with conditional sums (A1/F3).

    The reference's per-run status rollup (extract.py:177-188) as a
    TPC-H-Q1-shaped plan: partial (map-side) aggregation then a single
    shuffle on the two low-cardinality grouping keys.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qty = money(F.col("l_quantity"))
    disc_price = money(F.col("l_extendedprice")) * (F.lit(1) - money(F.col("l_discount")))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(qty).alias("sum_qty"),
            dsum(money(F.col("l_extendedprice"))).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            davg(qty).alias("avg_qty"),
            F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0))
            .cast("long").alias("high_discount_lines"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# O1-O3 — ordered top-k (reference extract.py:150,414-415).
# --------------------------------------------------------------------------

_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC NULLS LAST, o_orderkey
LIMIT 25
"""


@register("topk_orders", oracle=_TOPK_ORACLE)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic top-k: ORDER BY with a unique tiebreaker + LIMIT.

    The reference pairs LIMIT with ORDER BY only sometimes (SURVEY
    §2.6 O3 flags the nondeterminism); our engine always adds a
    tiebreaker.  Physical plan: TakeOrderedAndProject — no global
    sort, each partition keeps k rows, driver merges.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey"))
        .limit(25)
    )


# --------------------------------------------------------------------------
# U1 + F1-F4 — multi-branch UNION ALL event timeline
# (reference extract.py:277-416, the largest single operator).
# --------------------------------------------------------------------------

_TIMELINE_ORACLE = """
WITH branches AS (
  SELECT CAST(o_orderdate AS TIMESTAMP) AS event_time,
         'ORDER_PLACED' AS event_type,
         'LIFECYCLE' AS event_category,
         CAST(o_custkey AS VARCHAR) AS actor,
         'Order placed: ' || CAST(o_orderkey AS VARCHAR)
           || COALESCE(' | Priority: ' || o_orderpriority, '') AS description,
         o_orderkey AS order_key,
         CAST(NULL AS INTEGER) AS line_number,
         CAST(NULL AS DOUBLE) AS amount,
         'OP_' || CAST(o_orderkey AS VARCHAR) AS source_key
  FROM orders
  UNION ALL
  SELECT CAST(o_orderdate AS TIMESTAMP), 'ORDER_FINISHED', 'LIFECYCLE',
         CAST(o_custkey AS VARCHAR),
         'Order finished: ' || CAST(o_orderkey AS VARCHAR),
         o_orderkey, CAST(NULL AS INTEGER), o_totalprice,
         'OF_' || CAST(o_orderkey AS VARCHAR)
  FROM orders WHERE o_orderstatus = 'F'
  UNION ALL
  SELECT CAST(l_shipdate AS TIMESTAMP), 'LINE_SHIPPED', 'FULFILLMENT',
         CAST(l_suppkey AS VARCHAR),
         'Line shipped: ' || CAST(l_orderkey AS VARCHAR) || '#'
           || CAST(l_linenumber AS VARCHAR),
         l_orderkey, l_linenumber, l_extendedprice,
         'LS_' || CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)
  FROM lineitem
  UNION ALL
  SELECT CAST(l_shipdate AS TIMESTAMP), 'LINE_RETURNED', 'FULFILLMENT',
         CAST(l_suppkey AS VARCHAR),
         'Line returned: ' || CAST(l_orderkey AS VARCHAR) || '#'
           || CAST(l_linenumber AS VARCHAR),
         l_orderkey, l_linenumber, l_extendedprice,
         'LR_' || CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)
  FROM lineitem WHERE l_returnflag = 'R'
  UNION ALL
  SELECT ts, 'USER_' || upper(event_type), 'ACTIVITY',
         CAST(user_id AS VARCHAR),
         'User event: ' || event_type,
         CAST(NULL AS BIGINT), CAST(NULL AS INTEGER), value,
         'EV_' || CAST(event_id AS VARCHAR)
  FROM events
  UNION ALL
  SELECT ts, 'USER_ERROR', 'ALERT',
         CAST(user_id AS VARCHAR),
         'Error event: ' || CAST(event_id AS VARCHAR),
         CAST(NULL AS BIGINT), CAST(NULL AS INTEGER), value,
         'ER_' || CAST(event_id AS VARCHAR)
  FROM events WHERE event_type = 'error'
  UNION ALL
  SELECT CAST(o_orderdate AS TIMESTAMP), 'HIGH_VALUE_ORDER', 'ALERT',
         CAST(o_custkey AS VARCHAR),
         'High value: ' || CAST(o_orderkey AS VARCHAR),
         o_orderkey, CAST(NULL AS INTEGER), o_totalprice,
         'HV_' || CAST(o_orderkey AS VARCHAR)
  FROM orders WHERE o_totalprice >= 400000
  UNION ALL
  SELECT CAST(o_orderdate AS TIMESTAMP), 'URGENT_ORDER', 'ALERT',
         CAST(o_custkey AS VARCHAR),
         'Urgent: ' || CAST(o_orderkey AS VARCHAR)
           || COALESCE(' | Status: ' || o_orderstatus, ''),
         o_orderkey, CAST(NULL AS INTEGER), o_totalprice,
         'UR_' || CAST(o_orderkey AS VARCHAR)
  FROM orders WHERE o_orderpriority = '1-URGENT'
)
SELECT * FROM branches
WHERE event_time IS NOT NULL
ORDER BY event_time, source_key
LIMIT 10000
"""


def _timeline_branches(spark: SparkSession, sf_dir: str) -> list[DataFrame]:
    """Eight heterogeneous projections onto one event schema.

    Mirrors reference extract.py:277-416: per-branch SELECTs with typed
    NULL literals (NULL::uuid at extract.py:298), NULL-propagating
    concat dedup keys (F1), COALESCE'd optional fragments (F2).
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    def snull(t: str):
        return F.lit(None).cast(t)

    ts = lambda c: F.col(c).cast("timestamp_ntz")  # noqa: E731

    b1 = orders.select(
        ts("o_orderdate").alias("event_time"),
        F.lit("ORDER_PLACED").alias("event_type"),
        F.lit("LIFECYCLE").alias("event_category"),
        F.col("o_custkey").cast("string").alias("actor"),
        F.concat(
            F.lit("Order placed: "), F.col("o_orderkey").cast("string"),
            F.coalesce(F.concat(F.lit(" | Priority: "), F.col("o_orderpriority")), F.lit("")),
        ).alias("description"),
        F.col("o_orderkey").alias("order_key"),
        snull("int").alias("line_number"),
        snull("double").alias("amount"),
        F.concat(F.lit("OP_"), F.col("o_orderkey").cast("string")).alias("source_key"),
    )
    b2 = orders.filter(F.col("o_orderstatus") == "F").select(
        ts("o_orderdate").alias("event_time"),
        F.lit("ORDER_FINISHED").alias("event_type"),
        F.lit("LIFECYCLE").alias("event_category"),
        F.col("o_custkey").cast("string").alias("actor"),
        F.concat(F.lit("Order finished: "), F.col("o_orderkey").cast("string")).alias("description"),
        F.col("o_orderkey").alias("order_key"),
        snull("int").alias("line_number"),
        F.col("o_totalprice").alias("amount"),
        F.concat(F.lit("OF_"), F.col("o_orderkey").cast("string")).alias("source_key"),
    )
    b3 = li.select(
        ts("l_shipdate").alias("event_time"),
        F.lit("LINE_SHIPPED").alias("event_type"),
        F.lit("FULFILLMENT").alias("event_category"),
        F.col("l_suppkey").cast("string").alias("actor"),
        F.concat(
            F.lit("Line shipped: "), F.col("l_orderkey").cast("string"),
            F.lit("#"), F.col("l_linenumber").cast("string"),
        ).alias("description"),
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_number"),
        F.col("l_extendedprice").alias("amount"),
        F.concat(
            F.lit("LS_"), F.col("l_orderkey").cast("string"),
            F.lit("_"), F.col("l_linenumber").cast("string"),
        ).alias("source_key"),
    )
    b4 = li.filter(F.col("l_returnflag") == "R").select(
        ts("l_shipdate").alias("event_time"),
        F.lit("LINE_RETURNED").alias("event_type"),
        F.lit("FULFILLMENT").alias("event_category"),
        F.col("l_suppkey").cast("string").alias("actor"),
        F.concat(
            F.lit("Line returned: "), F.col("l_orderkey").cast("string"),
            F.lit("#"), F.col("l_linenumber").cast("string"),
        ).alias("description"),
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_number"),
        F.col("l_extendedprice").alias("amount"),
        F.concat(
            F.lit("LR_"), F.col("l_orderkey").cast("string"),
            F.lit("_"), F.col("l_linenumber").cast("string"),
        ).alias("source_key"),
    )
    b5 = ev.select(
        F.col("ts").alias("event_time"),
        F.concat(F.lit("USER_"), F.upper(F.col("event_type"))).alias("event_type"),
        F.lit("ACTIVITY").alias("event_category"),
        F.col("user_id").cast("string").alias("actor"),
        F.concat(F.lit("User event: "), F.col("event_type")).alias("description"),
        snull("bigint").alias("order_key"),
        snull("int").alias("line_number"),
        F.col("value").alias("amount"),
        F.concat(F.lit("EV_"), F.col("event_id").cast("string")).alias("source_key"),
    )
    b6 = ev.filter(F.col("event_type") == "error").select(
        F.col("ts").alias("event_time"),
        F.lit("USER_ERROR").alias("event_type"),
        F.lit("ALERT").alias("event_category"),
        F.col("user_id").cast("string").alias("actor"),
        F.concat(F.lit("Error event: "), F.col("event_id").cast("string")).alias("description"),
        snull("bigint").alias("order_key"),
        snull("int").alias("line_number"),
        F.col("value").alias("amount"),
        F.concat(F.lit("ER_"), F.col("event_id").cast("string")).alias("source_key"),
    )
    b7 = orders.filter(F.col("o_totalprice") >= 400000).select(
        ts("o_orderdate").alias("event_time"),
        F.lit("HIGH_VALUE_ORDER").alias("event_type"),
        F.lit("ALERT").alias("event_category"),
        F.col("o_custkey").cast("string").alias("actor"),
        F.concat(F.lit("High value: "), F.col("o_orderkey").cast("string")).alias("description"),
        F.col("o_orderkey").alias("order_key"),
        snull("int").alias("line_number"),
        F.col("o_totalprice").alias("amount"),
        F.concat(F.lit("HV_"), F.col("o_orderkey").cast("string")).alias("source_key"),
    )
    b8 = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        ts("o_orderdate").alias("event_time"),
        F.lit("URGENT_ORDER").alias("event_type"),
        F.lit("ALERT").alias("event_category"),
        F.col("o_custkey").cast("string").alias("actor"),
        F.concat(
            F.lit("Urgent: "), F.col("o_orderkey").cast("string"),
            F.coalesce(F.concat(F.lit(" | Status: "), F.col("o_orderstatus")), F.lit("")),
        ).alias("description"),
        F.col("o_orderkey").alias("order_key"),
        snull("int").alias("line_number"),
        F.col("o_totalprice").alias("amount"),
        F.concat(F.lit("UR_"), F.col("o_orderkey").cast("string")).alias("source_key"),
    )
    return [b1, b2, b3, b4, b5, b6, b7, b8]


@register("timeline_union", oracle=_TIMELINE_ORACLE)
def timeline_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-way UNION ALL event timeline (U1, reference extract.py:277-416).

    Eight branch projections onto one 9-column event schema combined
    with unionByName, filtered on NOT NULL event_time, ordered by
    (event_time, source_key) — the tiebreaker makes the LIMIT
    deterministic, fixing the reference's unordered-LIMIT flaw.
    """
    branches = _timeline_branches(spark, sf_dir)
    timeline = reduce(DataFrame.unionByName, branches)
    return (
        timeline.filter(F.col("event_time").isNotNull())
        .orderBy("event_time", "source_key")
        .limit(10000)
    )
