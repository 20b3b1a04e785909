"""Extended relational surface: the operators Spark gives for free that
the reference never had (SURVEY §2.4/§2.5 "Spark gives them free"
notes), plus the classic OLAP shapes (TPC-H Q3/Q5/Q10) and an as-of
join — the canonical "operator Spark lacks natively" composed from
windows (pyspark guide: merge_asof pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.parity import dsum, money
from ..sources.catalog import load_table
from .catalog import register

# --------------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS).
# --------------------------------------------------------------------------

_SEMI_ORACLE = """
SELECT c.c_custkey, c.c_name, c.c_mktsegment
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
"""


@register("semi_join_urgent_customers", oracle=_SEMI_ORACLE)
def semi_join_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi join == EXISTS: customers with at least one urgent order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


_ANTI_ORACLE = """
SELECT c.c_custkey, c.c_name, c.c_acctbal
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
)
"""


@register("anti_join_orderless_customers", oracle=_ANTI_ORACLE)
def anti_join_orderless_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti join == NOT EXISTS: customers who never ordered."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


# --------------------------------------------------------------------------
# Set operations: INTERSECT / EXCEPT.
# --------------------------------------------------------------------------

_SETOPS_ORACLE = """
WITH urgent AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
finished AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'),
both_kinds AS (SELECT custkey FROM urgent INTERSECT SELECT custkey FROM finished),
only_urgent AS (SELECT custkey FROM urgent EXCEPT SELECT custkey FROM finished)
SELECT custkey, 'both' AS membership FROM both_kinds
UNION ALL
SELECT custkey, 'urgent_only' AS membership FROM only_urgent
"""


@register("set_ops_membership", oracle=_SETOPS_ORACLE)
def set_ops_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect + exceptAll(distinct) + union over customer key sets."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT") \
        .select(F.col("o_custkey").alias("custkey")).distinct()
    finished = orders.filter(F.col("o_orderstatus") == "F") \
        .select(F.col("o_custkey").alias("custkey")).distinct()
    both = urgent.intersect(finished).withColumn("membership", F.lit("both"))
    only = urgent.exceptAll(finished).withColumn("membership", F.lit("urgent_only"))
    return both.unionByName(only)


# --------------------------------------------------------------------------
# ROLLUP / CUBE with grouping_id.
# --------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


@register("rollup_orders", oracle=_ROLLUP_ORACLE)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP totals (status -> status+priority -> grand)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum(money(F.col("o_totalprice"))).alias("total_price"),
    )


_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       count(*) AS n_lines,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_qty
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""


@register("cube_lineitem", oracle=_CUBE_ORACLE)
def cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).alias("n_lines"),
        dsum(money(F.col("l_quantity"))).alias("total_qty"),
    )


# --------------------------------------------------------------------------
# Pivot (and its explicit conditional-aggregation image for the oracle).
# --------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT o_orderpriority,
  CAST(round(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS F,
  CAST(round(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS O,
  CAST(round(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS P
FROM orders
GROUP BY o_orderpriority
"""


@register("pivot_status_revenue", oracle=_PIVOT_ORACLE)
def pivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order status into columns; pivot IS conditional aggregation,
    which is exactly how the oracle states it."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(dsum(money(F.col("o_totalprice"))))
    )


# --------------------------------------------------------------------------
# As-of join (Spark has no native one; composed via union + window —
# the standard pattern; DuckDB's native ASOF JOIN is the oracle).
# --------------------------------------------------------------------------

_ASOF_ORACLE = """
SELECT o.o_orderkey, o.o_custkey % 15 AS ukey, o.o_orderdate,
       e.event_id AS last_event_id, e.ts AS last_event_ts, e.event_type AS last_event_type
FROM orders o
ASOF LEFT JOIN events e
  ON (o.o_custkey % 15) = e.user_id AND e.ts <= CAST(o.o_orderdate AS TIMESTAMP)
"""


@register("asof_join_last_event", oracle=_ASOF_ORACLE)
def asof_join_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each order, the user's most recent event at or
    before the order date.

    Spark lacks a native ASOF; the scalable composition is
    union-the-two-streams + last_value(ignorenulls) over a
    (key, time)-ordered window — one shuffle on the key, no range
    explosion.  (user key = o_custkey % 15 maps orders onto the
    events table's user space.)

    Tie note: we break equal event timestamps by event_id; DuckDB's
    native ASOF picks arbitrarily on ties.  Safe here because
    (user_id, micro-truncated ts) is verified collision-free at every
    scale factor — revisit if the corpus ever gains same-instant
    events per user.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 15).alias("ukey"),
        F.col("o_custkey"),
        F.col("o_orderdate"),
    )
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("ukey"),
        F.col("ts"),
        "event_id",
        "event_type",
    )
    left = orders.select(
        "ukey",
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("kind"),  # orders sort after events at equal t (<= semantics)
        "o_orderkey",
        "o_orderdate",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp_ntz").alias("ts"),
        F.lit(None).cast("string").alias("event_type"),
    )
    right = ev.select(
        "ukey",
        F.col("ts").alias("t"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp_ntz").alias("o_orderdate"),
        "event_id",
        "ts",
        "event_type",
    )
    w = (
        W.partitionBy("ukey")
        .orderBy("t", "kind", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    merged = left.unionByName(right).select(
        "*",
        F.last("event_id", ignorenulls=True).over(w).alias("last_event_id"),
        F.last("ts", ignorenulls=True).over(w).alias("last_event_ts"),
        F.last("event_type", ignorenulls=True).over(w).alias("last_event_type"),
    )
    return merged.filter(F.col("kind") == 1).select(
        "o_orderkey", "ukey", "o_orderdate",
        "last_event_id", "last_event_ts", "last_event_type",
    )


# --------------------------------------------------------------------------
# TPC-H classics (parity-safe aggregate forms).
# --------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT l.l_orderkey,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


@register("tpch_q3_shipping_priority", oracle=_Q3_ORACLE)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filter each side, top-10 revenue."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = money(F.col("l_extendedprice")) * (F.lit(1) - money(F.col("l_discount")))
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, cust.c_custkey == orders.o_custkey)
        .filter(F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(rev).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_Q5_ORACLE = """
SELECT n.n_name AS nation_name,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""


@register("tpch_q5_local_supplier", oracle=_Q5_ORACLE)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with a same-nation constraint."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = money(F.col("l_extendedprice")) * (F.lit(1) - money(F.col("l_discount")))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(dsum(rev).alias("revenue"))
    )


_Q10_ORACLE = """
SELECT c.c_custkey, c.c_name,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
       c.c_acctbal, n.n_name AS nation_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@register("tpch_q10_returned_items", oracle=_Q10_ORACLE)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns, top-20 customers."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    rev = money(F.col("l_extendedprice")) * (F.lit(1) - money(F.col("l_discount")))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li.filter(F.col("l_returnflag") == "R"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation_name"))
        .agg(dsum(rev).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )
