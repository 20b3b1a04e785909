"""TPC-H decision-support shapes round 2 (Q4/Q17/Q18/Q19/Q22 analogs).

The reference has no ad-hoc analytics surface at all (SURVEY §2.4
"Spark gives them free"); these five close out the classic plan
shapes the earlier rounds didn't cover: EXISTS with a correlated
range predicate (Q4), an aggregate-derived join-back threshold
(Q17), a HAVING-subquery membership join (Q18), a disjunctive
multi-predicate join filter that still extracts the equi-key (Q19),
and a global-scalar threshold + anti join (Q22).  All dates/brands
are tuned to the driver testdata's distributions; all money math
uses the decimal-parity helpers so DuckDB hashes match bit-exactly.

Scale notes: every dimension side (part at Q17/Q19, the one-row
threshold at Q22, the filtered big-order keys at Q18) is broadcast;
the only shuffles left are the unavoidable fact-side aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.parity import dsum, money
from ..sources.catalog import load_table
from .catalog import register

# --------------------------------------------------------------------------
# Q4: order-priority checking — EXISTS with a correlated range predicate.
# --------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o.o_orderpriority
"""


@register("tpch_q4_order_priority", oracle=_Q4_ORACLE)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one late line, by priority.

    (Testdata lineitem has no commit/receipt dates, so "late" is a
    ship date more than 60 days past the order date.)  The correlated
    EXISTS becomes a LEFT SEMI join whose condition mixes the equi key
    with a cross-side range predicate — Catalyst still extracts the
    equi key for the hash join and evaluates the range residual inside
    the build, no nested-loop fallback.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# Q17: small-quantity-order revenue — join back on a per-group average.
# --------------------------------------------------------------------------

_Q17_ORACLE = """
WITH thresh AS (
  SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_limit
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
         / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN thresh t ON t.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#12' AND l.l_quantity < t.qty_limit
"""


@register("tpch_q17_small_qty_revenue", oracle=_Q17_ORACLE)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders below 20% of the part's
    average quantity.

    The correlated scalar subquery becomes a pre-aggregated per-part
    threshold joined back to the fact — one extra shuffle on
    l_partkey instead of N subquery executions.  l_quantity is
    integer-valued so avg() is bit-exact in both engines at any
    aggregation order (sums of small integers are exact doubles);
    the money sum uses the decimal-parity helpers.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    thresh = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_limit")
    )
    brand = part.filter(F.col("p_brand") == "Brand#12")
    return (
        li.join(F.broadcast(brand), F.col("p_partkey") == F.col("l_partkey"))
        .join(thresh, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg((dsum(money(F.col("l_extendedprice"))).cast("double") / F.lit(7.0))
             .alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# Q18: large-volume customers — HAVING-subquery membership join.
# --------------------------------------------------------------------------

_Q18_QTY = 300

_Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > {_Q18_QTY}
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(b.total_qty AS DOUBLE) AS total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


@register("tpch_q18_large_volume", oracle=_Q18_ORACLE)
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers whose orders exceed 300 total units.

    The classic IN-(GROUP BY ... HAVING) subquery: the order-level
    quantity rollup is computed once and joined straight back, so the
    per-order total rides along instead of being re-aggregated after
    the join (the driver-side IN-list a naive translation would build
    is exactly the collect() anti-pattern).  Top-100 by price via
    TakeOrderedAndProject with the orderkey tiebreaker.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > _Q18_QTY)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q19: disjunctive predicate join — OR-of-ANDs over both join sides.
# --------------------------------------------------------------------------

_Q19_ORACLE = """
SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
         AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@register("tpch_q19_disjunctive_filter", oracle=_Q19_ORACLE)
def tpch_q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs brand/size/quantity
    filter spanning both join sides.

    The planner test: Catalyst must still recognize the conjunct
    equi-key (p_partkey = l_partkey) under the disjunction, build a
    broadcast hash join on it, and evaluate the OR as a post-join
    residual — plus push the single-side implied filters (the brand
    IN-list, the quantity hull) below the join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    branch = [
        (("Brand#12", 1, 15), (1, 11)),
        (("Brand#23", 1, 25), (10, 20)),
        (("Brand#34", 1, 35), (20, 30)),
    ]
    disj = None
    for (brand, s_lo, s_hi), (q_lo, q_hi) in branch:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
        disj = c if disj is None else (disj | c)
    rev = money(F.col("l_extendedprice")) * (F.lit(1) - money(F.col("l_discount")))
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(disj)
        .agg(dsum(rev).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q22: dormant high-balance customers — global scalar threshold + anti join.
# --------------------------------------------------------------------------

_Q22_ORACLE = """
WITH thresh AS (
  SELECT CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 4) AS DOUBLE)
           / CAST(count(c_acctbal) AS DOUBLE) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_mktsegment, count(*) AS numcust,
       CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
         AS totacctbal
FROM customer c, thresh t
WHERE c.c_acctbal > t.avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY c.c_mktsegment
"""


@register("tpch_q22_dormant_customers", oracle=_Q22_ORACLE)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no urgent
    orders, rolled up by market segment.

    (Testdata customers all have *some* order, so the dormancy
    predicate is "no URGENT order" to keep the anti join non-trivial.)
    The global scalar average rides in as a broadcast one-row cross
    join — evaluated once, never per-row; the NOT EXISTS is a LEFT
    ANTI hash join.  The average itself uses the decimal-parity
    recipe so the threshold is bit-identical in both engines.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    pos = cust.filter(F.col("c_acctbal") > 0)
    thresh = pos.agg(
        (dsum(money(F.col("c_acctbal")), 4) / F.count("c_acctbal").cast("double"))
        .alias("avg_bal")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(money(F.col("c_acctbal"))).alias("totacctbal"),
        )
    )
