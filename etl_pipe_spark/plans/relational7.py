"""TPC-H decision-support shapes round 4 — the eight classics the
registry still lacked (Q2/Q6/Q8/Q9/Q11/Q12/Q16/Q20 analogs).

The reference has no ad-hoc analytics surface (SURVEY §2.4 "Spark
gives them free"); with relational/2/6 this module completes all 22
TPC-H plan shapes over the driver testdata.  The testdata carries no
``partsupp`` table and no commit/receipt dates, so the five queries
that need them are ADAPTED — same plan shape, same join/agg/subquery
structure, semantics re-rooted on columns that exist (each docstring
states the substitution).  All money math goes through the decimal
parity helpers so the DuckDB hashes match bit-exactly; dates are
tuned to the testdata's 1995-2001 span.

Scale notes (100 TB): every dimension side here (part 2k rows,
supplier 100, nation 25, region 5 at sf0.01; still tiny relative to
facts at any SF) is broadcast, so the only shuffles are the fact-side
aggregations; Q20's dominant-supplier predicate is a window over the
(partkey, suppkey) aggregate — shuffle on partkey, never a self-join
of lineitem; Q2's argmax-per-part is one window over a
distinct-projected join result, not a correlated re-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.parity import MONEY, dsum, money
from ..sources.catalog import load_table
from .catalog import register


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# --------------------------------------------------------------------------
# Q6: forecast revenue change — the purest pushdown scan-aggregate.
# --------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                 * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
  CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= CAST(0.05 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE)
  AND l_quantity < 24
"""


@register("tpch_q6_forecast_revenue", oracle=_Q6_ORACLE)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue that would be gained by eliminating small
    discounts — a single-table scan-aggregate.

    The whole query is one parquet scan with every predicate pushed
    to the reader (shipdate range, discount band, quantity cap) and a
    two-column ReadSchema; at 100 TB this is the query that proves
    the scan path is right — zero shuffles beyond the final 1-row
    partial-agg merge.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(money(F.col("l_extendedprice")) * money(F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --------------------------------------------------------------------------
# Q8: national market share within a region's market for one part type.
# --------------------------------------------------------------------------

_Q8_NATION, _Q8_REGION, _Q8_TYPE = "NATION_9", "ASIA", "PROMO"

_Q8_ORACLE = f"""
WITH all_sales AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l.l_discount AS DECIMAL(18,4))) AS volume,
         n1.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n2.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  WHERE r.r_name = '{_Q8_REGION}'
    AND p.p_type = '{_Q8_TYPE}'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1998-01-01'
)
SELECT o_year,
       CAST(round(sum(CASE WHEN supp_nation = '{_Q8_NATION}'
                           THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END), 2)
            AS DOUBLE)
         / CAST(round(sum(volume), 2) AS DOUBLE) AS mkt_share,
       CAST(round(sum(volume), 2) AS DOUBLE) AS total_volume
FROM all_sales
GROUP BY o_year
ORDER BY o_year
"""


@register("tpch_q8_market_share", oracle=_Q8_ORACLE)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a region's market for a part
    type, by order year — the conditional-numerator / total-denominator
    ratio aggregate.

    Join strategy by table size class: nation/region are broadcast
    unconditionally (bounded at 25/5 rows at any SF); customer and
    supplier scale WITH the fact side, so their joins are left to AQE
    (shuffle joins that AQE downgrades to broadcast while they fit —
    forcing a broadcast hint on customer would OOM the build side at
    the 100 TB design point); part is type-filtered and hinted since
    it is the smallest SF-proportional table.  The ratio divides two
    identically-rounded decimal sums as doubles (the ``davg``
    determinism recipe), so the hash is partition-order independent.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == _Q8_TYPE)
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == _Q8_REGION)
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation.join(
                F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    volume = money(F.col("l_extendedprice")) * (F.lit(1) - money(F.col("l_discount")))
    zero = F.lit(0).cast(MONEY)
    sales = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    return (
        sales.groupBy("o_year")
        .agg(
            (dsum(F.when(F.col("supp_nation") == _Q8_NATION, F.col("volume"))
                  .otherwise(zero))
             / dsum(F.col("volume"))).alias("mkt_share"),
            dsum(F.col("volume")).alias("total_volume"),
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q9: product-line profit by supplier nation and year (adapted cost).
# --------------------------------------------------------------------------

_Q9_ORACLE = """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(round(sum(
         CAST(l.l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
         - CAST(CAST(p.p_retailprice AS DECIMAL(18,4))
                * CAST(0.05 AS DECIMAL(18,4)) AS DECIMAL(18,4))
           * CAST(l.l_quantity AS DECIMAL(18,4))
       ), 2) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%gear%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


@register("tpch_q9_product_profit", oracle=_Q9_ORACLE)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on a product line by supplier nation and
    order year.

    ADAPTED: the testdata has no ``partsupp``, so ``ps_supplycost``
    is substituted with a 5% carrying cost of ``p_retailprice`` —
    same expression tree (revenue minus cost x quantity), same
    5-table join + two-level rollup.  The cost factor is quantized
    back to DECIMAL(18,4) before the quantity multiply on BOTH
    engines so the subtraction stays bit-exact.  part/supplier/nation
    broadcast; the lineitem |><| orders shuffle is the only exchange.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    supplycost = (money(F.col("p_retailprice")) * money(F.lit(0.05))).cast(MONEY)
    amount = (
        money(F.col("l_extendedprice")) * (F.lit(1) - money(F.col("l_discount")))
        - supplycost * money(F.col("l_quantity"))
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(dsum(amount).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# --------------------------------------------------------------------------
# Q2: best supplier per part — the argmax-per-group correlated shape.
# --------------------------------------------------------------------------

_Q2_REGION = "EUROPE"

_Q2_ORACLE = f"""
WITH shipped AS (
  SELECT DISTINCT l.l_partkey, l.l_suppkey
  FROM lineitem l
), ranked AS (
  SELECT s.s_acctbal, s.s_name, n.n_name AS nation, p.p_partkey, p.p_name,
         row_number() OVER (
           PARTITION BY p.p_partkey
           ORDER BY s.s_acctbal DESC, s.s_suppkey
         ) AS rn
  FROM shipped sh
  JOIN part p ON p.p_partkey = sh.l_partkey
  JOIN supplier s ON s.s_suppkey = sh.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = '{_Q2_REGION}'
)
SELECT s_acctbal, s_name, nation, p_partkey, p_name
FROM ranked WHERE rn = 1
ORDER BY s_acctbal DESC, nation, s_name, p_partkey
LIMIT 100
"""


@register("tpch_q2_best_supplier", oracle=_Q2_ORACLE)
def tpch_q2_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for every qualifying part, the single best
    supplier in a region — the correlated-min-subquery classic.

    ADAPTED: no ``partsupp``, so "supplies part" means "has shipped
    the part" (distinct lineitem pairs) and the textbook
    ``min(ps_supplycost)`` correlation becomes argmax ``s_acctbal``.
    The plan is the scalable rewrite of the correlated subquery: ONE
    window over the distinct (part, supplier) projection instead of a
    per-part re-scan; part/supplier/nation/region all broadcast, so
    the only wide operation is the distinct — and the highly selective
    part filter joins BELOW it (Catalyst won't push a join under an
    aggregate on its own), so the shuffle carries only qualifying
    parts' pairs, not every (part, supplier) pair in the corpus.  The
    final ordering is a total order (partkey is unique after rn=1),
    so LIMIT 100 is deterministic on both engines.
    """
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    shipped = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .select("l_suppkey", "p_partkey", "p_name")
        .distinct()
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == _Q2_REGION)
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )
    w = W.partitionBy("p_partkey").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return (
        shipped.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("s_acctbal", "s_name", "nation", "p_partkey", "p_name")
        .orderBy(F.col("s_acctbal").desc(), "nation", "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q11: important stock — group value vs a fraction of the global total.
# --------------------------------------------------------------------------

_Q11_REGION, _Q11_FRACTION = "EUROPE", 0.001

_Q11_ORACLE = f"""
WITH vals AS (
  SELECT l.l_partkey AS p_partkey,
         CAST(round(sum(CAST(l.l_quantity AS DECIMAL(18,4))
                        * CAST(p.p_retailprice AS DECIMAL(18,4))), 2) AS DOUBLE)
           AS part_value
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = '{_Q11_REGION}'
  GROUP BY l.l_partkey
)
SELECT p_partkey, part_value
FROM vals
WHERE part_value >
  (SELECT CAST(sum(CAST(part_value AS DECIMAL(18,2))) AS DOUBLE) FROM vals)
  * {_Q11_FRACTION}
ORDER BY part_value DESC, p_partkey
"""


@register("tpch_q11_important_stock", oracle=_Q11_ORACLE)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose stock value exceeds a fraction of
    the global total — HAVING against a scalar subquery.

    ADAPTED: no ``partsupp``, so value = shipped quantity x retail
    price for suppliers in one region.  The scalar subquery is the
    broadcast-1-row cross join (never a driver collect).  The grand
    total re-enters DECIMAL before summing — the 2-dp part_value
    doubles round-trip losslessly through DECIMAL(18,2), the decimal
    sum is order-insensitive, and one final cast yields the same
    double bits on both engines — a plain double sum here would be
    partition-order dependent (functions/parity.py's whole reason to
    exist) and could flip rows sitting ulps from the threshold.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == _Q11_REGION)
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey")
    )
    vals = (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(dsum(money(F.col("l_quantity")) * money(F.col("p_retailprice")))
             .alias("part_value"))
    )
    total = vals.agg(
        F.sum(F.col("part_value").cast("decimal(18,2)"))
        .cast("double").alias("__total")
    )
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("__total") * F.lit(_Q11_FRACTION))
        .select("p_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


# --------------------------------------------------------------------------
# Q12: late shipments by line status and order priority class.
# --------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
  AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
"""


@register("tpch_q12_late_shipments", oracle=_Q12_ORACLE)
def tpch_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: did late shipments hit high-priority orders? —
    join + dual conditional counts.

    ADAPTED: the testdata has no commit/receipt dates or ship modes,
    so "late" means shipped more than 60 days after the order date
    and the grouping key is ``l_linestatus``.  Same plan: one
    fact-fact equi-join (the join predicate stays a pure equi-join;
    the date-lag inequality is a post-join residual so sort-merge /
    shuffled-hash still applies), then a two-conditional-sum rollup.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# --------------------------------------------------------------------------
# Q16: supplier count per part attribute, excluding flagged suppliers.
# --------------------------------------------------------------------------

_Q16_SIZES = (1, 5, 10, 15, 20, 25, 30, 35)

_Q16_ORACLE = f"""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#2'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN {_Q16_SIZES}
  AND NOT EXISTS (
    SELECT 1 FROM supplier s
    WHERE s.s_acctbal < 0 AND s.s_suppkey = l.l_suppkey
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


@register("tpch_q16_supplier_cnt", oracle=_Q16_ORACLE)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many suppliers can serve each part
    attribute bucket — COUNT(DISTINCT) with an exclusion list.

    ADAPTED: "supplies" means "has shipped" (no ``partsupp``) and the
    complaint filter is a negative account balance.  The exclusion is
    a broadcast anti join against the tiny flagged-supplier list (the
    only plan that survives when the exclusion list is built from a
    1e6-row supplier table: never a nested loop), and the oracle says
    NOT EXISTS — not the textbook NOT IN — because left_anti has
    NOT-EXISTS NULL semantics (a NULL key in either side diverges
    under NOT IN); part is broadcast; the COUNT(DISTINCT suppkey) is
    the one shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(*_Q16_SIZES))
    )
    flagged = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(flagged), F.col("s_suppkey") == F.col("l_suppkey"),
              "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# Q20: suppliers dominating a part's yearly volume — semi-join + window.
# --------------------------------------------------------------------------

_Q20_REGION = "ASIA"

_Q20_ORACLE = f"""
WITH qty AS (
  SELECT l.l_partkey, l.l_suppkey,
         sum(CAST(l.l_quantity AS DECIMAL(18,4))) AS supp_qty
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'small%'
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l.l_partkey, l.l_suppkey
), dominant AS (
  SELECT DISTINCT l_suppkey FROM (
    SELECT l_suppkey, supp_qty,
           sum(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
    FROM qty
  ) WHERE 2 * supp_qty > part_qty
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = '{_Q20_REGION}'
  AND s.s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s.s_name
"""


@register("tpch_q20_dominant_supplier", oracle=_Q20_ORACLE)
def tpch_q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding excess share of a product
    line — nested aggregate subquery feeding a semi join.

    ADAPTED: no ``partsupp.ps_availqty``, so the predicate becomes
    "shipped more than half of the part's 1996 volume" — the same
    aggregate-vs-correlated-aggregate structure.  The correlated
    comparison is ONE window over the (part, supplier) rollup
    (shuffle on partkey), compared in exact decimals via
    ``2*supp_qty > part_qty`` — no division, no float boundary.  The
    supplier/nation/region side is broadcast and the dominant set
    semi-joins it.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    qty = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(money(F.col("l_quantity"))).alias("supp_qty"))
    )
    part_qty = F.sum("supp_qty").over(W.partitionBy("l_partkey"))
    dominant = (
        qty.withColumn("part_qty", part_qty)
        .filter(F.lit(2) * F.col("supp_qty") > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == _Q20_REGION)
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
    )
    return (
        supp.join(dominant, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )
