"""TPC-H decision-support shapes round 3 (Q7/Q13/Q15/Q21 analogs) plus
the salted-join skew pattern.

The reference has no ad-hoc analytics surface (SURVEY §2.4 "Spark
gives them free"); these close the remaining classic plan shapes:
cross-nation volume with an OR-of-pairs join filter (Q7), the outer
join -> double aggregation count histogram (Q13), an aggregate joined
to its own global max (Q15), and the only-late-supplier multi-EXISTS
(Q21) — re-expressed as a two-shuffle aggregation, because the
textbook triple self-join of lineitem is exactly the plan that dies
at 100 TB.  ``skew_salted_join`` demonstrates the salting recipe for
joins on pathologically low-cardinality keys, oracle-checked against
the plain join it must equal.

All money math uses the decimal-parity helpers so DuckDB hashes match
bit-exactly; dates are tuned to the driver testdata's 1995-2001 span.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.parity import dsum, money
from ..sources.catalog import load_table
from .catalog import register
from ..functions.frames import local_frame

# --------------------------------------------------------------------------
# Q7: volume shipping between two nations, by direction and year.
# --------------------------------------------------------------------------

_Q7_A, _Q7_B = "NATION_9", "NATION_10"

_Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
         AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = '{_Q7_A}' AND n2.n_name = '{_Q7_B}')
    OR (n1.n_name = '{_Q7_B}' AND n2.n_name = '{_Q7_A}'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
"""


@register("tpch_q7_volume_shipping", oracle=_Q7_ORACLE)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    shipping direction and year.

    Six-table join where the OR-of-nation-pairs predicate spans both
    fact-side lineages.  The scale play: nation x supplier and nation
    x customer are tiny — pre-filter each to the two nations of
    interest and broadcast, so the disjunction collapses to a cheap
    post-join residual over two already-pruned dimension lineages and
    the only shuffle left is lineitem |><| orders.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(_Q7_A, _Q7_B)
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(nation, F.col("n_nationkey") == F.col("c_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    rev = money(F.col("l_extendedprice")) * (F.lit(1) - money(F.col("l_discount")))
    return (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(dsum(rev).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q13: customer order-count distribution — outer join, double aggregation.
# --------------------------------------------------------------------------

_Q13_ORACLE = """
WITH c_orders AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM c_orders
GROUP BY c_count
"""


@register("tpch_q13_count_distribution", oracle=_Q13_ORACLE)
def tpch_q13_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed exactly N qualifying
    orders — including the zero-order customers an inner join loses.

    (The original's comment NOT LIKE filter stands in as a priority
    exclusion; testdata has no comment column.)  Outer join with the
    filter INSIDE the join condition — moving it to a WHERE would turn
    the join inner and silently drop the c_count = 0 bucket.  The
    second aggregation's key (c_count) is tiny-cardinality; Spark's
    partial map-side combine collapses it before the one-row-per-count
    exchange, so the histogram step is free at any corpus size.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# --------------------------------------------------------------------------
# Q15: top supplier — aggregate compared against its own global max.
# --------------------------------------------------------------------------

_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM revenue r
JOIN supplier s ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register("tpch_q15_top_supplier", oracle=_Q15_ORACLE)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue
    — ties included, which is what separates this from a top-1 LIMIT.

    The view-vs-its-own-max comparison becomes a single empty-frame
    window max over the aggregated (small) revenue relation — no
    second scan of lineitem, no self-join, and the equality test is
    bit-safe because both sides come from the same decimal-parity sum.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = money(F.col("l_extendedprice")) * (F.lit(1) - money(F.col("l_discount")))
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(rev).alias("total_revenue")
    )
    top = revenue.withColumn(
        "__max_rev", F.max("total_revenue").over(W.partitionBy())
    ).filter(F.col("total_revenue") == F.col("__max_rev"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        top.join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q21: suppliers who kept multi-supplier orders waiting.
# --------------------------------------------------------------------------

_Q21_ORACLE = """
WITH flagged AS (
  SELECT l.l_orderkey, l.l_suppkey,
         max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS is_late
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY 1, 2
),
per_order AS (
  SELECT l_orderkey,
         count(*) AS n_supps,
         sum(is_late) AS n_late,
         max(CASE WHEN is_late = 1 THEN l_suppkey END) AS sole_late_supp
  FROM flagged
  GROUP BY 1
)
SELECT s.s_name, count(*) AS numwait
FROM per_order p
JOIN supplier s ON s.s_suppkey = p.sole_late_supp
WHERE p.n_supps > 1 AND p.n_late = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 25
"""


@register("tpch_q21_waiting_supplier", oracle=_Q21_ORACLE)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    finished multi-supplier order.

    The textbook form is lineitem joined to itself twice (EXISTS
    another supplier, NOT EXISTS another late supplier) — three scans
    and two fact-to-fact shuffles of the biggest table in the schema,
    the first plan to die at 100 TB.  Re-expressed as aggregation:
    one (orderkey, suppkey) rollup with a late flag, one per-order
    rollup counting suppliers and late suppliers (the sole late
    supplier rides along via a conditional max), then a broadcast
    supplier join.  Same semantics, two map-combinable shuffles, no
    self-join.  ("Late" = shipped > 60 days after the order date, as
    in the Q4 analog; commit/receipt dates are not in the testdata.)
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    flagged = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supps"),
        F.sum("is_late").alias("n_late"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
            "sole_late_supp"
        ),
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        per_order.filter((F.col("n_supps") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("sole_late_supp"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(25)
    )


# --------------------------------------------------------------------------
# Statistical moments from exact power sums — hash-stable stddev/corr.
# --------------------------------------------------------------------------

_MOMENTS_ORACLE = """
WITH sums AS (
  SELECT l_returnflag,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 4)
                   * 100 AS BIGINT) AS DOUBLE) AS sx,
         CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 4)
                   * 100 AS BIGINT) AS DOUBLE) AS sy,
         CAST(CAST(round(sum(CAST(l_quantity AS DECIMAL(28,4))
                             * CAST(l_quantity AS DECIMAL(28,4))), 4)
                   * 10000 AS BIGINT) AS DOUBLE) AS sxx,
         CAST(CAST(round(sum(CAST(l_quantity AS DECIMAL(28,4))
                             * CAST(l_extendedprice AS DECIMAL(28,4))), 4)
                   * 10000 AS BIGINT) AS DOUBLE) AS sxy,
         CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,4))
                             * CAST(l_extendedprice AS DECIMAL(28,4))), 4)
                   * 10000 AS BIGINT) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_lines,
       sx / n / 100 AS mean_qty,
       sqrt((sxx - sx * sx / n) / (n - 1)) / 100 AS stddev_qty,
       (sxy - sx * sy / n) / (n - 1) / 10000 AS covar_qty_price,
       (n * sxy - sx * sy)
         / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price
FROM sums
"""


@register("stats_moments", oracle=_MOMENTS_ORACLE)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-flag mean / stddev / covariance / correlation that hash-match
    across engines.

    Native stddev/corr/covar aggregate doubles in partition order, so
    no two runs (let alone two engines) produce identical bits.  The
    parity recipe extends to second moments: accumulate the five power
    sums (sx, sy, sxx, sxy, syy) as EXACT decimals — one shuffle, still
    map-combinable — then surface each as a scaled BIGINT (values are
    fixed-point: x2 digits for first moments, x4 for products) before
    the one double cast.  The bigint detour is load-bearing: a
    17+-digit DECIMAL->DOUBLE cast is correctly rounded on the JVM but
    double-rounded in DuckDB (hugeint -> double -> /10^scale), and the
    engines disagree by one ulp exactly at ties — int64 -> double is
    single-rounded everywhere.  From identical doubles, identical IEEE
    expression trees (corr is scale-invariant; mean/stddev/covar divide
    the scale back out).  Deterministic at any parallelism, which is
    what makes a statistical profile of a 100 TB corpus reproducible
    run to run.  (Scaled second moments hold int64 up to ~sf1; past
    that, step the fixed-point scale down one digit per 100x rows.)
    """
    li = load_table(spark, sf_dir, "lineitem")
    x, y = money(F.col("l_quantity")), money(F.col("l_extendedprice"))

    def d(expr, scale):  # exact decimal sum -> scaled int64 -> stable double
        return (F.sum(expr) * F.lit(scale)).cast("bigint").cast("double")

    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        d(x, 100).alias("sx"), d(y, 100).alias("sy"),
        d(x * x, 10000).alias("sxx"), d(x * y, 10000).alias("sxy"),
        d(y * y, 10000).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    return sums.select(
        "l_returnflag",
        n.cast("bigint").alias("n_lines"),
        (sx / n / F.lit(100)).alias("mean_qty"),
        (F.sqrt((sxx - sx * sx / n) / (n - F.lit(1))) / F.lit(100))
        .alias("stddev_qty"),
        ((sxy - sx * sy / n) / (n - F.lit(1)) / F.lit(10000))
        .alias("covar_qty_price"),
        ((n * sxy - sx * sy)
         / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)))
        .alias("corr_qty_price"),
    )


# --------------------------------------------------------------------------
# Exact percentiles on a bounded-domain column.
# --------------------------------------------------------------------------

_PERCENTILES_ORACLE = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS p25_qty,
       quantile_cont(l_quantity, 0.50) AS p50_qty,
       quantile_cont(l_quantity, 0.75) AS p75_qty,
       quantile_cont(l_quantity, 0.90) AS p90_qty,
       CAST(max(l_quantity) AS DOUBLE) AS max_qty
FROM lineitem GROUP BY l_returnflag
"""


@register("exact_percentiles", oracle=_PERCENTILES_ORACLE)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of l_quantity per return flag.

    The exact complement of approx_aggregates' sketch family: for a
    BOUNDED domain (quantity takes ~50 distinct integer values),
    Spark's exact ``percentile`` aggregates a per-group value->count
    map — memory ~ domain size, not row count, so it map-combines and
    survives any row scale.  For open domains (prices, latencies) the
    sketch path is the scale answer; this pair of queries documents
    the decision rule.  Both engines interpolate (1-f)*lo + f*hi at
    rank (n-1)p, and ties between adjacent ranks on a dense bounded
    domain make the comparison ulp-robust.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.25)).alias("p25_qty"),
        F.percentile("l_quantity", F.lit(0.50)).alias("p50_qty"),
        F.percentile("l_quantity", F.lit(0.75)).alias("p75_qty"),
        F.percentile("l_quantity", F.lit(0.90)).alias("p90_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
    )


# --------------------------------------------------------------------------
# Salted join: the skew recipe for pathologically hot keys.
# --------------------------------------------------------------------------

_SALT_BUCKETS = 16

_FLAG_DESCRIPTIONS = [
    ("R", "returned"),
    ("A", "accepted"),
    ("N", "none"),
]

_SALTED_ORACLE = """
WITH flag_desc(flag, description) AS (
  VALUES ('R', 'returned'), ('A', 'accepted'), ('N', 'none')
)
SELECT l.l_returnflag, d.description,
       count(*) AS n_lines,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
         AS revenue
FROM lineitem l
JOIN flag_desc d ON d.flag = l.l_returnflag
GROUP BY 1, 2
"""


@register("skew_salted_join", oracle=_SALTED_ORACLE)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted shuffle join on a 3-value key, equal to the plain join.

    The skew recipe made checkable: a shuffle join keyed on
    l_returnflag sends EVERY row to one of three reducers no matter
    how many executors exist.  Salting restores parallelism — the
    fact side appends salt = pmod(hash(rowkey), 16) to its key, the
    dim side replicates each row 16x via a posexplode, and the join
    runs on (key, salt) across 3 x 16 partitions.  The oracle is the
    PLAIN join: salting must be a pure physical rewrite with zero
    semantic drift.  (For ad-hoc skew AQE's skewJoin handles splits
    automatically; explicit salting is the deterministic form that
    also covers aggregations and pre-AQE engines.)
    """
    li = load_table(spark, sf_dir, "lineitem")
    dim = local_frame(spark, _FLAG_DESCRIPTIONS, ["flag", "description"])
    salted_dim = dim.select(
        "flag", "description",
        F.posexplode(F.array([F.lit(i) for i in range(_SALT_BUCKETS)])),
    ).select("flag", "description", F.col("pos").alias("salt"))
    fact = li.withColumn(
        "salt", F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(_SALT_BUCKETS))
    )
    rev = money(F.col("l_extendedprice")) * (F.lit(1) - money(F.col("l_discount")))
    return (
        fact.hint("shuffle_hash")
        .join(salted_dim, (F.col("flag") == F.col("l_returnflag"))
              & (fact.salt == salted_dim.salt))
        .groupBy("l_returnflag", "description")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(rev).alias("revenue"),
        )
    )
