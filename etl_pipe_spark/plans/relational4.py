"""Fourth relational batch: part/supplier coverage, array aggregation
and manipulation, GROUPING SETS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.parity import dsum, money
from ..sources.catalog import load_table, register_views
from .catalog import register

# --------------------------------------------------------------------------
# TPC-H Q14-style promo revenue share (part ⋈ lineitem).
# --------------------------------------------------------------------------

_PROMO_ORACLE = """
SELECT
  CAST(round(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                      THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                           * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
                      ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS promo_revenue,
  CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS total_revenue,
  count(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
"""


@register("promo_revenue_share", oracle=_PROMO_ORACLE)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue over a broadcast part join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = money(F.col("l_extendedprice")) * (F.lit(1) - money(F.col("l_discount")))
    zero = F.lit(0).cast("decimal(18,4)")
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(zero)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            dsum(promo).alias("promo_revenue"),
            dsum(rev).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Supplier rollup across nations (supplier + nation + lineitem).
# --------------------------------------------------------------------------

_SUPPLIER_ORACLE = """
SELECT n.n_name AS nation_name, s.s_suppkey, s.s_name, s.s_acctbal,
       count(l.l_orderkey) AS n_lines,
       CAST(round(sum(CAST(l.l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_qty
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
LEFT JOIN lineitem l ON l.l_suppkey = s.s_suppkey
GROUP BY 1, 2, 3, 4
"""


@register("supplier_nation_rollup", oracle=_SUPPLIER_ORACLE)
def supplier_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier shipment rollup with nation context (left join keeps
    suppliers that never shipped)."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(li, li.l_suppkey == supp.s_suppkey, "left")
        .groupBy(
            F.col("n_name").alias("nation_name"), "s_suppkey", "s_name", "s_acctbal"
        )
        .agg(
            F.count("l_orderkey").alias("n_lines"),
            dsum(money(F.col("l_quantity"))).alias("total_qty"),
        )
    )


# --------------------------------------------------------------------------
# Array aggregation + manipulation.
# --------------------------------------------------------------------------

_ARRAYS_ORACLE = """
SELECT user_id,
  to_json(list_sort(list(DISTINCT event_type))) AS event_types,
  len(list_sort(list(DISTINCT event_type))) AS n_types,
  list_contains(list(DISTINCT event_type), 'error') AS had_error,
  to_json(list_sort(list(event_id))) AS event_ids,
  list_sort(list(event_id))[1] AS first_event_id,
  list_sort(list(event_id))[-1] AS last_event_id
FROM events
GROUP BY user_id
"""


@register("array_aggregation", oracle=_ARRAYS_ORACLE)
def array_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set / collect_list with explicit sorting for determinism
    (collection order is execution-dependent on every engine), plus
    array predicates and element access.

    Array outputs are serialized with ``to_json`` at the query boundary:
    the driver's pandas canonicalizer can't hash list cells, and both
    engines render ``["a","b"]`` / ``[1,2]`` byte-identically, so the
    JSON string IS the hashable canonical form.  Array-native variants
    stay exercised in tests.
    """
    ev = load_table(spark, sf_dir, "events")
    types_sorted = F.array_sort(F.collect_set("event_type"))
    ids_sorted = F.array_sort(F.collect_list("event_id"))
    return ev.groupBy("user_id").agg(
        F.to_json(types_sorted).alias("event_types"),
        F.size(types_sorted).alias("n_types"),
        F.array_contains(types_sorted, "error").alias("had_error"),
        F.to_json(ids_sorted).alias("event_ids"),
        F.element_at(ids_sorted, 1).alias("first_event_id"),
        F.element_at(ids_sorted, -1).alias("last_event_id"),
    )


# --------------------------------------------------------------------------
# GROUPING SETS via the SQL API.
# --------------------------------------------------------------------------

_GSETS_ORACLE = """
SELECT c_mktsegment, o_orderstatus,
       CAST(GROUPING(c_mktsegment, o_orderstatus) AS BIGINT) AS gid,
       count(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), (c_mktsegment, o_orderstatus))
"""


@register("grouping_sets_orders", oracle=_GSETS_ORACLE)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form under rollup/cube)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment, o_orderstatus,
               CAST(grouping_id(c_mktsegment, o_orderstatus) AS BIGINT) AS gid,
               count(*) AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus),
                                (c_mktsegment, o_orderstatus))
        """
    )


# --------------------------------------------------------------------------
# Unpivot / melt (wide metrics -> long key/value rows).
# --------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
SELECT l_orderkey, l_linenumber, metric, value
FROM (
  SELECT l_orderkey, l_linenumber,
         CAST(l_quantity AS DOUBLE) AS quantity,
         CAST(l_extendedprice AS DOUBLE) AS extendedprice,
         CAST(l_discount AS DOUBLE) AS discount,
         CAST(l_tax AS DOUBLE) AS tax
  FROM lineitem
) UNPIVOT (value FOR metric IN (quantity, extendedprice, discount, tax))
"""


@register("unpivot_lineitem_metrics", oracle=_UNPIVOT_ORACLE)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt four measure columns into (metric, value) rows via stack()."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice,"
            " 'discount', l_discount, 'tax', l_tax) AS (metric, value)"
        ),
    )


# --------------------------------------------------------------------------
# HAVING: filter on aggregate results (TPC-H Q18 shape).
# --------------------------------------------------------------------------

_HAVING_ORACLE = """
SELECT l_orderkey,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_qty,
       count(*) AS n_lines
FROM lineitem
GROUP BY l_orderkey
HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 150
"""


@register("having_large_orders", oracle=_HAVING_ORACLE)
def having_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-level filter (HAVING): orders with > 150 total quantity."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = money(F.col("l_quantity"))
    return (
        li.groupBy("l_orderkey")
        .agg(
            dsum(qty).alias("total_qty"),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(qty).alias("__raw_total"),
        )
        .filter(F.col("__raw_total") > 150)
        .drop("__raw_total")
    )


# --------------------------------------------------------------------------
# NULL-handling scalar family.
# --------------------------------------------------------------------------

_NULLFN_ORACLE = """
SELECT o_orderkey,
  nullif(o_orderstatus, 'O') AS status_unless_open,
  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
  greatest(o_totalprice, 100000.0) AS price_floor,
  least(o_totalprice, 400000.0) AS price_cap,
  o_totalprice IS NULL AS price_missing,
  CASE WHEN o_orderpriority = '1-URGENT' THEN NULL ELSE o_orderpriority END AS deprioritized
FROM orders
"""


@register("null_handling_functions", oracle=_NULLFN_ORACLE)
def null_handling_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nullif / coalesce / greatest / least / IS NULL family."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_unless_open"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN"))
        .alias("status_or_open"),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("price_floor"),
        F.least(F.col("o_totalprice"), F.lit(400000.0)).alias("price_cap"),
        F.col("o_totalprice").isNull().alias("price_missing"),
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(None).cast("string"))
        .otherwise(F.col("o_orderpriority")).alias("deprioritized"),
    )
