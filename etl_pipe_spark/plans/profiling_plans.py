"""Data-profiling and data-quality operators: the monitoring half of a
production pipeline.

* **Table profile** — the ANALYZE-style per-column statistics table
  (row count, null count, exact distinct count, min/max) every
  warehouse collects before planning and every ingest job diffs for
  schema/content drift.  One wide aggregate pass; the multi-distinct
  Expand is the standard ANALYZE cost and runs once per table, not per
  query.

* **Data-quality audit** — declarative constraint checks (foreign-key
  orphans via anti join, domain ranges, non-null rules) reduced to one
  row per rule with an exact violation count.  The reference pipeline
  trusts its inputs blindly (reference ``extract.py`` has no
  validation); production curation gates promotion on exactly this
  table.

Both are exact-arithmetic queries (counts, integer epoch-days, raw
parquet doubles compared without formatting), so the whole monitoring
surface sits under the hash-checking differential harness.

These register as ROTATION CANDIDATES (start demoted, like the five
mid-r5 TPC-H completions): they have full hash signal in the local
artifact and the oracle-parity suite this round, and take driver
window slots next rotation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table
from .catalog import register

# numeric columns profile into (min_num, max_num); strings into
# (min_str, max_str); the timestamp profiles as integer epoch-day —
# one uniform output schema, NULLs for the inapplicable kind.
_PROFILE_ORACLE = """
WITH src AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus,
         o_orderpriority,
         CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS o_orderdate_day
  FROM orders
)
SELECT 'o_custkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(o_custkey) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
       CAST(min(o_custkey) AS DOUBLE) AS min_num,
       CAST(max(o_custkey) AS DOUBLE) AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM src
UNION ALL
SELECT 'o_orderdate_day', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(o_orderdate_day) AS BIGINT),
       CAST(count(DISTINCT o_orderdate_day) AS BIGINT),
       CAST(min(o_orderdate_day) AS DOUBLE),
       CAST(max(o_orderdate_day) AS DOUBLE), NULL, NULL
FROM src
UNION ALL
SELECT 'o_orderkey', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(o_orderkey) AS BIGINT),
       CAST(count(DISTINCT o_orderkey) AS BIGINT),
       CAST(min(o_orderkey) AS DOUBLE), CAST(max(o_orderkey) AS DOUBLE),
       NULL, NULL
FROM src
UNION ALL
SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(o_orderpriority) AS BIGINT),
       CAST(count(DISTINCT o_orderpriority) AS BIGINT),
       NULL, NULL, min(o_orderpriority), max(o_orderpriority)
FROM src
UNION ALL
SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(o_orderstatus) AS BIGINT),
       CAST(count(DISTINCT o_orderstatus) AS BIGINT),
       NULL, NULL, min(o_orderstatus), max(o_orderstatus)
FROM src
UNION ALL
SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(o_totalprice) AS BIGINT),
       CAST(count(DISTINCT o_totalprice) AS BIGINT),
       min(o_totalprice), max(o_totalprice), NULL, NULL
FROM src
ORDER BY col_name
"""


@register("table_profile_stats", oracle=_PROFILE_ORACLE)
def table_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of ``orders``: one row per column
    with exact (rows, nulls, distinct, min/max) — the drift-detection
    table an ingest job publishes after every load.

    One wide aggregate computes every statistic in a single scan; the
    per-column rows come from restructuring that 1-row aggregate, NOT
    from per-column rescans, so a 100-column 100 TB table still costs
    one pass.  Exact ndv over several columns at once is the standard
    ANALYZE Expand; swap in approx_count_distinct for the cheap
    monitoring tier (the approx_aggregates query pins that machinery).
    """
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
        "o_orderpriority",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .cast("bigint").alias("o_orderdate_day"),
    )
    num_cols = ["o_custkey", "o_orderdate_day", "o_orderkey", "o_totalprice"]
    str_cols = ["o_orderpriority", "o_orderstatus"]
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in num_cols + str_cols:
        aggs += [
            F.count(c).cast("bigint").alias(f"__cnt_{c}"),
            F.countDistinct(c).cast("bigint").alias(f"__ndv_{c}"),
            F.min(c).alias(f"__min_{c}"),
            F.max(c).alias(f"__max_{c}"),
        ]
    wide = src.agg(*aggs)
    # restructure the ONE aggregate row into per-column rows with a
    # single explode — a unionByName per column would duplicate the
    # aggregate subtree (and the scan) once per column
    entries = []
    for c in num_cols + str_cols:
        is_num = c in num_cols
        entries.append(F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__cnt_{c}")).cast("bigint")
            .alias("n_nulls"),
            F.col(f"__ndv_{c}").alias("n_distinct"),
            (F.col(f"__min_{c}").cast("double") if is_num
             else F.lit(None).cast("double")).alias("min_num"),
            (F.col(f"__max_{c}").cast("double") if is_num
             else F.lit(None).cast("double")).alias("max_num"),
            (F.col(f"__min_{c}").cast("string") if not is_num
             else F.lit(None).cast("string")).alias("min_str"),
            (F.col(f"__max_{c}").cast("string") if not is_num
             else F.lit(None).cast("string")).alias("max_str"),
        ))
    return (
        wide.select(F.explode(F.array(*entries)).alias("__e"))
        .select("__e.*")
        .orderBy("col_name")
    )


# Snapshot-diff / CDC: the audit a load publishes when it replaces a
# snapshot — which keys appeared, vanished, or changed.  Two synthetic
# snapshots derive deterministically from orders (A drops keys
# % 7 == 0, B drops % 11 == 0 and perturbs o_totalprice on % 13 == 0),
# so 'added' / 'removed' / 'changed' all occur and both engines build
# the identical inputs.
_CDC_ORACLE = """
WITH a AS (
  SELECT o_orderkey AS k, o_orderstatus AS status, o_totalprice AS price
  FROM orders WHERE o_orderkey % 7 != 0
), b AS (
  SELECT o_orderkey AS k, o_orderstatus AS status,
         CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS price
  FROM orders WHERE o_orderkey % 11 != 0
)
SELECT coalesce(a.k, b.k) AS o_orderkey,
       CASE WHEN a.k IS NULL THEN 'added'
            WHEN b.k IS NULL THEN 'removed'
            ELSE 'changed' END AS change_type,
       a.price AS old_price, b.price AS new_price
FROM a FULL OUTER JOIN b ON a.k = b.k
WHERE a.k IS NULL OR b.k IS NULL
   OR a.status IS DISTINCT FROM b.status
   OR a.price IS DISTINCT FROM b.price
ORDER BY o_orderkey
"""


@register("snapshot_diff_cdc", oracle=_CDC_ORACLE)
def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture diff between two snapshot loads: one row per
    added / removed / changed key (unchanged keys drop out), the audit
    trail a replace-load publishes and the input a downstream
    incremental consumer replays.

    One FULL OUTER join on the snapshot key — at 100 TB both sides
    shuffle once on the key (or zero times if both snapshots are
    bucketed on it, the layout the writer controls); the change
    classification is null-pattern + IS DISTINCT FROM comparisons
    inside the join row, no second pass.  The registered form derives
    both snapshots from ``orders`` deterministically so the diff
    itself is hash-checked.
    """
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    b = orders.filter(F.col("o_orderkey") % 11 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.when(F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice")).alias("price"),
    )
    al, bl = a.alias("a"), b.alias("b")
    ak, bk = F.col("a.k"), F.col("b.k")
    diff = (
        al.join(bl, ak == bk, "full_outer")
        .select(
            F.coalesce(ak, bk).alias("o_orderkey"),
            F.when(ak.isNull(), "added")
            .when(bk.isNull(), "removed")
            .otherwise("changed").alias("change_type"),
            F.col("a.price").alias("old_price"),
            F.col("b.price").alias("new_price"),
            (ak.isNull() | bk.isNull()
             | ~F.col("a.status").eqNullSafe(F.col("b.status"))
             | ~F.col("a.price").eqNullSafe(F.col("b.price"))
             ).alias("__keep"),
        )
    )
    return diff.filter("__keep").drop("__keep").orderBy("o_orderkey")


_DQ_ORACLE = """
SELECT 'lineitem_orderkey_fk' AS rule,
       CAST(count(*) AS BIGINT) AS n_violations,
       count(*) = 0 AS passed
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'lineitem_quantity_domain', CAST(count(*) AS BIGINT), count(*) = 0
FROM lineitem WHERE l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50
UNION ALL
SELECT 'orders_custkey_fk', CAST(count(*) AS BIGINT), count(*) = 0
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'orders_date_range', CAST(count(*) AS BIGINT), count(*) = 0
FROM orders
WHERE o_orderdate IS NULL
   OR o_orderdate < TIMESTAMP '1990-01-01'
   OR o_orderdate >= TIMESTAMP '2005-01-01'
UNION ALL
SELECT 'orders_totalprice_positive', CAST(count(*) AS BIGINT), count(*) = 0
FROM orders WHERE o_totalprice IS NULL OR o_totalprice <= 0
ORDER BY rule
"""


@register("dq_audit_violations", oracle=_DQ_ORACLE)
def dq_audit_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit: one row per constraint with the
    exact violation count — the gate a curation pipeline runs before
    promoting a load (FK orphans, domain ranges, non-null rules).

    FK rules are LEFT ANTI joins (the orphan side streams, the key
    side is a normal hash/broadcast build — at 100 TB the orders->
    customer check broadcasts the customer keys, the lineitem->orders
    check is one shuffle on the fact key); domain rules are
    filter-count aggregates that push their predicates into the scan.
    Each rule's count is independent, so a scheduler can also run them
    as separate cheap jobs; bundling them here keeps the audit row
    atomic per load.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")

    def rule(name: str, df: DataFrame) -> DataFrame:
        return (
            df.agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
            .select(
                F.lit(name).alias("rule"),
                "n_violations",
                (F.col("n_violations") == 0).alias("passed"),
            )
        )

    checks = [
        rule("lineitem_orderkey_fk",
             lineitem.join(orders.select("o_orderkey"),
                           lineitem.l_orderkey == F.col("o_orderkey"),
                           "left_anti")),
        rule("lineitem_quantity_domain",
             lineitem.filter(F.col("l_quantity").isNull()
                             | (F.col("l_quantity") < 1)
                             | (F.col("l_quantity") > 50))),
        rule("orders_custkey_fk",
             orders.join(F.broadcast(customer.select("c_custkey")),
                         orders.o_custkey == F.col("c_custkey"),
                         "left_anti")),
        rule("orders_date_range",
             orders.filter(F.col("o_orderdate").isNull()
                           | (F.col("o_orderdate") < F.lit("1990-01-01"))
                           | (F.col("o_orderdate") >= F.lit("2005-01-01")))),
        rule("orders_totalprice_positive",
             orders.filter(F.col("o_totalprice").isNull()
                           | (F.col("o_totalprice") <= 0))),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("rule")
