"""Third relational batch: range join (bucketed), window frames,
ranking functions, scalar function suites, and the SQL API surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.parity import dsum, money
from ..sources.catalog import load_table, register_views
from .catalog import register

# --------------------------------------------------------------------------
# Range join: events within 24h after a (mapped) user's order date.
# Spark-side: bucketize the time axis so the join is an equi-join on
# (user, day-bucket) — the guide's standard range-join decomposition —
# instead of the BroadcastNestedLoop a raw inequality join produces.
# --------------------------------------------------------------------------

_RANGE_JOIN_ORACLE = """
SELECT a.event_id AS anchor_id, a.user_id, a.ts AS anchor_ts,
       f.event_id AS followup_id, f.ts AS followup_ts, f.event_type AS followup_type
FROM events a
JOIN events f
  ON a.user_id = f.user_id
 AND f.ts > a.ts
 AND f.ts < a.ts + INTERVAL '6 hours'
WHERE a.event_type = 'signup'
"""


@register("range_join_bucketed", oracle=_RANGE_JOIN_ORACLE)
def range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join via time-bucket decomposition.

    "Events within 6 h after each signup, same user."  A raw
    inequality join compiles to a quadratic nested-loop; instead each
    anchor's (t, t+6h) window is exploded onto its two 6-hour buckets
    and the join becomes a plain equi-join on (user, bucket) plus a
    residual filter — linear shuffle, the shape that survives 100 TB.
    The plan gate asserts no NestedLoop appears.
    """
    ev = load_table(spark, sf_dir, "events")
    bucket_us = 6 * 3600 * 1_000_000
    bkt = lambda c: F.floor(F.unix_micros(c.cast("timestamp")) / bucket_us)  # noqa: E731
    anchors = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("anchor_id"),
        "user_id",
        F.col("ts").alias("anchor_ts"),
    )
    anchors_b = anchors.withColumn(
        "bucket",
        F.explode(F.array(bkt(F.col("anchor_ts")), bkt(F.col("anchor_ts")) + 1)),
    )
    followups = ev.select(
        "user_id",
        F.col("event_id").alias("followup_id"),
        F.col("ts").alias("followup_ts"),
        F.col("event_type").alias("followup_type"),
    ).withColumn("bucket", bkt(F.col("followup_ts")))
    return (
        anchors_b.join(followups, ["user_id", "bucket"])
        .filter(
            (F.col("followup_ts") > F.col("anchor_ts"))
            & (F.col("followup_ts") < F.col("anchor_ts") + F.expr("INTERVAL '6' HOUR"))
        )
        .select(
            "anchor_id", "user_id", "anchor_ts",
            "followup_id", "followup_ts", "followup_type",
        )
    )


# --------------------------------------------------------------------------
# Window frames: running totals and moving averages.
# --------------------------------------------------------------------------

_FRAMES_ORACLE = """
SELECT user_id, event_id, ts,
  CAST(round(sum(CAST(value AS DECIMAL(18,4)))
       OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
    AS running_total,
  CAST(round(sum(CAST(value AS DECIMAL(18,4)))
       OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
    / CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS moving_avg_3,
  lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
  lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
FROM events
"""


@register("window_frames", oracle=_FRAMES_ORACLE)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS-frame running totals, 3-row moving average, lag/lead."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(W.unboundedPreceding, 0)
    last3 = w.rowsBetween(-2, 0)
    val = money(F.col("value"))
    return ev.select(
        "user_id", "event_id", "ts",
        F.round(F.sum(val).over(run), 2).cast("double").alias("running_total"),
        (
            F.round(F.sum(val).over(last3), 2).cast("double")
            / F.count(F.lit(1)).over(last3).cast("double")
        ).alias("moving_avg_3"),
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


# --------------------------------------------------------------------------
# Ranking function family.
# --------------------------------------------------------------------------

_RANKING_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_totalprice,
  rank() OVER w AS rnk,
  dense_rank() OVER w AS drnk,
  row_number() OVER w AS rn,
  ntile(4) OVER w AS quartile,
  CAST(percent_rank() OVER w AS DOUBLE) AS pct_rank,
  CAST(cume_dist() OVER w AS DOUBLE) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
"""


@register("ranking_functions", oracle=_RANKING_ORACLE)
def ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number / ntile / percent_rank / cume_dist."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).cast("double").alias("pct_rank"),
        F.cume_dist().over(w).cast("double").alias("cume"),
    )


# --------------------------------------------------------------------------
# Scalar string function suite (F1-F4 family, extended).
# --------------------------------------------------------------------------

_STRINGS_ORACLE = """
SELECT doc_id,
  upper(substr(text, 1, 12)) AS head_upper,
  lower(substr(text, 1, 12)) AS head_lower,
  length(text) AS n_chars,
  lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
  replace(substr(text, 1, 30), ' ', '_') AS snake_head,
  split_part(text, ' ', 1) AS first_word,
  reverse(split_part(text, ' ', 1)) AS first_word_rev,
  substr(text, 1, 1) || '-' || CAST(n_chars AS VARCHAR) AS composite_key,
  trim('  ' || substr(text, 1, 5) || '  ') AS trimmed,
  contains(text, 'spark') AS mentions_spark,
  position('data' IN text) AS data_pos
FROM documents
"""


@register("string_functions", oracle=_STRINGS_ORACLE)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar suite: case, pad, replace, split_part, position..."""
    d = load_table(spark, sf_dir, "documents")
    head = F.substring(F.col("text"), 1, 12)
    return d.select(
        "doc_id",
        F.upper(head).alias("head_upper"),
        F.lower(head).alias("head_lower"),
        F.length("text").cast("long").alias("n_chars"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.replace(F.substring(F.col("text"), 1, 30), F.lit(" "), F.lit("_")).alias("snake_head"),
        F.split_part(F.col("text"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.reverse(F.split_part(F.col("text"), F.lit(" "), F.lit(1))).alias("first_word_rev"),
        F.concat(
            F.substring(F.col("text"), 1, 1), F.lit("-"), F.col("n_chars").cast("string")
        ).alias("composite_key"),
        F.trim(F.concat(F.lit("  "), F.substring(F.col("text"), 1, 5), F.lit("  ")))
        .alias("trimmed"),
        F.contains(F.col("text"), F.lit("spark")).alias("mentions_spark"),
        F.instr(F.col("text"), "data").cast("long").alias("data_pos"),
    )


# --------------------------------------------------------------------------
# Date/time function suite (timezone-safe subset).
# --------------------------------------------------------------------------

_DATETIME_ORACLE = """
SELECT event_id, ts,
  CAST(year(ts) AS INTEGER) AS y,
  CAST(month(ts) AS INTEGER) AS m,
  CAST(day(ts) AS INTEGER) AS d,
  CAST(hour(ts) AS INTEGER) AS h,
  CAST(minute(ts) AS INTEGER) AS mi,
  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
  CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
  CAST(ts AS DATE) + 7 AS week_later,
  ts + INTERVAL '90 seconds' AS overlap_edge
FROM events
"""


@register("datetime_functions", oracle=_DATETIME_ORACLE)
def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar suite: field extraction, truncation, arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", "ts",
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("day_start"),
        F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hour_start"),
        F.date_add(F.col("ts").cast("date"), 7).alias("week_later"),
        (F.col("ts") + F.expr("INTERVAL '90' SECOND")).alias("overlap_edge"),
    )


# --------------------------------------------------------------------------
# SQL API surface: the same engine through spark.sql over registered views.
# --------------------------------------------------------------------------

_SQL_API_ORACLE = """
SELECT c.c_mktsegment,
       count(DISTINCT o.o_custkey) AS active_customers,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS segment_revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


@register("sql_api_segment_revenue", oracle=_SQL_API_ORACLE)
def sql_api_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point: identical Catalyst plans from spark.sql(...)
    over the registered catalog views (SURVEY §3 — the reference's
    SQL-string interface, now against Spark's own optimizer)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_mktsegment,
               count(DISTINCT o.o_custkey) AS active_customers,
               count(*) AS n_orders,
               CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                 AS segment_revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        """
    )
