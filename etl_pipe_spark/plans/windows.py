"""Window-function and time-window operators.

Covers the SCD current-version derivation (SURVEY §1.1 append-only
version streams; reference transform.py:157-167 is_current_version)
as a window dedup, plus the idiomatic-Spark time windows the reference
lacked (SURVEY §2.10 ST5): tumbling, sliding, and session windows —
all with exact DuckDB oracles (counts/min/max and 2dp-decimal sums
only, so floating-point order effects can't break the hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.parity import dsum, money
from ..sources.catalog import load_table
from .catalog import register

# --------------------------------------------------------------------------
# SCD current-version derivation: latest row per key via row_number.
# --------------------------------------------------------------------------

_CURRENT_VERSION_ORACLE = """
SELECT user_id, event_id, ts, event_type, value
FROM (
  SELECT user_id, event_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


@register("current_version_window", oracle=_CURRENT_VERSION_ORACLE)
def current_version_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current version per key (reference transform.py:157-167 / SCD-2).

    The reference marks is_current_version = (end_at IS NULL) on an
    append-only stream; the pure-query equivalent derives the latest
    version per key with a descending row_number — one shuffle on the
    key, no state.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


# --------------------------------------------------------------------------
# Tumbling window aggregation (ST5).
# --------------------------------------------------------------------------

_TUMBLING_ORACLE = """
SELECT
  date_trunc('hour', ts) AS window_start,
  event_type,
  count(*) AS n_events,
  count(DISTINCT user_id) AS n_users,
  CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value,
  min(value) AS min_value,
  max(value) AS max_value
FROM events
GROUP BY 1, 2
"""


@register("tumbling_window_agg", oracle=_TUMBLING_ORACLE)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregate (idiomatic F.window)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            dsum(money(F.col("value"))).alias("total_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "n_users", "total_value", "min_value", "max_value",
        )
    )


# --------------------------------------------------------------------------
# Sliding window aggregation (ST5): 1 hour every 30 minutes.
# --------------------------------------------------------------------------

_SLIDING_ORACLE = """
WITH buckets AS (
  SELECT e.*, time_bucket(INTERVAL '30 minutes', e.ts) - k.off * INTERVAL '30 minutes' AS window_start
  FROM events e
  CROSS JOIN (SELECT unnest([0, 1]) AS off) k
)
SELECT window_start, count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
FROM buckets
WHERE ts < window_start + INTERVAL '1 hour'
GROUP BY 1
"""


@register("sliding_window_agg", oracle=_SLIDING_ORACLE)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding by 30 minutes — each event lands in 2 windows."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(money(F.col("value"))).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


# --------------------------------------------------------------------------
# Sessionization: 30-minute inactivity gap, lag + running sum.
# --------------------------------------------------------------------------

_SESSION_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_no
  FROM flagged
)
SELECT user_id,
       CAST(session_no AS BIGINT) AS session_no,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS session_value
FROM numbered
GROUP BY user_id, session_no
"""


@register("session_window_agg", oracle=_SESSION_ORACLE)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (lag + running sum; SURVEY §2.10 ST5).

    The batch equivalent of streaming session_window: a new session
    starts after >30 min of inactivity; one shuffle on user_id serves
    both window functions and the final rollup.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(prev.isNull() | (F.col("ts") - prev > F.expr("INTERVAL '30' MINUTE")), 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_no", F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)).cast("long")
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        dsum(money(F.col("value"))).alias("session_value"),
    )


# --------------------------------------------------------------------------
# Top-k per group (the reference's ordered batch caps, done right).
# --------------------------------------------------------------------------

_TOPK_PER_GROUP_ORACLE = """
SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rank_in_flag
FROM (
  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rank_in_flag
  FROM lineitem
) WHERE rank_in_flag <= 5
"""


@register("topk_per_group", oracle=_TOPK_PER_GROUP_ORACLE)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 lineitems per returnflag via ranked window (O3 done safely)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        li.withColumn("rank_in_flag", F.row_number().over(w))
        .filter(F.col("rank_in_flag") <= 5)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice", "rank_in_flag")
    )
