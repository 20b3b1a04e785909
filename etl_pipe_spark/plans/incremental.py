"""Pure-query images of the merge semantics (SQL-expressible, oracled).

The stateful merge layer itself is exercised by unit tests
(tests/test_merge.py, tests/test_incremental.py); these registry
entries express each sink's *resulting snapshot* as a pure query over
a two-batch split of ``events`` so the driver's DuckDB oracle can
hash-check the semantics end to end (SURVEY §7 Stage 4 note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources.catalog import load_table
from .catalog import register

_SPLIT = "2024-01-15 00:00:00"  # existing = before, update batch = after

# --------------------------------------------------------------------------
# L1/L3 upsert-latest snapshot: full-history "latest row per key", which is
# what repeated whole-row upserts converge to.
# --------------------------------------------------------------------------

_UPSERT_ORACLE = """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
       value AS last_value, ts AS updated_at
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
  FROM events
) WHERE rn = 1
"""


@register("merge_upsert_snapshot", oracle=_UPSERT_ORACLE)
def merge_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot equivalence of repeated UPSERTs (reference load.py:10-47).

    Applying the upsert merge batch-by-batch converges to "latest row
    per key" — expressed here as the one-pass window query so the
    oracle can check it; tests assert the batched merge produces the
    identical snapshot.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            F.col("ts").alias("updated_at"),
        )
    )


# --------------------------------------------------------------------------
# L6 insert-if-absent with overlap replay: second batch re-reads a slice of
# the first (the 90 s overlap); duplicates must vanish.
# --------------------------------------------------------------------------

_REPLAY_ORACLE = f"""
WITH batch1 AS (
  SELECT * FROM events WHERE ts < TIMESTAMP '{_SPLIT}'
), batch2 AS (  -- overlap: re-reads everything from 90 s before the split
  SELECT * FROM events WHERE ts >= TIMESTAMP '{_SPLIT}' - INTERVAL '90 seconds'
), unioned AS (
  SELECT * FROM batch1 UNION ALL SELECT * FROM batch2
)
SELECT 'EV_' || CAST(event_id AS VARCHAR) AS source_key,
       min(ts) AS event_time,
       min(user_id) AS user_id,
       min(event_type) AS event_type,
       min(value) AS amount
FROM unioned
GROUP BY 1
"""


@register("merge_replay_dedup", oracle=_REPLAY_ORACLE)
def merge_replay_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlap-replay idempotence (reference ST2/ST3 + load.py:169-187).

    Batch 2 deliberately re-reads a 90 s band of batch 1; the
    insert-if-absent key (source_key) absorbs the duplicates.  The
    unionByName + dropDuplicates plan IS the merge's logical core.
    """
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(_SPLIT).cast("timestamp_ntz")
    batch1 = ev.filter(F.col("ts") < split)
    batch2 = ev.filter(F.col("ts") >= split - F.expr("INTERVAL '90' SECOND"))
    from ..streaming.incremental import event_source_key

    merged = batch1.unionByName(batch2).dropDuplicates(["event_id"])
    return merged.select(
        event_source_key().alias("source_key"),
        F.col("ts").alias("event_time"),
        "user_id",
        "event_type",
        F.col("value").alias("amount"),
    )


# --------------------------------------------------------------------------
# L2/L5 SCD-2 close-version snapshot.
# --------------------------------------------------------------------------

_SCD2_ORACLE = """
SELECT user_id,
       ts AS version_started_at,
       event_id,
       value,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version_ended_at,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current_version
FROM events
"""


@register("scd2_version_chain", oracle=_SCD2_ORACLE)
def scd2_version_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 version chains (reference transform.py:157-167, load.py:50-83).

    Every event is a version of its user's state; the next version's
    start closes it.  One window pass computes version_ended_at /
    is_current_version exactly as the batched merge does.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.col("ts").alias("version_started_at"),
        "event_id",
        "value",
        nxt.alias("version_ended_at"),
        nxt.isNull().alias("is_current_version"),
    )
