"""Streaming-executed registry queries.

These run a real Structured Streaming query (AvailableNow trigger) and
return the drained result table, so the driver's oracle check
exercises the streaming engine itself — watermark handling included —
against plain batch SQL in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.structured import read_events_stream, run_stream_to_table, windowed_counts
from .catalog import register

_STREAM_COUNTS_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n_events
FROM events
GROUP BY 1, 2
"""


@register("streaming_tumbling_counts", oracle=_STREAM_COUNTS_ORACLE)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window counts computed by Structured Streaming (ST1/ST2/ST5).

    A finite run over the events table must produce exactly the batch
    answer — "complete" output mode emits every window, and the 90 s
    watermark only drops data that would be late *across* batches,
    of which a single AvailableNow pass has none.
    """
    stream = read_events_stream(spark, sf_dir)
    return run_stream_to_table(spark, windowed_counts(stream))


_STREAM_DEDUP_ORACLE = """
SELECT event_type, COUNT(*) AS n_unique
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("streaming_dedup_watermark", oracle=_STREAM_DEDUP_ORACLE)
def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup under the hash check: every event
    is delivered TWICE (the stream unions with itself — the worst
    at-least-once redelivery), ``dropDuplicatesWithinWatermark`` on
    event_id absorbs the duplicates inside the 90 s lateness bound,
    and the drained per-type counts must equal DuckDB's counts over
    the ORIGINAL table — proving exactly-once semantics came from the
    operator's state, not from sink-side key merges (ST3 moved into
    the stream; streaming/stateful.dedup_within_watermark).
    """
    from ..streaming.stateful import dedup_within_watermark

    stream = read_events_stream(spark, sf_dir)
    doubled = stream.unionByName(stream)
    deduped = dedup_within_watermark(doubled, keys=["event_id"], ts_col="ts")
    drained = run_stream_to_table(
        spark, deduped.select("event_id", "event_type"),
        output_mode="append")
    return (
        drained.groupBy("event_type")
        .agg({"*": "count"}).withColumnRenamed("count(1)", "n_unique")
        .orderBy("event_type")
    )
