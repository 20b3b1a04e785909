"""Custom stateful streaming operator (applyInPandasWithState)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipe_spark.sources.catalog import load_table
from etl_pipe_spark.streaming.stateful import running_user_totals
from etl_pipe_spark.streaming.structured import read_events_stream, run_stream_to_table


def test_running_user_totals_match_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir).select("user_id", "value", "ts")
    got = run_stream_to_table(spark, running_user_totals(stream), output_mode="update")
    # update mode emits one row per key per batch; keep the final row per key
    final = {r.user_id: r for r in got.collect()}

    batch = {
        r.user_id: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .collect()
    }
    assert set(final) == set(batch)
    for uid, b in batch.items():
        assert final[uid].n_events == b.n_events
        assert final[uid].total_value == pytest.approx(b.total_value, rel=1e-9)


def test_dedup_within_watermark_bounds_state(spark, sf_dir, tmp_path):
    """Duplicates inside the lateness window are dropped; state stays
    bounded (the within-watermark variant, not global dropDuplicates).
    Drive a finite stream containing exact duplicate rows and assert
    the drained output carries each key once."""
    import os

    from pyspark.sql import functions as F

    from etl_pipe_spark.streaming.stateful import dedup_within_watermark
    from etl_pipe_spark.streaming.structured import (
        read_events_stream, run_stream_to_table)

    stream = read_events_stream(spark, sf_dir)
    # duplicate the whole source: every event arrives twice in one
    # batch — well inside any lateness bound
    doubled = stream.unionByName(stream)
    deduped = dedup_within_watermark(
        doubled, keys=["event_id"], ts_col="ts")
    got = run_stream_to_table(
        spark, deduped.select("event_id"), output_mode="append")
    n = got.count()
    base = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    assert n == base, f"expected {base} unique events, got {n}"
