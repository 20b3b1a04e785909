"""End-to-end incremental pipeline cycles (reference pipeline.py S5-S9):
watermark advance, overlap replay idempotence, crash-safe convergence."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_pipe_spark.sources.catalog import load_table
from etl_pipe_spark.streaming.incremental import IncrementalPipeline
from etl_pipe_spark.streaming.watermark import DEFAULT_EPOCH, WatermarkStore

MID = dt.datetime(2024, 1, 15)
END = dt.datetime(2024, 2, 15)


@pytest.fixture()
def pipe(spark, sf_dir, tmp_path):
    return IncrementalPipeline(spark, sf_dir, str(tmp_path / "target"))


def test_watermark_store_roundtrip(spark, tmp_path):
    store = WatermarkStore(spark, str(tmp_path / "wm"), overlap_sec=90)
    assert store.get("t") == DEFAULT_EPOCH - dt.timedelta(seconds=90)
    store.advance("t", dt.datetime(2024, 1, 10, 12, 0, 0), 123)
    assert store.get("t") == dt.datetime(2024, 1, 10, 11, 58, 30)
    assert store.total_rows("t") == 123
    # empty batch: watermark must not move (fixes reference S6)
    store.advance("t", None, 0)
    assert store.get("t") == dt.datetime(2024, 1, 10, 11, 58, 30)
    # regression never moves the watermark backwards
    store.advance("t", dt.datetime(2023, 1, 1), 5)
    assert store.get("t") == dt.datetime(2024, 1, 10, 11, 58, 30)
    assert store.total_rows("t") == 128


def test_two_cycles_converge_to_full_recompute(spark, sf_dir, pipe):
    c1 = pipe.run_cycle(now_ts=MID)
    c2 = pipe.run_cycle(now_ts=END)
    assert all(v >= 0 for v in (c1 | c2).values()), f"flow failed: {c1} {c2}"

    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()

    dim = pipe.sinks["dim_users"].read()
    assert dim.count() == n_users
    # dim matches a full-recompute latest-per-user
    expected = {
        (r.user_id, r.event_id)
        for r in ev.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
            ),
        ).filter("rn = 1").collect()
    }
    got = {(r.user_id, r.last_event_id) for r in dim.collect()}
    assert got == expected

    log = pipe.sinks["fact_event_log"].read()
    assert log.count() == n_events  # overlap replays absorbed
    vers = pipe.sinks["user_versions"].read()
    assert vers.count() == n_events
    assert vers.filter("is_current_version").count() == n_users


def test_replayed_cycle_is_noop(spark, pipe):
    pipe.run_cycle(now_ts=MID)
    snap1 = {k: sorted(map(str, s.read().collect())) for k, s in pipe.sinks.items()}
    # force a full replay of the same window: watermark overlap keeps it safe
    pipe.run_cycle(now_ts=MID)
    snap2 = {k: sorted(map(str, s.read().collect())) for k, s in pipe.sinks.items()}
    assert snap1 == snap2
