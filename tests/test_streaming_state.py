"""Stateful merge at real state sizes (SURVEY §2.10 ST2-ST4).

The sf0.001 streaming tests exercise the machinery at toy state; this
drives the foreachBatch SCD-2 merge through >= 3 OVERLAPPING
micro-batches of the sf0.1 events table (100k versions), advancing the
reference-style watermark per batch, and asserts the stream's end
state is exactly the one-shot batch SCD-2 snapshot — then redelivers
the entire source (fresh checkpoint) and asserts the state does not
move.  This is the at-least-once + idempotent-merge contract the
reference's 90 s overlap loop relies on (extract.py:27-30,
load.py:50-83), checked at 100x the toy row count.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil

import pytest
from pyspark.sql import Window as W, functions as F

from etl_pipe_spark.operators.merge import ParquetMergeSink, scd2_apply_versions
from etl_pipe_spark.sources.catalog import load_table
from etl_pipe_spark.streaming.watermark import WatermarkStore

# sf0.1 sibling of the suite's configured (toy) SF dir — the point of
# this test is 100x the toy state size, but the data root still honors
# the same env override as conftest.py.
_SF_ROOT = os.path.dirname(
    os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001").rstrip("/"))
SF01 = os.path.join(_SF_ROOT, "sf0.1")
_DDL = (
    "user_id long, ts timestamp_ntz, event_id long, value double, "
    "version_ended_at timestamp_ntz, is_current_version boolean"
)
_OVERLAP = dt.timedelta(seconds=90)


def _write_overlapping_chunks(spark, src_dir: str) -> dt.datetime:
    """Three time-tercile chunk files, each re-reading the previous
    chunk's last 90 s (the reference's overlap replay); returns the
    corpus max(ts).  Files get increasing mtimes so the file source's
    oldest-first ordering delivers them as three micro-batches."""
    ev = load_table(spark, SF01, "events").select(
        "user_id", "ts", "event_id", "value")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    b1 = lo + (hi - lo) / 3
    b2 = lo + 2 * (hi - lo) / 3
    chunks = [
        ev.filter(F.col("ts") < F.lit(b1)),
        ev.filter((F.col("ts") >= F.lit(b1 - _OVERLAP)) & (F.col("ts") < F.lit(b2))),
        ev.filter(F.col("ts") >= F.lit(b2 - _OVERLAP)),
    ]
    for i, c in enumerate(chunks):
        tmp = os.path.join(src_dir, f"_tmp{i}")
        c.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(src_dir, f"chunk{i}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(tmp)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    return hi


def _expected_scd2(spark):
    ev = load_table(spark, SF01, "events").select(
        "user_id", "ts", "event_id", "value")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id", "ts", "event_id", "value",
        nxt.alias("version_ended_at"),
        nxt.isNull().alias("is_current_version"),
    )


def _snapshot(df) -> list[tuple]:
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.skipif(
    not os.path.isdir(SF01),
    reason=f"sf0.1 corpus not generated at {SF01} — the 100k-version "
           "state-size test needs it; the sf0.001 streaming tests still run",
)
def test_multibatch_scd2_merge_with_watermark_matches_batch(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    hi = _write_overlapping_chunks(spark, src_dir)

    sink = ParquetMergeSink(spark, str(tmp_path / "scd2"), _DDL)
    wm = WatermarkStore(spark, str(tmp_path / "wm"))
    batch_rows: list[int] = []

    def apply_batch(bdf, epoch_id: int) -> None:
        updates = bdf.select("user_id", "ts", "event_id", "value")
        merged = scd2_apply_versions(
            sink.read(), updates, keys=["user_id"], ts_col="ts",
            tiebreakers=["event_id"],
        )
        sink.write(merged)
        mx = updates.agg(F.max("ts")).first()[0]
        batch_rows.append(updates.count())
        wm.advance("events", mx, batch_rows[-1])

    def run(ckpt: str) -> None:
        sch = spark.read.parquet(src_dir).schema
        stream = (
            spark.readStream.schema(sch)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(src_dir, "chunk*.parquet"))
        )
        q = (
            stream.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run(str(tmp_path / "ckpt1"))
    assert len(batch_rows) >= 3, f"expected >=3 micro-batches, got {batch_rows}"
    n_events = load_table(spark, SF01, "events").count()
    # the overlap bands were genuinely redelivered...
    assert sum(batch_rows) > n_events
    # ...and the watermark advanced to max(ts) processed (minus the
    # standing 90 s overlap the next read would apply)
    assert wm.get("events") == hi - _OVERLAP
    assert wm.total_rows("events") == sum(batch_rows)

    expected = _snapshot(_expected_scd2(spark))
    assert _snapshot(sink.read()) == expected

    # Crash-replay: a fresh checkpoint redelivers EVERY chunk; the
    # set-based merge must absorb 100k duplicate versions unchanged.
    run(str(tmp_path / "ckpt2"))
    assert len(batch_rows) >= 6
    assert _snapshot(sink.read()) == expected
