"""Delta-optional merge path: factory fallback always tested; the
MERGE semantics tests run only where Delta is on the classpath (this
sandbox has none, so they skip — same semantics as test_merge.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from etl_pipe_spark.operators.delta_merge import (
    DeltaMergeSink,
    delta_available,
    make_merge_sink,
)
from etl_pipe_spark.operators.merge import ParquetMergeSink

needs_delta = pytest.mark.skipif(
    not delta_available(), reason="Delta Lake not on the classpath"
)


def _t(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_factory_falls_back_to_parquet_without_delta(spark, tmp_path):
    sink = make_merge_sink(spark, str(tmp_path / "t"), "id long, v string")
    expected = DeltaMergeSink if delta_available(spark) else ParquetMergeSink
    assert isinstance(sink, expected)


def test_detection_never_raises(spark):
    assert delta_available(spark) in (True, False)


@needs_delta
def test_delta_upsert_partial_update(spark, tmp_path):
    sink = DeltaMergeSink(
        spark, str(tmp_path / "u"),
        "id long, status string, created_by string, score double",
    )
    sink.write(spark.createDataFrame(
        [(1, "a", "created1", 10.0), (2, "b", "created2", 20.0)],
        sink.schema_ddl,
    ))
    updates = spark.createDataFrame(
        [(2, "b2", "HACKED", 22.0), (3, "c", "created3", 30.0)], sink.schema_ddl
    )
    sink.apply_upsert(updates, keys=["id"], update_cols=["status", "score"])
    got = sorted(
        (r["id"], r["status"], r["created_by"], r["score"])
        for r in sink.read().collect()
    )
    assert got == [
        (1, "a", "created1", 10.0),
        (2, "b2", "created2", 22.0),  # created_by NOT overwritten
        (3, "c", "created3", 30.0),
    ]


@needs_delta
def test_delta_insert_if_absent_replay_idempotent(spark, tmp_path):
    sink = DeltaMergeSink(spark, str(tmp_path / "l"), "source_key string, v long")
    updates = spark.createDataFrame([("k1", 1), ("k2", 2)], sink.schema_ddl)
    n1 = sink.insert_if_absent(updates, ["source_key"])
    n2 = sink.insert_if_absent(updates, ["source_key"])  # replay absorbed
    assert n1 == n2 == 2


@needs_delta
def test_delta_scd2_closes_versions(spark, tmp_path):
    sink = DeltaMergeSink(
        spark, str(tmp_path / "v"),
        "entity_id long, ts timestamp, attr string, "
        "version_ended_at timestamp, is_current_version boolean",
    )
    sink.apply_scd2(
        spark.createDataFrame([(1, _t(1), "v1", None, None)], sink.schema_ddl),
        keys=["entity_id"], ts_col="ts",
    )
    sink.apply_scd2(
        spark.createDataFrame([(1, _t(3), "v2", None, None)], sink.schema_ddl),
        keys=["entity_id"], ts_col="ts",
    )
    got = sorted(
        (r["ts"], r["version_ended_at"], r["is_current_version"])
        for r in sink.read().collect()
    )
    assert got == [(_t(1), _t(3), False), (_t(3), None, True)]
