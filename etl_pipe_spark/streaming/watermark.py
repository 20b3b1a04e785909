"""Per-table incremental watermark state (reference extract.py:10-49 S5/S6).

The reference keeps a low-watermark row per source table in its
target database, re-reads a 90 s overlap band to catch late commits,
and relies on idempotent sinks to absorb the resulting duplicates —
exactly Structured Streaming's "at-least-once + idempotent sink =>
effectively exactly-once" recipe, so we keep the design.

One deliberate fix over the reference: extract.py:33-49 advances the
watermark to NOW() even when the LIMIT cap truncated the batch, so
rows beyond the cap can be skipped forever (SURVEY §2.1 S6 ⚠).  Here
the caller advances to ``max(ts)`` actually processed.

State lives as a tiny parquet dataset — driver-side reads only; at
cluster scale this is a metadata table (Delta/JDBC), never big data.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

from pyspark.sql import Row, SparkSession, functions as F

DEFAULT_EPOCH = dt.datetime(2020, 1, 1)
DEFAULT_OVERLAP_SEC = 90  # reference config.py:29 OVERLAP_SEC

_SCHEMA = (
    "table_name string, last_fetched_at timestamp_ntz, "
    "total_rows_ever long, updated_at timestamp_ntz"
)


class WatermarkStore:
    """Parquet-backed watermark state table (reference etl_watermark,
    setup_target.py:15-32)."""

    def __init__(self, spark: SparkSession, path: str,
                 overlap_sec: int = DEFAULT_OVERLAP_SEC):
        self.spark = spark
        self.path = path
        self.overlap_sec = overlap_sec

    def _read(self):
        if not os.path.exists(self.path):
            return self.spark.createDataFrame([], _SCHEMA)
        return self.spark.read.schema(_SCHEMA).parquet(self.path)

    def get(self, table_name: str) -> dt.datetime:
        """Low watermark minus the late-data overlap (extract.py:10-31).

        First sight of a table returns the 2020-01-01 epoch default
        (extract.py:31) so the initial cycle scans everything.
        """
        rows = self._read().filter(F.col("table_name") == table_name).collect()
        base = rows[0].last_fetched_at if rows else DEFAULT_EPOCH
        return base - dt.timedelta(seconds=self.overlap_sec)

    def advance(self, table_name: str, max_ts_processed: dt.datetime | None,
                rows_fetched: int) -> None:
        """Advance to max(ts) actually processed (fixes reference S6 ⚠),
        accumulating the total_rows_ever counter (extract.py:40-47)."""
        if max_ts_processed is None:
            return  # empty batch: watermark must not move
        state = {r.table_name: r for r in self._read().collect()}
        prev = state.get(table_name)
        state[table_name] = Row(
            table_name=table_name,
            last_fetched_at=max(max_ts_processed, prev.last_fetched_at) if prev else max_ts_processed,
            total_rows_ever=(prev.total_rows_ever if prev else 0) + rows_fetched,
            updated_at=dt.datetime.utcnow(),
        )
        staged = self.path + ".staged"
        self.spark.createDataFrame(list(state.values()), _SCHEMA) \
            .coalesce(1).write.mode("overwrite").parquet(staged)
        if os.path.exists(self.path):
            shutil.rmtree(self.path)
        os.rename(staged, self.path)

    def total_rows(self, table_name: str) -> int:
        rows = self._read().filter(F.col("table_name") == table_name).collect()
        return rows[0].total_rows_ever if rows else 0
