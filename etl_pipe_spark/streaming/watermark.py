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

    def _pointer(self) -> str:
        return os.path.join(self.path, "CURRENT")

    def _current_snapshot(self) -> str | None:
        try:
            with open(self._pointer()) as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    def _read(self):
        snap = self._current_snapshot()
        if snap is None:
            return self.spark.createDataFrame([], _SCHEMA)
        return self.spark.read.schema(_SCHEMA).parquet(os.path.join(self.path, snap))

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
        accumulating the total_rows_ever counter (extract.py:40-47).

        Commit is crash-safe: the new state lands in a versioned
        directory and an atomic pointer swap publishes it (same
        protocol as ParquetMergeSink) — a crash mid-advance can never
        wipe the previous watermarks and reset every flow to the 2020
        epoch, which the old rmtree-then-rename sequence could.
        """
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
        snap = self._current_snapshot()
        version = int(snap.rsplit("-", 1)[1]) + 1 if snap else 1
        new_snap = f"state-{version:08d}"
        os.makedirs(self.path, exist_ok=True)
        # single-slice parallelize: a coalesce(1) over the default
        # 32-partition local-list RDD evaluates every partition
        # serially through one task's Python-worker round trips
        # (~6 s/write measured — see operators/index_store._tiny_table)
        self.spark.createDataFrame(
            self.spark.sparkContext.parallelize(list(state.values()), 1),
            _SCHEMA,
        ).write.mode("overwrite") \
            .parquet(os.path.join(self.path, new_snap))
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            f.write(new_snap)
        os.replace(tmp, self._pointer())
        # retain one previous state for post-mortems, drop older
        for name in os.listdir(self.path):
            if name.startswith("state-"):
                try:
                    v = int(name.rsplit("-", 1)[1])
                except ValueError:
                    continue
                if v <= version - 2:
                    shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)

    def total_rows(self, table_name: str) -> int:
        rows = self._read().filter(F.col("table_name") == table_name).collect()
        return rows[0].total_rows_ever if rows else 0
