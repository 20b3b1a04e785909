"""Delta-backed merge sink: real MERGE when the classpath allows it.

ParquetMergeSink (operators/merge.py) rewrites the whole snapshot per
cycle behind an atomic pointer — honest single-writer semantics, but a
full-table write at 100 TB.  When Delta Lake is on the classpath
(delta-spark package + io.delta jars), the same three reference merge
semantics (load.py L1-L6) route through transactional ``MERGE INTO``:
only touched files rewrite, writers coordinate through the Delta log,
and concurrent readers see snapshot isolation.

Detection is capability-based (:func:`delta_available`), never assumed:
this sandbox has no Delta, so the suite skip-marks the Delta tests and
everything falls back to ParquetMergeSink.  ``make_merge_sink`` is the
single switch point.
"""

from __future__ import annotations

import importlib.util

from pyspark.sql import DataFrame, SparkSession

from .merge import ParquetMergeSink, _latest_per_key, scd2_apply_versions


def delta_available(spark: SparkSession | None = None) -> bool:
    """True iff the delta-spark package AND the Delta jars are usable."""
    if importlib.util.find_spec("delta") is None:
        return False
    if spark is not None:
        try:
            spark._jvm.io.delta.tables.DeltaTable.isDeltaTable(
                spark._jsparkSession, "/nonexistent-probe-path"
            )
        except Exception:
            return False
    return True


class DeltaMergeSink:
    """Same surface as ParquetMergeSink, backed by Delta MERGE.

    ``read``/``write`` mirror the parquet sink; ``apply_upsert`` and
    ``apply_scd2`` push the merge INTO the table transaction instead of
    read-modify-rewrite, so a cycle touching 0.1% of keys rewrites
    ~0.1% of files — the shape that survives 100 TB snapshots and
    multiple writers.
    """

    def __init__(self, spark: SparkSession, path: str, schema_ddl: str):
        self.spark = spark
        self.path = path
        self.schema_ddl = schema_ddl

    # -- snapshot surface (ParquetMergeSink-compatible) -----------------
    def _table(self):
        from delta.tables import DeltaTable

        return DeltaTable.forPath(self.spark, self.path)

    def _exists(self) -> bool:
        from delta.tables import DeltaTable

        return DeltaTable.isDeltaTable(self.spark, self.path)

    def read(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], self.schema_ddl)
        return self.spark.read.format("delta").load(self.path)

    def write(self, df: DataFrame) -> int:
        df.write.format("delta").mode("overwrite").save(self.path)
        return self.spark.read.format("delta").load(self.path).count()

    # -- merge semantics -------------------------------------------------
    def apply_upsert(
        self,
        updates: DataFrame,
        keys: list[str],
        update_cols: list[str] | None = None,
        order_col: str | None = None,
        tiebreakers: list[str] | None = None,
    ) -> int:
        """Reference L1/L3 as a transactional MERGE (ON CONFLICT DO UPDATE)."""
        if order_col is not None:
            updates = _latest_per_key(updates, keys, order_col, tiebreakers)
        else:
            updates = updates.dropDuplicates(keys)
        if not self._exists():
            return self.write(updates)
        cols = self.read().columns
        set_cols = [c for c in (update_cols or cols) if c not in keys]
        cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        (
            self._table().alias("t")
            .merge(updates.alias("s"), cond)
            .whenMatchedUpdate(set={c: f"s.{c}" for c in set_cols})
            .whenNotMatchedInsertAll()
            .execute()
        )
        return self.spark.read.format("delta").load(self.path).count()

    def insert_if_absent(self, updates: DataFrame, keys: list[str]) -> int:
        """Reference L4/L6 (ON CONFLICT DO NOTHING) as MERGE insert-only."""
        updates = updates.dropDuplicates(keys)
        if not self._exists():
            return self.write(updates)
        cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        (
            self._table().alias("t")
            .merge(updates.alias("s"), cond)
            .whenNotMatchedInsertAll()
            .execute()
        )
        return self.spark.read.format("delta").load(self.path).count()

    def apply_scd2(
        self,
        updates: DataFrame,
        keys: list[str],
        ts_col: str,
        end_col: str = "version_ended_at",
        current_col: str = "is_current_version",
        tiebreakers: list[str] | None = None,
    ) -> int:
        """Reference L2/L5: SCD-2 version merge touching only affected keys.

        The closure recompute (scd2_apply_versions) runs on the slice of
        the snapshot whose keys appear in the batch — not the whole
        table — then lands through one MERGE on the version identity
        (keys + ts + tiebreakers): matched versions update their
        end/current flags, new versions insert.  Unaffected keys' files
        are never rewritten.
        """
        if not self._exists():
            merged = scd2_apply_versions(
                self.spark.createDataFrame([], self.schema_ddl), updates,
                keys, ts_col, end_col, current_col, tiebreakers,
            )
            return self.write(merged)
        touched = updates.select(*keys).distinct()
        existing_slice = self.read().join(touched, keys, "left_semi")
        merged = scd2_apply_versions(
            existing_slice, updates, keys, ts_col, end_col, current_col, tiebreakers
        )
        version_key = keys + [ts_col] + (tiebreakers or [])
        cond = " AND ".join(f"t.{k} = s.{k}" for k in version_key)
        (
            self._table().alias("t")
            .merge(merged.alias("s"), cond)
            .whenMatchedUpdate(set={end_col: f"s.{end_col}", current_col: f"s.{current_col}"})
            .whenNotMatchedInsertAll()
            .execute()
        )
        return self.spark.read.format("delta").load(self.path).count()


def make_merge_sink(spark: SparkSession, path: str, schema_ddl: str,
                    prefer_delta: bool = True):
    """The single sink switch point: Delta when usable, parquet otherwise."""
    if prefer_delta and delta_available(spark):
        return DeltaMergeSink(spark, path, schema_ddl)
    return ParquetMergeSink(spark, path, schema_ddl)
