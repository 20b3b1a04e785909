"""Idempotent sink semantics (reference load.py L1-L6) as set-based merges.

The reference upserts row-at-a-time through INSERT ... ON CONFLICT
(load.py:10-187).  Spark-first, each semantics is a set-based plan on
(existing snapshot, update batch) pairs — the shape Delta's MERGE
compiles to; without Delta on the classpath we express the anti-join +
union rewrite directly and a ParquetMergeSink handles
read-apply-rewrite (non-atomic; flagged for production, SURVEY §7
risk 3).

All three merges are replay-idempotent: re-applying the same batch
yields the same snapshot, which is what absorbs the watermark
overlap's duplicates (reference ST2/ST3).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Window as W, functions as F


def _latest_per_key(updates: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Collapse an update batch to one row per key (last version wins)."""
    w = W.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert(
    existing: DataFrame,
    updates: DataFrame,
    keys: list[str],
    update_cols: list[str] | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """UPSERT with optional partial update (reference load.py:10-47 L1).

    Insert unmatched rows; for matched keys overwrite only
    ``update_cols`` (the reference's 10 mutable lifecycle fields),
    keeping immutable creation fields from the existing row.
    ``update_cols=None`` replaces the whole row (L3).
    """
    cols = existing.columns
    if order_col is not None:
        updates = _latest_per_key(updates, keys, order_col)
    update_cols = [c for c in (update_cols or cols) if c not in keys]

    e, u = existing.alias("e"), updates.alias("u")
    cond = [F.col(f"e.{k}") == F.col(f"u.{k}") for k in keys]

    matched = e.join(u, cond, "inner").select(
        *[F.col(f"e.{k}").alias(k) for k in keys],
        *[
            (F.col(f"u.{c}") if c in update_cols else F.col(f"e.{c}")).alias(c)
            for c in cols if c not in keys
        ],
    ).select(*cols)
    unmatched_existing = e.join(u, cond, "left_anti").select(*cols)
    new_rows = u.join(e, cond, "left_anti").select(*cols)
    return unmatched_existing.unionByName(matched).unionByName(new_rows)


def insert_if_absent(existing: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Insert-only merge (reference load.py:117-136 L4 / :169-187 L6).

    Immutable results / event logs: within-batch dedup on the key,
    then left-anti against the snapshot — replayed rows from the
    overlap window vanish, exactly like ON CONFLICT DO NOTHING.
    """
    fresh = updates.dropDuplicates(keys).join(existing, keys, "left_anti")
    return existing.unionByName(fresh.select(*existing.columns))


def scd2_apply_versions(
    existing: DataFrame,
    updates: DataFrame,
    keys: list[str],
    ts_col: str,
    end_col: str = "version_ended_at",
    current_col: str = "is_current_version",
) -> DataFrame:
    """Append-only SCD-2 version stream merge (reference load.py:50-83 L2/L5).

    Source rows are versions: a new version for a key closes the
    previous one (end_col := next version's ts).  The merged snapshot
    recomputes closure across existing ∪ updates with one window pass,
    so replays and out-of-order late versions land correctly —
    set-based, no per-row conflict handling.
    """
    version_key = keys + [ts_col]
    combined = existing.drop(end_col, current_col).unionByName(
        updates.drop(*[c for c in (end_col, current_col) if c in updates.columns])
    ).dropDuplicates(version_key)
    w = W.partitionBy(*keys).orderBy(F.col(ts_col))
    nxt = F.lead(F.col(ts_col)).over(w)
    return combined.withColumn(end_col, nxt).withColumn(current_col, nxt.isNull())


class ParquetMergeSink:
    """Read-apply-rewrite merge sink over a parquet snapshot path.

    Production note: parquet rewrite is not atomic (no transaction
    log); swap in Delta/Iceberg MERGE where available.  The staging
    rename keeps the window small for the test harness.
    """

    def __init__(self, spark, path: str, schema_ddl: str):
        self.spark = spark
        self.path = path
        self.schema_ddl = schema_ddl

    def read(self) -> DataFrame:
        if not os.path.exists(self.path):
            return self.spark.createDataFrame([], self.schema_ddl)
        return self.spark.read.parquet(self.path)

    def write(self, df: DataFrame) -> int:
        staged = self.path + ".staged"
        df.write.mode("overwrite").parquet(staged)
        if os.path.exists(self.path):
            shutil.rmtree(self.path)
        os.rename(staged, self.path)
        return self.spark.read.parquet(self.path).count()
