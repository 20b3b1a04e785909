"""Physical layout operators: the Spark replacement for the reference's
7 serving-side indexes (reference setup_target.py:104-240; SURVEY §4
"Index-backed serving").

On a cluster, scan pruning comes from layout, not b-trees:

* date partitioning on fact tables -> partition pruning on time
  predicates (the reference's idx_timeline_time equivalent);
* bucketing on join/merge keys -> co-located joins without a shuffle
  (the reference's unique-key indexes feeding ON CONFLICT);
* sorted-within-files writes -> parquet min/max row-group skipping
  (the partial index WHERE is_current_version analogue is simply a
  partition column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_date_partitioned(
    df: DataFrame, path: str, ts_col: str, granularity: str = "month",
    mode: str = "overwrite",
) -> None:
    """Date-partitioned fact write: time predicates prune directories.

    Month granularity keeps partition counts sane at 100 TB (day-level
    on a multi-year fact creates small-file pressure; AQE coalesce
    plus month partitions is the usual budget).
    """
    fmt = {"day": "yyyy-MM-dd", "month": "yyyy-MM", "year": "yyyy"}[granularity]
    (
        df.withColumn("__dt", F.date_format(F.col(ts_col), fmt))
        .repartition("__dt")
        .write.mode(mode)
        .partitionBy("__dt")
        .parquet(path)
    )


def read_date_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("__dt")


def write_bucketed_table(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed table: later equi-joins/merges on ``key``
    co-locate without a shuffle (both sides bucketed the same way)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def spread_for_compute(
    spark: SparkSession, df: DataFrame, min_ratio: float = 0.5
) -> DataFrame:
    """Round-robin ``df`` across the session's shuffle width — but only
    when the scan is narrower than the compute width.

    The small-input / heavy-expansion idiom: text pipelines (shingling,
    token explodes) multiply bytes 10-100x AFTER the scan, so a table
    that fits in one input split runs its entire expansion serially.
    One cheap exchange of the raw rows buys full-width CPU parallelism
    for every downstream narrow stage.  On a real multi-file 100 TB
    table the scan is already wide, so the exchange would be a full
    extra shuffle of the corpus that buys nothing: it is SKIPPED when
    the planned scan partition count is already >= ``min_ratio`` of
    the shuffle width.  The partition count comes from Spark's file-
    split planning (no job is triggered).  Two consumers of the same
    spread share the exchange (ReuseExchange).
    """
    width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    try:
        planned = df.rdd.getNumPartitions()
    except Exception:
        planned = 1  # un-plannable input: assume narrow, spread it
    if planned >= max(1, int(width * min_ratio)):
        return df
    return df.repartition(width)


def compact(df: DataFrame, path: str, target_partitions: int) -> None:
    """Small-file compaction: rewrite a dataset at a chosen file count
    (the maintenance job every long-lived incremental sink needs)."""
    df.coalesce(target_partitions).write.mode("overwrite").parquet(path)
