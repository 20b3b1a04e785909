"""Table loaders for the parquet test catalog (and, in production, JDBC).

The reference reads its source tables by shipping SELECT strings to
PostgreSQL (reference db.py:54-59, extract.py:52-419).  Here a source
is a lazy DataFrame: ``spark.read.parquet`` in the test environment,
``spark.read.format("jdbc")`` against a live database — either way
Catalyst pushes filters/projections into the scan, so downstream
operators stay source-agnostic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..session import pin_conf

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table as a lazy DataFrame.

    ``events`` needs special handling: the file stores TIMESTAMP(NANOS)
    which Spark reads (under nanosAsLong) as int64.  We keep the exact
    nanos as ``ts_ns`` and derive ``ts`` as the micro-truncated
    TIMESTAMP_NTZ — bit-identical to what DuckDB produces when it
    truncates the same file's nanos to micros, so oracle comparisons
    on ``ts`` are exact.
    """
    pin_conf(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        df = (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts_ns div 1000")).cast("timestamp_ntz"),
            )
            .select("event_id", "ts", "user_id", "event_type", "value", "props", "ts_ns")
        )
    return df


def since_to_ns(since) -> int:
    """Watermark datetime -> int64 nanos, the single conversion point.

    Microsecond-exact (timestamp() floats are rounded at the micro
    digit before scaling); callers compare against the raw ts_ns
    column so the parquet scan can prune row groups.
    """
    import datetime as dt

    if isinstance(since, str):
        since = dt.datetime.fromisoformat(since)
    return round(since.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) * 1000


def events_since(events: DataFrame, since) -> DataFrame:
    """Watermark filter on the events table that PUSHES DOWN.

    A predicate on the derived ``ts`` (timestamp_micros(ts_ns div
    1000)) is an expression, so parquet gets PushedFilters: [] — a
    full scan per micro-batch at scale.  Filtering the raw int64
    nanos column is exactly equivalent for whole-microsecond
    watermarks (floor(ns/1000) >= since_us  <=>  ns >= since_us*1000)
    and reaches the scan for row-group skipping.
    """
    return events.filter(F.col("ts_ns") >= F.lit(since_to_ns(since)))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every catalog table as a temp view for the SQL API."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    batchsize: int = 500,
    num_partitions: int | None = None,
    **options,
) -> None:
    """JDBC sink (reference db.py:68-76 S3: execute_values page_size=500).

    ``batchsize`` maps directly onto the reference's write page size;
    ``num_partitions`` bounds concurrent connections the way its
    connection pool did (db.py:14-30).  For upsert semantics, stage
    through a temp table and MERGE server-side, or use the set-based
    merges in operators/merge.py against a lakehouse table.
    """
    writer = (
        df.coalesce(num_partitions) if num_partitions else df
    ).write.format("jdbc").option("url", url).option("dbtable", table) \
        .option("batchsize", str(batchsize)).mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


def load_jdbc(
    spark: SparkSession,
    url: str,
    table_or_query: str,
    *,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound=None,
    upper_bound=None,
    **options,
) -> DataFrame:
    """Production-path JDBC source (reference db.py:54-59 equivalent).

    With ``partition_column`` + bounds the scan parallelizes across
    ``num_partitions`` executor-side connections; Catalyst pushes
    predicates into the remote engine (pushDownPredicate default on).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table_or_query)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
