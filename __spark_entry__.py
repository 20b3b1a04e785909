"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`etl_pipe_spark.plans.catalog` — the engine's query
registry.  The driver's verify runs ``entry(spark)`` as a smoke check,
runs each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from etl_pipe_spark.plans.catalog import queries as _queries

    return _queries()["run_summary_rollup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from etl_pipe_spark.plans.catalog import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    """Equivalent ANSI SQL per query, runnable by DuckDB on the same
    parquet tables.  Non-SQL-expressible ops are omitted (rows-only
    check)."""
    from etl_pipe_spark.plans.catalog import oracle_sql as _oracle_sql

    return _oracle_sql()
