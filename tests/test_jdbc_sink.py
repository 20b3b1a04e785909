"""JDBC sink/source parity over embedded Apache Derby.

The reference engine's production I/O is a database (db.py:54-76:
pooled psycopg2 reads + execute_values batched writes).  The sandbox
has no server database, but Spark's own classpath ships embedded
Derby (its Hive-metastore backend), which exercises the REAL JDBC
write and read paths — batched inserts, connection-bounded
parallelism, dialect type mapping — end to end in-process.  Where
even Derby is absent the tests skip with the classpath pinned as the
reason, the same convention as test_delta_merge.py.
"""

from __future__ import annotations

import pytest


def _derby_available(spark) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        return True
    except Exception:
        return False


@pytest.fixture()
def derby_url(spark, tmp_path):
    if not _derby_available(spark):
        pytest.skip("Derby JDBC driver not on the Spark classpath")
    return f"jdbc:derby:{tmp_path}/db;create=true"


def test_jdbc_write_read_roundtrip(spark, derby_url):
    """write_jdbc -> load_jdbc round trip: rows, types, and NULLs
    survive the dialect mapping both ways."""
    from etl_pipe_spark.sources.catalog import load_jdbc, write_jdbc

    rows = [(1, "alpha", 1.5), (2, "beta", None), (3, None, -0.25)]
    df = spark.createDataFrame(rows, "id long, name string, score double")
    write_jdbc(df, derby_url, "roundtrip", mode="append",
               driver="org.apache.derby.jdbc.EmbeddedDriver")
    back = load_jdbc(spark, derby_url, "roundtrip",
                     driver="org.apache.derby.jdbc.EmbeddedDriver")
    got = sorted((r.id, r.name, r.score) for r in back.collect())
    assert got == sorted(rows)


def test_jdbc_batched_write_pages_like_reference(spark, derby_url):
    """The reference pages bulk writes at 500 rows (db.py:68-76
    execute_values page_size); batchsize must deliver every row intact
    when the data spans many pages and several partitions."""
    from etl_pipe_spark.sources.catalog import load_jdbc, write_jdbc

    n = 2_307  # deliberately not a multiple of the page size
    df = spark.range(n).selectExpr("id", "id * 2 AS doubled").repartition(8)
    write_jdbc(df, derby_url, "paged", mode="append", batchsize=500,
               num_partitions=2,
               driver="org.apache.derby.jdbc.EmbeddedDriver")
    back = load_jdbc(spark, derby_url, "paged",
                     driver="org.apache.derby.jdbc.EmbeddedDriver")
    assert back.count() == n
    assert back.selectExpr("sum(id) s").first().s == n * (n - 1) // 2
    assert back.selectExpr("sum(doubled) s").first().s == n * (n - 1)


def test_jdbc_partitioned_read_covers_all_bounds(spark, derby_url):
    """A bounded partitioned read (the reference's pooled parallel
    scan) must return every row exactly once, including rows OUTSIDE
    [lower_bound, upper_bound] — JDBC bounds split partitions, they
    do not filter."""
    from etl_pipe_spark.sources.catalog import load_jdbc, write_jdbc

    df = spark.range(100).selectExpr("id", "id % 7 AS grp")
    write_jdbc(df, derby_url, "bounded", mode="append",
               driver="org.apache.derby.jdbc.EmbeddedDriver")
    back = load_jdbc(
        spark, derby_url, "bounded",
        partition_column="id", num_partitions=4,
        lower_bound=10, upper_bound=90,
        driver="org.apache.derby.jdbc.EmbeddedDriver")
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
    assert sorted(r.id for r in back.collect()) == list(range(100))
