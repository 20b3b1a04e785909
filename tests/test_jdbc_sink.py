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


_DRV = "org.apache.derby.jdbc.EmbeddedDriver"


def _seed_upsert_target(spark, derby_url, table):
    from etl_pipe_spark.sources.catalog import write_jdbc

    base = spark.createDataFrame(
        [(1, "RUNNING", 10.0, "keep-1"),
         (2, "RUNNING", 20.0, "keep-2"),
         (3, "SUCCESS", 30.0, "keep-3")],
        "run_id long, status string, score double, note string")
    write_jdbc(base, derby_url, table, mode="append", driver=_DRV)


def _upsert_batch(spark):
    # 2: status transition (the reference's run lifecycle, load.py:86-100);
    # 3: re-delivered unchanged row (replay); 4: brand-new run
    return spark.createDataFrame(
        [(2, "SUCCESS", 25.0, "should-NOT-land"),
         (3, "SUCCESS", 30.0, "should-NOT-land"),
         (4, "RUNNING", 40.0, "new-4")],
        "run_id long, status string, score double, note string")


@pytest.mark.parametrize("use_merge", [True, False],
                         ids=["merge", "staging-anti-join"])
def test_jdbc_upsert_partial_update(spark, derby_url, use_merge):
    """ON CONFLICT (run_id) DO UPDATE SET status, score — the
    reference's partial upsert (load.py:30-79 updates ONLY the mutable
    columns): matched rows change status/score but keep their
    untouched columns, absent rows insert whole, and the whole thing
    is set-based server-side (one MERGE, or UPDATE + anti-join INSERT
    where MERGE is unavailable)."""
    from etl_pipe_spark.sources.catalog import jdbc_upsert, load_jdbc

    table = f"upsert_{'m' if use_merge else 'f'}"
    _seed_upsert_target(spark, derby_url, table)
    jdbc_upsert(spark, _upsert_batch(spark), derby_url, table,
                keys=["run_id"], update_cols=["status", "score"],
                use_merge=use_merge, driver=_DRV)
    got = {
        r.run_id: (r.status, r.score, r.note)
        for r in load_jdbc(spark, derby_url, table, driver=_DRV).collect()
    }
    assert got == {
        1: ("RUNNING", 10.0, "keep-1"),        # untouched row
        2: ("SUCCESS", 25.0, "keep-2"),        # updated, note preserved
        3: ("SUCCESS", 30.0, "keep-3"),        # replay no-op
        4: ("RUNNING", 40.0, "new-4"),         # inserted whole
    }


@pytest.mark.parametrize("use_merge", [True, False],
                         ids=["merge", "staging-anti-join"])
def test_jdbc_upsert_is_idempotent(spark, derby_url, use_merge):
    """Replaying the identical batch must change nothing — the
    reference's scheduler re-delivers overlap windows by design
    (extract.py watermark minus 90 s) and leans on the upsert for
    idempotence."""
    from etl_pipe_spark.sources.catalog import jdbc_upsert, load_jdbc

    table = f"upsert_idem_{'m' if use_merge else 'f'}"
    _seed_upsert_target(spark, derby_url, table)
    for _ in range(2):
        jdbc_upsert(spark, _upsert_batch(spark), derby_url, table,
                    keys=["run_id"], update_cols=["status", "score"],
                    use_merge=use_merge, driver=_DRV)
    back = load_jdbc(spark, derby_url, table, driver=_DRV)
    assert back.count() == 4
    assert back.filter("run_id = 2").first().score == 25.0
