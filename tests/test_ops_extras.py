"""Scheduler, skew, and layout operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipe_spark.operators.layout import (
    read_date_partitioned,
    write_date_partitioned,
)
from etl_pipe_spark.operators.skew import salted_agg, salted_join
from etl_pipe_spark.sources.catalog import load_table
from etl_pipe_spark.streaming.scheduler import CycleScheduler


def test_scheduler_failure_accounting():
    calls = {"n": 0}
    alerts = []

    def flaky_cycle():
        calls["n"] += 1
        if calls["n"] <= 3:
            return {"flow": -1}  # failing flow
        return {"flow": 5}

    sched = CycleScheduler(
        flaky_cycle, interval_sec=0, max_consecutive_failures=3,
        alert=alerts.append, sleep=lambda s: None,
    )
    sched.run_forever(max_cycles=5)
    assert sched.cycles_run == 5
    assert alerts == ["3 consecutive failed cycles"]  # fired once at threshold
    assert sched.consecutive_failures == 0  # reset by later successes


def test_scheduler_exception_isolated():
    def boom():
        raise RuntimeError("cycle died")

    sched = CycleScheduler(boom, interval_sec=0, max_consecutive_failures=2,
                           alert=lambda m: None, sleep=lambda s: None)
    assert sched.run_once() is None
    assert sched.consecutive_failures == 1


def test_salted_agg_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        (r.l_returnflag, r.n, float(r.qty))
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("qty"))
        .collect()
    }
    salted = {
        (r.l_returnflag, r.n, float(r.qty))
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {
                "n": (F.count(F.lit(1)), F.sum),
                "qty": (F.sum(F.col("l_quantity").cast("decimal(18,4)")), F.sum),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    plain = li.join(orders, "l_orderkey").groupBy("o_orderstatus").count()
    salted = salted_join(li, orders, "l_orderkey", n_salts=4) \
        .groupBy("o_orderstatus").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_date_partitioned_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").drop("ts_ns")
    path = str(tmp_path / "events_by_month")
    write_date_partitioned(ev, path, "ts", granularity="day")
    back = read_date_partitioned(spark, path)
    assert back.count() == ev.count()
    # partition pruning: a ts-derived predicate hits only matching dirs
    one_day = back.filter(F.to_date("ts") == "2024-01-05")
    expected = ev.filter(F.to_date("ts") == "2024-01-05").count()
    assert one_day.count() == expected
    # directory count confirms physical partitioning happened
    import os
    dirs = [d for d in os.listdir(path) if d.startswith("__dt=")]
    assert len(dirs) >= 25  # ~30 days of events


def test_bucketed_tables_join_without_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key must hash-join with no
    Exchange on either side — the co-located join layout.py promises."""
    from etl_pipe_spark.operators.layout import write_bucketed_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        li = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
        )
        write_bucketed_table(orders, "b_orders", "o_orderkey", n_buckets=4)
        write_bucketed_table(li, "b_lineitem", "o_orderkey", n_buckets=4)
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join still shuffles"
        assert joined.count() == li.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_ranked_running_sum_equals_global_window(spark):
    """The two-phase range-partition decomposition must reproduce the
    single-task global window exactly, at any shuffle width."""
    from pyspark.sql import Window as W

    from etl_pipe_spark.operators.ordering import ranked_running_sum

    rows = [(i, (i * 37) % 101, (i * 13) % 7 + 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, score long, weight long")
    # two-phase form takes plain ascending value expressions: score
    # DESC is expressed as -score ASC (the negation convention every
    # descending caller uses); the expected global window keeps the
    # native DESC marker, so the test also pins the equivalence.
    order = [(-F.col("score")), F.col("id")]

    w = W.orderBy(F.col("score").desc(), F.col("id"))
    expected = sorted(
        (r.id, r.rnk, r.before)
        for r in df.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "before",
            F.coalesce(
                F.sum("weight").over(w.rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("bigint"),
        )
        .collect()
    )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            got = sorted(
                (r.id, r.rnk, r.sum_before)
                for r in ranked_running_sum(df, order, "weight").collect()
            )
            assert got == expected, f"diverged at {parts} partitions"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
