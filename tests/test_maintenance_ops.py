"""Round-6 maintenance ops: incremental rollup merge and blocked fuzzy
join.

DuckDB hash parity is covered by tests/test_oracle_parity.py; these
pin what the oracle can't see — that the incremental merge equals the
one-shot recompute under ARBITRARY batch boundaries (not just the
registered split), and the fuzzy join's block-and-bound semantics on
crafted typos.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipe_spark.functions.parity import money
from etl_pipe_spark.plans.maintenance_plans import (
    COHORTS,
    MAX_EDIT,
    _partial_rollup,
    fuzzy_join_blocked,
    incremental_rollup_merge,
)
from etl_pipe_spark.sources.catalog import load_table


def _finalize(merged_partials):
    return merged_partials.select(
        "cohort", "status", "cnt",
        F.round(F.col("sum_dec"), 2).cast("double").alias("total_price"),
        F.col("max_dec").cast("double").alias("max_price"),
    )


def test_incremental_merge_equals_recompute_for_any_split(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    direct = (
        orders.groupBy(
            (F.col("o_custkey") % COHORTS).cast("bigint").alias("cohort"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum(money(F.col("o_totalprice"))), 2)
            .cast("double").alias("total_price"),
            F.max(money(F.col("o_totalprice"))).cast("double").alias("max_price"),
        )
    )
    expect = sorted(map(tuple, direct.collect()))
    # Three different batch boundaries, including a degenerate one where
    # the batch is empty — the merge must be boundary-invariant.
    for split in ("1996-06-15", "1999-01-01", "2050-01-01"):
        ts = F.lit(split).cast("timestamp")
        hist = _partial_rollup(orders.where(F.col("o_orderdate") < ts))
        batch = _partial_rollup(orders.where(F.col("o_orderdate") >= ts))
        merged = (
            hist.unionByName(batch)
            .groupBy("cohort", "status")
            .agg(
                F.sum("cnt").cast("bigint").alias("cnt"),
                F.sum("sum_dec").alias("sum_dec"),
                F.max("max_dec").alias("max_dec"),
            )
        )
        got = sorted(map(tuple, _finalize(merged).collect()))
        assert got == expect, f"merge != recompute at split {split}"


def test_registered_rollup_covers_every_group(spark, sf_dir):
    out = incremental_rollup_merge(spark, sf_dir)
    n_direct = (
        load_table(spark, sf_dir, "orders")
        .select((F.col("o_custkey") % COHORTS).alias("c"), "o_orderstatus")
        .distinct()
        .count()
    )
    assert out.count() == n_direct


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_join_matches_sequential_blocked_reference(spark, sf_dir):
    parts = [
        (r["p_partkey"], r["p_name"])
        for r in load_table(spark, sf_dir, "part").collect()
    ]
    expect = {}
    for key, name in parts:
        if key % 10 != 0 or len(name) < 4:
            continue
        probe = name[:2] + name[3:]
        cands = [
            (k, n) for k, n in parts
            if n[:2] == probe[:2] and len(n) // 4 == len(probe) // 4
        ]
        scored = [((_lev(probe, n)), k) for k, n in cands]
        scored = [s for s in scored if s[0] <= MAX_EDIT]
        if scored:
            dist, pk = min(scored)
            expect[key] = (probe, pk, dist, len(scored))
    got = {
        r["probe_id"]: (r["probe_name"], r["matched_partkey"],
                        r["edit_distance"], r["n_candidates"])
        for r in fuzzy_join_blocked(spark, sf_dir).collect()
    }
    assert got == expect
    assert got, "no probes matched at all — blocking or bound is broken"
    # The deleted-char source lands in the probe's block whenever the
    # deletion doesn't cross a length bucket; those probes must match
    # at distance <= 1.
    same_bucket = [
        k for k, name in parts
        if k in got and (len(name) - 1) // 4 == len(name) // 4
    ]
    assert same_bucket and all(got[k][2] <= 1 for k in same_bucket)
