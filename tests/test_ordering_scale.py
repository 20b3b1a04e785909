"""Regression: ranked_running_sum must produce a permutation at scale.

The r8 scaling sweep caught the spark_partition_id-based two-phase
rank emitting DUPLICATE global ranks at 1M rows (989,558 distinct of
1,000,000): `within` feeds two consumers (row output + per-partition
offsets), and without a materialization point each consumer
re-evaluated the range exchange — AQE gives every read stage its own
coalesced shuffle reader, so `spark_partition_id` disagreed between
the branches and the offsets join mis-keyed.  Small inputs coalesce
both branches identically, which is why every sf0.01 oracle
comparison stayed green; this file pins the invariant at the size
where the divergence actually manifested (the r8 persist()-based fix
was verified to be load-bearing at cpus=8: 976,302 distinct ranks
without it).

Round 9 removed the hazard STRUCTURALLY: `__pid` is now a pure
function of the row's order-key values against boundary literals
frozen at plan-build time, so independent re-evaluations of the two
consumers always agree and the tracked persist is a pure performance
cache.  test_rank_survives_early_cache_release pins exactly that —
release_rank_caches() fired BEFORE any action (the call pattern the
r8 contract forbade) must still yield a permutation.

Round 10 tiers the file (VERDICT r9 item 4 — the suite outgrew the
driver's pytest budget): every invariant runs at 150k rows in the
default fast tier, and the original 1M-row shapes carry
@pytest.mark.slow (--runslow / SPARK_GRAFT_SLOW_TESTS=1).  150k rows
across 64 input partitions still exercises the multi-bucket path
(dozens of boundaries at cpus>=8 -> the binary-search assignment, the
offsets merge, AQE-coalesced consumers); 1M is kept because that is
the size where the historical divergence actually manifested.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipe_spark.operators.ordering import (
    ranked_running_sum,
    release_rank_caches,
)

N_FAST = 150_000
N_SLOW = 1_000_000


def _frame(spark, n):
    # hash-valued sort key with heavy ties; doc_id breaks the total order
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            (F.xxhash64(F.col("id")) % 400 + 400).alias("n_tokens"),
        )
        .repartition(64)
    )


def _permutation_check(ranked, n):
    chk = ranked.agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("rnk").alias("distinct_rnk"),
        F.min("rnk").alias("mn"),
        F.max("rnk").alias("mx"),
        F.sum("rnk").alias("s"),
    ).collect()[0]
    assert chk["rows"] == n
    assert chk["distinct_rnk"] == n, "duplicate global ranks (offsets mis-keyed)"
    assert (chk["mn"], chk["mx"]) == (1, n)
    assert chk["s"] == n * (n + 1) // 2


def _run_permutation(spark, n):
    df = _frame(spark, n).persist()
    try:
        df.count()
        ranked = ranked_running_sum(
            df, [F.col("n_tokens"), F.col("doc_id")], None, rank_name="rnk"
        )
        _permutation_check(ranked, n)
    finally:
        df.unpersist()
        release_rank_caches()


def _run_early_release(spark, n):
    df = _frame(spark, n).persist()
    try:
        df.count()
        ranked = ranked_running_sum(
            df, [F.col("n_tokens"), F.col("doc_id")], None, rank_name="rnk"
        )
        # early release: no action has touched `ranked` yet
        release_rank_caches()
        _permutation_check(ranked, n)
        # and a SECOND action on the same (now uncached) frame must
        # reproduce the identical permutation — re-evaluation cannot
        # re-bucket (boundaries are frozen literals)
        _permutation_check(ranked, n)
    finally:
        df.unpersist()
        release_rank_caches()


def _run_running_sum(spark, n):
    df = _frame(spark, n).persist()
    try:
        df.count()
        rs = ranked_running_sum(
            df, [F.col("n_tokens"), F.col("doc_id")], "n_tokens",
            rank_name="rnk", before_name="before",
        )
        chk = rs.agg(
            F.countDistinct("rnk").alias("d"),
            F.sum("rnk").alias("s"),
            # the max exclusive-prefix + its own value must equal the total
            F.max(F.col("before") + F.col("n_tokens")).alias("top"),
            F.sum("n_tokens").alias("total"),
            F.min("before").alias("first_before"),
        ).collect()[0]
        assert chk["d"] == n and chk["s"] == n * (n + 1) // 2
        assert chk["top"] == chk["total"]
        assert chk["first_before"] == 0
    finally:
        df.unpersist()
        release_rank_caches()


# --- fast tier (default) ---------------------------------------------------

def test_rank_is_a_permutation_fast(spark):
    _run_permutation(spark, N_FAST)


def test_rank_survives_early_cache_release_fast(spark):
    _run_early_release(spark, N_FAST)


def test_running_sum_mode_consistent_fast(spark):
    _run_running_sum(spark, N_FAST)


# --- slow tier (1M rows — the size where the r8 divergence showed) ---------

@pytest.mark.slow
def test_rank_is_a_permutation_at_1m_rows(spark):
    _run_permutation(spark, N_SLOW)


@pytest.mark.slow
def test_rank_survives_early_cache_release(spark):
    _run_early_release(spark, N_SLOW)


@pytest.mark.slow
def test_running_sum_mode_consistent_at_1m_rows(spark):
    _run_running_sum(spark, N_SLOW)
