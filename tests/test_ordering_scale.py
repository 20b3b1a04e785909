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
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipe_spark.operators.ordering import (
    ranked_running_sum,
    release_rank_caches,
)

N = 1_000_000


def _frame(spark):
    # hash-valued sort key with heavy ties; doc_id breaks the total order
    return (
        spark.range(N)
        .select(
            F.col("id").alias("doc_id"),
            (F.xxhash64(F.col("id")) % 400 + 400).alias("n_tokens"),
        )
        .repartition(64)
    )


def _permutation_check(ranked):
    chk = ranked.agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("rnk").alias("distinct_rnk"),
        F.min("rnk").alias("mn"),
        F.max("rnk").alias("mx"),
        F.sum("rnk").alias("s"),
    ).collect()[0]
    assert chk["rows"] == N
    assert chk["distinct_rnk"] == N, "duplicate global ranks (offsets mis-keyed)"
    assert (chk["mn"], chk["mx"]) == (1, N)
    assert chk["s"] == N * (N + 1) // 2


def test_rank_is_a_permutation_at_1m_rows(spark):
    df = _frame(spark).persist()
    try:
        df.count()
        ranked = ranked_running_sum(
            df, [F.col("n_tokens"), F.col("doc_id")], None, rank_name="rnk"
        )
        _permutation_check(ranked)
    finally:
        df.unpersist()
        release_rank_caches()


def test_rank_survives_early_cache_release(spark):
    """The r8 verdict's structural-guard bar: releasing the tracked
    caches BEFORE the rank output is materialized — the exact call
    pattern that reopened the divergence under the r8 persist-based
    fix — must still yield a permutation, because correctness no
    longer rides the cache (value-derived __pid)."""
    df = _frame(spark).persist()
    try:
        df.count()
        ranked = ranked_running_sum(
            df, [F.col("n_tokens"), F.col("doc_id")], None, rank_name="rnk"
        )
        # early release: no action has touched `ranked` yet
        assert release_rank_caches() >= 1
        _permutation_check(ranked)
        # and a SECOND action on the same (now uncached) frame must
        # reproduce the identical permutation — re-evaluation cannot
        # re-bucket (boundaries are frozen literals)
        _permutation_check(ranked)
    finally:
        df.unpersist()
        release_rank_caches()


def test_running_sum_mode_consistent_at_1m_rows(spark):
    df = _frame(spark).persist()
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
        assert chk["d"] == N and chk["s"] == N * (N + 1) // 2
        assert chk["top"] == chk["total"]
        assert chk["first_before"] == 0
    finally:
        df.unpersist()
        release_rank_caches()
