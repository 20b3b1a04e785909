"""Regression: ranked_running_sum must produce a permutation at scale.

The r8 scaling sweep caught the two-phase rank emitting DUPLICATE
global ranks at 1M rows (989,558 distinct of 1,000,000): `within`
feeds two consumers (row output + per-partition offsets), and without
a materialization point each consumer re-evaluates the range exchange
— AQE gives every read stage its own coalesced shuffle reader, so
`spark_partition_id` disagrees between the branches and the offsets
join mis-keys.  Small inputs coalesce both branches identically, which
is why every sf0.01 oracle comparison stayed green; this test pins the
invariant at the size where the divergence actually manifests
(verified to FAIL against the unfixed operator in this exact session
config: 976,302 distinct ranks at cpus=8).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipe_spark.operators.ordering import ranked_running_sum

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


def test_rank_is_a_permutation_at_1m_rows(spark):
    df = _frame(spark).persist()
    try:
        df.count()
        ranked = ranked_running_sum(
            df, [F.col("n_tokens"), F.col("doc_id")], None, rank_name="rnk"
        )
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
    finally:
        df.unpersist()


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
