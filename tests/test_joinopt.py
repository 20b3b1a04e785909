"""Bloom semi-join reduction + temperature mixture: properties beyond
the oracle hash (the oracle already proves result-equivalence with
the unoptimized join / the exact quota set)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_pipe_spark.operators.bloom import (
    BLOOM_K,
    bloom_build,
    bloom_hit_expr,
    bloom_words_column,
    bloom_words_dense,
)
from etl_pipe_spark.plans.joinopt_plans import _BLOOM_M, _PRIORITY
from etl_pipe_spark.plans.selection_plans import (
    MIX_OUT_DEN,
    temperature_mixture_select,
)
from etl_pipe_spark.sources.catalog import load_table


def test_bloom_expr_prunes_without_false_negatives(spark, sf_dir):
    """The map-side expression probe must admit EVERY true match
    (no false negatives) while actually pruning a nontrivial share
    of the fact table (the filter's whole point)."""
    orders = load_table(spark, sf_dir, "orders")
    urgent_keys = {
        r.o_orderkey
        for r in orders.filter(F.col("o_orderpriority") == _PRIORITY)
        .select("o_orderkey").collect()
    }
    words = bloom_build(
        orders.filter(F.col("o_orderpriority") == _PRIORITY)
        .select("o_orderkey"),
        "o_orderkey", _BLOOM_M,
    )
    dense = bloom_words_dense(words, _BLOOM_M)
    assert len(dense) == _BLOOM_M // 64

    fact = (
        load_table(spark, sf_dir, "lineitem").select("l_orderkey")
        .crossJoin(F.broadcast(bloom_words_column(spark, dense)))
    )
    total = fact.count()
    kept = fact.filter(bloom_hit_expr("l_orderkey", _BLOOM_M))
    kept_keys = {r.l_orderkey for r in kept.collect()}
    match_keys = {
        r.l_orderkey
        for r in load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey").collect()
        if r.l_orderkey in urgent_keys
    }
    # no false negatives: every true match survives the probe
    assert match_keys <= kept_keys
    # real pruning: the filter drops a meaningful share (~4/5 of
    # priorities; allow slack for bloom false positives)
    assert len(kept_keys & urgent_keys) == len(match_keys & urgent_keys)
    assert kept.count() < 0.5 * total


def test_temperature_mixture_quota_math(spark, sf_dir):
    """Quotas must equal the integer formula recomputed sequentially,
    every source must respect its quota exactly, and the tau=0.5
    shape must hold: small sources get MORE than proportional share,
    large sources less (when counts differ)."""
    docs = load_table(spark, sf_dir, "documents")
    n_by_src = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    w = {s: math.isqrt(n) for s, n in n_by_src.items()}
    n_total = sum(n_by_src.values())
    n_out = n_total // MIX_OUT_DEN
    s_sum = sum(w.values())
    expect_k = {s: (n_out * w[s]) // s_sum for s in w}

    rows = temperature_mixture_select(spark, sf_dir).collect()
    taken = {}
    for r in rows:
        taken[r.source] = taken.get(r.source, 0) + 1
        assert r.rnk <= r.k_s
        assert r.k_s == expect_k[r.source], r.source
    for s, k in expect_k.items():
        # a source takes min(k_s, n_s) rows
        assert taken.get(s, 0) == min(k, n_by_src[s]), s

    # temperature shape: if a source is 4x larger, its quota is only
    # ~2x larger (sqrt), i.e. quota per doc FALLS with size
    sizes = sorted(n_by_src.items(), key=lambda kv: kv[1])
    small_s, small_n = sizes[0]
    big_s, big_n = sizes[-1]
    if big_n >= 2 * small_n:
        assert expect_k[big_s] / big_n < expect_k[small_s] / small_n
