"""PageRank over the near-dup graph: properties the hash oracle can't
see — mass accounting, isolated-vertex semantics, hub ordering, and
partition-count independence of the iterative loop."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipe_spark.plans.graph_plans import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_UNIT,
    pagerank_neardup_graph,
)


def test_pagerank_mass_and_isolated_vertices(spark, sf_dir):
    rows = pagerank_neardup_graph(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    total = sum(r.rank_fp for r in rows)
    # floor divisions only LOSE mass: total must sit under one unit
    # but above the teleport-only floor (1 - damping) * UNIT
    assert total <= PR_UNIT
    assert total >= (PR_DAMP_DEN - PR_DAMP_NUM) * PR_UNIT // PR_DAMP_DEN
    # isolated vertices end at exactly the teleport floor
    tp = ((PR_DAMP_DEN - PR_DAMP_NUM) * PR_UNIT // PR_DAMP_DEN) // n
    for r in rows:
        if r.deg == 0:
            assert r.rank_fp == tp, r
        else:
            assert r.rank_fp >= tp, r


def test_pagerank_ranks_correlate_with_degree(spark, sf_dir):
    """Not a theorem, but on a near-dup graph the top-rank vertex must
    be connected and the mean rank of connected vertices must exceed
    the teleport floor — rank actually flowed along edges."""
    rows = pagerank_neardup_graph(spark, sf_dir).collect()
    connected = [r for r in rows if r.deg > 0]
    if not connected:
        return
    top = max(rows, key=lambda r: r.rank_fp)
    assert top.deg > 0
    n = len(rows)
    tp = ((PR_DAMP_DEN - PR_DAMP_NUM) * PR_UNIT // PR_DAMP_DEN) // n
    mean_connected = sum(r.rank_fp for r in connected) / len(connected)
    assert mean_connected > tp


def test_pagerank_partition_count_independent(spark, sf_dir):
    base = {
        (r.doc_id, r.deg, r.rank_fp)
        for r in pagerank_neardup_graph(spark, sf_dir).collect()
    }
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        alt = {
            (r.doc_id, r.deg, r.rank_fp)
            for r in pagerank_neardup_graph(spark, sf_dir).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == alt
