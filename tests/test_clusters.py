"""Connected-components operator semantics (dedup clustering)."""

from __future__ import annotations

from etl_pipe_spark.operators.clusters import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["left_id", "right_id"])
    return {
        r.vertex_id: r.cluster_id
        for r in connected_components(df).collect()
    }


def test_chain_collapses_to_min_id(spark):
    # A~B, B~C, C~D: one cluster even though A~D never scored.
    labels = _cc(spark, [(1, 2), (2, 3), (3, 4)])
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1}


def test_cycle_terminates_and_labels_min(spark):
    labels = _cc(spark, [(5, 6), (6, 7), (7, 5)])
    assert labels == {5: 5, 6: 5, 7: 5}


def test_disjoint_components_stay_apart(spark):
    labels = _cc(spark, [(1, 2), (10, 11), (11, 12), (20, 21)])
    assert labels == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_long_chain_converges_within_round_cap(spark):
    # diameter 12 chain — propagation needs ~12 rounds, under the cap
    edges = [(i, i + 1) for i in range(12)]
    labels = _cc(spark, edges)
    assert set(labels.values()) == {0}


def test_edge_direction_irrelevant(spark):
    assert _cc(spark, [(2, 1), (3, 2)]) == {1: 1, 2: 1, 3: 1}
