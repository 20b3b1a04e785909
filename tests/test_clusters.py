"""Connected-components operator semantics (dedup clustering), for
both the min-label-propagation default and the large-star/small-star
high-diameter variant (same (vertex_id, cluster_id) contract)."""

from __future__ import annotations

import pytest

from etl_pipe_spark.operators.clusters import (
    connected_components, connected_components_two_phase)

IMPLS = {
    "propagation": connected_components,
    "two_phase": connected_components_two_phase,
}


@pytest.fixture(params=sorted(IMPLS), ids=sorted(IMPLS))
def cc_impl(request):
    return IMPLS[request.param]


def _cc(spark, edges, impl=connected_components):
    df = spark.createDataFrame(edges, ["left_id", "right_id"])
    return {r.vertex_id: r.cluster_id for r in impl(df).collect()}


def test_chain_collapses_to_min_id(spark, cc_impl):
    # A~B, B~C, C~D: one cluster even though A~D never scored.
    labels = _cc(spark, [(1, 2), (2, 3), (3, 4)], cc_impl)
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1}


def test_cycle_terminates_and_labels_min(spark, cc_impl):
    labels = _cc(spark, [(5, 6), (6, 7), (7, 5)], cc_impl)
    assert labels == {5: 5, 6: 5, 7: 5}


def test_disjoint_components_stay_apart(spark, cc_impl):
    labels = _cc(spark, [(1, 2), (10, 11), (11, 12), (20, 21)], cc_impl)
    assert labels == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_long_chain_converges_within_round_cap(spark, cc_impl):
    # diameter 12 chain — propagation needs ~12 rounds, under the cap
    edges = [(i, i + 1) for i in range(12)]
    labels = _cc(spark, edges, cc_impl)
    assert set(labels.values()) == {0}


def test_edge_direction_irrelevant(spark, cc_impl):
    assert _cc(spark, [(2, 1), (3, 2)], cc_impl) == {1: 1, 2: 1, 3: 1}


def test_two_phase_matches_propagation_on_random_graph(spark):
    # 120 vertices, deterministic pseudo-random edges: both algorithms
    # must produce the identical min-label component map.
    edges = [((i * 73) % 120, (i * 91 + 7) % 120) for i in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    assert _cc(spark, edges, connected_components_two_phase) == \
        _cc(spark, edges, connected_components)


def test_two_phase_collapses_deep_chain_in_few_rounds(spark):
    # A 64-link path has diameter 64: propagation would need ~64
    # shuffle rounds, the star scheme O(log n).  max_rounds=10 would
    # STRICTLY fail propagation here — passing proves the round count.
    edges = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(edges, ["left_id", "right_id"])
    labels = {r.vertex_id: r.cluster_id
              for r in connected_components_two_phase(df, max_rounds=10).collect()}
    assert labels == {i: 0 for i in range(65)}


def test_two_phase_matches_propagation_property(spark):
    # Property-based breadth: arbitrary small multigraphs (self-loops,
    # duplicates, disconnected islands) — the two algorithms must agree
    # on every component map.  Deterministic example set (hypothesis's
    # per-example Spark jobs would be minutes); seeds chosen to cover
    # stars, paths, cliques-with-bridges, and shuffled id spaces.
    import random

    for seed in (3, 17, 42, 99):
        rng = random.Random(seed)
        n_vertices = rng.randint(5, 40)
        ids = rng.sample(range(1000), n_vertices)
        edges = [
            (rng.choice(ids), rng.choice(ids))
            for _ in range(rng.randint(n_vertices // 2, n_vertices * 2))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        assert _cc(spark, edges, connected_components_two_phase) == \
            _cc(spark, edges, connected_components), f"seed {seed} diverged"
