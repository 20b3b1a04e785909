"""Pin the driver-visible registration window.

The driver's differential harness hard-checks only the FIRST 50
registered queries.  These tests pin (a) every flagship LLM-pipeline
operator inside that window and (b) the demotion list staying exactly
the r01-green demo queries, so a future registration can't silently
push a flagship out of hard-signal coverage.
"""

from etl_pipe_spark.plans.catalog import _DEMOTED, REGISTRY, _load_all, queries

DRIVER_WINDOW = 50

FLAGSHIPS = [
    # ROUND-8 WINDOW (the r7 verdict's item 3 rotation with the
    # CORRECTED staleness ordering — r02-stale group first; the
    # swap-by-swap history lives in catalog._DEMOTED's notes).
    # This list pins the COMPLETE intended 50-slot window so any
    # future registration or demotion that would silently evict a
    # member fails here first.
    #
    # Production flagships + the never-green orc row — pinned
    # in-window EVERY round:
    "streaming_dedup_watermark",
    "incremental_neardup_lsh",
    "lsh_index_persisted",
    "ann_ivf_scaled",
    "semantic_dedup_scaled",
    "kmeans_fit_clusters",
    "ivfpq_index_persisted",
    "sq8_index_persisted",
    "orc_roundtrip_ingest",
    # r8 promotions — the 18 r02-stale queries (5 rounds without a
    # driver row), the 12 r03-stale, and 11 of the 15 r04-stale
    # (the 4 left out have pinned production supersets):
    "double_role_dim_join",
    "topk_orders",
    "timeline_union",
    "semi_join_urgent_customers",
    "anti_join_orderless_customers",
    "rollup_orders",
    "cube_lineitem",
    # pivot_status_revenue yielded its slot to bq_hamming_rerank
    # (mid-r8 addendum 2); the pivot conditional-agg family stays
    # in-window via unpivot_lineitem_metrics + cube/rollup +
    # sql_api_segment_revenue.
    "bq_hamming_rerank",     # mid-r8 registration: 1-bit BQ Hamming shortlist + exact rerank (integer-exact distance oracle)
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    # tpch_q10_returned_items yielded its slot to srp_bq_hamming_rerank
    # (mid-r8 addendum 4); its join+agg+topk shape stays in-window via
    # tpch_q3_shipping_priority.
    "srp_bq_hamming_rerank",  # mid-r8 registration: 256-bit SRP codes, integer-exact fixed-shortlist Hamming ANN
    "range_join_bucketed",
    "window_frames",
    "sql_api_segment_revenue",
    "lsh_index_lifecycle",   # mid-r8 registration: full store lifecycle (build+append+append+compact+probe) under the one-shot-build oracle
    "array_aggregation",
    "unpivot_lineitem_metrics",
    # having_large_orders yielded its slot to bq_index_persisted
    # (mid-r8 addendum 3); its groupBy+HAVING shape stays in-window
    # via tpch_q18_large_volume.
    "bq_index_persisted",    # mid-r8 registration: persisted BQ store leg under the in-memory oracle
    "tpch_q4_order_priority",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume",
    "tpch_q19_disjunctive_filter",
    "tpch_q22_dormant_customers",
    "tpch_q13_count_distribution",
    "tpch_q15_top_supplier",
    "stats_moments",
    # exact_percentiles yielded its slot to curriculum_quantile_interleave
    # (mid-r8 addendum 6) — the new query runs the same two-phase
    # distributed-rank machinery plus the decile arithmetic.
    "curriculum_quantile_interleave",
    "skew_salted_join",
    # json_flatten_props yielded its slot to paragraph_dedup_reassemble
    # (mid-r8 addendum 5); JSON ops stay in-window via json_as_map.
    "paragraph_dedup_reassemble",
    "json_as_map",
    "current_version_window",
    "tumbling_window_agg",
    "sliding_window_agg",
    "merge_upsert_snapshot",
    "streaming_tumbling_counts",
    "text_token_stats",
    "doc_quality_score",
    "embedding_neardup_pairs",
    "dedup_clusters",
    "dedup_simhash_pairs",
    "mixture_sampling",
]


def test_flagships_inside_driver_window():
    names = list(queries())
    window = set(names[:DRIVER_WINDOW])
    missing = [f for f in FLAGSHIPS if f not in window]
    assert not missing, f"flagships outside driver window: {missing}"


def test_demoted_names_exist_and_ordering_is_a_permutation():
    _load_all()
    assert set(_DEMOTED) <= set(REGISTRY), "demoting a name that isn't registered"
    names = list(queries())
    assert sorted(names) == sorted(REGISTRY), "ordering dropped or duplicated a query"
    assert names[-len(_DEMOTED):] == list(_DEMOTED)
