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
    # ROUND-7 WINDOW (the r6 verdict's item 3 rotation executed; the
    # full history of every swap lives in catalog._DEMOTED's notes).
    # This list pins the COMPLETE intended 50-slot window so any
    # future registration or demotion that would silently evict a
    # member fails here first.
    #
    # Production flagships — pinned in-window EVERY round:
    "kmeans_fit_clusters",
    "ann_ivf_scaled",
    "semantic_dedup_scaled",
    "pq_ann_adc",
    "ivfpq_ann_adc",
    "ivfpq_rerank",
    "ivfpq_index_persisted",
    "incremental_neardup_lsh",
    "streaming_dedup_watermark",
    # r7 carryovers holding their family's hard signal (green r6):
    "tpch_q2_best_supplier",
    "bm25_retrieval",
    "sq8_ann_rerank",
    "logreg_quality_fit",
    "csv_ingest_coerced",
    "orc_roundtrip_ingest",     # the one never-green row; r7 carries the tz-free fix
    "schema_evolution_merge",
    "snapshot_diff_cdc",
    "dsir_importance_select",
    "temperature_mixture_select",
    "pagerank_neardup_graph",   # fresh post-cap bench row wanted (r6 verdict nit 3)
    "triangle_clustering_coeff",
    "bpe_train_merges",
    "timeseries_gapfill",       # r7: day-chunked spine lands this round
    "event_funnel_conversion",
    # r7 NEW registrations (first driver rows pending):
    "pagerank_persisted_edges",
    "triangle_persisted_pairs",
    "sq8_index_persisted",
    # mid-r7 additions (slots yielded by cms_heavy_hitters and
    # bpe_encode_vocab, both r6-green with in-window family cover):
    "lsh_index_persisted",
    "winnowing_fingerprints",
    # r7 promotions — longest-stale demotions back for fresh rows
    # (staleness ceiling: every registered query has a driver row
    # within the last 2 rounds after this window runs):
    "string_functions",
    "datetime_functions",
    "ranking_functions",
    "null_handling_functions",
    "set_ops_membership",
    "topk_per_group",
    "pricing_summary",
    "tpch_q21_waiting_supplier",
    "tpch_q7_volume_shipping",
    "dedup_clusters_star",
    "boilerplate_span_removal",
    "token_budget_selection",
    "vocab_top_coverage",
    "unigram_logprob_quality",
    "embedding_gram_matrix",
    "bloom_incremental_filter",
    "zorder_layout_skipping",
    "coercion_kitchen_sink",    # fresh row over the r7 grammar-gated safe_* ladders
    "dedup_exact",
    "grouping_sets_orders",
    "lang_id_stopwords",
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
