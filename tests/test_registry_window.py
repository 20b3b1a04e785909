"""Pin the driver-visible registration window.

The driver's differential harness hard-checks only the FIRST 50
registered queries.  These tests pin (a) the COMPLETE intended window
so any future registration or demotion that would silently evict a
member fails here first, and (b) the demotion list staying a
permutation tail of the registry.
"""

from etl_pipe_spark.plans.catalog import _DEMOTED, REGISTRY, _load_all, queries

DRIVER_WINDOW = 50

FLAGSHIPS = [
    # ROUND-9 WINDOW (the r8 verdict's items 1+2 rotation, executed
    # against the recomputed r01-r08 staleness union; the swap-by-swap
    # rationale lives in catalog._DEMOTED's round-9 header).
    #
    # The 3 never-driver-checked r8 registrations (the queue HEAD —
    # after r9 the never-checked set is empty again):
    "ngram_novelty_score",
    "binaryfile_ingest",
    "ivfsq8_ann_rerank",
    # ALL 10 r04-stale promotions (incl. the four whose production
    # supersets covered them in r8 — the base forms return, the
    # supersets hand back their pins):
    "promo_revenue_share",
    "pivot_status_revenue",
    "having_large_orders",
    "tpch_q10_returned_items",
    "json_flatten_props",
    "exact_percentiles",
    "similarity_ann_ivf",
    "kmeans_update_step",
    "similarity_topk_cosine",
    "semantic_dedup",
    # This round's 3 NEW registrations (first driver rows in-window,
    # keeping the never-checked set empty — the r5-r8 convention):
    "ngram_novelty_persisted",   # r9: novelty probe against the PERSISTED reference gram table
    "ivfbq_ann_rerank",          # r9: IVF-pruned Hamming + exact rerank (completes the quantizer x index matrix's BQ column)
    "ivfpq_index_lifecycle",     # r9: IVFPQ build+append+append+compact+search under the frozen-quantizer oracle
    # Pinned production flagships:
    "ann_ivf_scaled",
    "semantic_dedup_scaled",
    "lsh_index_persisted",
    "streaming_dedup_watermark",
    # 30 of the 33 r05-stale promotions (the 3 left out —
    # corpus_curation_pipeline, dedup_minhash_lsh,
    # multimodal_frame_sample — carry in-window family cover and head
    # the r10 queue):
    "multimodal_features",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q20_dominant_supplier",
    "ann_kmeans_recall_lift",
    "pq_fit_quality",
    "pca_top_component",
    "corpus_shuffle_shards",
    "approx_aggregates",
    "sequence_packing",
    "tfidf_top_terms",
    "dedup_ngram_jaccard",
    "pandas_group_zscore",
    "contamination_check",
    "quality_repetition_filter",
    "run_summary_rollup",
    "incremental_scan",
    "asof_join_last_event",
    "session_window_agg",
    "merge_replay_dedup",
    "scd2_version_chain",
    "wide_projection",
    "denorm_join",
    "supplier_nation_rollup",
    "json_flatten_input_data",
    "doc_fingerprint",
    "similarity_srp_lsh",
    "text_redact",
    "doc_chunking",
    "dedup_simhash",
]


def test_flagship_list_is_the_whole_window():
    assert len(FLAGSHIPS) == DRIVER_WINDOW


def test_flagships_inside_driver_window():
    names = list(queries())
    window = set(names[:DRIVER_WINDOW])
    missing = [f for f in FLAGSHIPS if f not in window]
    extra = sorted(window - set(FLAGSHIPS))
    assert not missing, f"flagships outside driver window: {missing}"
    assert not extra, f"unexpected window members: {extra}"


def test_demoted_names_exist_and_ordering_is_a_permutation():
    _load_all()
    assert set(_DEMOTED) <= set(REGISTRY), "demoting a name that isn't registered"
    names = list(queries())
    assert sorted(names) == sorted(REGISTRY), "ordering dropped or duplicated a query"
    assert names[-len(_DEMOTED):] == list(_DEMOTED)
