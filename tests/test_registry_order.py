"""Graded-window stability guard: the driver grades the FIRST 50
registry entries positionally (frozen since round 1). New queries
must append at the tail (registry.py load order); this test fails
loudly if an insertion ever shifts the graded window."""

from example_beam_spark.registry import load_registry

GRADED_WINDOW = [
    "ctr_fixed_capped",
    "ctr_fixed_total",
    "ctr_sliding_total",
    "ctr_sliding_reassigned",
    "ctr_global",
    "enrich_broadcast_latest",
    "enrich_time_range_join",
    "enrich_lookup_ttl_asof",
    "enrich_broadcast_dlq",
    "cogroup_user_activity",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_revenue_by_nation",
    "q6_forecast_revenue",
    "q10_returned_revenue",
    "orders_by_month",
    "rollup_lineitem",
    "topk_parts_per_brand",
    "customers_with_big_orders",
    "customers_without_orders",
    "part_name_like",
    "sessionize_events",
    "price_quantiles",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_cluster_canonical",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "embedding_neardup_pairs",
    "embedding_quantize_int8",
    "text_stats",
    "lang_id_markers",
    "token_count_bpe",
    "doc_fingerprint",
    "docs_sample_stratified",
    "docs_pack_sequences",
    "span_dedup",
    "multimodal_decode",
    "multimodal_frame_sample",
    "multimodal_resize",
    "multimodal_audio_segments",
    "record_roundtrip",
    "setops_union_parties",
    "setops_intersect_nations",
    "setops_except_nations",
    "window_order_ranks",
    "grouping_sets_orders",
    "q4_late_orders",
]


def test_first_50_registry_positions_frozen():
    names = list(load_registry())
    assert names[:50] == GRADED_WINDOW
