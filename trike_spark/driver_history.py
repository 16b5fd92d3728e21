"""Record of which queries the capped driver correctness window has verified.

The driver checks only the first 50 exported names per round (sorted order).
Round 2's family-interleaved export made that window family-balanced; this
module makes it *cumulative*: names already hard-verified in a previous
round's ``CORRECTNESS_r*.json`` are pushed behind never-verified ones, so
each round's 50-entry window lands on fresh queries until the whole registry
has a driver-green row.

The sets below are transcribed from the committed correctness reports
(strip the ``{rank:02d}_`` prefix). They are data, not behavior: rotating
the export order cannot change any query's semantics, and every rotated
query still carries the same oracle SQL. See docs/QUERY_ORDER.md.
"""

from __future__ import annotations

# CORRECTNESS_r02.json — 50/50 green (rows + schema + hash, or rows-only
# where the registry deliberately omits an oracle).
VERIFIED_R02: frozenset[str] = frozenset(
    {
        "agg_basic_stats",
        "agg_correlated_subquery",
        "agg_count_distinct",
        "agg_cube_flags",
        "curation_contamination_trigram",
        "curation_hash_sample",
        "curation_lang_median_filter",
        "curation_mixture_reweight",
        "dedup_cluster_canonical",
        "dedup_embedding_cosine_pairs",
        "dedup_embedding_lsh_cosine_pairs",
        "dedup_exact",
        "events_dedup_first_per_key",
        "events_enrich_stream_static",
        "events_interval_join_click_purchase",
        "events_sessionization",
        "join_anti_inactive_customers",
        "join_asof_event_order",
        "join_cross_region_pairs",
        "join_full_nation_presence",
        "multimodal_assemble",
        "multimodal_decode_features",
        "multimodal_frame_sample",
        "pipeline_training_data_prep",
        "q10_returned_items",
        "q12_priority_shipping_buckets",
        "q1_pricing_summary",
        "q3_shipping_priority",
        "scalar_array_funcs",
        "scalar_array_funcs2",
        "scalar_bitwise_funcs",
        "scan_csv_roundtrip_documents",
        "scan_json_roundtrip_events",
        "setop_except_all",
        "setop_intersect",
        "setop_union_all",
        "sim_centroids_by_label",
        "sim_ivf_search",
        "sim_lsh_bucket_topk",
        "sketch_bloom_membership",
        "sketch_countmin_heavyhitters",
        "text_bigrams_top10",
        "text_explode_outer_trigrams",
        "text_fingerprint",
        "trike_batch_encode",
        "trike_cloud_event_project",
        "trike_heartbeat_filter",
        "window_distribution_funcs",
        "window_gap_fill_forward",
        "window_lag_lead_order_gaps",
    }
)

# Union of every name hard-verified by any past driver round.
DRIVER_VERIFIED: frozenset[str] = VERIFIED_R02

# Queries the round-2 verdict explicitly asked to see driver-green this
# round ("q2, q16, q21 … each lands inside the rotated driver window").
# They rank FIRST within their family's unverified bucket so a large
# family can't crowd them out of the 50-entry window.
WINDOW_PRIORITY: frozenset[str] = frozenset(
    {
        "q2_min_cost_supplier",
        "q16_supplier_part_counts",
        "q21_sole_blame_supplier",
    }
)
