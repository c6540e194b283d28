"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
every implemented operator from SURVEY.md §2 as (spark, sf_dir) -> DataFrame;
``oracle_sql()`` gives the DuckDB-runnable ANSI SQL equivalent for each
SQL-expressible query (non-relational ops omit theirs → rows-only check).

The real implementations live in ``weather_database_system_spark``; this file
only aggregates the per-module QUERIES / ORACLE registries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Verification-freshness bookkeeping (r5 VERDICT task #1).
#
# MAINTENANCE (start of each round): for every key in the new
# CORRECTNESS_r{N}.json, set _LAST_VERIFIED[name] = N (add new names,
# overwrite older rounds); then REMOVE any query this round's code or
# oracle changes touch, so it re-enters the front of the sample. The
# python one-liner in tests/test_docs.py's docstring neighborhood:
#   rounds = {k: n for n in range(1, N+1)
#             for k in json.load(open(f"CORRECTNESS_r{n:02d}.json"))}
# gives the exact map; tests/test_docs.py pins names/ordering.
#
# _LAST_VERIFIED maps each query with a green CORRECTNESS row — whose
# implementation AND oracle are unchanged since that row — to the round of
# that row (last key occurrence across all CORRECTNESS_r* files). The driver
# samples the first 50 registry entries per round, so _prioritize()
# enumerates never-checked / rewritten entries first (absent from the map),
# then ascending by staleness — the r01/r02-era greens re-verify before
# anything newer. Two rounds of this rotation re-freshen the whole registry.
#
# Rotation executed at r14 start per the procedure above: all 50 keys
# in CORRECTNESS_r13.json moved to 13 — 50/50 green (rows + schema +
# hash). The r13 sample was 13 unmapped (3 re-queues: heavy_hitters_cms,
# heavy_hitters_cms_stream, jaccard_prefix_pairs; 10 queries ADDED
# during r13: salted_join_cms, channel_cumulative_compare,
# trigram_index_search, minmax_downsample, table_fingerprint,
# table_fingerprint_stream, fingerprint_divergence_report,
# frequent_best_customer_revenue, nearest_station_within_radius,
# station_density_grid) + the 2 r7 stragglers (feed_daily_rollup,
# cache_envelope_projection — now cleared) + 35 from the front of the
# r8-era block.  [The previous revision of this comment under-counted
# the r13 additions as "9 new / 12 unmapped"; fingerprint_divergence_
# report was omitted — ADVICE r13 #1. Corrected: 10 new / 13 unmapped,
# which is exactly what CORRECTNESS_r13.json shows.]
# Groups now: r8=12 (the last r8-green entries — the stalest rows in
# the registry, first in line this round per the r13 VERDICT task #1),
# r10=45, r11=48, r12=47, r13=47 after the three mid-round removals
# noted inline below. The r14 sample (first 50) = 7 unmapped (4 new r14
# queries: trigram_search_prebuilt, ann_ivf_prebuilt,
# ann_ivf_prebuilt_nprobe, fingerprint_generic_orders; 3 re-queues:
# trigram_index_search, station_density_grid,
# nearest_station_within_radius) + the 12-entry r8 block + the front 31
# of the 45-entry r10 block; one more round then refreshes the
# remainder.
_LAST_VERIFIED = {
    # --- last green in r08 ---
    **dict.fromkeys([
        "anomaly_mad_zscore_approx", "approx_distinct_users_scale",
        "bloom_prefilter_semi_join", "doc_chunk_windows",
        "domain_mixture_weights", "feed_station_monthly",
        "feed_station_rollup", "pii_redaction", "quality_weighted_sample",
        "sequence_pack_bins", "sequence_pack_bins_sharded",
        "udf_weighted_mean_price"
    ], 8),
    # --- last green in r10 ---
    **dict.fromkeys([
        "agg_collect_sorted", "ann_brute_force",
        "asof_attribution_tolerance", "bigram_surprisal_quality",
        "chunk_dedup_stats", "contamination_eval_overlap",
        "corpus_dedup_apply", "curriculum_pack_epochs",
        "data_quality_profile", "decayed_user_value",
        "dedup_against_index", "dedup_clusters", "dedup_containment",
        "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
        "diff_snapshots", "embedding_gram_matrix", "embedding_near_dup",
        "entity_fuzzy_blocking", "funnel_time_to_convert",
        "graph_clustering_coeff", "grouping_sets_revenue",
        "histogram_value_buckets", "image_decode_features",
        "item_cooccurrence_similarity", "late_orders_by_priority",
        "ngram_jaccard_pairs", "pagerank_near_dup", "pmi_collocations",
        "repetition_ngram_stats", "rollup_merge_incremental",
        "scd2_user_history", "seasonal_hourly_profile",
        "shipping_priority", "source_kl_divergence",
        "source_overlap_jaccard", "span_corruption_masks",
        "split_by_cluster", "string_functions", "time_proximity_join",
        "tokenize_to_ids", "unigram_logprob_quality",
        "winnow_fingerprints", "zorder_layout"
    ], 10),
    # --- last green in r11 ---
    **dict.fromkeys([
        "ann_ivf_label", "ann_lsh_fixedpoint", "ann_lsh_hyperplane",
        "ann_product_quantization", "asof_attribution", "bm25_search",
        "changepoint_mean_shift", "corpus_curation", "correlation_matrix",
        "customer_order_distribution", "dedup_clusters_fast",
        "dedup_minhash_lsh_fast", "discount_elimination_revenue",
        "disjunctive_brand_revenue", "duplicate_span_extraction",
        "embedding_near_dup_lsh", "embedding_pca_project",
        "excess_share_suppliers", "important_part_value",
        "jpeg_decode_features", "lang_id_stopword", "large_volume_orders",
        "linear_regression_trend", "min_cost_supplier", "monthly_rollup",
        "multimodal_frame_sample", "multimodal_metadata", "nation_profit",
        "nation_trade_volume", "pricing_summary", "promo_revenue_share",
        "quarterly_top_supplier", "range_band_join",
        "regional_market_share", "returned_item_customers",
        "session_path_analysis", "small_quantity_part_revenue",
        "sole_return_supplier", "stream_stream_join",
        "supplier_count_by_part_family", "text_quality",
        "text_token_stats", "tfidf_top_terms", "time_weighted_avg",
        "udf_tokenize_table", "wealthy_idle_customers",
        "weighted_reservoir_sample", "window_running_sum"
    ], 11),
    # --- last green in r12 ---
    **dict.fromkeys([
        "ann_ivf_kmeans", "ann_ivf_kmeans_nprobe", "approx_distinct_users",
        "array_functions", "bpe_merge_pairs", "cache_freshness_ladder",
        "cache_ttl_introspection", "coercion_fill_policy",
        "cohort_retention", "conditional_functions", "datetime_functions",
        "dedup_clusters_logstar", "feature_scaling", "funnel_conversion",
        "gap_fill_interpolate", "gap_fill_locf",
        # heavy_hitters_cms_stream REMOVED mid-r13 (vocab-factored
        # rewrite alongside the batch twin — grams collapse to weighted
        # vocabulary rows before hashing; bit-identical output verified
        # vs the oracle at sf0.001/0.01 in-session, Zipf-regime 32×
        # rehearsal 56.4 → 50.1 s): touched code re-enters the sample
        # front per the standing protocol.
        "hll_partial_rollup", "map_functions",
        "math_functions", "monthly_filtered", "multi_band_counts",
        "projection_sort", "quantile_bucket_decile",
        "quantile_bucket_decile_approx", "rfm_segmentation",
        "rfm_segmentation_approx", "rollup_cascade_day",
        "rollup_topk_per_grain", "semdedup_prune", "sessionize_events",
        "shipmode_priority_counts", "skew_salted_agg", "skew_split_join",
        "sql_correlated_exists", "sql_groupby_having",
        "sql_scalar_subquery", "stratified_sample",
        "stream_late_data_policy", "stream_session_window",
        "stream_sliding_window", "stream_tumbling_window",
        "stream_windowed_dedup", "string_functions_extended",
        "tfidf_cosine_pairs", "train_test_split", "udf_normalize_text",
        "yoy_revenue_delta"
    ], 12),
    # --- last green in r13 ---
    **dict.fromkeys([
        "agg_quantiles", "agg_statistics", "ann_bruteforce_pandas",
        "anomaly_mad_zscore", "audio_decode_features",
        "cache_envelope_projection", "channel_cumulative_compare",
        "conditional_agg", "count_diagnostic", "cube_totals",
        "date_normalization", "derived_revenue", "doc_fingerprint",
        "feed_daily_rollup", "filter_limit_sample",
        "fingerprint_divergence_report", "frequent_best_customer_revenue",
        "heavy_hitters_cms", "heavy_hitters_cms_stream",
        "jaccard_prefix_pairs", "join_anti_unordered_parts",
        "join_full_outer_nation_presence", "join_left_order_counts",
        "join_semi_active_customers", "join_star_revenue",
        "json_extract_props", "lineage_projection", "minmax_downsample",
        # nearest_station_within_radius REMOVED mid-r14 (_blocked_nearest
        # gained the optional hot_cells salted path; the registry default
        # is the unchanged plain join, but the touched-code protocol
        # re-queues it regardless): re-enters the sample front.
        "multimodal_features",
        "pivot_status_matrix", "png_decode_features",
        "presentation_format", "rollup_totals", "salted_join_cms",
        "set_except_nations", "set_intersect_nations", "set_union_nations",
        # station_density_grid REMOVED early-r14 (self-enforcing
        # non-negativity assert added for the // vs floor(/) oracle
        # equivalence — r13 VERDICT task #7): touched code re-enters
        # the sample front per the standing protocol.
        # trigram_index_search REMOVED early-r14 (body refactored onto the
        # shared _needle_tris/_tri_arr/_verify_contains helpers extracted
        # for the new trigram_search_prebuilt variant, plus the
        # self-enforcing needle-contract assert — ADVICE r13 #4): touched
        # code re-enters the sample front per the standing protocol.
        "skyline_pareto", "table_fingerprint",
        "table_fingerprint_stream", "topk_global",
        "unpivot_measures", "window_distribution_funcs",
        "window_lag_delta", "window_rank_dense", "window_rolling_1h",
        "window_topk_per_group"
    ], 13),
}


def _prioritize(mapping: dict) -> dict:
    """Never-checked / rewritten entries first, then stalest-green first
    (ascending last-verified round; registry order preserved within ties)."""
    items = sorted(
        mapping.items(), key=lambda kv: _LAST_VERIFIED.get(kv[0], 0)
    )
    return dict(items)


def _registries():
    from weather_database_system_spark.operators import relational

    modules = [relational]
    for name in (
        "dedup",
        "similarity",
        "textan",
        "multimodal",
        "temporal",
        "spatial",
        "scale",
        "behavioral",
        "featurize",
        "trainprep",
    ):
        try:
            mod = __import__(
                f"weather_database_system_spark.operators.{name}", fromlist=[name]
            )
            modules.append(mod)
        except ImportError:
            pass
    for path in (
        "weather_database_system_spark.streaming.windows",
        "weather_database_system_spark.functions.scalar",
        "weather_database_system_spark.functions.udfs",
        "weather_database_system_spark.pipeline.rollup",
        "weather_database_system_spark.pipeline.cachemath",
        "weather_database_system_spark.pipeline.ingest",
    ):
        try:
            modules.append(__import__(path, fromlist=["_"]))
        except ImportError:
            pass

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracle: dict[str, str] = {}
    for mod in modules:
        queries.update(getattr(mod, "QUERIES", {}))
        oracle.update(getattr(mod, "ORACLE", {}))
    return _prioritize(queries), oracle


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    from weather_database_system_spark.operators.relational import pricing_summary

    return pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registries()[0]


def oracle_sql() -> dict[str, str]:
    return _registries()[1]
