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
#             for k in json.load(open(f"CORRECTNESS_r0{n}.json"))}
# gives the exact map; tests/test_docs.py pins names/ordering.
#
# _LAST_VERIFIED maps each query with a green CORRECTNESS row — whose
# implementation AND oracle are unchanged since that row — to the round of
# that row (last key occurrence across CORRECTNESS_r01..r05). The driver
# samples the first 50 registry entries per round, so _prioritize()
# enumerates never-checked / rewritten entries first (absent from the map),
# then ascending by staleness — the r01/r02-era greens re-verify before
# anything newer. Two rounds of this rotation re-freshen the whole registry.
#
# Rotation executed at r11 start per the procedure above (r10 skipped its
# rotation — the r10 sample was key-identical to r9's; r10 VERDICT #3):
# every key in CORRECTNESS_r10.json moved to 10 (that sample re-greened
# the whole r05-era block and the r06 front), leaving groups r6=20,
# r7=45, r8=48, r10=46. The r11 sample therefore covers the 7 r11
# rewrites below plus the twenty-one never-verified queries new this round
# (sole_return_supplier, customer_order_distribution, the second
# TPC-H-shape wave — small_quantity_part_revenue, large_volume_orders,
# wealthy_idle_customers, quarterly_top_supplier — the third wave:
# nation_trade_volume, regional_market_share, returned_item_customers,
# promo_revenue_share, disjunctive_brand_revenue — the fourth,
# pseudo-partsupp wave: min_cost_supplier, nation_profit,
# important_part_value, supplier_count_by_part_family,
# excess_share_suppliers, and the Q6-shaped
# discount_elimination_revenue that completes the sweep at 21 of 22
# TPC-H shapes — plus four late-r11 extension operators:
# weighted_reservoir_sample (A-ES fixed-size weighted sampling, exact
# oracle), heavy_hitters_cms (count-min frequency sketch, exact
# spine + pinned claims), correlation_matrix (one-pass Pearson
# matrix from decimal-exact moments), and jaccard_prefix_pairs
# (PPJoin prefix-filtered exact set-similarity join — the oracle
# brute-forces the unfiltered join, certifying zero false negatives)),
# the entire
# 20-query r6 tail (ann_ivf_label, bm25_search,
# asof_attribution, range_band_join, stream_stream_join, …) and the front
# of the r7 block — after r11 nothing in the registry is older than r7.
#
# Deliberately REMOVED from the map this round (r11 rewrites → jump the
# queue): dedup_minhash_lsh_fast and dedup_clusters_fast (their registry
# surfaces are NOW the *_checked wrappers — exact-twin rows + pinned
# recall / est-deviation / label-agreement claims, DuckDB oracles added
# this round; the r9 note that claimed this had already landed was wrong
# for two rounds — r10 VERDICT #2); embedding_pca_project (registry
# surface now embedding_pca_project_checked: replayable spine + pinned
# subspace-invariant claims); ann_product_quantization (registry surface
# now ann_product_quantization_checked: replayable per-query spine +
# pinned ADC quantization-error / gain claims — the LAST rows-only entry,
# so the registry is now 164/164 oracle-checked); jpeg_decode_features
# (oracle dimensions now interpolate {IMG_W}/{IMG_H} instead of
# hardcoding 48/32 — replay equivalence is expected but the oracle text
# changed, so it re-enters the sample front); changepoint_mean_shift
# (late-r11 fix: Spark's decimal(38,10) window-sum subtraction silently
# dropped to scale 9 — a one-sided precision loss that could flip the
# argmax on score ties vs DuckDB's exact subtraction; caught by the
# NULL-series hypothesis property, subtraction now downcast-exact);
# window_running_sum (the
# r11 full-registry sf0.1 parity sweep — tools/parity_sweep.py — caught
# a ROWS-frame ordering tie between duplicate (orderkey, linenumber)
# lineitem rows that the sf0.01 gate never hits; ordering now
# tie-broken by the summands on both engine and oracle sides).
_LAST_VERIFIED = {
    # --- last green in r06 ---
    **dict.fromkeys([
        "ann_ivf_label", "ann_lsh_fixedpoint", "ann_lsh_hyperplane",
        "asof_attribution", "bm25_search", "corpus_curation",
        "duplicate_span_extraction", "embedding_near_dup_lsh",
        "lang_id_stopword", "linear_regression_trend",
        "multimodal_frame_sample", "multimodal_metadata",
        "range_band_join", "session_path_analysis",
        "stream_stream_join", "text_quality", "text_token_stats",
        "tfidf_top_terms", "time_weighted_avg", "udf_tokenize_table",
    ], 6),
    # --- last green in r07 ---
    **dict.fromkeys([
        "ann_ivf_kmeans", "ann_ivf_kmeans_nprobe",
        "approx_distinct_users",
        "array_functions", "cache_envelope_projection",
        "cache_freshness_ladder", "cache_ttl_introspection",
        "coercion_fill_policy", "cohort_retention",
        "conditional_functions", "datetime_functions",
        "dedup_clusters_logstar", "feature_scaling",
        "feed_daily_rollup", "funnel_conversion",
        "gap_fill_interpolate", "gap_fill_locf", "hll_partial_rollup",
        "map_functions", "math_functions", "monthly_filtered",
        "monthly_rollup", "pricing_summary", "projection_sort",
        "quantile_bucket_decile", "quantile_bucket_decile_approx",
        "rfm_segmentation", "rfm_segmentation_approx",
        "rollup_cascade_day", "semdedup_prune", "sessionize_events",
        "skew_salted_agg", "sql_correlated_exists",
        "sql_groupby_having", "sql_scalar_subquery",
        "stratified_sample", "stream_late_data_policy",
        "stream_session_window", "stream_sliding_window",
        "stream_tumbling_window", "stream_windowed_dedup",
        "string_functions_extended", "tfidf_cosine_pairs",
        "train_test_split", "udf_normalize_text",
    ], 7),
    # --- last green in r08 ---
    **dict.fromkeys([
        "agg_quantiles", "agg_statistics", "ann_bruteforce_pandas",
        "anomaly_mad_zscore", "anomaly_mad_zscore_approx",
        "approx_distinct_users_scale", "audio_decode_features",
        "bloom_prefilter_semi_join", "conditional_agg",
        "count_diagnostic", "cube_totals", "date_normalization",
        "derived_revenue", "doc_chunk_windows", "doc_fingerprint",
        "domain_mixture_weights", "feed_station_monthly",
        "feed_station_rollup", "filter_limit_sample",
        "join_anti_unordered_parts",
        "join_full_outer_nation_presence", "join_left_order_counts",
        "join_semi_active_customers", "join_star_revenue",
        "json_extract_props", "lineage_projection",
        "multimodal_features", "pii_redaction", "pivot_status_matrix",
        "png_decode_features", "presentation_format",
        "quality_weighted_sample", "rollup_totals",
        "sequence_pack_bins", "sequence_pack_bins_sharded",
        "set_except_nations", "set_intersect_nations",
        "set_union_nations", "skyline_pareto", "topk_global",
        "udf_weighted_mean_price", "unpivot_measures",
        "window_distribution_funcs", "window_lag_delta",
        "window_rank_dense", "window_rolling_1h",
        "window_topk_per_group",
    ], 8),
    # --- last green in r10 ---
    **dict.fromkeys([
        "agg_collect_sorted", "ann_brute_force",
        "asof_attribution_tolerance", "bigram_surprisal_quality",
        "chunk_dedup_stats",
        "contamination_eval_overlap", "corpus_dedup_apply",
        "curriculum_pack_epochs", "data_quality_profile",
        "decayed_user_value", "dedup_against_index", "dedup_clusters",
        "dedup_containment", "dedup_exact", "dedup_minhash_lsh",
        "dedup_simhash", "diff_snapshots", "embedding_gram_matrix",
        "embedding_near_dup", "entity_fuzzy_blocking",
        "funnel_time_to_convert", "graph_clustering_coeff",
        "grouping_sets_revenue", "histogram_value_buckets",
        "image_decode_features", "item_cooccurrence_similarity",
        "late_orders_by_priority", "ngram_jaccard_pairs",
        "pagerank_near_dup", "pmi_collocations",
        "repetition_ngram_stats", "rollup_merge_incremental",
        "scd2_user_history", "seasonal_hourly_profile",
        "shipping_priority", "source_kl_divergence",
        "source_overlap_jaccard", "span_corruption_masks",
        "split_by_cluster", "string_functions", "time_proximity_join",
        "tokenize_to_ids", "unigram_logprob_quality",
        "winnow_fingerprints", "zorder_layout",
    ], 10),
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
