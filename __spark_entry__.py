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

# Queries with a green CORRECTNESS row in round 1 or 2 (union of the keys in
# CORRECTNESS_r01.json / CORRECTNESS_r02.json). The driver samples the first
# 50 registry entries per round, so _registries() enumerates everything NOT
# in this set first — one round's sample then covers every never-checked
# query; the already-verified ones keep their local oracle-parity coverage
# (tests/test_oracle_parity.py) in the meantime.
_DRIVER_GREEN = frozenset({
    "agg_collect_sorted", "agg_quantiles", "agg_statistics",
    "ann_brute_force", "ann_bruteforce_pandas", "ann_ivf_kmeans",
    "ann_ivf_label", "ann_lsh_hyperplane", "coercion_fill_policy",
    "conditional_agg", "count_diagnostic", "cube_totals",
    "date_normalization", "dedup_clusters", "dedup_exact",
    "dedup_minhash_lsh", "dedup_minhash_lsh_fast", "dedup_simhash",
    "derived_revenue", "embedding_near_dup", "embedding_near_dup_lsh",
    "filter_limit_sample", "grouping_sets_revenue", "histogram_value_buckets",
    "join_anti_unordered_parts", "join_full_outer_nation_presence",
    "join_left_order_counts", "join_semi_active_customers",
    "join_star_revenue", "json_extract_props", "lang_id_stopword",
    "late_orders_by_priority", "lineage_projection", "monthly_filtered",
    "monthly_rollup", "ngram_jaccard_pairs", "pivot_status_matrix",
    "presentation_format", "pricing_summary", "projection_sort",
    "rollup_totals", "set_except_nations", "set_intersect_nations",
    "set_union_nations", "shipping_priority", "string_functions",
    "text_quality", "text_token_stats", "topk_global", "unpivot_measures",
    "window_lag_delta", "window_rank_dense", "window_rolling_1h",
    "window_running_sum", "window_topk_per_group",
})


def _prioritize(mapping: dict) -> dict:
    """Never-driver-checked entries first (registry order preserved within
    each block), round-1/2-green entries last."""
    unchecked = {k: v for k, v in mapping.items() if k not in _DRIVER_GREEN}
    checked = {k: v for k, v in mapping.items() if k in _DRIVER_GREEN}
    return {**unchecked, **checked}


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
