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
    return queries, oracle


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    from weather_database_system_spark.operators.relational import pricing_summary

    return pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registries()[0]


def oracle_sql() -> dict[str, str]:
    return _registries()[1]
