"""SparkSession bootstrap.

One place to configure the session so tests, bench, and the driver contract
all run with identical semantics:

- ``spark.sql.session.timeZone=UTC``: the DuckDB oracle compares naive
  timestamps; Spark must render in UTC (reference pins a timezone per fetch at
  fetchStocktonWeather.js:35 — we pin UTC engine-wide and treat observation
  timestamps as naive local time).
- AQE on: runtime coalescing + skew-join handling is the 100 TB-scale answer
  to skewed group/join keys; at local[32] it also right-sizes tiny shuffles.
- shuffle.partitions sized to cores for local mode (the 200 default
  over-parallelizes small data and under-parallelizes 100 TB; on a real
  cluster this is set per-job or left to AQE's coalescing).
- Arrow enabled: every pandas interchange (toPandas, pandas_udf,
  applyInPandas) rides vectorized Arrow batches.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "weather_database_system_spark",
              cpus: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Local-mode knobs are chosen so the same logical plans scale to a real
    cluster: nothing here hand-schedules what Catalyst/AQE would do.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
