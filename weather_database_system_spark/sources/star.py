"""Loaders for the driver-generated star schema (TESTDATA.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``. Readers are
plain ``spark.read.parquet`` — columnar scan, predicate pushdown and column
pruning come from Catalyst; nothing to hand-roll.

At 100 TB these tables would be directory-partitioned (orders/lineitem by
month of their date key); the loaders keep that transparent to callers, so
queries written against them partition-prune automatically once the layout
carries partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Broadcast decisions are made per query (and pinned by plan tests in
# tests/test_plans.py), not here: a loader-level blanket hint would leak into
# joins where broadcasting is wrong (full outer) or wasteful.


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    ensure_engine_confs(spark)
    if name == "events":
        return _load_events(spark, path)
    return _normalize_ts(spark.read.parquet(path))


def _normalize_ts(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to session-tz TIMESTAMP (UTC per
    ensure_engine_confs). The engine's temporal surface — watermarks, epoch
    casts, window() — is defined over TIMESTAMP; under a UTC session the
    cast preserves the wall-clock value, i.e. exactly the naive-as-UTC
    reading the DuckDB oracle applies to the same parquet."""
    from pyspark.sql import functions as F

    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if not ntz:
        return df
    return df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})


def ensure_engine_confs(spark: SparkSession) -> None:
    """Session confs the engine's semantics depend on, applied once per
    session (get_spark sets them at build time; the driver supplies its OWN
    session, so the first load_table call is the bootstrap there):

    - session.timeZone=UTC — date_trunc/date_format must agree with the
      timezone-naive DuckDB oracle even if the host JVM default isn't UTC.
    - legacy.parquet.nanosAsLong — events.ts is TIMESTAMP(NANOS) in some
      testdata generations, which the vectorized reader rejects; read raw
      nanos and convert (see _load_events). Must be set before the first
      events scan is PLANNED.
    - parquet.inferTimestampNTZ.enabled=false — other generations write
      ts as TIMESTAMP(MICROS) with isAdjustedToUTC=false, which Spark 4
      infers as TIMESTAMP_NTZ: a type that breaks event-time watermarks
      (LTZ required) and epoch casts. Disabling the inference reads it as
      session-tz TIMESTAMP — under UTC, the exact naive-as-UTC semantics
      the DuckDB oracle uses. _normalize_ts additionally casts any NTZ
      column that slipped through (a session whose first events scan was
      planned before this bootstrap).

    This is a documented global override, not a per-call side effect: the
    set() only fires when the value differs, so a session already
    bootstrapped (every get_spark session) is never touched again.
    """
    wanted = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    }
    for k, v in wanted.items():
        try:
            current = spark.conf.get(k)
        except Exception:
            current = None
        if current != v:
            spark.conf.set(k, v)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    rejects outright. Read it as raw nanos (legacy conf, set by
    ensure_engine_confs) and convert with integer division — NOT float
    division, which would lose precision on ~1.7e18 nano values — truncating
    toward zero exactly like the DuckDB oracle's ns→us narrowing for
    positive epochs."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return _normalize_ts(df)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql sees the same names
    the DuckDB oracle pre-registers."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
