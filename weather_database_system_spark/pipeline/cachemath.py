"""The cache/serving arithmetic (SURVEY §2A ops #16, #20, #22) as
driver-hash-verifiable registry queries.

The cache layer's library surface (pipeline/cache.py, pipeline/serving.py)
is exercised by pytest, but its MATH — the 3-state freshness ladder
(backend/routes/monthly.js:36-42), the TTL countdown of the cache
introspection route (backend/routes/cache.js:9-64), and the envelope
metadata stamp (clickhouseToRedis.js:57-73) — is pure SQL over
(now, written_at, interval) triples. These queries evaluate that exact
arithmetic, with the SAME constants the library uses (imported from
pipeline/cache.py, not re-typed), over deterministic synthetic triples
derived from event ids, so the DuckDB oracle hash pins the serving
semantics too (VERDICT r2 'Next round' #8).

Determinism: snapshot age is a pure function of event_id (a multiplicative
spread mod 2×TTL covers expired through fresh, plus a periodic zero-interval
stripe for the degenerate guard), and "now" is a FIXED logical timestamp —
no wall clock anywhere, so both engines compute byte-identical envelopes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_database_system_spark.operators.relational import DEC, _fr, _sql_fr
from weather_database_system_spark.pipeline.cache import (
    DEFAULT_TTL_SEC,
    freshness_status_col,
    freshness_status_sql,
)
from weather_database_system_spark.sources.star import load_table

# Deterministic synthetic snapshot age per event: spreads over [0, 2×TTL)
# so ttl_remaining covers (-TTL, TTL] — expired, out-of-sync, partial and
# full all occur. Every 11th event gets interval 0 (the degenerate-guard
# branch of the ladder).
_AGE_SPREAD = 37
_ZERO_INTERVAL_EVERY = 11
_INTROSPECT_EVERY = 199  # bounded per-row sample for the introspection query

_FIXED_NOW = "1998-06-01 00:00:00"  # logical 'now' for the envelope stamp


def _age():
    return F.pmod(F.col("event_id") * _AGE_SPREAD, F.lit(2 * DEFAULT_TTL_SEC))


def _interval():
    return F.when(
        F.pmod(F.col("event_id"), F.lit(_ZERO_INTERVAL_EVERY)) == 0, F.lit(0)
    ).otherwise(F.lit(DEFAULT_TTL_SEC))


def _sql_age() -> str:
    return f"(event_id * {_AGE_SPREAD}) % {2 * DEFAULT_TTL_SEC}"


def _sql_interval() -> str:
    return (
        f"CASE WHEN event_id % {_ZERO_INTERVAL_EVERY} = 0 THEN 0 "
        f"ELSE {DEFAULT_TTL_SEC} END"
    )


def cache_freshness_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op #20 as a query: classify every synthetic snapshot with the ladder
    (shared constants with classify_freshness) and aggregate the census per
    state — count plus the exact ttl_remaining envelope per status. The
    oracle recomputes the CASE with the same thresholds; a drifted constant
    or a flipped boundary comparison flips rows between states and breaks
    the hash."""
    ev = load_table(spark, sf_dir, "events")
    ttl = (F.lit(DEFAULT_TTL_SEC) - _age()).alias("ttl_remaining")
    classified = ev.select(
        ttl, _interval().alias("interval_sec")
    ).select(
        freshness_status_col(F.col("ttl_remaining"), F.col("interval_sec")).alias(
            "sync_status"
        ),
        "ttl_remaining",
    )
    return (
        classified.groupBy("sync_status")
        .agg(
            F.count("*").alias("n_snapshots"),
            F.min("ttl_remaining").alias("min_ttl"),
            F.max("ttl_remaining").alias("max_ttl"),
        )
        .orderBy("sync_status")
    )


def cache_ttl_introspection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op #22 as a query: the introspection route's per-snapshot payload —
    ttl_seconds, ttl_minutes (portable 2-dp rounding), cache_valid and the
    ladder state — for a bounded deterministic stripe of snapshots."""
    ev = load_table(spark, sf_dir, "events")
    sub = ev.filter(F.pmod(F.col("event_id"), F.lit(_INTROSPECT_EVERY)) == 0)
    ttl = F.lit(DEFAULT_TTL_SEC) - _age()
    return (
        sub.select(
            "event_id",
            ttl.cast("double").alias("ttl_seconds"),
            _fr(ttl.cast("double") / F.lit(60.0), 2).alias("ttl_minutes"),
            (ttl > 0).cast("int").alias("cache_valid"),
            freshness_status_col(ttl, F.lit(DEFAULT_TTL_SEC)).alias("sync_status"),
        )
        .orderBy("event_id")
    )


def cache_envelope_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op #16 as a query: the monthly serving rows wearing the cache
    envelope's metadata columns — cache_timestamp, data_version (the
    v{unix-epoch} stamp, computed by each engine from the same fixed logical
    now, so the epoch arithmetic itself is cross-checked) and
    refresh_interval_sec (clickhouseToRedis.js:62-66)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("month", F.col("ts")), "yyyy-MM-dd").alias(
                "month"
            )
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast(DEC)), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.lit("monthly_agg").alias("metric"),
            "month",
            "n_events",
            "total_value",
            F.lit(_FIXED_NOW).alias("cache_timestamp"),
            F.concat(
                F.lit("v"),
                F.unix_timestamp(F.lit(_FIXED_NOW)).cast("string"),
            ).alias("data_version"),
            F.lit(DEFAULT_TTL_SEC).alias("refresh_interval_sec"),
        )
        .orderBy("month")
    )


ORACLE: dict[str, str] = {
    "cache_freshness_ladder": f"""
        WITH snapshots AS (
            SELECT {DEFAULT_TTL_SEC} - ({_sql_age()}) AS ttl_remaining,
                   {_sql_interval()} AS interval_sec
            FROM events
        )
        SELECT {freshness_status_sql('ttl_remaining', 'interval_sec')}
                   AS sync_status,
               count(*) AS n_snapshots,
               min(ttl_remaining) AS min_ttl,
               max(ttl_remaining) AS max_ttl
        FROM snapshots
        GROUP BY 1
        ORDER BY 1
    """,
    "cache_ttl_introspection": f"""
        WITH sub AS (
            SELECT event_id,
                   {DEFAULT_TTL_SEC} - ({_sql_age()}) AS ttl
            FROM events
            WHERE event_id % {_INTROSPECT_EVERY} = 0
        )
        SELECT event_id,
               CAST(ttl AS DOUBLE) AS ttl_seconds,
               {_sql_fr('CAST(ttl AS DOUBLE) / 60.0', 2)} AS ttl_minutes,
               CAST(ttl > 0 AS INT) AS cache_valid,
               {freshness_status_sql('ttl', str(DEFAULT_TTL_SEC))} AS sync_status
        FROM sub
        ORDER BY event_id
    """,
    "cache_envelope_projection": f"""
        SELECT 'monthly_agg' AS metric,
               strftime(date_trunc('month', ts), '%Y-%m-%d') AS month,
               count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(30,10))), 2) AS DOUBLE)
                   AS total_value,
               '{_FIXED_NOW}' AS cache_timestamp,
               'v' || CAST(CAST(epoch(TIMESTAMP '{_FIXED_NOW}') AS BIGINT)
                           AS VARCHAR) AS data_version,
               {DEFAULT_TTL_SEC} AS refresh_interval_sec
        FROM events
        GROUP BY 2
        ORDER BY 2
    """,
}

QUERIES = {
    "cache_freshness_ladder": cache_freshness_ladder,
    "cache_ttl_introspection": cache_ttl_introspection,
    "cache_envelope_projection": cache_envelope_projection,
}
