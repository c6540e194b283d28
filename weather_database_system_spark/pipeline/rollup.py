"""Hypertable-style rollup cascade: hour → day → month aggregates where
each coarser grain is computed FROM THE FINER GRAIN'S PARTIALS, never by
re-scanning raw data.

This is the continuous-aggregate pattern (TimescaleDB/Druid rollups) the
reference approximates with its single monthly INSERT…SELECT
(etlToClickHouse.js:157-173): at 100 TB you cannot afford to re-scan the
fact table per grain — you keep (sum, count) partials at the finest grain
and reassociate upward. sum/count are reassociable; avg is derived at read
time from the partials; min/max cascade the same way. The partials
accumulate in DECIMAL(30,10), so the cascade is LOSSLESS: the registry
query ``rollup_cascade_day`` computes day-grain from hour-grain partials
while its oracle aggregates the raw table directly — they must match
bit-for-bit, which is the whole point.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_database_system_spark.operators.relational import DEC, _fr, _sql_fr
from weather_database_system_spark.sources.star import load_table

GRAINS = ("hour", "day", "month")


def rollup_partials(df: DataFrame, ts_col: str, keys: list[str], value: str, grain: str) -> DataFrame:
    """Finest-grain partials: (sum, count, min, max) per (keys, bucket)."""
    return (
        df.groupBy(*keys, F.date_trunc(grain, F.col(ts_col)).alias("bucket"))
        .agg(
            F.sum(F.col(value).cast(DEC)).alias("psum"),
            F.count(value).alias("pcount"),
            F.min(value).alias("pmin"),
            F.max(value).alias("pmax"),
        )
    )


def cascade_up(partials: DataFrame, keys: list[str], grain: str) -> DataFrame:
    """Coarser grain from finer partials: reassociate sums/counts, cascade
    min/max — no raw-data access."""
    return (
        partials.groupBy(*keys, F.date_trunc(grain, F.col("bucket")).alias("bucket"))
        .agg(
            F.sum("psum").alias("psum"),
            F.sum("pcount").alias("pcount"),
            F.min("pmin").alias("pmin"),
            F.max("pmax").alias("pmax"),
        )
    )


def build_rollup_cascade(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    *,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    value: str = "value",
) -> dict[str, DataFrame]:
    """Materialize the full cascade, one table per grain, each built from
    the previous grain's partials. Returns the (re-read) tables."""
    keys = keys if keys is not None else ["event_type"]
    out: dict[str, DataFrame] = {}
    current = rollup_partials(df, ts_col, keys, value, GRAINS[0])
    for grain in GRAINS:
        if grain != GRAINS[0]:
            current = cascade_up(current, keys, grain)
        path = os.path.join(root, f"rollup_{grain}")
        current.write.mode("overwrite").parquet(path)
        current = spark.read.parquet(path)
        out[grain] = current
    return out


def read_rollup(df: DataFrame) -> DataFrame:
    """Read-time projection over partials: avg derived, sums surfaced."""
    return df.select(
        "*",
        (F.col("psum").cast("double") / F.col("pcount")).alias("avg_value"),
    )


def rollup_cascade_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry proof of losslessness: day-grain computed hour-partials-first
    (rollup_partials → cascade_up), while the oracle aggregates the raw
    events table directly at day grain. Bit-equality ⇒ the cascade loses
    nothing."""
    ev = load_table(spark, sf_dir, "events")
    hours = rollup_partials(ev, "ts", ["event_type"], "value", "hour")
    days = cascade_up(hours, ["event_type"], "day")
    return days.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd").alias("day"),
        F.round(F.col("psum"), 2).cast("double").alias("total_value"),
        F.col("pcount").alias("n_events"),
        _fr(F.col("pmin"), 4).alias("min_value"),
        _fr(F.col("pmax"), 4).alias("max_value"),
        _fr(F.col("psum").cast("double") / F.col("pcount"), 4).alias("avg_value"),
    ).orderBy("event_type", "day")


ORACLE: dict[str, str] = {
    "rollup_cascade_day": f"""
        SELECT event_type,
               strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               CAST(round(sum(CAST(value AS DECIMAL(30,10))), 2) AS DOUBLE) AS total_value,
               count(value)                                AS n_events,
               {_sql_fr('min(value)', 4)}                  AS min_value,
               {_sql_fr('max(value)', 4)}                  AS max_value,
               {_sql_fr('CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) / count(value)', 4)} AS avg_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
}

QUERIES = {
    "rollup_cascade_day": rollup_cascade_day,
}
