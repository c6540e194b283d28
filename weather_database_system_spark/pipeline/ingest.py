"""Ingestion: HTTP source → bronze (raw payload) → silver (enriched rows).

Reference parity (SURVEY §2A ops #1-7):

- op #1  HTTP REST source scan   fetchStocktonWeather.js:29-71
- op #2  struct-of-arrays pivot  fetchStocktonWeather.js:77-105
- op #3  per-field null policy   fetchStocktonWeather.js:73-75,88-92
- op #4  unit conversion         fetchStocktonWeather.js:97
- op #5  enrichment structs      fetchStocktonWeather.js:189-193
- op #6  lineage envelope        fetchStocktonWeather.js:148-155
- op #7  zone append sink        fetchStocktonWeather.js:107-141

Spark-first shape: the pivot is ``arrays_zip + explode`` (not the reference's
index-aligned JS loop), fill policy is ``coalesce``/null-propagating
arithmetic, and the enrichment is two ``struct`` columns — all inside
whole-stage codegen. The HTTP fetch itself is driver-side (one small payload
per fetch); at scale, many fetch windows fan out via a DataFrame of request
params + ``mapInPandas`` so executors fetch concurrently.
"""

from __future__ import annotations

import datetime as dt
from typing import Any

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from weather_database_system_spark.pipeline.schemas import (
    BRONZE_SCHEMA,
    HOURLY_VARS,
    SILVER_SCHEMA,
)

OPEN_METEO_URL = "https://archive-api.open-meteo.com/v1/archive"

# op #3 fill policy (fetchStocktonWeather.js:88-92): null default;
# 0.0 for precipitation and gusts.
ZERO_FILLED = {"precipitation": 0.0, "wind_gusts_10m": 0.0}

FIELD_RENAMES = {
    "temperature_2m": "temperatureC",
    "relative_humidity_2m": "humidityPercent",
    "precipitation": "rainfallMm",
    "wind_speed_10m": "windSpeedMps",
    "wind_gusts_10m": "windGustMps",
}


def fetch_hourly_history(
    latitude: float,
    longitude: float,
    start_date: str,
    end_date: str,
    timezone: str = "America/Los_Angeles",
    url: str = OPEN_METEO_URL,
) -> dict[str, Any]:
    """op #1: GET the Open-Meteo archive endpoint (fetchStocktonWeather.js:29-71).

    Driver-side by design — one request returns one bounded payload. Raises
    on non-2xx like the reference (:64-66). Kept import-gated: the engine
    works fully offline (tests use the deterministic fixture payloads)."""
    import json
    import urllib.parse
    import urllib.request

    params = urllib.parse.urlencode(
        {
            "latitude": latitude,
            "longitude": longitude,
            "start_date": start_date,
            "end_date": end_date,
            "hourly": ",".join(HOURLY_VARS),
            "wind_speed_unit": "ms",
            "timezone": timezone,
        }
    )
    with urllib.request.urlopen(f"{url}?{params}", timeout=60) as resp:
        if not 200 <= resp.status < 300:
            raise RuntimeError(f"Open-Meteo API error: HTTP {resp.status}")
        return json.loads(resp.read().decode("utf-8"))


def bronze_from_payload(
    spark: SparkSession, payload: dict[str, Any], fetched_at: dt.datetime
) -> DataFrame:
    """Payload dict → one bronze row embedding the entire API response
    (fetchStocktonWeather.js:177-187 stores `payload: data` verbatim)."""
    hourly = payload["hourly"]
    row = Row(
        fetched_at=fetched_at,
        latitude=float(payload["latitude"]),
        longitude=float(payload["longitude"]),
        timezone=payload.get("timezone", "UTC"),
        hourly=Row(
            time=list(hourly["time"]),
            **{v: [None if x is None else float(x) for x in hourly[v]] for v in HOURLY_VARS},
        ),
    )
    return spark.createDataFrame([row], schema=BRONZE_SCHEMA)


def bronze_to_observations(bronze: DataFrame) -> DataFrame:
    """ops #2-4: pivot the parallel hourly arrays into per-hour rows.

    ``arrays_zip`` aligns the six arrays positionally (replacing the manual
    index loop at fetchStocktonWeather.js:87-104), ``explode`` emits one row
    per hour; then the fill policy and the null-propagating °F conversion."""
    zipped = bronze.select(
        F.explode(F.arrays_zip("hourly.time", *[f"hourly.{v}" for v in HOURLY_VARS])).alias("h")
    )
    cols = [F.col("h.time").alias("timestamp")]
    for v in HOURLY_VARS:
        c = F.col(f"h.{v}")
        if v in ZERO_FILLED:
            c = F.coalesce(c, F.lit(ZERO_FILLED[v]))
        cols.append(c.alias(FIELD_RENAMES[v]))
    return zipped.select(*cols).withColumn(
        # op #4 (fetchStocktonWeather.js:97): null iff temperatureC null.
        "temperatureF",
        F.col("temperatureC") * 9 / 5 + 32,
    )


def enrich(
    obs: DataFrame,
    city: str,
    state: str,
    *,
    source_timestamp: str,
    etl_batch_id: str,
    api_request_id: str | None = None,
    author: str = "weather_database_system_spark",
    source_database: str = "open-meteo.com/archive",
    data_quality: str = "as-provided",
) -> DataFrame:
    """ops #5-6: attach the constant location struct and the shared lineage
    metadata envelope to every observation (fetchStocktonWeather.js:148-155,
    189-193). Column order is pinned to the silver contract."""
    return obs.select(
        "timestamp",
        "temperatureC",
        "temperatureF",
        "humidityPercent",
        "rainfallMm",
        "windSpeedMps",
        "windGustMps",
        F.struct(
            F.lit(city).alias("city"), F.lit(state).alias("state")
        ).alias("location"),
        F.struct(
            F.lit(source_timestamp).alias("source_timestamp"),
            F.lit(source_database).alias("source_database"),
            F.lit(data_quality).alias("data_quality"),
            F.lit(api_request_id).cast("string").alias("api_request_id"),
            F.lit(etl_batch_id).alias("etl_batch_id"),
            F.lit(author).alias("author"),
        ).alias("metadata"),
    )


def write_zone(df: DataFrame, path: str, mode: str = "append") -> int:
    """op #7: append to a zone and report the row count written (the
    reference reports insertedCount — fetchStocktonWeather.js:130-138).
    The count costs one extra job; callers that don't need it pass through
    ``df.write`` directly."""
    n = df.count()
    df.write.mode(mode).parquet(path)
    return n


def ingest_payload(
    spark: SparkSession,
    payload: dict[str, Any],
    *,
    city: str,
    state: str,
    bronze_path: str | None = None,
    silver_path: str | None = None,
    fetched_at: dt.datetime | None = None,
    api_request_id: str | None = None,
    author: str = "weather_database_system_spark",
) -> DataFrame:
    """Full ingestion of one fetch: payload → bronze append → pivot →
    enrich → silver append; returns the silver DataFrame (the reference's
    main() at fetchStocktonWeather.js:143-201)."""
    fetched_at = fetched_at or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    bronze = bronze_from_payload(spark, payload, fetched_at)
    if bronze_path:
        write_zone(bronze, bronze_path)
    silver = enrich(
        bronze_to_observations(bronze),
        city,
        state,
        source_timestamp=fetched_at.isoformat(timespec="milliseconds") + "Z",
        # fetched_at is naive-UTC by convention; pin tzinfo before
        # .timestamp() so the batch id doesn't shift on non-UTC hosts.
        etl_batch_id=f"etl-{int(fetched_at.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)}",
        api_request_id=api_request_id,
        author=author,
    )
    if silver_path:
        write_zone(silver, silver_path)
    return silver
