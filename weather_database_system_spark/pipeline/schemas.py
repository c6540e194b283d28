"""Explicit StructType contracts for every pipeline zone (FIXTURES.md §A).

The reference keeps bronze/silver schemaless (Mongo docs shaped only by
constructor code — fetchStocktonWeather.js:177-193) and declares DDL only at
the warehouse (etlToClickHouse.js:24-56). We make every zone's contract
explicit: schema drift then fails at the zone boundary, not inside a query.

Types standardize on DOUBLE (reference uses Float32 at the warehouse,
etlToClickHouse.js:28-33) per the oracle-parity decision in SURVEY §7.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# A1 — raw Open-Meteo archive payload: struct-of-arrays, one row per fetch
# (fetchStocktonWeather.js:77-85; whole payload embedded per :177-187).
HOURLY_VARS = (
    "temperature_2m",
    "relative_humidity_2m",
    "precipitation",
    "wind_speed_10m",
    "wind_gusts_10m",
)

HOURLY_SCHEMA = StructType(
    [StructField("time", ArrayType(StringType()), False)]
    + [StructField(v, ArrayType(DoubleType()), False) for v in HOURLY_VARS]
)

BRONZE_SCHEMA = StructType(
    [
        StructField("fetched_at", TimestampType(), False),
        StructField("latitude", DoubleType(), False),
        StructField("longitude", DoubleType(), False),
        StructField("timezone", StringType(), False),
        StructField("hourly", HOURLY_SCHEMA, False),
    ]
)

# A2 — silver observation with nested location/metadata structs
# (fetchStocktonWeather.js:94-102,148-155,189-193).
LOCATION_SCHEMA = StructType(
    [StructField("city", StringType(), False), StructField("state", StringType(), False)]
)

METADATA_SCHEMA = StructType(
    [
        StructField("source_timestamp", StringType(), False),
        StructField("source_database", StringType(), False),
        StructField("data_quality", StringType(), False),
        StructField("api_request_id", StringType(), True),
        StructField("etl_batch_id", StringType(), False),
        StructField("author", StringType(), False),
    ]
)

SILVER_SCHEMA = StructType(
    [
        StructField("timestamp", StringType(), False),
        StructField("temperatureC", DoubleType(), True),
        StructField("temperatureF", DoubleType(), True),
        StructField("humidityPercent", DoubleType(), True),
        StructField("rainfallMm", DoubleType(), False),
        StructField("windSpeedMps", DoubleType(), True),
        StructField("windGustMps", DoubleType(), False),
        StructField("location", LOCATION_SCHEMA, False),
        StructField("metadata", METADATA_SCHEMA, False),
    ]
)

# A2b — station-keyed silver (r7 verdict #6): the multi-station
# generalization of SILVER_SCHEMA. The reference models ONE location
# (LOCATION_SCHEMA is a constant (city, state) — fetchStocktonWeather.js:
# 189-193), so a fleet of stations needs provenance the single-location
# contract cannot carry: station_id is a TOP-LEVEL column (the sink's
# partition key — a nested struct field can't partition a write), and
# every date-grain rollup downstream keys on (station_id, date) so
# observations from different stations never collapse into one group.
SILVER_STATION_SCHEMA = StructType(
    [
        StructField("timestamp", StringType(), False),
        StructField("temperatureC", DoubleType(), True),
        StructField("temperatureF", DoubleType(), True),
        StructField("humidityPercent", DoubleType(), True),
        StructField("rainfallMm", DoubleType(), False),
        StructField("windSpeedMps", DoubleType(), True),
        StructField("windGustMps", DoubleType(), False),
        StructField("station_id", StringType(), False),
        StructField("latitude", DoubleType(), False),
        StructField("longitude", DoubleType(), False),
        StructField("metadata", METADATA_SCHEMA, False),
    ]
)

# A3 — gold daily_weather, flat 19 + 1 partition column
# (etlToClickHouse.js:24-56; date from timestamp.slice(0,10) at :100).
DAILY_COLUMNS = (
    "date",
    "temperatureC",
    "temperatureF",
    "humidityPercent",
    "rainfallMm",
    "windSpeedMps",
    "windGustMps",
    "city",
    "state",
    "source_timestamp",
    "source_database",
    "data_quality",
    "api_request_id",
    "etl_batch_id",
    "author",
    "warehouse_load_time",
    "rows_loaded",
    "sync_interval_min",
    "load_mode",
)

# A4 — gold monthly_agg (etlToClickHouse.js:139-154 DDL, :157-173 values).
MONTHLY_COLUMNS = (
    "city",
    "month",
    "avg_temp_c",
    "total_rain_mm",
    "warehouse_load_time",
    "rows_loaded",
    "load_mode",
    "sync_interval_min",
)

MONTHLY_SCHEMA = StructType(
    [
        StructField("city", StringType(), False),
        StructField("month", StringType(), False),
        StructField("avg_temp_c", DoubleType(), True),
        StructField("total_rain_mm", DoubleType(), True),
        StructField("warehouse_load_time", TimestampType(), False),
        StructField("rows_loaded", IntegerType(), False),
        StructField("load_mode", StringType(), False),
        StructField("sync_interval_min", IntegerType(), False),
    ]
)
