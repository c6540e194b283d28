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

# Dimension tables small enough to broadcast at any realistic scale factor
# (region=5 rows, nation=25 at every SF; supplier/part/customer grow with SF
# but stay dimension-sized relative to the fact tables).
BROADCAST_DIMS = ("region", "nation", "supplier", "part", "customer")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    # The driver supplies its own SparkSession; pin the session timezone so
    # date_trunc/date_format agree with the (timezone-naive) DuckDB oracle
    # even if the host JVM default ever isn't UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    rejects outright. Read it as raw nanos (legacy conf) and convert with
    integer division — NOT float division, which would lose precision on
    ~1.7e18 nano values — truncating toward zero exactly like the DuckDB
    oracle's ns→us narrowing for positive epochs."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql sees the same names
    the DuckDB oracle pre-registers."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
