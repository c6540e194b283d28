"""Property-based tests (SURVEY §5.4): aggregation invariants on randomized
inputs via hypothesis. Small generated frames, big invariants — the
properties that must hold at ANY scale:

- multi-grain consistency: monthly totals equal the sum of daily totals;
- salting transparency: a salted two-stage aggregate equals the plain one;
- unit-conversion round-trip: F = C*9/5+32 inverts, nulls preserved.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ROW = st.tuples(
    st.sampled_from(["Stockton", "Fresno", "Reno"]),          # city
    st.integers(min_value=0, max_value=89),                   # day offset (3 months)
    st.one_of(st.none(), st.floats(-50, 50, allow_nan=False)),  # temperature C
    st.floats(0, 100, allow_nan=False),                       # rainfall mm
)

SETTINGS = settings(
    max_examples=8,                    # each example runs Spark jobs
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    import datetime as dt

    from pyspark.sql import functions as F

    data = [
        (
            city,
            (dt.date(2024, 1, 1) + dt.timedelta(days=off)).isoformat(),
            temp,
            rain,
        )
        for city, off, temp, rain in rows
    ]
    return spark.createDataFrame(
        data, "city string, date string, temperatureC double, rainfallMm double"
    ).withColumn("month", F.concat(F.substring("date", 1, 7), F.lit("-01")))


@given(rows=st.lists(ROW, min_size=1, max_size=40))
@SETTINGS
def test_monthly_totals_equal_sum_of_daily(spark, rows):
    from pyspark.sql import functions as F

    df = _df(spark, rows)
    daily = df.groupBy("city", "date", "month").agg(
        F.sum(F.col("rainfallMm").cast("decimal(30,10)")).alias("rain")
    )
    monthly_from_daily = {
        (r["city"], r["month"]): r["rain"]
        for r in daily.groupBy("city", "month").agg(F.sum("rain").alias("rain")).collect()
    }
    monthly_direct = {
        (r["city"], r["month"]): r["rain"]
        for r in df.groupBy("city", "month")
        .agg(F.sum(F.col("rainfallMm").cast("decimal(30,10)")).alias("rain"))
        .collect()
    }
    assert monthly_from_daily == monthly_direct


@given(rows=st.lists(ROW, min_size=1, max_size=40))
@SETTINGS
def test_salted_agg_equals_plain_agg(spark, rows):
    from pyspark.sql import functions as F

    df = _df(spark, rows)
    plain = {
        r["city"]: (r["n"], r["s"])
        for r in df.groupBy("city")
        .agg(F.count("*").alias("n"), F.sum(F.col("rainfallMm").cast("decimal(30,10)")).alias("s"))
        .collect()
    }
    salted = (
        df.withColumn("salt", F.pmod(F.hash("date"), F.lit(4)))
        .groupBy("city", "salt")
        .agg(F.count("*").alias("n"), F.sum(F.col("rainfallMm").cast("decimal(30,10)")).alias("s"))
        .groupBy("city")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    )
    got = {r["city"]: (r["n"], r["s"]) for r in salted.collect()}
    assert got == plain


@given(rows=st.lists(ROW, min_size=1, max_size=40))
@SETTINGS
def test_fahrenheit_conversion_roundtrips_and_preserves_nulls(spark, rows):
    from pyspark.sql import functions as F

    df = _df(spark, rows).withColumn(
        "temperatureF", F.col("temperatureC") * 9 / 5 + 32
    )
    back = df.withColumn("c_back", (F.col("temperatureF") - 32) * 5 / 9)
    for r in back.collect():
        if r["temperatureC"] is None:
            assert r["temperatureF"] is None and r["c_back"] is None
        else:
            assert abs(r["c_back"] - r["temperatureC"]) < 1e-9
