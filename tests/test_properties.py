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


# --- multimodal decoder round-trip properties (pure functions, no Spark) ---

PIXELS = st.integers(min_value=0, max_value=255)


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=2, max_value=16),
    h=st.integers(min_value=2, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_ppm_encode_decode_roundtrips_any_image(w, h, seed):
    """PPM decoder property: for ANY pixel grid, encode→decode is the
    identity on dimensions and bytes — the decoder is grounded over
    arbitrary images, not just the synthesis pattern."""
    import numpy as np

    from weather_database_system_spark.operators.multimodal import _decode_ppm

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    payload = f"P6\n{w} {h}\n255\n".encode() + img.tobytes()
    dw, dh, px = _decode_ppm(payload)
    assert (dw, dh) == (w, h)
    assert (px == img).all()


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=512),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    sr=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_encode_decode_roundtrips_any_pcm(n, seed, sr):
    """WAV decoder property: ANY int16 PCM signal survives the stdlib
    wave encode→decode cycle bit-for-bit with its sample rate."""
    import io
    import wave

    import numpy as np

    from weather_database_system_spark.operators.multimodal import _decode_wav

    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, size=n, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(sr)
        wv.writeframes(samples.tobytes())
    dsr, back = _decode_wav(buf.getvalue())
    assert dsr == sr
    assert (back == samples).all()
