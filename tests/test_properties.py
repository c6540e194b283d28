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


# ---------------------------------------------------------------------------
# Round-5 continuation operators: distribution-soundness properties on
# generated data (degenerate ties, bucket boundaries, single-element inputs)
# ---------------------------------------------------------------------------

_POINT = st.tuples(
    st.integers(min_value=1, max_value=9999),   # price cents (coarse → ties)
    st.integers(min_value=0, max_value=60),     # day offset (coarse → ties)
)


@given(points=st.lists(_POINT, min_size=1, max_size=60))
@SETTINGS
def test_skyline_two_phase_equals_brute_force_on_any_points(spark, tmp_path_factory, points):
    """Distributivity property: the bucketed two-phase skyline equals the
    O(n²) non-dominated set for ANY point cloud — including heavy price and
    date ties, where the strict-dominance edge cases live."""
    import datetime as dt

    from weather_database_system_spark.operators.relational import skyline_pareto

    tmp = tmp_path_factory.mktemp("sky")
    rows = [
        (
            i,
            i,
            "O",
            cents / 100.0,
            dt.datetime(2024, 1, 1) + dt.timedelta(days=off),
            "1-URGENT",
        )
        for i, (cents, off) in enumerate(points)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp / "orders.parquet"))

    got = {r.o_orderkey for r in skyline_pareto(spark, str(tmp)).collect()}
    want = {
        k
        for k, (p, d) in enumerate(points)
        if not any(
            p2 <= p and d2 <= d and (p2 < p or d2 < d) for p2, d2 in points
        )
    }
    assert got == want


@given(sizes=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=50))
@SETTINGS
def test_distributed_prefix_sum_equals_cumsum_on_any_sizes(spark, tmp_path_factory, sizes):
    """The two-level prefix sum must equal the plain Python cumulative sum
    over the (n_tokens, doc_id) order for ANY length distribution —
    including all-equal lengths (every tie crosses range-partition
    boundaries) and empty docs."""
    from weather_database_system_spark.operators.trainprep import (
        curriculum_pack_epochs,
    )
    from weather_database_system_spark.session import release_persisted

    tmp = tmp_path_factory.mktemp("cur")
    rows = [
        (i, " ".join(f"w{j}" for j in range(n)), "en", "web", 0)
        for i, n in enumerate(sizes)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    got = {r.doc_id: r.cum_before for r in curriculum_pack_epochs(spark, str(tmp)).collect()}
    release_persisted()
    # split('') yields [''] → 1 token for an empty text; mirror that
    n_of = {i: max(n, 1) for i, n in enumerate(sizes)}
    order = sorted(n_of, key=lambda i: (n_of[i], i))
    cum, want = 0, {}
    for i in order:
        want[i] = cum
        cum += n_of[i]
    assert got == want


@given(
    offsets=st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=1_200_000_000),
            st.sampled_from([0, 300_000_000, 600_000_000, 900_000_000]),
        ),
        min_size=2,
        max_size=25,
        unique=True,
    )
)
@SETTINGS
def test_proximity_bucketing_equals_brute_force_at_boundaries(spark, tmp_path_factory, offsets):
    """Band-join property: the same∪adjacent bucket plan finds EXACTLY the
    |Δt| ≤ window pairs for ANY timestamp set — the sampled exact multiples
    of the window width sit right on the bucket-boundary edge cases."""
    import datetime as dt

    from weather_database_system_spark.operators.temporal import (
        PROX_WINDOW_US,
        time_proximity_join,
    )

    tmp = tmp_path_factory.mktemp("prox")
    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + dt.timedelta(microseconds=us),
            i % 3,
            ["click", "view"][i % 2],
            1.0,
            "{}",
        )
        for i, us in enumerate(offsets)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp / "events.parquet"))

    got = {(r.type_x, r.type_y): r.n_pairs for r in time_proximity_join(spark, str(tmp)).collect()}
    from collections import Counter

    want = Counter()
    for i in range(len(offsets)):
        for j in range(i + 1, len(offsets)):
            if abs(offsets[i] - offsets[j]) <= PROX_WINDOW_US:
                ta, tb = ["click", "view"][i % 2], ["click", "view"][j % 2]
                want[tuple(sorted((ta, tb)))] += 1
    assert got == dict(want)


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["click", "view", "purchase"]),
            st.integers(min_value=0, max_value=29),   # January day offset
            st.integers(min_value=0, max_value=23),   # hour
            st.one_of(st.none(), st.floats(0, 100, allow_nan=False)),
        ),
        min_size=2,
        max_size=40,
    )
)
@SETTINGS
def test_null_sensitive_operators_keep_oracle_parity(spark, tmp_path_factory, rows):
    """Cross-engine property over the operators whose aggregates mix
    count(*) with null-skipping sums: for ANY event set INCLUDING NULL
    values, the Spark plan must still match its DuckDB oracle — pinning the
    count(*)-vs-count(value) merge fix and the drop-nulls-before-moments
    convention of the OLS/changepoint/seasonal family, which real test
    data (no NULLs) cannot exercise."""
    import datetime as dt

    import duckdb

    import __spark_entry__ as em
    from tests.oracle import compare
    from weather_database_system_spark.operators.scale import (
        anomaly_mad_zscore,
        rollup_merge_incremental,
    )
    from weather_database_system_spark.operators.temporal import (
        changepoint_mean_shift,
        linear_regression_trend,
        seasonal_hourly_profile,
    )

    tmp = tmp_path_factory.mktemp("nulls")
    data = [
        (i, dt.datetime(2024, 1, 1 + d, h, 30), i % 7, et, v, "{}")
        for i, (et, d, h, v) in enumerate(rows)
    ]
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp / "events.parquet"))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp}/events.parquet/*.parquet')"
    )
    oracles = em.oracle_sql()
    for name, fn in (
        ("rollup_merge_incremental", rollup_merge_incremental),
        ("linear_regression_trend", linear_regression_trend),
        ("changepoint_mean_shift", changepoint_mean_shift),
        ("seasonal_hourly_profile", seasonal_hourly_profile),
        ("anomaly_mad_zscore", anomaly_mad_zscore),
    ):
        compare(fn(spark, str(tmp)), con, oracles[name], name=f"{name}_nulls")


def test_single_observation_series_excluded_from_ols(spark, tmp_path_factory):
    """A 1-row series with a real microsecond-grade (non-dyadic x) timestamp
    must be excluded by the degenerate-series guard. var_x != 0 alone is not
    enough: exact cancellation of the DECIMAL(30,10)-rounded moments fails
    for non-dyadic x, leaving sxx - sx² at a ~1e-18 residual that evades the
    filter and emits an enormous garbage slope (r5 ADVICE). The explicit
    n >= 2 guard — in both engines — is what this pins; the NULL-property
    test cannot, because its :30-minute timestamps make x exactly
    representable."""
    import datetime as dt

    import duckdb

    import __spark_entry__ as em
    from tests.oracle import compare
    from weather_database_system_spark.operators.temporal import (
        linear_regression_trend,
    )

    tmp = tmp_path_factory.mktemp("ols1")
    data = [
        # the hazard: a singleton series at a microsecond-grade timestamp
        (0, dt.datetime(2024, 1, 3, 7, 13, 29, 123457), 1, "solo", 42.0, "{}"),
        # a healthy series so the result set is non-empty
        (1, dt.datetime(2024, 1, 1, 0, 0, 1, 111111), 2, "trend", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 6, 0, 2, 222222), 2, "trend", 2.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 12, 0, 3, 333333), 2, "trend", 4.0, "{}"),
    ]
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp / "events.parquet"))

    got = linear_regression_trend(spark, str(tmp)).collect()
    assert [r.event_type for r in got] == ["trend"], got

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp}/events.parquet/*.parquet')"
    )
    compare(
        linear_regression_trend(spark, str(tmp)),
        con,
        em.oracle_sql()["linear_regression_trend"],
        name="linear_regression_trend_singleton",
    )


@given(
    docs=st.lists(
        st.lists(st.sampled_from("a b c d e".split()), min_size=0, max_size=8),
        min_size=1,
        max_size=14,
    ),
    cap=st.integers(min_value=2, max_value=6),
)
@SETTINGS
def test_capped_prefilters_equal_naive_collect_then_filter(spark, docs, cap):
    """The pre-filter-before-expansion rewrites (_capped_postings,
    _cap_band_buckets) must emit EXACTLY the same sets as the naive
    collect-everything-then-size-filter forms they replaced, for ANY tiny
    corpus and cap — the memory-bounding optimization is not allowed to
    change a single posting or bucket."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.dedup import (
        _cap_band_buckets,
        _capped_postings,
    )

    rows = [(i, " ".join(toks) if toks else "") for i, toks in enumerate(docs)]
    # shingle-ish stream: one row per (doc, token) as the 's' unit
    sh = (
        spark.createDataFrame(rows, "doc_id long, text string")
        .select("doc_id", F.explode(F.split("text", " ")).alias("s"))
        .filter(F.col("s") != "")
    )
    got = {
        (r["s"], tuple(sorted(r["ds"])))
        for r in _capped_postings(sh, cap).collect()
    }
    naive = {
        (r["s"], tuple(sorted(r["ds"])))
        for r in sh.groupBy("s")
        .agg(F.collect_list("doc_id").alias("ds"))
        .filter((F.size("ds") > 1) & (F.size("ds") <= cap))
        .collect()
    }
    assert got == naive

    bands = sh.select(
        "doc_id", (F.col("doc_id") % 2).alias("band"), F.col("s").alias("bsig")
    )
    got_b = {tuple(r) for r in _cap_band_buckets(bands, cap).collect()}
    sizes = bands.groupBy("band", "bsig").count()
    naive_b = {
        tuple(r)
        for r in bands.join(
            sizes.filter(F.col("count") <= cap).select("band", "bsig"),
            ["band", "bsig"],
        ).collect()
    }
    assert got_b == naive_b


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=2, max_value=16),
    h=st.integers(min_value=5, max_value=12),   # ≥5 rows → every filter type used
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_encode_decode_roundtrips_any_image(w, h, seed):
    """PNG codec property: for ANY pixel grid, encode (scanline filters
    cycling through ALL five spec types) → inflate+defilter is the
    identity — the decoder's Sub/Up/Average/Paeth reversal is grounded
    over arbitrary images, not just the synthesis pattern."""
    import struct
    import zlib

    import numpy as np

    from weather_database_system_spark.operators.multimodal import (
        _decode_png,
        _png_chunk,
        _png_filter_scanlines,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    raw = _png_filter_scanlines(img, [r % 5 for r in range(h)])
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    dw, dh, px = _decode_png(payload)
    assert (dw, dh) == (w, h)
    assert (px == img).all()


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=2, max_value=20),
    h=st.integers(min_value=2, max_value=17),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_encode_decode_roundtrips_any_image_at_q100(w, h, seed):
    """JPEG codec property: at quality 100 (all-ones-ish quant tables) the
    only loss is float-DCT + rounding, so for ANY pixel grid — including
    non-multiple-of-8 dims exercising the MCU edge padding — the decoder
    must reproduce every pixel within ±3. Grounds the whole baseline
    pipeline (DCT, zigzag, magnitude coding, Huffman tables, byte
    stuffing, entropy decode, IDCT, color transform) over arbitrary
    images, not just the synthesis pattern."""
    import numpy as np

    from weather_database_system_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    payload = _encode_jpeg(img, quality=100)
    dw, dh, out = _decode_jpeg(payload)
    assert (dw, dh) == (w, h)
    err = np.abs(out.astype(np.int64) - img.astype(np.int64))
    assert err.max() <= 3, f"max per-pixel error {err.max()} at q100"


DOC_TOKENS = st.lists(
    st.sampled_from("alpha beta gamma delta eps zeta eta theta".split()),
    min_size=5,
    max_size=14,
)


@given(docs=st.lists(DOC_TOKENS, min_size=2, max_size=8))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ppjoin_recall_complete_on_random_corpora(spark, tmp_path_factory, docs):
    """PPJoin's zero-false-negative property on ARBITRARY corpora, not
    just the synthetic testdata: for any document set, the prefix-
    filtered engine pairs must equal the brute-force exact-Jaccard ≥ 0.5
    pair set computed in plain Python over the same distinct trigram
    shingles. The pigeonhole argument says this can't fail; this pins
    the IMPLEMENTATION (global ordering, integer prefix length,
    candidate verification) against off-by-one regressions the fixed
    corpus might not catch — tiny docs (5-14 tokens, 8-word vocab)
    maximize boundary cases: identical docs, 2-3 shingle sets, ties in
    the frequency order."""
    from weather_database_system_spark.operators.dedup import (
        jaccard_prefix_pairs,
    )

    tmp = tmp_path_factory.mktemp("ppjoin")
    rows = [(i, " ".join(toks), "en", "src") for i, toks in enumerate(docs)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    def shingles(toks):
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    expected = set()
    sets = [shingles(t) for t in docs]
    for a in range(len(sets)):
        for b in range(a + 1, len(sets)):
            inter = len(sets[a] & sets[b])
            if 3 * inter >= len(sets[a]) + len(sets[b]) and inter > 0:
                expected.add((a, b))

    got = {
        (r.doc_a, r.doc_b)
        for r in jaccard_prefix_pairs(spark, str(tmp)).collect()
    }
    assert got == expected, (sorted(got ^ expected)[:5], docs)


@SETTINGS
@given(
    keys=st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=60),
    hot_mask=st.integers(min_value=0, max_value=2**13 - 1),
)
def test_salted_join_transparency_any_keys_any_hot_set(spark, keys, hot_mask):
    """Join-side salting transparency (the join twin of the salted-agg
    property above): for ANY fact key multiset and ANY hot-key subset —
    including keys the fact doesn't contain, the empty set, and every
    key — salted_join(fact, dim) is row-identical to the plain inner
    join. The detector can therefore never affect correctness, only
    reducer balance (the property that makes CMS-sketched detection
    safe to deploy)."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.scale import salted_join

    fact = spark.createDataFrame(
        [(k, i) for i, k in enumerate(keys)], "k int, row_id int"
    )
    dim = spark.createDataFrame(
        [(k, k * 10) for k in range(13)], "k int, attr int"
    )
    hot = spark.createDataFrame(
        [(k,) for k in range(13) if hot_mask & (1 << k)] or [(-1,)],
        "k int",
    )
    plain = sorted(
        (r.k, r.row_id, r.attr) for r in fact.join(dim, "k").collect()
    )
    salted = sorted(
        (r.k, r.row_id, r.attr)
        for r in salted_join(fact, dim, "k", hot, F.xxhash64("row_id")).collect()
    )
    assert salted == plain


@settings(max_examples=8, deadline=None)
@given(
    data=st.data(),
    texts=st.lists(
        st.text(alphabet="ab ", min_size=3, max_size=40), min_size=1, max_size=12
    ),
)
def test_trigram_search_equals_python_substring_scan(spark, data, texts):
    """Trigram-index search must agree with a pure-Python substring scan
    for ANY corpus and ANY needle — including needles absent from every
    doc, needles with repeated trigrams, and overlap-heavy 'aaa' texts
    (n_occurrences counts non-overlapping replace semantics in both
    implementations)."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.textan import _trigram_search

    # needle: either a substring of a real text (guaranteed hits) or a
    # random string (usually a miss) — both regimes matter
    if data.draw(st.booleans()) and any(len(t) >= 3 for t in texts):
        src = data.draw(
            st.sampled_from([t for t in texts if len(t) >= 3])
        )
        n = data.draw(st.integers(3, min(15, len(src))))
        i = data.draw(st.integers(0, len(src) - n))
        needle = src[i : i + n]
    else:
        needle = data.draw(st.text(alphabet="ab ", min_size=3, max_size=8))

    docs = spark.createDataFrame(
        [(i, "xx", t) for i, t in enumerate(texts)],
        "doc_id long, lang string, text string",
    )
    got = {
        r.doc_id: (r.first_pos, r.n_occurrences)
        for r in _trigram_search(docs, needle).collect()
    }
    want = {
        i: (t.index(needle) + 1, (len(t) - len(t.replace(needle, ""))) // len(needle))
        for i, t in enumerate(texts)
        if needle in t
    }
    assert got == want


# fingerprint(df, cols) mergeability pin (r13 VERDICT task #2): rows of
# mixed type — ints, strings (incl. '|'-bearing and empty), nullable
# decimals, timestamps — sharded arbitrarily.
FP_ROW = st.tuples(
    st.integers(-(2**40), 2**40),                               # id (long)
    st.sampled_from(["", "a", "a|b", "spark", "été"]),  # name
    st.one_of(st.none(), st.decimals(-1000, 1000, places=2)),   # amount
    st.integers(0, 10**9),                                      # epoch seconds
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(FP_ROW, min_size=0, max_size=30),
    cuts=st.lists(st.integers(0, 30), min_size=0, max_size=3),
    buckets=st.sampled_from([1, 4, 32]),
)
def test_fingerprint_shard_merge_equals_whole_table(spark, rows, cuts, buckets):
    """merge_fingerprints(fingerprint(shard_i)) must equal
    fingerprint(whole table) row-for-row, for ANY frame content (mixed
    types, NULL decimals, separator-bearing strings, duplicate rows),
    ANY sharding (including empty shards), and ANY bucket count — the
    invariant that lets 100 TB replicas digest independently and
    compare by shipping <= `buckets` rows. Row-order invariance rides
    along: the shards ARE a permutation of the table."""
    import datetime as dt

    from weather_database_system_spark.operators.scale import (
        fingerprint,
        merge_fingerprints,
    )

    def mk(rs):
        return spark.createDataFrame(
            [
                (i, s, None if d is None else d, dt.datetime(2020, 1, 1)
                 + dt.timedelta(seconds=e, microseconds=e % 7))
                for (i, s, d, e) in rs
            ],
            "id long, name string, amount decimal(10,2), ts timestamp",
        )

    whole = {
        (r.bucket, r.n_rows, r.checksum)
        for r in fingerprint(mk(rows), buckets=buckets).collect()
    }
    bounds = sorted({c for c in cuts if c <= len(rows)}) + [len(rows)]
    shards, lo = [], 0
    for hi in bounds:
        shards.append(mk(rows[lo:hi]))
        lo = hi
    merged = {
        (r.bucket, r.n_rows, r.checksum)
        for r in merge_fingerprints(
            *[fingerprint(s, buckets=buckets) for s in shards]
        ).collect()
    }
    assert merged == whole


def test_fingerprint_contract_rejections(spark):
    """The canonicalization contract is self-enforcing: raw floats and
    complex types are rejected with instructions, as are unknown
    columns; NULL cells hash to the sentinel rather than vanishing
    (concat_ws would otherwise alias (NULL,'x') with ('x',NULL))."""
    import pytest

    from weather_database_system_spark.operators.scale import fingerprint

    df = spark.createDataFrame(
        [(1.5, [1], "x")], "d double, arr array<int>, s string"
    )
    with pytest.raises(ValueError, match="explicit-scale decimal"):
        fingerprint(df, ["d"])
    with pytest.raises(ValueError, match="unsupported type"):
        fingerprint(df, ["arr"])
    with pytest.raises(ValueError, match="not in frame"):
        fingerprint(df, ["nope"])
    # NULL vs swapped-null frames must NOT collide
    a = spark.createDataFrame([(None, "x")], "u string, v string")
    b = spark.createDataFrame([("x", None)], "u string, v string")
    fa = {(r.bucket, r.checksum) for r in fingerprint(a).collect()}
    fb = {(r.bucket, r.checksum) for r in fingerprint(b).collect()}
    assert fa != fb


def test_fingerprint_config_guards(spark):
    """ADVICE r14 #5 + VERDICT r14 task #5, self-enforcing: (1) a
    duplicated column list is rejected (it digests a DIFFERENT virtual
    table — two replicas with differently-duplicated lists would report
    false divergence); (2) merge_fingerprints refuses digests produced
    under different configurations (bucket count / column list / null
    sentinel — carried as column metadata, surviving parquet
    round-trips) and digests that never came from fingerprint();
    (3) same-config digests still merge, including after a parquet
    round-trip."""
    import pytest

    from weather_database_system_spark.operators.scale import (
        fingerprint,
        merge_fingerprints,
    )

    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, s string")
    with pytest.raises(ValueError, match="duplicate columns"):
        fingerprint(df, ["id", "id"])

    f8, f16 = fingerprint(df, buckets=8), fingerprint(df, buckets=16)
    with pytest.raises(ValueError, match="different configurations"):
        merge_fingerprints(f8, f16)
    with pytest.raises(ValueError, match="different configurations"):
        merge_fingerprints(fingerprint(df, ["id"]), fingerprint(df, ["s"]))
    handmade = spark.createDataFrame(
        [(0, 1, 1)], "bucket bigint, n_rows long, checksum long"
    )
    with pytest.raises(ValueError, match="no fingerprint config"):
        merge_fingerprints(f8, handmade)

    merged = merge_fingerprints(f8, fingerprint(df, buckets=8))
    assert merged.count() <= 8
    # the config survives a parquet round-trip, so stored shard digests
    # from different runs remain mergeable (and still guarded)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        f8.write.mode("overwrite").parquet(f"{td}/d8")
        back = spark.read.parquet(f"{td}/d8")
        assert merge_fingerprints(back, f8).count() <= 8
        with pytest.raises(ValueError, match="different configurations"):
            merge_fingerprints(back, f16)
