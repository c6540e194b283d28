"""Temporal join operators Spark lacks as built-ins: as-of join and range
join (SURVEY §2B "custom operators"; the reference has no joins at all).

Both are implemented as compositions of existing DataFrame ops — the
preferred tier (a) of the custom-operator ladder — NOT with per-row Python:

- as-of join: union both sides tagged, one window pass per key carries the
  most recent build-side row forward (`last(..., ignorenulls=True)` over an
  unbounded-preceding frame). ONE shuffle on the join key, no range
  explosion, no driver logic — the classic scalable as-of shape. A
  sort-merge "MergeAsof" would touch the same data; this reuses Spark's
  existing window machinery and AQE handles key skew.
- range join: probe-side values against a small interval dimension via a
  broadcast inequality join — no shuffle at all on the probe side; Spark
  turns it into BroadcastNestedLoopJoin, which is the right plan when one
  side is tiny. (Large×large interval joins would instead bucket both sides
  by coarse range then equi-join the bucket — see the docstring on
  ``range_band_join``.)

DuckDB's native ASOF JOIN is the oracle for the as-of semantics — an
independent implementation agreeing bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from weather_database_system_spark.operators.relational import (
    DEC,
    _avg4,
    _fr,
    _sql_avg4,
    _sql_fr,
)
from weather_database_system_spark.sources.star import load_table

_TS_US = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, applied: attribute each click to the user's most recent
    view at-or-before it (the ad-attribution query). Backward as-of on
    (user_id, ts); clicks with no prior view keep null attribution."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    views = ev.filter(F.col("event_type") == "view")

    tagged = clicks.select(
        F.lit(1).alias("is_click"), "user_id", "ts", "event_id"
    ).unionByName(
        views.select(F.lit(0).alias("is_click"), "user_id", "ts", "event_id")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_click").asc(), F.col("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    last_view_ts = F.last(
        F.when(F.col("is_click") == 0, F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        tagged.withColumn("last_view_ts", last_view_ts)
        .filter(F.col("is_click") == 1)
        .select(
            F.col("event_id").alias("click_event_id"),
            "user_id",
            F.date_format("ts", _TS_US).alias("click_ts"),
            F.date_format("last_view_ts", _TS_US).alias("view_ts"),
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_view_ts"))).alias(
                "gap_us"
            ),
        )
        .orderBy("click_event_id")
    )


ASOF_TOLERANCE_MIN = 30  # max staleness of an attributed view (minutes)


def asof_attribution_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH a staleness tolerance — the production attribution
    semantics (kdb's ``wj``/TimescaleDB tolerance arg): a click attributes
    to the most recent prior view only if that view is at most
    ASOF_TOLERANCE_MIN old; older matches null out exactly like no-match
    (an unbounded as-of credits a view from last month — never the
    product-analytics contract). Same single-shuffle union+window shape as
    asof_attribution; the tolerance is one additional codegen'd predicate
    over the already-computed gap, so the scale story is unchanged. The
    DuckDB oracle stays the independent native ASOF JOIN implementation
    with the same post-predicate."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    views = ev.filter(F.col("event_type") == "view")

    tagged = clicks.select(
        F.lit(1).alias("is_click"), "user_id", "ts", "event_id"
    ).unionByName(
        views.select(F.lit(0).alias("is_click"), "user_id", "ts", "event_id")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_click").asc(), F.col("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    last_view_ts = F.last(
        F.when(F.col("is_click") == 0, F.col("ts")), ignorenulls=True
    ).over(w)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_view_ts"))
    fresh = gap_us <= ASOF_TOLERANCE_MIN * 60 * 1_000_000
    return (
        tagged.withColumn("last_view_ts", last_view_ts)
        .filter(F.col("is_click") == 1)
        .select(
            F.col("event_id").alias("click_event_id"),
            "user_id",
            F.date_format("ts", _TS_US).alias("click_ts"),
            F.when(fresh, F.date_format("last_view_ts", _TS_US)).alias("view_ts"),
            F.when(fresh, gap_us).alias("gap_us"),
            F.coalesce(fresh, F.lit(False)).cast("int").alias("attributed"),
        )
        .orderBy("click_event_id")
    )


BANDS = (
    # (band, lo, hi) — price bands; hi exclusive
    ("low", 0.0, 20_000.0),
    ("mid", 20_000.0, 60_000.0),
    ("high", 60_000.0, 200_000.0),
)


def range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-containment) join: orders matched to the price band
    containing o_totalprice, then aggregated per band.

    The band dimension is broadcast, so the probe side never shuffles —
    at 100 TB this stays a map-only pass. If the interval side were large,
    the scalable rewrite assigns both sides a coarse bucket
    (floor(price/width)) and equi-joins on bucket before the range filter."""
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(list(BANDS), "band string, lo double, hi double")
    return (
        orders.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band", "lo")
        .agg(
            F.count("*").alias("n_orders"),
            _avg4(F.col("o_totalprice"), 2).alias("avg_price"),
        )
        .orderBy("lo")
        .select("band", "n_orders", "avg_price")
    )


def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (the TimescaleDB `time_weight` shape): each
    observation's value weighted by how long it held — the duration until
    the next observation of the same series (lead over (event_type; ts)).
    Irregular sampling makes the plain AVG wrong for gauge metrics; this is
    the right aggregate, and at 100 TB it is still ONE window shuffle on
    the series key plus a bounded-cardinality agg.

    Determinism: durations are exact integer microseconds (unix_micros),
    weighted products accumulate in DECIMAL(30,10), ties in the ordering
    are broken by event_id — bit-identical to the oracle's replay."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    dur = (F.lead(us).over(w) - us).alias("w_us")
    weighted = ev.select("event_type", "value", dur).filter(F.col("w_us").isNotNull())
    return (
        weighted.groupBy("event_type")
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum("w_us").alias("total_us"),
            _fr(
                F.sum((F.col("w_us") * F.col("value")).cast(DEC)).cast("double")
                / F.sum("w_us").cast("double"),
                6,
            ).alias("time_weighted_value"),
        )
        .orderBy("event_type")
    )


def _hourly_grid(ev: DataFrame) -> DataFrame:
    """Shared gap-fill scaffold: (event_type, hour, value) where `hour`
    densifies each series to its own observed [min, max] hourly range and
    `value` is the hour's last observation (null on empty hours).

    The grid comes from sequence()+explode on each series' (min, max)
    aggregate — one row per series exploded to its hours, NO cross join
    anywhere; the hourly last-observation is a windowed row_number
    (deterministic tie-break on (ts, event_id))."""
    hour = F.date_trunc("hour", F.col("ts"))
    rk = F.row_number().over(
        W.partitionBy("event_type", "hour").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
    )
    hourly = (
        ev.select("event_type", hour.alias("hour"), "value", "ts", "event_id")
        .withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select("event_type", "hour", "value")
    )
    grid = (
        ev.groupBy("event_type")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("mn"),
            F.date_trunc("hour", F.max("ts")).alias("mx"),
        )
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("mn"), F.col("mx"), F.expr("interval 1 hour"))
            ).alias("hour"),
        )
    )
    return grid.join(hourly, ["event_type", "hour"], "left")


def gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling with last-observation-carried-forward (the TimescaleDB
    time_bucket_gapfill + locf() shape): per series, densify to an hourly
    grid over the series' own observed range, then carry the latest value
    across empty hours.

    LOCF is last(ignorenulls) over an unbounded-preceding frame. Two
    key-partition shuffles total (hourly window + locf window share the
    series key). At 100 TB the grid is tiny next to the data and the locf
    window state is one value per series — the same shape streaming
    watermarked state uses."""
    ev = load_table(spark, sf_dir, "events")
    locf = F.last("value", ignorenulls=True).over(
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        _hourly_grid(ev)
        .select(
            "event_type",
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            locf.alias("value_locf"),
            F.col("value").isNull().cast("int").alias("is_gap"),
        )
        .orderBy("event_type", "hour")
    )


def gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling with linear interpolation (the TimescaleDB
    time_bucket_gapfill + interpolate() shape): empty hours get the value
    linearly interpolated between the surrounding observations, weighted by
    time distance.

    The bracketing observations come from two ignorenulls window passes over
    the SAME (series, hour) partitioning — last() over the preceding frame
    and first() over the following frame — so Catalyst plans one exchange
    with forward+reverse in-partition sorts, never a self-join. The
    interpolation arithmetic is pure IEEE double ops in the same order on
    both engines (epoch-second deltas are exact integers), so results are
    bit-reproducible; every grid interior gap has both brackets because the
    grid spans exactly the observed range."""
    ev = load_table(spark, sf_dir, "events")
    wprec = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wfoll = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    obs_hour = F.when(F.col("value").isNotNull(), F.col("hour"))
    df = (
        _hourly_grid(ev)
        .withColumn("pv", F.last("value", ignorenulls=True).over(wprec))
        .withColumn("ph", F.last(obs_hour, ignorenulls=True).over(wprec))
        .withColumn("nv", F.first("value", ignorenulls=True).over(wfoll))
        .withColumn("nh", F.first(obs_hour, ignorenulls=True).over(wfoll))
    )
    frac = (
        (F.unix_timestamp("hour") - F.unix_timestamp("ph")).cast("double")
        / (F.unix_timestamp("nh") - F.unix_timestamp("ph")).cast("double")
    )
    interp = (
        F.when(F.col("value").isNotNull(), F.col("value"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv") + (F.col("nv") - F.col("pv")) * frac,
        )
        .otherwise(F.lit(None).cast("double"))
    )
    return df.select(
        "event_type",
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        _fr(interp, 6).alias("value_interp"),
        F.col("value").isNull().cast("int").alias("is_gap"),
    ).orderBy("event_type", "hour")


def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type-2 build (Kimball SCD2): collapse each
    user's event stream into attribute VERSIONS — a new row only when the
    tracked attribute (event_type here) actually changes — with
    valid_from/valid_to interval bounds and an is_current flag. This is the
    standard warehouse dimension-history operator the reference's
    append-only document sink cannot express
    (/root/reference/etlToMongo.js writes raw rows; history requires the
    change-detection window below).

    Shape for 100 TB: ONE hash exchange on user_id; the lag change-detector
    and the lead/row_number versioning run over the same (user_id; ts,
    event_id) sort order, so Spark plans a single sort — two Window nodes,
    zero extra shuffles. user_id is high-cardinality (no skewed partition),
    and the change filter shrinks the versioning input before the second
    window pass. Deterministic: ties broken by event_id."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    valid_to = F.lead("ts").over(w)
    return (
        changes.select(
            "user_id",
            F.row_number().over(w).alias("version_no"),
            "event_type",
            F.date_format("ts", _TS_US).alias("valid_from"),
            F.date_format(valid_to, _TS_US).alias("valid_to"),
            valid_to.isNull().cast("int").alias("is_current"),
        )
        .orderBy("user_id", "version_no")
    )


TREND_ANCHOR = "2024-01-01 00:00:00"  # x = hours since this fixed epoch


def linear_regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series ordinary-least-squares trend: slope/intercept/R² of value
    over time for each event_type — closed-form OLS from the five sufficient
    moments (n, Σx, Σy, Σxy, Σx², Σy²), the "is this metric drifting"
    primitive behind every trend alert and the REGR_SLOPE/REGR_R2 family of
    SQL aggregates.

    Scale shape: ONE map-side-combined aggregation per series — the moments
    are algebraic, so this also merges incrementally (the
    rollup_merge_incremental contract applies verbatim to OLS states).
    Determinism: x is hours since a FIXED literal anchor (each row's
    division is one IEEE op both engines agree on), per-row products
    accumulate in DECIMAL (order-independent), and the closed forms
    evaluate on identical doubles before _fr rounding."""
    # NULL observations are dropped BEFORE the moments: count(*) would
    # otherwise include rows whose y the sum-moments skip, silently
    # corrupting the fit (both engines filter identically)
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = (
        F.unix_micros("ts") - F.unix_micros(F.lit(TREND_ANCHOR).cast("timestamp"))
    ).cast("double") / 3_600_000_000.0
    y = F.col("value")
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x.cast(DEC)).cast("double").alias("sx"),
        F.sum(y.cast(DEC)).cast("double").alias("sy"),
        F.sum((x * y).cast(DEC)).cast("double").alias("sxy"),
        F.sum((x * x).cast(DEC)).cast("double").alias("sxx"),
        F.sum((y * y).cast(DEC)).cast("double").alias("syy"),
    )
    n = F.col("n").cast("double")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = n * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov_n / var_x
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    r2 = (cov_n * cov_n) / (var_x * var_y)
    # degenerate series — fewer than two observations, a single distinct x
    # (var_x = 0) or a constant y (var_y = 0, r² undefined) — are excluded:
    # the fit does not exist, and under ANSI the division would error rather
    # than emit DuckDB's inf. n >= 2 is explicit because var_x = 0 for a
    # single observation relies on exact cancellation of DECIMAL-rounded
    # moments: a non-dyadic x (real microsecond timestamps) can leave
    # sxx - sx² at a ~1e-18 residual that evades the filter and emits a
    # garbage slope
    m = m.filter((F.col("n") >= 2) & (var_x != 0) & (var_y != 0))
    return m.select(
        "event_type",
        "n",
        _fr(slope, 6).alias("slope_per_hour"),
        _fr(intercept, 4).alias("intercept"),
        _fr(r2, 6).alias("r2"),
    ).orderBy("event_type")


def seasonal_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile — the "seasonal" component of an
    STL-style decomposition at daily period: per (event_type, hour), the
    mean value and its RATIO to the series' overall mean (the
    multiplicative seasonal index a forecaster divides out), plus the hour's
    share of event volume. A flat series has all indexes ≈ 1; load-shaped
    metrics show their diurnal curve.

    Two map-side-combined aggregations (hourly and overall, both exact
    DECIMAL sums) joined on the low-cardinality series key — the overall
    side is |series| rows, broadcast; never a window over event_type."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())  # counts must match the sums
        .select("event_type", F.hour("ts").alias("hour_of_day"), "value")
    )
    hourly = ev.groupBy("event_type", "hour_of_day").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast(DEC)).alias("s"),
    )
    overall = ev.groupBy("event_type").agg(
        F.count("*").alias("tot_n"),
        F.sum(F.col("value").cast(DEC)).alias("tot_s"),
    )
    hmean = F.col("s").cast("double") / F.col("n_events")
    omean = F.col("tot_s").cast("double") / F.col("tot_n")
    return (
        hourly.join(F.broadcast(overall), "event_type")
        .select(
            "event_type",
            "hour_of_day",
            "n_events",
            _fr(hmean, 4).alias("mean_value"),
            # a zero-mean series has no multiplicative index — NULL, not a
            # division error (ANSI) or inf (DuckDB)
            F.when(omean != 0, _fr(hmean / omean, 4)).alias("seasonal_index"),
            _fr(F.col("n_events") / F.col("tot_n").cast("double"), 4).alias(
                "volume_share"
            ),
        )
        .orderBy("event_type", "hour_of_day")
    )


PROX_WINDOW_US = 300 * 1_000_000  # ±5 minutes


def time_proximity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LARGE × LARGE band join — the pattern range_band_join's docstring
    promises for when NEITHER side broadcasts: find all event pairs within
    ±5 minutes of each other (co-activity analysis) by bucketing both
    sides to the band width and equi-joining on (same bucket) ∪ (adjacent
    bucket), then refining with the exact |Δt| predicate. Candidate volume
    is Σ per-bucket n·m over ≤2 buckets per row — linear in the true match
    count for time-uniform data — instead of the n² a cross join or the
    single-reducer sort a naive interval walk would cost. Each qualifying
    unordered pair is generated EXACTLY once (same-bucket pairs ordered by
    event_id; adjacent-bucket pairs ordered by the bucket roles), so no
    dedup pass is needed. Emits the co-activity matrix per unordered
    event-type pair with exact-integer mean gaps.

    The oracle is the direct O(n²) inequality join — the independent
    formulation the bucketing must equal exactly."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.expr(f"unix_micros(ts) div {PROX_WINDOW_US}").alias("bkt"),
    )
    a, b = ev.alias("a"), ev.alias("b")

    def project(joined):
        return joined.select(
            F.least(F.col("a.event_type"), F.col("b.event_type")).alias("type_x"),
            F.greatest(F.col("a.event_type"), F.col("b.event_type")).alias(
                "type_y"
            ),
            F.abs(F.col("a.us") - F.col("b.us")).alias("gap_us"),
        )

    same = project(
        a.join(
            b,
            (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.event_id") < F.col("b.event_id")),
        )
    )
    adjacent = project(
        a.join(
            b,
            (F.col("a.bkt") + 1 == F.col("b.bkt"))
            & (F.abs(F.col("a.us") - F.col("b.us")) <= PROX_WINDOW_US),
        )
    )
    pairs = same.unionByName(adjacent).filter(F.col("gap_us") <= PROX_WINDOW_US)
    return (
        pairs.groupBy("type_x", "type_y")
        .agg(
            F.count("*").alias("n_pairs"),
            _fr(
                F.sum(F.col("gap_us").cast(DEC)).cast("double")
                / F.count("*")
                / 1_000_000.0,
                4,
            ).alias("avg_gap_sec"),
        )
        .orderBy("type_x", "type_y")
    )


def changepoint_mean_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline change-point detection — the binary-segmentation step of the
    CUSUM/BinSeg family: per event_type, the split day d* maximizing
    |mean(value, days < d) − mean(value, days ≥ d)|, i.e. the single most
    likely mean-shift point in the series (ties → earliest day). The
    monitoring primitive behind "when did this metric move" alerts; run
    recursively on each side it becomes full binary segmentation.

    Scale shape: ONE fact-scan aggregation to (event_type, day) partials
    (map-side combined, exact decimal sums), then every candidate split is
    scored from prefix sums over the tiny daily table — two window passes
    on a series whose length is days, not rows. The 100 TB cost is the
    first aggregation; the search is free. Exact decimal partials make
    both engines' prefix sums bit-identical, so the argmax is
    oracle-exact."""
    # drop NULL observations so the count partial matches the sum partial
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.col("value").cast(DEC)).alias("s"),
        F.count("*").alias("n"),
    )
    w = W.partitionBy("event_type").orderBy("day")
    wb = w.rowsBetween(W.unboundedPreceding, -1)
    wt = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    cum = daily.select(
        "event_type",
        "day",
        F.sum("s").over(wb).alias("s_bef"),
        F.sum("n").over(wb).alias("n_bef"),
        F.sum("s").over(wt).alias("s_tot"),
        F.sum("n").over(wt).alias("n_tot"),
    ).filter(F.col("n_bef").isNotNull())
    before = F.col("s_bef").cast("double") / F.col("n_bef")
    # The windowed sums are decimal(38,10); subtracting them directly needs
    # precision 39, which Spark resolves by silently dropping the scale to 9
    # — a one-digit precision loss DuckDB's exact subtraction doesn't take.
    # That skews `after` by ~1e-10 and, worse, breaks score TIES one-sidedly
    # (the before-side mean keeps 10 digits), so the argmax can pick a
    # different day than the oracle (caught by the NULL-series hypothesis
    # property, r11). Downcasting to (28,10) first keeps the subtraction
    # loss-free (precision 29 < 38) with 10^18 of sum headroom.
    after = (
        F.col("s_tot").cast("decimal(28,10)")
        - F.col("s_bef").cast("decimal(28,10)")
    ).cast("double") / (F.col("n_tot") - F.col("n_bef"))
    shift = F.abs(after - before)
    pick = W.partitionBy("event_type").orderBy(shift.desc(), F.col("day"))
    return (
        cum.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            _fr(before, 6).alias("mean_before"),
            _fr(after, 6).alias("mean_after"),
            _fr(shift, 6).alias("mean_shift"),
        )
        .orderBy("event_type")
    )


def minmax_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max time-series decimation (the M4 / dashboarding downsample;
    Jugel et al., VLDB 2014): per (series, time bucket) keep exactly the
    extreme rows — the max-value and min-value observation — so a plot
    of the decimated series preserves every visual spike the full series
    has. The TSDB counterpart of what the reference's dashboard does by
    querying whole months of raw rows (routes/monthly.js rolls up; a
    chart over 100 TB of observations needs decimation, not a full scan).

    ONE window partitioning (event_type, day) carries both extreme ranks
    — two orderings, two Window nodes, ONE exchange, no joins, no
    second scan; the kept rows explode from a per-row CASE array, so a
    single-row bucket correctly yields BOTH its min and max row. Total
    ordering: value ties broken by the unique event_id, NULL values
    ordered last under both directions in BOTH engines (explicit
    NULLS LAST), so argmin/argmax are engine-deterministic. Output is
    raw stored doubles — no arithmetic — hence hash-exact.

    At 100 TB: map-side the fact partitions by (series, bucket) — a
    uniform key space (buckets bound the per-group row count); the
    shuffle carries the fact once and state per group is O(1). The M4
    variant adding first/last rows per bucket is the same plan with two
    more rank columns."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "event_id",
        "value",
    )
    base = W.partitionBy("event_type", "day")
    ranked = ev.select(
        "*",
        F.row_number()
        .over(base.orderBy(F.col("value").desc_nulls_last(), "event_id"))
        .alias("rmax"),
        F.row_number()
        .over(base.orderBy(F.col("value").asc_nulls_last(), "event_id"))
        .alias("rmin"),
    )
    kind = F.explode(
        F.filter(
            F.array(
                F.when(F.col("rmax") == 1, F.lit("max")),
                F.when(F.col("rmin") == 1, F.lit("min")),
            ),
            lambda x: x.isNotNull(),
        )
    )
    return (
        ranked.select("event_type", "day", kind.alias("kind"), "event_id", "value")
        .orderBy("event_type", "day", "kind")
    )


ORACLE: dict[str, str] = {
    # the UNREWRITTEN two-branch form: rank twice, filter twice, UNION —
    # the engine emits both extremes from one pass via the CASE-array
    # explode instead
    "minmax_downsample": """
        WITH b AS (
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, event_id, value,
                   row_number() OVER (
                       PARTITION BY event_type, strftime(ts, '%Y-%m-%d')
                       ORDER BY value DESC NULLS LAST, event_id) AS rmax,
                   row_number() OVER (
                       PARTITION BY event_type, strftime(ts, '%Y-%m-%d')
                       ORDER BY value ASC NULLS LAST, event_id) AS rmin
            FROM events
        )
        SELECT event_type, day, 'max' AS kind, event_id, value
        FROM b WHERE rmax = 1
        UNION ALL
        SELECT event_type, day, 'min' AS kind, event_id, value
        FROM b WHERE rmin = 1
        ORDER BY event_type, day, kind
    """,
    "linear_regression_trend": f"""
        WITH m AS (
            SELECT event_type,
                   count(*) AS n,
                   CAST(sum(CAST(x AS DECIMAL(30,10))) AS DOUBLE) AS sx,
                   CAST(sum(CAST(y AS DECIMAL(30,10))) AS DOUBLE) AS sy,
                   CAST(sum(CAST(x * y AS DECIMAL(30,10))) AS DOUBLE) AS sxy,
                   CAST(sum(CAST(x * x AS DECIMAL(30,10))) AS DOUBLE) AS sxx,
                   CAST(sum(CAST(y * y AS DECIMAL(30,10))) AS DOUBLE) AS syy
            FROM (
                SELECT event_type,
                       CAST(epoch_us(ts) - epoch_us(TIMESTAMP '{TREND_ANCHOR}')
                            AS DOUBLE) / 3600000000.0 AS x,
                       value AS y
                FROM events
                WHERE value IS NOT NULL
            )
            GROUP BY 1
        )
        SELECT event_type, n,
               {_sql_fr('(n * sxy - sx * sy) / (n * sxx - sx * sx)', 6)}
                   AS slope_per_hour,
               {_sql_fr('(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n', 4)}
                   AS intercept,
               {_sql_fr('((n * sxy - sx * sy) * (n * sxy - sx * sy)) / ((n * sxx - sx * sx) * (n * syy - sy * sy))', 6)}
                   AS r2
        FROM m
        WHERE n >= 2 AND (n * sxx - sx * sx) <> 0 AND (n * syy - sy * sy) <> 0
        ORDER BY event_type
    """,
    "seasonal_hourly_profile": f"""
        WITH hourly AS (
            SELECT event_type, hour(ts) AS hour_of_day,
                   count(*) AS n_events,
                   sum(CAST(value AS DECIMAL(30,10))) AS s
            FROM events WHERE value IS NOT NULL GROUP BY 1, 2
        ),
        overall AS (
            SELECT event_type, count(*) AS tot_n,
                   sum(CAST(value AS DECIMAL(30,10))) AS tot_s
            FROM events WHERE value IS NOT NULL GROUP BY 1
        )
        SELECT h.event_type, h.hour_of_day, h.n_events,
               {_sql_fr('CAST(h.s AS DOUBLE) / h.n_events', 4)} AS mean_value,
               CASE WHEN CAST(o.tot_s AS DOUBLE) / o.tot_n <> 0 THEN
                   {_sql_fr('(CAST(h.s AS DOUBLE) / h.n_events) / (CAST(o.tot_s AS DOUBLE) / o.tot_n)', 4)}
               END AS seasonal_index,
               {_sql_fr('h.n_events * 1.0 / o.tot_n', 4)} AS volume_share
        FROM hourly h JOIN overall o ON h.event_type = o.event_type
        ORDER BY h.event_type, h.hour_of_day
    """,
    "time_proximity_join": f"""
        SELECT least(a.event_type, b.event_type) AS type_x,
               greatest(a.event_type, b.event_type) AS type_y,
               count(*) AS n_pairs,
               {_sql_fr("CAST(sum(CAST(abs(epoch_us(a.ts) - epoch_us(b.ts)) AS DECIMAL(30,10))) AS DOUBLE) / count(*) / 1000000.0", 4)}
                   AS avg_gap_sec
        FROM events a JOIN events b
          ON abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {PROX_WINDOW_US}
         AND a.event_id < b.event_id
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "changepoint_mean_shift": f"""
        WITH daily AS (
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                   sum(CAST(value AS DECIMAL(30,10))) AS s,
                   count(*) AS n
            FROM events WHERE value IS NOT NULL GROUP BY 1, 2
        ),
        cum AS (
            SELECT event_type, day,
                   sum(s) OVER (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS s_bef,
                   sum(n) OVER (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS n_bef,
                   sum(s) OVER (PARTITION BY event_type) AS s_tot,
                   sum(n) OVER (PARTITION BY event_type) AS n_tot
            FROM daily
        ),
        scored AS (
            SELECT event_type, day,
                   CAST(s_bef AS DOUBLE) / n_bef AS mb,
                   CAST(s_tot - s_bef AS DOUBLE) / (n_tot - n_bef) AS ma
            FROM cum WHERE n_bef IS NOT NULL
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY event_type
                       ORDER BY abs(ma - mb) DESC, day) AS rk
            FROM scored
        )
        SELECT event_type, day AS change_day,
               {_sql_fr('mb', 6)} AS mean_before,
               {_sql_fr('ma', 6)} AS mean_after,
               {_sql_fr('abs(ma - mb)', 6)} AS mean_shift
        FROM ranked WHERE rk = 1
        ORDER BY event_type
    """,
    "scd2_user_history": """
        WITH changes AS (
            SELECT * FROM (
                SELECT user_id, ts, event_id, event_type,
                       lag(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS prev_type
                FROM events
            ) WHERE prev_type IS NULL OR prev_type <> event_type
        )
        SELECT user_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS version_no,
               event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
               strftime(lead(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id),
                        '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
               CAST(lead(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL AS INT)
                   AS is_current
        FROM changes
        ORDER BY user_id, version_no
    """,
    "gap_fill_interpolate": """
        WITH hourly AS (
            SELECT event_type, hour, value FROM (
                SELECT event_type, date_trunc('hour', ts) AS hour, value,
                       row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                          ORDER BY ts DESC, event_id DESC) AS rk
                FROM events
            ) WHERE rk = 1
        ),
        bounds AS (
            SELECT event_type,
                   date_trunc('hour', min(ts)) AS mn,
                   date_trunc('hour', max(ts)) AS mx
            FROM events GROUP BY 1
        ),
        grid AS (
            SELECT event_type,
                   unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour
            FROM bounds
        ),
        joined AS (
            SELECT g.event_type, g.hour, h.value
            FROM grid g
            LEFT JOIN hourly h ON g.event_type = h.event_type AND g.hour = h.hour
        ),
        br AS (
            SELECT *,
                last_value(value IGNORE NULLS) OVER (
                    PARTITION BY event_type ORDER BY hour
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                last_value(CASE WHEN value IS NOT NULL THEN hour END IGNORE NULLS)
                    OVER (PARTITION BY event_type ORDER BY hour
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
                first_value(value IGNORE NULLS) OVER (
                    PARTITION BY event_type ORDER BY hour
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                first_value(CASE WHEN value IS NOT NULL THEN hour END IGNORE NULLS)
                    OVER (PARTITION BY event_type ORDER BY hour
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
            FROM joined
        )
        SELECT event_type,
               strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
               floor((CASE
                   WHEN value IS NOT NULL THEN value
                   WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                       pv + (nv - pv) *
                       (CAST(date_diff('second', ph, hour) AS DOUBLE) /
                        CAST(date_diff('second', ph, nh) AS DOUBLE))
               END) * 1000000 + 0.5) / 1000000 AS value_interp,
               CAST(value IS NULL AS INT) AS is_gap
        FROM br
        ORDER BY 1, 2
    """,
    "gap_fill_locf": """
        WITH hourly AS (
            SELECT event_type, hour, value FROM (
                SELECT event_type, date_trunc('hour', ts) AS hour, value,
                       row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                          ORDER BY ts DESC, event_id DESC) AS rk
                FROM events
            ) WHERE rk = 1
        ),
        bounds AS (
            SELECT event_type,
                   date_trunc('hour', min(ts)) AS mn,
                   date_trunc('hour', max(ts)) AS mx
            FROM events GROUP BY 1
        ),
        grid AS (
            SELECT event_type,
                   unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour
            FROM bounds
        )
        SELECT g.event_type,
               strftime(g.hour, '%Y-%m-%d %H:%M:%S') AS hour,
               last_value(h.value IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf,
               CAST(h.value IS NULL AS INT) AS is_gap
        FROM grid g
        LEFT JOIN hourly h ON g.event_type = h.event_type AND g.hour = h.hour
        ORDER BY 1, 2
    """,
    "time_weighted_avg": f"""
        WITH durs AS (
            SELECT event_type, value,
                   lead(epoch_us(ts)) OVER (PARTITION BY event_type
                                            ORDER BY ts, event_id)
                   - epoch_us(ts) AS w_us
            FROM events
        )
        SELECT event_type,
               count(*) AS n_intervals,
               CAST(sum(w_us) AS BIGINT) AS total_us,  -- HUGEINT otherwise
               {_sql_fr("CAST(sum(CAST(w_us * value AS DECIMAL(30,10))) AS DOUBLE) / CAST(sum(w_us) AS DOUBLE)", 6)}
                   AS time_weighted_value
        FROM durs WHERE w_us IS NOT NULL
        GROUP BY event_type
        ORDER BY event_type
    """,
    "asof_attribution_tolerance": f"""
        SELECT c.event_id AS click_event_id,
               c.user_id,
               strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
               CASE WHEN epoch_us(c.ts) - epoch_us(v.ts) <= {ASOF_TOLERANCE_MIN * 60 * 1_000_000}
                    THEN strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') END AS view_ts,
               CASE WHEN epoch_us(c.ts) - epoch_us(v.ts) <= {ASOF_TOLERANCE_MIN * 60 * 1_000_000}
                    THEN epoch_us(c.ts) - epoch_us(v.ts) END AS gap_us,
               CAST(coalesce(epoch_us(c.ts) - epoch_us(v.ts)
                             <= {ASOF_TOLERANCE_MIN * 60 * 1_000_000}, false) AS INT)
                   AS attributed
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON c.user_id = v.user_id AND c.ts >= v.ts
        ORDER BY click_event_id
    """,
    "asof_attribution": """
        SELECT c.event_id AS click_event_id,
               c.user_id,
               strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
               strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
               epoch_us(c.ts) - epoch_us(v.ts)        AS gap_us
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON c.user_id = v.user_id AND c.ts >= v.ts
        ORDER BY click_event_id
    """,
    "range_band_join": f"""
        WITH bands(band, lo, hi) AS (
            VALUES ('low', 0.0, 20000.0), ('mid', 20000.0, 60000.0),
                   ('high', 60000.0, 200000.0)
        )
        SELECT band, count(*) AS n_orders,
               {_sql_avg4('o_totalprice', 2)} AS avg_price
        FROM orders JOIN bands
          ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band, lo
        ORDER BY lo
    """,
}

QUERIES = {
    "minmax_downsample": minmax_downsample,
    "changepoint_mean_shift": changepoint_mean_shift,
    "linear_regression_trend": linear_regression_trend,
    "seasonal_hourly_profile": seasonal_hourly_profile,
    "time_proximity_join": time_proximity_join,
    "scd2_user_history": scd2_user_history,
    "asof_attribution": asof_attribution,
    "asof_attribution_tolerance": asof_attribution_tolerance,
    "range_band_join": range_band_join,
    "time_weighted_avg": time_weighted_avg,
    "gap_fill_locf": gap_fill_locf,
    "gap_fill_interpolate": gap_fill_interpolate,
}
