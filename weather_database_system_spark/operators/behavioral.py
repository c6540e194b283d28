"""Behavioral / product-analytics operators: cohort retention and ordered
funnel conversion over the events stream (SURVEY §2B "custom operators" —
the reference's dashboard answers only per-city monthly aggregates
[/root/reference/backend/routes/monthly.js:21-54]; these are the standard
next questions an analytics engine is asked of the same event feed).

Both are pure DataFrame compositions — no UDFs, no driver loops:

- cohort retention: a user's cohort is the Monday-truncated week of their
  first purchase, computed with ONE window pass over the user partition (no
  self-join against a first-seen aggregate, which would shuffle the fact
  table twice). Activity weeks then dedup to (cohort, offset, user) and
  aggregate. At 100 TB: two hash shuffles on high-cardinality keys
  (user_id, then the tiny (cohort, offset) pair), both map-side combined.
- funnel: the strictly-ordered, 24h-deadlined signup → view → click →
  purchase funnel (ClickHouse windowFunnel semantics).
  Each step's first-qualifying timestamp is a windowed conditional min that
  may reference the previous step's column; all four Window operators share
  one user_id partitioning, so Catalyst plans a SINGLE exchange followed by
  four in-partition window passes. The per-user frame then collapses with a
  map-side-combinable agg and a constant-size stack() unpivot — no second
  scan of the events table, no per-step join cascade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from weather_database_system_spark.operators.relational import _fr, _sql_fr
from weather_database_system_spark.sources.star import load_table

FUNNEL_STEPS = ("signup", "view", "click", "purchase")


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix: for each first-seen week (cohort) and
    week offset since it, how many distinct cohort users were active, and
    what fraction of the cohort that is.

    Cohorting is on PURCHASE events (first-purchase week; active = weeks
    with a purchase): with the synthetic feed every user fires *some* event
    every week, so purchase-based cohorts are what leaves a discriminating,
    non-trivially-1.0 matrix. Week 0 retention is 1.0 by construction
    (every user purchases in their first-purchase week) — a built-in sanity
    invariant."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    week = F.date_trunc("week", F.col("ts"))
    cohort = F.min(week).over(W.partitionBy("user_id"))
    activity = (
        ev.select(
            "user_id",
            week.alias("week"),
            cohort.alias("cohort_week"),
        )
        .distinct()
        .select(
            "user_id",
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
    )
    per_cell = activity.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("active_users")
    )
    cohort_size = F.max(
        F.when(F.col("week_offset") == 0, F.col("active_users"))
    ).over(W.partitionBy("cohort_week"))
    return (
        per_cell.withColumn("cohort_size", cohort_size)
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "active_users",
            "cohort_size",
            _fr(F.col("active_users") / F.col("cohort_size"), 4).alias(
                "retention_pct"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered, time-bounded funnel (the ClickHouse windowFunnel
    shape): step k counts users whose first qualifying event of step k's
    type happened AFTER their step k-1 timestamp and within 24 hours OF THE
    CHAIN'S FIRST EVENT (s1) — the whole conversion is bounded by one window
    from the funnel entry, exactly windowFunnel's contract (a per-step
    deadline would let a "24h funnel" span 72h; ADVICE r2).

    The chained conditional-min windows all partition by user_id → one
    shuffle; the final aggregate is a single row unpivoted with stack()."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    df = ev.select("user_id", "event_type", "ts")
    prev = None
    for i, step in enumerate(FUNNEL_STEPS, start=1):
        cond = F.col("event_type") == step
        if prev is not None:
            cond = (
                cond
                & (F.col("ts") > F.col(prev))
                & (F.col("ts") <= F.col("s1") + F.expr("INTERVAL 24 HOURS"))
            )
        df = df.withColumn(f"s{i}", F.min(F.when(cond, F.col("ts"))).over(w))
        prev = f"s{i}"
    per_user = df.groupBy("user_id").agg(
        *[F.max(f"s{i}").alias(f"s{i}") for i in range(1, 5)]
    )
    totals = per_user.agg(
        *[F.count(f"s{i}").alias(f"u{i}") for i in range(1, 5)]
    )
    stacked = totals.select(
        F.expr(
            "stack(4, "
            + ", ".join(
                f"{i}, '{step}', u{i}"
                for i, step in enumerate(FUNNEL_STEPS, start=1)
            )
            + ") as (step, step_type, users)"
        ),
        F.col("u1").alias("_u1"),
    )
    return stacked.select(
        "step",
        "step_type",
        "users",
        _fr(F.col("users") / F.col("_u1"), 4).alias("conv_pct"),
    ).orderBy("step")


ORACLE: dict[str, str] = {
    "cohort_retention": f"""
        WITH activity AS (
            SELECT DISTINCT user_id,
                   date_trunc('week', ts) AS week,
                   min(date_trunc('week', ts)) OVER (PARTITION BY user_id)
                       AS cohort_week
            FROM events WHERE event_type = 'purchase'
        ),
        cells AS (
            SELECT cohort_week,
                   CAST(date_diff('day', cohort_week, week) / 7 AS INT)
                       AS week_offset,
                   count(DISTINCT user_id) AS active_users
            FROM activity GROUP BY 1, 2
        )
        SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
               week_offset, active_users,
               max(CASE WHEN week_offset = 0 THEN active_users END)
                   OVER (PARTITION BY cohort_week) AS cohort_size,
               {_sql_fr(
                   "CAST(active_users AS DOUBLE) / "
                   "(max(CASE WHEN week_offset = 0 THEN active_users END)"
                   " OVER (PARTITION BY cohort_week))", 4)} AS retention_pct
        FROM cells
        ORDER BY 1, 2
    """,
    "funnel_conversion": f"""
        WITH e1 AS (
            SELECT user_id, event_type, ts,
                   min(CASE WHEN event_type = 'signup' THEN ts END)
                       OVER (PARTITION BY user_id) AS s1
            FROM events
        ),
        e2 AS (
            SELECT *, min(CASE WHEN event_type = 'view' AND ts > s1
                               AND ts <= s1 + INTERVAL 24 HOURS THEN ts END)
                          OVER (PARTITION BY user_id) AS s2
            FROM e1
        ),
        e3 AS (
            SELECT *, min(CASE WHEN event_type = 'click' AND ts > s2
                               AND ts <= s1 + INTERVAL 24 HOURS THEN ts END)
                          OVER (PARTITION BY user_id) AS s3
            FROM e2
        ),
        e4 AS (
            SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > s3
                               AND ts <= s1 + INTERVAL 24 HOURS THEN ts END)
                          OVER (PARTITION BY user_id) AS s4
            FROM e3
        ),
        per_user AS (
            SELECT user_id, max(s1) AS s1, max(s2) AS s2,
                   max(s3) AS s3, max(s4) AS s4
            FROM e4 GROUP BY 1
        ),
        totals AS (
            SELECT count(s1) AS u1, count(s2) AS u2,
                   count(s3) AS u3, count(s4) AS u4
            FROM per_user
        )
        SELECT step, step_type, users,
               {_sql_fr("CAST(users AS DOUBLE) / u1", 4)} AS conv_pct
        FROM (
            SELECT 1 AS step, 'signup' AS step_type, u1 AS users, u1 FROM totals
            UNION ALL SELECT 2, 'view', u2, u1 FROM totals
            UNION ALL SELECT 3, 'click', u3, u1 FROM totals
            UNION ALL SELECT 4, 'purchase', u4, u1 FROM totals
        )
        ORDER BY step
    """,
}

QUERIES = {
    "cohort_retention": cohort_retention,
    "funnel_conversion": funnel_conversion,
}
