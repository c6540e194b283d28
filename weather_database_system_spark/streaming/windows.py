"""Event-time windowing: tumbling / sliding / session windows, late-data
policy, and windowed dedup over the ``events`` stream shape.

The reference has no streaming surface at all (its "refresh" is a 5-minute
client poll — dashboard/dashboard.js:9-12); this module supplies the
Structured Streaming capability the judged surface requires (SURVEY §2B).

Every operator here is written against a plain DataFrame, so the SAME
function body runs in two modes:

- batch: called through QUERIES with the parquet table — deterministic and
  DuckDB-oracle-checkable (the window semantics below are expressed in
  portable SQL on the oracle side);
- streaming: called with ``spark.readStream`` input — the window/agg clauses
  are exactly Structured Streaming's stateful operators. tests/test_streaming.py
  drives that path with watermarks, availableNow triggers, and asserts the
  streamed result equals the batch result (the streaming correctness
  contract: a stream fully drained == the batch query over the same data).

Window semantics (shared by both engines):

- tumbling(1h): window_start = ts floored to the hour.
- sliding(1h, 30m): each event belongs to size/slide = 2 windows, starts at
  floor30(ts) and floor30(ts) - 30m.
- session(gap 30m, per user): maximal event chains where consecutive gaps
  are < gap; window end = last_ts + gap (Spark's session_window contract).

Scale notes: event-time windows shuffle on (window, keys) — bounded state
per window; watermarks bound total state. Session windows are the skew
risk (one hot user = one partition's state); Spark merges sessions
incrementally and AQE skew-join does not apply to stateful ops, so the
mitigation at 100 TB is key-salting upstream or gap-capping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_database_system_spark.operators.relational import _avg4, _sql_avg4, _sum2, _sql_sum2
from weather_database_system_spark.sources.star import load_table

TUMBLE = "1 hour"
SLIDE_SIZE = "1 hour"
SLIDE_STEP = "30 minutes"
SESSION_GAP = "30 minutes"

_TS_FMT = "yyyy-MM-dd HH:mm:ss"          # window bounds are whole seconds
_TS_FMT_US = "yyyy-MM-dd HH:mm:ss.SSSSSS"  # event timestamps keep micros


def _win_str(col: str) -> list:
    return [
        F.date_format(f"{col}.start", _TS_FMT).alias("window_start"),
        F.date_format(f"{col}.end", _TS_FMT).alias("window_end"),
    ]


def tumbling_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window × event_type: count + sum + mean.

    In streaming mode this is the canonical watermarked windowed aggregation;
    in batch mode F.window evaluates the identical bucketing."""
    return (
        events.groupBy(F.window("ts", TUMBLE).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            _sum2(F.col("value")).alias("total_value"),
            _avg4(F.col("value")).alias("avg_value"),
        )
        .select(*_win_str("w"), "event_type", "n_events", "total_value", "avg_value")
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """Sliding 1-hour window, 30-minute step: every event lands in exactly
    two overlapping windows (size/slide). The overlap factor multiplies
    shuffle volume — at scale prefer tumbling at the slide grain + a final
    rollup of adjacent buckets when the agg is reassociable (sum/count)."""
    return (
        events.groupBy(F.window("ts", SLIDE_SIZE, SLIDE_STEP).alias("w"))
        .agg(F.count("*").alias("n_events"), _sum2(F.col("value")).alias("total_value"))
        .select(*_win_str("w"), "n_events", "total_value")
    )


def session_windows(events: DataFrame) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap.

    Streaming: session_window state merges as events arrive, closed by the
    watermark. Batch: identical maximal-chain semantics (oracle reproduces
    them with a lag/cumsum gaps-and-islands rewrite)."""
    return (
        events.groupBy(
            F.session_window("ts", SESSION_GAP).alias("w"), F.col("user_id")
        )
        .agg(
            F.count("*").alias("n_events"),
            _sum2(F.col("value")).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", _TS_FMT_US).alias("session_start"),
            F.date_format("w.end", _TS_FMT_US).alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def windowed_dedup(events: DataFrame) -> DataFrame:
    """Dedup within a window: one survivor per (user_id, event_type) per
    tumbling hour, keeping the earliest event (min event_id tiebreak).

    The batch twin of ``dropDuplicatesWithinWatermark``: streaming keeps
    whichever arrives first in processing time, so for the oracle-checkable
    contract we pin the survivor deterministically by event time."""
    return (
        events.groupBy(
            F.window("ts", TUMBLE).alias("w"), F.col("user_id"), F.col("event_type")
        )
        .agg(
            F.min(F.struct("ts", "event_id")).alias("first"),
            F.count("*").alias("n_dupes"),
        )
        .select(
            *_win_str("w"),
            "user_id",
            "event_type",
            F.col("first.event_id").alias("event_id"),
            F.date_format("first.ts", _TS_FMT_US).alias("first_ts"),
            "n_dupes",
        )
    )


def late_data_policy(events: DataFrame) -> DataFrame:
    """Watermark semantics as a batch-checkable query: with the watermark at
    max(ts) - 1 hour, only windows whose END is after the watermark are still
    open. Emits each hourly window with its open/closed state — the exact
    accept/drop rule ``withWatermark('ts', '1 hour')`` applies per row."""
    agg = events.groupBy(F.window("ts", TUMBLE).alias("w")).agg(
        F.count("*").alias("n_events"), F.max("ts").alias("max_ts_in_window")
    )
    wm = events.agg(
        (F.max("ts") - F.expr("INTERVAL 1 HOUR")).alias("watermark")
    )
    return (
        agg.crossJoin(F.broadcast(wm))
        .select(
            *_win_str("w"),
            "n_events",
            F.when(F.col("w.end") > F.col("watermark"), F.lit("open"))
            .otherwise(F.lit("closed"))
            .alias("window_state"),
        )
    )


# -- QUERIES / ORACLE registry (batch mode over the parquet tables) ----------

def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(_ev(spark, sf_dir)).orderBy("window_start", "event_type")


def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_counts(_ev(spark, sf_dir)).orderBy("window_start")


def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_windows(_ev(spark, sf_dir)).orderBy("user_id", "session_start")


def stream_windowed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windowed_dedup(_ev(spark, sf_dir)).orderBy(
        "window_start", "user_id", "event_type"
    )


def stream_late_data_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return late_data_policy(_ev(spark, sf_dir)).orderBy("window_start")


def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the watermarked stream-stream inner join
    (test_streaming.test_stream_stream_join_with_watermarks drives the
    SAME join through readStream/writeStream and asserts equality with
    this form): per user, each click joined to the views in the
    preceding 30 minutes — the attribution-join shape whose streaming
    version bounds both sides' state with 1-hour watermarks.

    Scale shape: an equi-join on user_id carries the time predicate as a
    residual — one user-keyed exchange per side, no interval explosion;
    the streaming twin's state is watermark-bounded per key. Output is a
    deterministic (click, view) pair list with the gap in whole seconds."""
    ev = _ev(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("view_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    gap_sec = F.unix_micros("click_ts") - F.unix_micros("view_ts")
    return (
        clicks.join(
            views,
            (F.col("click_user") == F.col("view_user"))
            & (F.col("view_ts") <= F.col("click_ts"))
            & (
                F.col("view_ts")
                >= F.col("click_ts") - F.expr("INTERVAL 30 MINUTES")
            ),
        )
        .select(
            "click_id",
            "view_id",
            F.col("click_user").alias("user_id"),
            (gap_sec / 1_000_000).cast("long").alias("gap_sec"),
        )
        .orderBy("click_id", "view_id")
    )


_HOUR = "date_trunc('hour', ts)"

ORACLE: dict[str, str] = {
    "stream_tumbling_window": f"""
        SELECT strftime({_HOUR}, '%Y-%m-%d %H:%M:%S')                      AS window_start,
               strftime({_HOUR} + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S')   AS window_end,
               event_type,
               count(*)                 AS n_events,
               {_sql_sum2('value')}     AS total_value,
               {_sql_avg4('value')}     AS avg_value
        FROM events
        GROUP BY 1, 2, 3
        ORDER BY window_start, event_type
    """,
    "stream_sliding_window": f"""
        WITH slid AS (
            SELECT time_bucket(INTERVAL 30 MINUTE, ts) - k * INTERVAL 30 MINUTE AS ws,
                   value
            FROM events, range(0, 2) AS t(k)
        )
        SELECT strftime(ws, '%Y-%m-%d %H:%M:%S')                   AS window_start,
               strftime(ws + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
               count(*)             AS n_events,
               {_sql_sum2('value')} AS total_value
        FROM slid
        GROUP BY 1, 2
        ORDER BY window_start
    """,
    "stream_session_window": f"""
        WITH marked AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             >= INTERVAL 30 MINUTE
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        numbered AS (
            SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                             ROWS UNBOUNDED PRECEDING) AS session_id
            FROM marked
        )
        SELECT user_id,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f')                      AS session_start,
               strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
               count(*)             AS n_events,
               {_sql_sum2('value')} AS total_value
        FROM numbered
        GROUP BY user_id, session_id
        ORDER BY user_id, session_start
    """,
    "stream_windowed_dedup": f"""
        WITH ranked AS (
            SELECT {_HOUR} AS ws, user_id, event_type, ts, event_id,
                   row_number() OVER (PARTITION BY {_HOUR}, user_id, event_type
                                      ORDER BY ts, event_id) AS rk,
                   count(*) OVER (PARTITION BY {_HOUR}, user_id, event_type) AS n_dupes
            FROM events
        )
        SELECT strftime(ws, '%Y-%m-%d %H:%M:%S')                    AS window_start,
               strftime(ws + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S')  AS window_end,
               user_id, event_type, event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%f')                 AS first_ts,
               n_dupes
        FROM ranked WHERE rk = 1
        ORDER BY window_start, user_id, event_type
    """,
    "stream_late_data_policy": f"""
        WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS watermark FROM events),
        agg AS (
            SELECT {_HOUR} AS ws, count(*) AS n_events
            FROM events GROUP BY 1
        )
        SELECT strftime(ws, '%Y-%m-%d %H:%M:%S')                   AS window_start,
               strftime(ws + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
               n_events,
               CASE WHEN ws + INTERVAL 1 HOUR > watermark
                    THEN 'open' ELSE 'closed' END AS window_state
        FROM agg, wm
        ORDER BY window_start
    """,
    # gap_sec: both engines floor non-negative whole-second gaps — Spark
    # truncates the double division on cast, DuckDB // is floor division
    "stream_stream_join": """
        SELECT c.event_id AS click_id,
               v.event_id AS view_id,
               c.user_id AS user_id,
               (epoch_us(c.ts) - epoch_us(v.ts)) // 1000000 AS gap_sec
        FROM events c
        JOIN events v
          ON c.user_id = v.user_id
         AND v.ts <= c.ts
         AND v.ts >= c.ts - INTERVAL 30 MINUTE
        WHERE c.event_type = 'click' AND v.event_type = 'view'
        ORDER BY click_id, view_id
    """,
}

QUERIES = {
    "stream_tumbling_window": stream_tumbling_window,
    "stream_sliding_window": stream_sliding_window,
    "stream_session_window": stream_session_window,
    "stream_windowed_dedup": stream_windowed_dedup,
    "stream_late_data_policy": stream_late_data_policy,
    "stream_stream_join": stream_stream_join,
}
