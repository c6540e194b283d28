"""Helpers over ``df.explain("formatted")`` output.

Catalyst gives pushdown/pruning/broadcast/partial-agg for free when the plan
is declared right (SURVEY §4) — but "for free" silently stops being true
when a refactor inserts a UDF above a filter or widens a projection. These
helpers turn the physical plan into assertable facts so tests pin the plan
shape, not just the result values.

Parsing the explain text is deliberate: it is the same surface a human
reads, it works on plain DataFrames pre-execution, and it needs no private
JVM APIs beyond what ``DataFrame.explain`` itself uses.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The EXPLAIN FORMATTED text of the (pre-execution, possibly AQE-
    tentative) physical plan."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (BroadcastExchange excluded) — the
    dominant cost term at scale. AQE may later coalesce partitions but
    never removes a shuffle boundary the plan declares."""
    plan = formatted_plan(df)
    # formatted mode prints one "(n) Exchange" detail header per shuffle
    # (BroadcastExchange prints as "(n) BroadcastExchange", so it's excluded
    # by the word boundary); simple/extended modes inline the partitioning.
    return len(re.findall(r"^\(\d+\) Exchange\s*$", plan, re.M)) or len(
        re.findall(r"\bExchange (?:hash|range)partitioning|\bExchange SinglePartition", plan)
    )


def broadcast_join_count(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return len(re.findall(r"\bBroadcastHashJoin|\bBroadcastNestedLoopJoin", plan))


def pushed_filters(df: DataFrame) -> list[str]:
    """All parquet-scan PushedFilters entries, flattened."""
    out: list[str] = []
    # greedy-to-line-end capture: IN-list atoms like
    # In(event_type, [click,view]) contain an inner ']', so a lazy
    # [^\]]* match truncates them (found by the multi_band_counts pin).
    # Anchored to end-of-line (ADVICE r12 #3): formatted mode puts
    # PushedFilters on its own line; the anchor pins that assumption so
    # a simple-mode style '..., ReadSchema: ...' trailer could never be
    # swallowed into the capture.
    for m in re.finditer(
        r"PushedFilters: \[(.*)\]\s*$", formatted_plan(df), re.M
    ):
        # filter atoms look like Name(args...); args may contain commas
        # and bracketed IN-lists
        out.extend(
            re.findall(r"\w+\([^()]*(?:\([^()]*\)[^()]*)*\)", m.group(1))
        )
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Per-scan sets of column names actually read from parquet — the
    column-pruning witness (a 2-column projection must not scan 16)."""
    schemas: list[set[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        body = m.group(1)
        cols = {
            part.split(":")[0].strip()
            for part in re.split(r",(?![^<]*>)", body)
            if part.strip()
        }
        schemas.append(cols)
    return schemas


def wholestage_codegen_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees — how much of the plan runs as
    generated JVM code rather than interpreted operators. (Parsed from
    EXPLAIN CODEGEN; the pre-execution AQE formatted plan carries no codegen
    annotations.)"""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    buf = io.StringIO()
    try:
        # under AQE the pre-execution plan is an AdaptiveSparkPlan shell with
        # no codegen subtrees yet; physical planning happens at explain time,
        # so toggling AQE off just for this inspection yields the real spans
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        with contextlib.redirect_stdout(buf):
            df.explain("codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", buf.getvalue())
    return int(m.group(1)) if m else 0
