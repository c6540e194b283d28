"""Scalar-function coverage queries: math, datetime, array, conditional.

Everything stays JVM-side inside whole-stage codegen — no UDFs. Each family
is restricted to operations with ENGINE-PORTABLE semantics so the DuckDB
oracle can hash-match:

- math: +,-,*,/, abs/ceil/floor/sqrt are IEEE-exact cross-engine; integer
  powers are expanded to multiplication (x*x) because pow() goes through
  libm whose last-ulp behavior differs per platform; exp/ln are excluded
  for the same reason.
- datetime: field extraction + day arithmetic; week numbering pinned to ISO
  on both engines; weekday normalized to Monday=0 (Spark ``weekday`` ≙
  DuckDB ``isodow - 1``).
- arrays: the embeddings vector column exercised with size/index/slice/
  min/max — float32 values cast to double identically on both engines.
- conditional: CASE/coalesce/nullif/greatest/least ladders — the
  reference's freshness-threshold idiom (monthly.js:36-42) generalized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_database_system_spark.operators.relational import _fr, _sql_fr
from weather_database_system_spark.sources.star import load_table


def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(price - 30000).alias("abs_centered"),
        F.ceil(price).alias("price_ceil"),
        F.floor(price).alias("price_floor"),
        _fr(F.sqrt(price), 6).alias("price_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.sign(F.col("l_discount") - 0.05).alias("disc_sign"),
    ).orderBy("l_orderkey", "l_linenumber")


def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("dom"),
        F.weekday(d).alias("wd_mon0"),
        F.weekofyear(d).alias("iso_week"),
        F.quarter(d).alias("q"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.lit("1999-01-01").cast("date"), d).alias("days_to_1999"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
    ).orderBy("o_orderkey")


def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dims"),
        _fr(F.element_at(v, 1), 6).alias("first_dim"),
        _fr(F.element_at(v, -1), 6).alias("last_dim"),
        _fr(F.array_max(v), 6).alias("max_val"),
        _fr(F.array_min(v), 6).alias("min_val"),
        _fr(
            F.aggregate(F.slice(v, 1, 8), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("sum_first8"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_positive"),
    ).orderBy("vec_id")


def conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return orders.select(
        "o_orderkey",
        F.when(p >= 100000, "large").when(p >= 30000, "medium").otherwise("small").alias("size_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias("status_display"),
        F.greatest(p - 50000, F.lit(0.0)).alias("excess_over_50k"),
        F.least(p, F.lit(10000.0)).alias("capped_10k"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("is_urgent"),
    ).orderBy("o_orderkey")


def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: build a map from the parsed JSON props,
    read it back with element_at, enumerate it with map_keys/map_entries,
    and explode it to long form. DuckDB has no Spark-style MAP over JSON,
    so the oracle recomputes the same long form straight from the JSON —
    independent derivations, identical rows."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("k"), F.get_json_object("props", "$.k"),
        F.lit("type"), F.col("event_type"),
    )
    return (
        ev.select("event_id", F.explode(m).alias("key", "val"))
        .orderBy("event_id", "key")
    )


def string_functions_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-family batch: regexp group extraction, fixed-width
    padding, character translation, reverse, repeat — the remaining scalar
    string surface the first batch (operators/relational.string_functions)
    doesn't cover."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_first_word"),
        F.regexp_extract("p_brand", r"(\d+)", 1).alias("brand_digits"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.rpad("p_brand", 12, ".").alias("brand_rpad"),
        F.translate("p_name", "aeiou", "AEIOU").alias("name_vowels_upper"),
        F.reverse("p_brand").alias("brand_reversed"),
        F.repeat(F.lit("-"), (F.col("p_size") % 5) + 1).alias("size_bar"),
    ).orderBy("p_partkey")


ORACLE: dict[str, str] = {
    "string_functions_extended": r"""
        SELECT p_partkey,
               regexp_extract(p_type, '^(\w+)', 1)           AS type_first_word,
               regexp_extract(p_brand, '(\d+)', 1)           AS brand_digits,
               lpad(CAST(p_partkey AS VARCHAR), 10, '0')     AS key_padded,
               rpad(p_brand, 12, '.')                        AS brand_rpad,
               translate(p_name, 'aeiou', 'AEIOU')           AS name_vowels_upper,
               reverse(p_brand)                              AS brand_reversed,
               repeat('-', p_size % 5 + 1)                   AS size_bar
        FROM part
        ORDER BY p_partkey
    """,
    "map_functions": """
        SELECT event_id, 'k' AS key, json_extract_string(props, '$.k') AS val
        FROM events
        UNION ALL
        SELECT event_id, 'type', event_type FROM events
        ORDER BY event_id, key
    """,
    "math_functions": f"""
        SELECT l_orderkey, l_linenumber,
               abs(l_extendedprice - 30000)              AS abs_centered,
               CAST(ceil(l_extendedprice) AS BIGINT)     AS price_ceil,
               CAST(floor(l_extendedprice) AS BIGINT)    AS price_floor,
               {_sql_fr('sqrt(l_extendedprice)', 6)}     AS price_sqrt,
               l_quantity * l_quantity                   AS qty_sq,
               l_orderkey % 7                            AS key_mod7,
               CAST(sign(l_discount - 0.05) AS DOUBLE)   AS disc_sign
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber
    """,
    "datetime_functions": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT)        AS y,
               CAST(month(o_orderdate) AS INT)       AS m,
               CAST(day(o_orderdate) AS INT)         AS dom,
               CAST(isodow(o_orderdate) - 1 AS INT)  AS wd_mon0,
               CAST(weekofyear(o_orderdate) AS INT)  AS iso_week,
               CAST(quarter(o_orderdate) AS INT)     AS q,
               strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')           AS due_date,
               CAST(date_diff('day', o_orderdate, DATE '1999-01-01') AS INT) AS days_to_1999,
               strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')     AS month_end
        FROM orders
        ORDER BY o_orderkey
    """,
    "array_functions": f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        SELECT vec_id,
               CAST(len(v) AS INT)                        AS dims,
               {_sql_fr('v[1]', 6)}                       AS first_dim,
               {_sql_fr('v[len(v)]', 6)}                  AS last_dim,
               {_sql_fr('list_max(v)', 6)}                AS max_val,
               {_sql_fr('list_min(v)', 6)}                AS min_val,
               {_sql_fr('list_sum(v[1:8])', 6)}           AS sum_first8,
               CAST(len(list_filter(v, x -> x > 0)) AS INT) AS n_positive
        FROM e
        ORDER BY vec_id
    """,
    "conditional_functions": """
        SELECT o_orderkey,
               CASE WHEN o_totalprice >= 100000 THEN 'large'
                    WHEN o_totalprice >= 30000 THEN 'medium'
                    ELSE 'small' END                          AS size_class,
               coalesce(nullif(o_orderstatus, 'O'), 'OPEN')   AS status_display,
               greatest(o_totalprice - 50000, 0.0)            AS excess_over_50k,
               least(o_totalprice, 10000.0)                   AS capped_10k,
               CAST(o_orderpriority = '1-URGENT' AS INT)      AS is_urgent
        FROM orders
        ORDER BY o_orderkey
    """,
}

QUERIES = {
    "map_functions": map_functions,
    "string_functions_extended": string_functions_extended,
    "math_functions": math_functions,
    "datetime_functions": datetime_functions,
    "array_functions": array_functions,
    "conditional_functions": conditional_functions,
}
