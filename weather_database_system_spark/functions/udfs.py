"""The blessed extension points: Arrow-batched pandas UDFs and Python UDTFs
(SURVEY §2B "UDF/UDAF/UDTF" — absent from the reference, whose logic is all
plain JS functions).

Policy demonstrated here (and enforced in review): UDFs are the SLOW PATH.
Everything expressible with built-in column functions stays JVM-side; Python
appears only when the semantics genuinely need it (a pandas/numpy library, a
model, custom state). When it does appear it is ALWAYS vectorized —
``pandas_udf`` / ``mapInPandas`` over Arrow batches, never row-at-a-time
``F.udf`` (10-100× slower; see /opt/skills guidance and Spark docs).

Three tiers shown:

- scalar pandas_udf  — 1:1 column transform, deterministic, oracle-checked
  (the UDF computes what lower+regexp would — proving the Arrow path is
  semantically transparent, which is exactly what you verify before trusting
  a UDF in a 100 TB pipeline);
- grouped-agg pandas_udf — a numpy weighted mean per group (UDAF shape);
  float accumulation can't bit-match a decimal oracle, so the output
  carries the exact decimal yardstick plus a pinned |udaf − exact| claim
  the oracle asserts (hash-checked), with the raw closeness also
  tolerance-tested in pytest;
- Python UDTF — one row in, many rows out with per-row state (the TABLE
  function shape); rows-only + semantic tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_database_system_spark.sources.star import load_table

# NB: pandas_udf/udtf are applied lazily inside the query functions — the
# decorators parse their DDL return types through the active SparkSession,
# so module import must not require one (the driver imports this module
# before/without a session during registry assembly).


def _normalize_series(s: pd.Series) -> pd.Series:
    """Scalar pandas-UDF body: lowercase + whitespace collapse + trim,
    vectorized pandas string kernels over each Arrow batch."""
    return s.str.lower().str.replace(r"\s+", " ", regex=True).str.strip()


def _weighted_mean(v: pd.Series, w: pd.Series) -> float:
    """Grouped-aggregate pandas-UDF body (UDAF shape): quantity-weighted
    mean. numpy does the arithmetic; Spark handles grouping/shuffle/merge."""
    import numpy as np

    return float(np.average(v.to_numpy(), weights=w.to_numpy()))


class TokenizeUDTF:
    """Python UDTF: one document row → one row per token with position and
    a stopword flag. The lateral-join table-function shape (for custom
    exploders Spark lacks); eval is called once per input row."""

    STOP = {"the", "a", "and", "of", "to"}

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            yield i, tok, tok in self.STOP


def udf_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas-UDF pass over documents — oracle-checked: the UDF must
    agree with SQL lower()+regexp_replace()+trim() exactly."""
    normalize_text = F.pandas_udf(_normalize_series, "string")
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        normalize_text(F.concat(F.lit("  "), F.col("text"), F.lit("   "))).alias(
            "text_normalized"
        ),
    ).orderBy("doc_id")


# Pinned tolerance for the UDAF claim: float accumulation over ~10⁵ rows
# drifts ≤ ~1e-9 relative from the exact decimal mean; 1e-6 relative is a
# ≥100× margin that still catches any real UDAF defect (a wrong weight
# column or a dropped group is off by whole units).
WMEAN_REL_TOL = 1e-6


def udf_weighted_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF: quantity-weighted mean extended price per
    returnflag. The UDAF's float accumulation order can't bit-match a
    decimal oracle, so its raw value stays out of the output; instead the
    same aggregation ALSO computes the exact decimal weighted mean
    (sum(price·qty)/sum(qty) in DECIMAL — the engine-exact yardstick
    DuckDB replays) and ``udaf_close`` pins the claim
    |udaf − exact| ≤ WMEAN_REL_TOL·exact, so the pandas-UDAF path is
    hash-checked instead of rows-only (r7 verdict #5 pattern)."""
    weighted_mean = F.pandas_udf(_weighted_mean, "double")
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(30,10)"
    # Spark forbids mixing a grouped-agg pandas UDF with built-in
    # aggregates in ONE agg (INVALID_PANDAS_UDF_PLACEMENT), so the UDAF
    # keeps its own aggregation — the path under test, plan unchanged —
    # and the exact yardstick is a separate agg joined back on the 3-row
    # group key (the approx_distinct_users_scale bolt-on shape). The
    # yardstick divides two exact decimal SUMS each cast to double BEFORE
    # one IEEE divide: identical decimal values convert to identical
    # doubles in both engines, so the quotient is engine-exact
    # (decimal/decimal division scale rules differ between Spark and
    # DuckDB — never divide decimals cross-engine; the _avg4 recipe).
    udaf = li.groupBy("l_returnflag").agg(
        weighted_mean("l_extendedprice", "l_quantity").alias("wmean_udaf")
    )
    yard = li.groupBy("l_returnflag").agg(
        F.sum((F.col("l_extendedprice") * F.col("l_quantity")).cast(dec))
        .cast("double")
        .alias("wsum"),
        F.sum(F.col("l_quantity").cast(dec)).cast("double").alias("qsum"),
    )
    agg = udaf.join(F.broadcast(yard), "l_returnflag")
    from weather_database_system_spark.operators.relational import _fr

    exact = F.col("wsum") / F.col("qsum")
    close = F.abs(F.col("wmean_udaf") - exact) <= F.lit(WMEAN_REL_TOL) * F.abs(exact)
    return agg.select(
        "l_returnflag",
        _fr(exact, 4).alias("wmean_price"),
        close.cast("int").alias("udaf_close"),
    ).orderBy("l_returnflag")


def udf_tokenize_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF over a bounded sample of documents (LATERAL join shape):
    per-token rows with positions. Oracle-checked: the UDTF's split-on-
    single-space + stopword flag is deterministic and SQL-expressible, so
    DuckDB replays it with zipped unnest(string_split)/generate_series —
    proving the UDTF path, like the scalar pandas-UDF path, is semantically
    transparent."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register(
        "tokenize", F.udtf(TokenizeUDTF, returnType="pos int, token string, is_stopword boolean")
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token, t.is_stopword
        FROM udtf_docs d, LATERAL tokenize(d.text) t
        ORDER BY d.doc_id, t.pos
        """
    )


ORACLE: dict[str, str] = {
    "udf_normalize_text": r"""
        SELECT doc_id,
               trim(regexp_replace(lower('  ' || text || '   '), '\s+', ' ', 'g'))
                   AS text_normalized
        FROM documents
        ORDER BY doc_id
    """,
    # the UDAF query's output is the exact decimal yardstick plus the
    # pinned claim the Spark side computed; a UDAF straying past
    # WMEAN_REL_TOL emits 0 and hash-mismatches
    "udf_weighted_mean_price": """
        SELECT l_returnflag,
               floor(CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(30,10))) AS DOUBLE)
                     / CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE)
                     * 10000 + 0.5) / 10000 AS wmean_price,
               CAST(1 AS INT) AS udaf_close
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    # parallel unnests zip positionally in DuckDB, replaying the UDTF's
    # enumerate(text.split(' ')) exactly (split on a single space keeps
    # empty tokens, same as Python's str.split(' '))
    "udf_tokenize_table": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS token,
                   unnest(generate_series(0, len(string_split(text, ' ')) - 1))
                       AS pos
            FROM documents
            WHERE doc_id < 20 AND text IS NOT NULL
        )
        SELECT doc_id, CAST(pos AS INT) AS pos, token,
               token IN ('the', 'a', 'and', 'of', 'to') AS is_stopword
        FROM toks
        ORDER BY doc_id, pos
    """,
}

QUERIES = {
    "udf_normalize_text": udf_normalize_text,
    "udf_weighted_mean_price": udf_weighted_mean_price,
    "udf_tokenize_table": udf_tokenize_table,
}
