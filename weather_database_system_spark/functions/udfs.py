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
  float accumulation can't bit-match a decimal oracle, so it is rows-only
  for the driver and tolerance-tested against the exact expression;
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


def udf_weighted_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF: quantity-weighted mean extended price per
    returnflag. Rows-only for the driver (float accumulation order);
    tolerance-tested against the exact decimal expression in pytest."""
    weighted_mean = F.pandas_udf(_weighted_mean, "double")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(weighted_mean("l_extendedprice", "l_quantity").alias("wmean_price"))
        .orderBy("l_returnflag")
    )


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
