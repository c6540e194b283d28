"""Semantic tests for the pandas-UDF / UDTF extension points: the Python
paths must agree with their exact JVM-side twins (tolerance where float
accumulation forbids bit-equality)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_SMOKE


def test_grouped_agg_udf_matches_exact_expression(spark):
    """The emitted wmean_price is the exact decimal yardstick (checked
    against an independent float recompute) and every pinned udaf_close
    claim holds — i.e. the raw pandas-UDAF value stayed within
    WMEAN_REL_TOL of exact."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.functions.udfs import udf_weighted_mean_price
    from weather_database_system_spark.sources.star import load_table

    rows = udf_weighted_mean_price(spark, SF_SMOKE).collect()
    got = {r.l_returnflag: r.wmean_price for r in rows}
    assert rows and all(r.udaf_close == 1 for r in rows)

    li = load_table(spark, SF_SMOKE, "lineitem")
    exact = {
        r["l_returnflag"]: r["wm"]
        for r in li.groupBy("l_returnflag")
        .agg(
            (
                F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                / F.sum("l_quantity")
            ).alias("wm")
        )
        .collect()
    }
    assert got.keys() == exact.keys()
    for k in got:
        assert abs(got[k] - exact[k]) < 1e-4 + 1e-6 * abs(exact[k])


def test_udtf_tokenizes_with_positions_and_stopwords(spark):
    from weather_database_system_spark.functions.udfs import udf_tokenize_table
    from weather_database_system_spark.sources.star import load_table

    stop = {"the", "a", "and", "of", "to"}  # the @udtf wrapper hides .STOP

    rows = udf_tokenize_table(spark, SF_SMOKE).collect()
    assert rows
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, SF_SMOKE, "documents").filter("doc_id < 20").collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc.keys() == texts.keys()
    for doc_id, text in texts.items():
        toks = text.split(" ")
        got = sorted(by_doc[doc_id], key=lambda r: r.pos)
        assert [r.token for r in got] == toks
        assert [r.pos for r in got] == list(range(len(toks)))
        assert all(r.is_stopword == (r.token in stop) for r in got)


def test_scalar_pandas_udf_is_arrow_vectorized(spark):
    """The scalar UDF must plan as ArrowEvalPython (vectorized batches), not
    BatchEvalPython (row-at-a-time pickling) — the 10-100× policy line."""
    from weather_database_system_spark.functions.udfs import udf_normalize_text
    from weather_database_system_spark.plans import formatted_plan

    plan = formatted_plan(udf_normalize_text(spark, SF_SMOKE))
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_udtf_tokenizer_null_and_empty_text_parity(spark, tmp_path):
    """NULL-text docs must vanish identically in both engines (the UDTF
    yields nothing for None; the oracle filters IS NOT NULL), and an
    empty string must yield exactly ONE empty token in both (Python
    ''.split(' ') == [''], DuckDB string_split('', ' ') == [''])."""
    import duckdb

    import __spark_entry__ as em
    from tests.oracle import compare

    rows = [
        (0, None, "en", "src0", 0),
        (1, "", "en", "src0", 0),
        (2, "the quick fox", "en", "src0", 13),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    df = em.queries()["udf_tokenize_table"](spark, str(tmp_path))
    got = df.collect()
    assert {r.doc_id for r in got} == {1, 2}  # NULL-text doc gone
    assert [(r.pos, r.token) for r in got if r.doc_id == 1] == [(0, "")]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    compare(df, con, em.oracle_sql()["udf_tokenize_table"], name="udtf_nulls")
