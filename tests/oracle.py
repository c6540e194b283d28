"""Local replica of the driver's DuckDB-oracle comparison.

Canonicalizes both result sets (column order by name, rows sorted, cells
stringified with fixed float formatting) and asserts exact equality — a
stricter check than any order-insensitive value-hash, so passing here implies
passing the driver gate for the same data.
"""

from __future__ import annotations

import math
import os

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def register_duck_views(con, sf_dir: str) -> None:
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")


def _cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return f"{v:.6f}"
    if hasattr(v, "isoformat"):  # date / datetime / pd.Timestamp
        s = v.isoformat()
        return s[:-3] if s.endswith(".000") else s
    return str(v)


def canonicalize(pdf) -> list[tuple[str, ...]]:
    import pandas as pd

    pdf = pdf[sorted(pdf.columns)]
    rows = []
    for row in pdf.itertuples(index=False):
        rows.append(tuple(_cell(None if (isinstance(v, float) and math.isnan(v)) or v is pd.NaT else v) for v in row))
    rows.sort()
    return rows


def compare(spark_df, con, sql: str, name: str = "?") -> None:
    spark_pdf = spark_df.toPandas()
    duck_pdf = con.execute(sql).df()

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    s_rows = canonicalize(spark_pdf)
    d_rows = canonicalize(duck_pdf)
    if s_rows != d_rows:
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (spark, duck): {diffs}"
        )
