"""Replay the driver's correctness gate locally: every registry query vs
its DuckDB oracle at sf0.01 on a vanilla session (the same side-by-side
compare the per-round driver runs). Prints per-query status and a
final FAILURES line; exit code 1 on any mismatch.

Usage: python tools/verify_replay.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as em
    from tests.oracle import canonicalize, register_duck_views

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("entry rows:", len(em.entry(spark).collect()))
    con = duckdb.connect()
    register_duck_views(con, sf_dir)
    queries, oracles = em.queries(), em.oracle_sql()
    from weather_database_system_spark.session import release_persisted

    fails = []
    for name in sorted(queries):
        spdf = queries[name](spark, sf_dir).toPandas()
        # the engine's persisted-intermediate contract: the sweep owner
        # releases between queries, else 200+ queries' cached blocks
        # accumulate in the vanilla session's default driver heap (a
        # full-registry replay OOM'd at ~quarter depth without this; the
        # driver's own 50-query gate never reaches that depth)
        release_persisted()
        if name not in oracles:
            print(f"{name}: rows-only ({len(spdf)})")
            continue
        dpdf = con.execute(oracles[name]).df()
        ok = (
            sorted(spdf.columns) == sorted(dpdf.columns)
            and len(spdf) == len(dpdf)
            and canonicalize(spdf) == canonicalize(dpdf)
        )
        if not ok:
            fails.append(name)
        print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(spdf)} rows)")
    print("FAILURES:", fails or "none")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
