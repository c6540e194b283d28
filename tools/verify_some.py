"""Replay a NAMED SUBSET of registry queries vs their DuckDB oracles —
the per-change correctness gate for optimization rounds (the full
tools/verify_replay.py sweep takes ~11 min for 228 queries; a touched
operator usually needs only its family re-proven before the full sweep
at round close). Same vanilla session, same canonicalize compare, same
FAILURES contract as verify_replay.

Usage: python tools/verify_some.py json_extract_props pricing_summary
       python tools/verify_some.py --sf /root/testdata/sf0.001 <names...>
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as em
    from tests.oracle import canonicalize, register_duck_views

    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    register_duck_views(con, args.sf)
    queries, oracles = em.queries(), em.oracle_sql()
    from weather_database_system_spark.session import release_persisted

    fails = []
    for name in args.names:
        if name not in queries:
            print(f"{name}: NOT IN REGISTRY")
            fails.append(name)
            continue
        spdf = queries[name](spark, args.sf).toPandas()
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
    sys.exit(main())
