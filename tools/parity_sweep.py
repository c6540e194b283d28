"""Full-registry oracle parity sweep at an arbitrary SF (driver-gate twin).

The driver's CORRECTNESS gate replays queries() vs oracle_sql() at sf0.01;
this tool runs the identical comparison at any SF dir (default sf0.1) so
pinned-claim tolerances and engine-exact paths can be re-validated at 10×
the gated volume. Prints one line per query and a FAILURES summary.

Usage: python tools/parity_sweep.py [--sf-dir /root/testdata/sf0.1]
           [--start 0] [--count 999] [--cpus 16] [--names a,b,c]

--start/--count slice the sorted query list so long sweeps can run in
resumable chunks; --names restricts to an explicit comma-separated list
(for spot-checking newly added queries at several SFs).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--count", type=int, default=10_000)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "16"))
    ap.add_argument("--names", default="")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as em
    from tests.oracle import canonicalize, register_duck_views
    from weather_database_system_spark.session import (
        get_spark,
        release_persisted,
    )

    spark = get_spark(app_name="parity-sweep", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    register_duck_views(con, args.sf_dir)
    Q, O = em.queries(), em.oracle_sql()
    names = sorted(Q)[args.start : args.start + args.count]
    if args.names:
        wanted = {n.strip() for n in args.names.split(",") if n.strip()}
        unknown = wanted - set(Q)
        if unknown:
            raise SystemExit(f"unknown query names: {sorted(unknown)}")
        names = [n for n in sorted(Q) if n in wanted]
    fails = []
    for name in names:
        t0 = time.perf_counter()
        try:
            spdf = Q[name](spark, args.sf_dir).toPandas()
            if name not in O:
                print(f"{name}: rows-only ({len(spdf)})", flush=True)
                continue
            dpdf = con.execute(O[name]).df()
            ok = (
                sorted(spdf.columns) == sorted(dpdf.columns)
                and len(spdf) == len(dpdf)
                and canonicalize(spdf) == canonicalize(dpdf)
            )
        except Exception as exc:  # noqa: BLE001 — sweep must report, not die
            ok = False
            print(f"{name}: ERROR {exc}", flush=True)
        finally:
            release_persisted()
        if not ok:
            fails.append(name)
        print(
            f"{name}: {'OK' if ok else 'MISMATCH'} "
            f"({time.perf_counter() - t0:.1f}s)",
            flush=True,
        )
    print("FAILURES:", fails or "none", flush=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
