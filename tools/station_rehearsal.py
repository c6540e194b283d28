"""Station-fleet scale rehearsal (r8 verdict #5, carried to r11).

The multi-station silver contract (``ingest_feed_stations`` →
``partitionBy("station_id")``, pipeline/ingest.py) claims fleet-scale
shape: source fan-out grows with stations × shards, per-station reads
prune at the file listing, and the partitioned sink must not degenerate
into a small-files explosion (the classic failure: a shuffle before the
write spreads every station across every task, writing tasks × stations
tiny files). This makes the claim MEASURED: hold per-station volume
fixed (``--days`` of hourly observations), scale the station count
8×→64×, and record

- ingest wall time (feed scan → pivot → enrich → partitioned write),
  with the scaling exponent b in t ≈ a·N^b fitted on log-log points —
  b ≈ 1 is the honest ceiling (fleet size IS the workload), b < 1 means
  idle cores are still absorbing the growth;
- source partition fan-out (stations × date shards — the Python
  DataSource's unit of parallelism);
- silver files written, files per station-partition directory, and mean
  file size. Healthy: files/station == shards/station (each (station,
  shard) task writes exactly its own partition directory — no shuffle
  between source and sink). Degenerate: files/station ≈ task count.

Fixtures and sinks live in /tmp scratch; nothing under /root/testdata is
touched. Usage:

    python tools/station_rehearsal.py [--stations 8,16,32,64]
        [--days 60] [--shard-days 30] [--runs 2] [--cpus 16]

Prints a markdown table for NOTES.md plus one JSON line.
"""

from __future__ import annotations

import argparse
import datetime as dt
import glob
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FETCHED_AT = dt.datetime(2024, 3, 1, 12, 0, 0)
START = "2024-01-01"


def _end_date(days: int) -> str:
    d0 = dt.date.fromisoformat(START)
    return (d0 + dt.timedelta(days=days - 1)).isoformat()


def run_point(spark, n_stations: int, days: int, shard_days: int, runs: int):
    from weather_database_system_spark.pipeline.ingest import ingest_feed_stations
    from weather_database_system_spark.session import release_persisted
    from weather_database_system_spark.sources.observation_feed import (
        shard_ranges,
        write_feed_fixtures,
    )

    tmp = tempfile.mkdtemp(prefix=f"station_rehearsal_{n_stations}x_")
    payload_dir = os.path.join(tmp, "payloads")
    os.makedirs(payload_dir)
    # Distinct coordinates per station — station_id derivation is keyed on
    # them; 0.01-degree spacing keeps the printf-derived ids unique.
    stations = [
        {"latitude": round(35.0 + 0.01 * i, 2), "longitude": round(-120.0 - 0.01 * i, 2)}
        for i in range(n_stations)
    ]
    end = _end_date(days)
    n_shards = write_feed_fixtures(
        payload_dir, stations, START, end, shard_days=shard_days
    )

    times = []
    silver_path = None
    for r in range(runs):
        silver_path = os.path.join(tmp, f"silver_{r}")
        t0 = time.perf_counter()
        ingest_feed_stations(
            spark,
            stations,
            START,
            end,
            shard_days=shard_days,
            payload_dir=payload_dir,
            silver_path=silver_path,
            fetched_at=FETCHED_AT,
        )
        times.append(time.perf_counter() - t0)
        release_persisted()

    files = glob.glob(os.path.join(silver_path, "station_id=*", "*.parquet"))
    part_dirs = glob.glob(os.path.join(silver_path, "station_id=*"))
    total_bytes = sum(os.path.getsize(f) for f in files)
    rows = spark.read.parquet(silver_path).count()
    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "stations": n_stations,
        "feed_partitions": n_shards,
        "best_sec": round(min(times), 3),
        "runs_sec": [round(t, 3) for t in times],
        "rows": rows,
        "silver_files": len(files),
        "partition_dirs": len(part_dirs),
        "files_per_station": round(len(files) / max(1, len(part_dirs)), 2),
        "mean_file_kb": round(total_bytes / max(1, len(files)) / 1024, 1),
    }


def fit_exponent(points) -> float:
    xs = [math.log(p["stations"]) for p in points]
    ys = [math.log(p["best_sec"]) for p in points]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    return (n * sxy - sx * sy) / (n * sxx - sx * sx)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stations", default="8,16,32,64")
    ap.add_argument("--days", type=int, default=60)
    ap.add_argument("--shard-days", type=int, default=30)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "16"))
    args = ap.parse_args()

    from weather_database_system_spark.session import get_spark

    spark = get_spark(app_name="station-rehearsal", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    counts = [int(s) for s in args.stations.split(",")]
    # Warm the Python DataSource / Arrow worker pool on the smallest point
    # so point 1 doesn't carry the interpreter spin-up (bench.py's class).
    run_point(spark, counts[0], args.days, args.shard_days, 1)

    points = [
        run_point(spark, n, args.days, args.shard_days, args.runs)
        for n in counts
    ]
    b = fit_exponent(points)

    print(
        "| stations | feed parts | best (s) | rows | silver files | "
        "files/station | mean file KB |"
    )
    print("|---|---|---|---|---|---|---|")
    for p in points:
        print(
            f"| {p['stations']} | {p['feed_partitions']} | {p['best_sec']} "
            f"| {p['rows']} | {p['silver_files']} | {p['files_per_station']} "
            f"| {p['mean_file_kb']} |"
        )
    print(f"\nexponent b (t ~ N^b): {b:.2f}")
    print(json.dumps({"points": points, "exponent": round(b, 3)}))


if __name__ == "__main__":
    main()
