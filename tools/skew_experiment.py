"""Measured evidence for the salted skew join (ADVICE r12 #4 follow-up).

The salted_join/skew_split_join story so far is *provably safe* (row
identity pinned for any hot set) and *structurally bounded* (|hot| ≤ N/H).
This experiment makes the PERFORMANCE half measured instead of argued:
generate a fact whose hottest key owns a configurable share of all rows
(the "one city is 30 % of the feed" regime), force a shuffle join
(broadcast disabled — at 100 TB the dim does not broadcast), and time

- the PLAIN join+agg (the hot key's rows land on ONE reducer), vs
- salted_join driven by detect_hot_keys_cms (hot rows scatter over
  N_SALTS reducers),

identical outputs asserted before timing. Prints a markdown row per
hot-share point plus one JSON line for NOTES.md.

Operational guidance (measured, r13): amortize detection — a CMS pass
recomputed per query dominates at small volumes and makes salting a net
loss; with detection persisted/online, salting wins 1.3-1.5x on
local[32] at 30-50 % hot share and wins by construction at cluster
partition counts, where the plain join's wall-clock IS the hot reducer.

Usage: python tools/skew_experiment.py [--rows 3000000] [--keys 2000]
           [--shares 0.1,0.3,0.5] [--runs 3] [--shuffle-partitions N]

--shuffle-partitions decouples reducer count from cores (r13 VERDICT
task #4): local[32] with 32 partitions understates the salting win —
every reducer slot is busy anyway, so the hot reducer merely finishes
last among 32. At cluster-like counts (1024+) the plain join's
wall-clock converges to the ONE hot reducer while 1023 others idle;
salting scatters that key over N_SALTS reducers. Running this tool at
1024 partitions makes that claim measured instead of argued.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--keys", type=int, default=5_000)
    ap.add_argument("--shares", default="0.1,0.3,0.5")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument(
        "--shuffle-partitions",
        default=None,
        help="reducer count (default: --cpus); set 1024+ to emulate "
        "cluster-scale reducer fan-out on a local box",
    )
    ap.add_argument(
        "--scratch",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "spark-warehouse",
        ),
        help="parquet scratch dir (kept inside the repo by default)",
    )
    args = ap.parse_args()
    shuffle_parts = args.shuffle_partitions or args.cpus

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.scale import (
        detect_hot_keys_cms,
        salted_join,
    )

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        # force real shuffle joins: the 100 TB dim never broadcasts
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for share_s in args.shares.split(","):
        share = float(share_s)
        n_hot = int(args.rows * share)
        # key 0 owns `share` of the fact; the rest spread uniformly
        fact = spark.range(args.rows).select(
            F.when(F.col("id") < n_hot, F.lit(0))
            .otherwise(F.col("id") % (args.keys - 1) + 1)
            .alias("k"),
            F.col("id").alias("row_id"),
        )
        dim = spark.range(args.keys).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("attr")
        )
        fpath = os.path.join(args.scratch, f"skew_fact_{share_s}")
        dpath = os.path.join(args.scratch, f"skew_dim_{share_s}")
        fact.write.mode("overwrite").parquet(fpath)
        dim.write.mode("overwrite").parquet(dpath)
        fact = spark.read.parquet(fpath)
        dim = spark.read.parquet(dpath)

        # detection is persisted and materialized OUTSIDE the timing: in
        # production the hot set is amortized across many queries (or
        # maintained online from streaming CMS partials) — the experiment
        # times the JOIN strategies, not the detector
        hot = detect_hot_keys_cms(
            fact, "k", max(2, args.rows // args.keys * 4)
        ).persist()
        hot.count()

        def plain():
            return (
                fact.join(dim, "k")
                .groupBy("attr")
                .agg(F.count("*").alias("n"), F.sum("row_id").alias("s"))
            )

        def salted():
            return (
                salted_join(fact, dim, "k", hot, F.xxhash64("row_id"))
                .groupBy("attr")
                .agg(F.count("*").alias("n"), F.sum("row_id").alias("s"))
            )

        # identical output first (sum over all groups — order-free digest)
        dp = plain().agg(F.sum("n"), F.sum("s")).collect()[0]
        ds = salted().agg(F.sum("n"), F.sum("s")).collect()[0]
        assert tuple(dp) == tuple(ds), (dp, ds)

        def best_of(fn):
            best = float("inf")
            for _ in range(args.runs):
                t0 = time.monotonic()
                fn().write.format("noop").mode("overwrite").save()
                best = min(best, time.monotonic() - t0)
            return best

        def reducer_profile(join_df):
            """(max, median) rows per shuffle-output partition of the
            JOIN itself — the number that IS a real cluster's
            wall-clock. local[32] wave-scheduling hides the skew tail
            (32 cores absorb the other reducers' work between waves of
            the 1024 tasks), so at cluster-like partition counts the
            timing columns UNDERSTATE the win; the reducer row
            distribution is scheduling-independent: a 1024-executor
            cluster's plain-join tail ≈ max_rows × per-row cost while
            everything else finishes in one wave."""
            # AQE coalescing merges tiny shuffle partitions AND AQE
            # skew-join splitting carves up the hot partition (both ON in
            # the timed runs — the deployable config); disable both just
            # for the profile so partition ids reflect the REQUESTED
            # reducer fan-out, i.e. what 1024 distinct executors would
            # each get with no runtime re-plan. Leaving skew-join on
            # understated plain_max_reducer_rows — the very number the
            # docstring claims is scheduling-independent (ADVICE r14 #4).
            keys = (
                "spark.sql.adaptive.coalescePartitions.enabled",
                "spark.sql.adaptive.skewJoin.enabled",
            )
            old = {k: spark.conf.get(k, "true") for k in keys}
            for k in keys:
                spark.conf.set(k, "false")
            try:
                pc = (
                    join_df.select(F.spark_partition_id().alias("__p"))
                    .groupBy("__p")
                    .count()
                )
                row = pc.agg(
                    F.max("count").alias("mx"),
                    F.expr("percentile(count, 0.5)").alias("med"),
                ).collect()[0]
            finally:
                for k, v in old.items():
                    spark.conf.set(k, v)
            return int(row["mx"]), float(row["med"])

        tp, ts = best_of(plain), best_of(salted)
        pmax, pmed = reducer_profile(fact.join(dim, "k"))
        smax, smed = reducer_profile(
            salted_join(fact, dim, "k", hot, F.xxhash64("row_id"))
        )
        results[share_s] = {
            "plain_sec": round(tp, 2),
            "salted_sec": round(ts, 2),
            "speedup": round(tp / ts, 2),
            "plain_max_reducer_rows": pmax,
            "plain_median_reducer_rows": pmed,
            "salted_max_reducer_rows": smax,
            "salted_median_reducer_rows": smed,
            "tail_reduction": round(pmax / max(1, smax), 1),
        }
        hot.unpersist()

    print(
        "| hot share | plain (s) | salted (s) | speedup | plain max/med "
        "reducer rows | salted max/med | tail reduction |"
    )
    print("|---|---|---|---|---|---|---|")
    for s, r in results.items():
        print(
            f"| {s} | {r['plain_sec']} | {r['salted_sec']} | {r['speedup']}× "
            f"| {r['plain_max_reducer_rows']}/{int(r['plain_median_reducer_rows'])} "
            f"| {r['salted_max_reducer_rows']}/{int(r['salted_median_reducer_rows'])} "
            f"| {r['tail_reduction']}× |"
        )
    print(json.dumps({"skew_experiment": {
        "rows": args.rows, "keys": args.keys, "cpus": args.cpus,
        "shuffle_partitions": int(shuffle_parts),
        "results": results,
    }}))


if __name__ == "__main__":
    main()
