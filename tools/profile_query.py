#!/usr/bin/env python
"""Per-job / per-stage profile of registry queries (guide §1: measure first).

Runs each named query once warm (after the bench's standard warm-up) with the
Spark UI enabled, then reads the UI REST API (/api/v1) to attribute
wall-clock to the individual jobs a query submits — driver collects, persist
materializations, the final noop action — and per-stage executor time /
shuffle bytes. This is the measurement layer bench.py cannot give: bench
times the whole query; this tool says WHICH job inside it is slow.

Usage: python tools/profile_query.py semdedup_prune ann_product_quantization
       (no args = the 12-query QUICK sentinel set)

Output: JSON lines per query: total wall, per-job rows (desc, duration,
stages), per-stage (runtime, shuffle read/write, tasks).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
UI_PORT = int(os.environ.get("WDSS_PROFILE_UI_PORT", "4049"))


def _api(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as resp:
        return json.loads(resp.read().decode())


def main() -> None:
    from weather_database_system_spark.session import (
        get_spark,
        release_persisted,
    )
    import __spark_entry__ as em

    spark = get_spark(
        app_name="wdss-profile",
        cpus=CPUS,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = dict(em.queries())
    from weather_database_system_spark.operators.dedup import (
        dedup_clusters_fast,
        dedup_minhash_lsh_fast,
    )
    from weather_database_system_spark.operators.similarity import (
        ann_product_quantization,
    )

    queries["dedup_minhash_lsh_fast"] = dedup_minhash_lsh_fast
    queries["dedup_clusters_fast"] = dedup_clusters_fast
    queries["ann_product_quantization"] = ann_product_quantization

    names = sys.argv[1:]
    if not names:
        names = [
            "pricing_summary", "topk_global", "join_star_revenue",
            "window_running_sum", "dedup_clusters_fast", "semdedup_prune",
            "ann_product_quantization", "tfidf_cosine_pairs",
            "feed_daily_rollup", "stream_session_window",
            "sole_return_supplier", "heavy_hitters_cms",
        ]

    # bench-identical warm-up
    queries["pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(2).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    queries["feed_daily_rollup"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    release_persisted()

    app_id = spark.sparkContext.applicationId
    out = []
    for name in names:
        fn = queries[name]
        # one cold pass so the profiled pass is the warm (headline) number
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        release_persisted()
        jobs_before = {j["jobId"] for j in _api(f"applications/{app_id}/jobs")}
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        warm = time.perf_counter() - t0
        release_persisted()
        jobs = [
            j
            for j in _api(f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        jobs.sort(key=lambda j: j["jobId"])
        job_rows = []
        for j in jobs:
            sub = j.get("submissionTime", "")
            comp = j.get("completionTime", "")
            dur = None
            try:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                dur = (
                    datetime.strptime(comp, fmt) - datetime.strptime(sub, fmt)
                ).total_seconds()
            except Exception:
                pass
            job_rows.append(
                {
                    "job": j["jobId"],
                    "dur_s": round(dur, 3) if dur is not None else None,
                    "stages": j.get("stageIds", []),
                    "tasks": j.get("numTasks"),
                    "desc": (j.get("description") or j.get("name", ""))[:100],
                }
            )
        stages = _api(f"applications/{app_id}/stages?status=complete")
        stage_ids = {s for j in jobs for s in j.get("stageIds", [])}
        stage_rows = [
            {
                "stage": s["stageId"],
                "run_ms": s.get("executorRunTime"),
                "cpu_ms": (s.get("executorCpuTime") or 0) // 1_000_000,
                "tasks": s.get("numCompleteTasks"),
                "sh_read_mb": round((s.get("shuffleReadBytes") or 0) / 1e6, 2),
                "sh_write_mb": round((s.get("shuffleWriteBytes") or 0) / 1e6, 2),
                "in_mb": round((s.get("inputBytes") or 0) / 1e6, 2),
                "name": s.get("name", "")[:60],
            }
            for s in stages
            if s["stageId"] in stage_ids
        ]
        stage_rows.sort(key=lambda r: -(r["run_ms"] or 0))
        rec = {
            "query": name,
            "cold_s": round(cold, 3),
            "warm_s": round(warm, 3),
            "n_jobs": len(jobs),
            "jobs": job_rows,
            "top_stages": stage_rows[:12],
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "..", "PROFILE_LOCAL.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
