#!/usr/bin/env python
"""Capture .explain("formatted") for registry queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [query ...]
       (no query args = the full 55-query bench HEADLINE set)

Writes plans/<tag>/<query>_<suffix>.txt ("before"/"after" via
WDSS_PLAN_SUFFIX, default "before"). Also emits a one-line summary per
query: #Exchange, join strategies, BatchEvalPython/ArrowEvalPython nodes,
so plan regressions can be diffed at a glance.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SUFFIX = os.environ.get("WDSS_PLAN_SUFFIX", "before")


def main() -> None:
    from weather_database_system_spark.session import (
        get_spark,
        release_persisted,
    )
    import __spark_entry__ as em
    import bench

    tag = sys.argv[1] if len(sys.argv) > 1 else "r18"
    names = sys.argv[2:] or list(bench.HEADLINE)

    spark = get_spark(
        app_name="wdss-plans",
        cpus=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
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

    here = os.path.dirname(os.path.abspath(__file__))
    outdir = os.path.join(here, "..", "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    for name in names:
        fn = queries[name]
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # iterative ops may need their build first
            plan = f"EXPLAIN FAILED: {exc}"
        finally:
            release_persisted()
        path = os.path.join(outdir, f"{name}_{SUFFIX}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(
            set(
                re.findall(
                    r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                    r"BroadcastNestedLoopJoin|CartesianProduct)\b",
                    plan,
                )
            )
        )
        py = sorted(
            set(
                re.findall(
                    r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|"
                    r"MapInArrow|FlatMapGroupsInPandas)\b",
                    plan,
                )
            )
        )
        print(
            f"{name}: Exchange={n_ex} joins={','.join(joins) or '-'} "
            f"python={','.join(py) or '-'}",
            flush=True,
        )


if __name__ == "__main__":
    main()
