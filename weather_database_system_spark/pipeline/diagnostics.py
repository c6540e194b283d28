"""Staged diagnostics: the reference's 5-step runtime self-probe
(SURVEY §2A ops #24-27, §5), engine-native.

- op #24  health probe (SELECT 1)        backend/routes/diagnostics.js:14-26
- op #25  catalog introspection          backend/routes/diagnostics.js:28-78
- op #26  count aggregate                backend/routes/diagnostics.js:80-100
- op #27  filter + LIMIT sample          backend/routes/diagnostics.js:102-121

Each step yields {step, status: success|warning|error, detail, remediation?}
and later steps are skipped once a prerequisite fails — the same staged
short-circuit the reference implements with sequential awaits.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from weather_database_system_spark.pipeline.warehouse import monthly_path


def run_diagnostics(
    spark: SparkSession,
    warehouse_root: str,
    *,
    sample_city: str = "Stockton",
) -> list[dict[str, Any]]:
    steps: list[dict[str, Any]] = []

    # Step 1 — op #24: session liveness (≙ SELECT 1 over the connection).
    try:
        assert spark.sql("SELECT 1 AS ok").collect()[0]["ok"] == 1
        steps.append({"step": "connectivity", "status": "success", "detail": "SparkSession live"})
    except Exception as exc:  # noqa: BLE001
        steps.append(
            {
                "step": "connectivity",
                "status": "error",
                "detail": str(exc),
                "remediation": "restart the SparkSession",
            }
        )
        return steps

    # Step 2 — op #25: warehouse root exists (≙ system.databases probe).
    if not os.path.isdir(warehouse_root):
        steps.append(
            {
                "step": "database_exists",
                "status": "error",
                "detail": f"warehouse root {warehouse_root} missing",
                "remediation": "run the ETL first: pipeline.warehouse.run_etl(...)",
            }
        )
        return steps
    steps.append({"step": "database_exists", "status": "success", "detail": warehouse_root})

    # Step 3 — op #25: monthly_agg exists (≙ system.tables probe).
    mpath = monthly_path(warehouse_root)
    if not os.path.isdir(mpath):
        steps.append(
            {
                "step": "table_exists",
                "status": "error",
                "detail": f"{mpath} missing",
                "remediation": "run pipeline.warehouse.build_monthly_agg(...)",
            }
        )
        return steps
    steps.append({"step": "table_exists", "status": "success", "detail": mpath})

    # Step 4 — op #26: row count > 0.
    from weather_database_system_spark.pipeline.warehouse import read_monthly

    monthly = read_monthly(spark, warehouse_root)
    n = monthly.count()
    if n == 0:
        steps.append(
            {
                "step": "row_count",
                "status": "warning",
                "detail": "monthly_agg is empty",
                "remediation": "load daily data, then rebuild the aggregate",
            }
        )
        return steps
    steps.append({"step": "row_count", "status": "success", "detail": f"{n} rows"})

    # Step 5 — op #27: sample query returns a row for the serving city.
    sample = monthly.filter(F.col("city") == sample_city).limit(1).collect()
    if not sample:
        steps.append(
            {
                "step": "sample_query",
                "status": "warning",
                "detail": f"no rows for city={sample_city!r}",
                "remediation": "check the city parameter or ingest that city",
            }
        )
    else:
        steps.append(
            {
                "step": "sample_query",
                "status": "success",
                "detail": f"city={sample_city!r} month={sample[0]['month']}",
            }
        )
    return steps
