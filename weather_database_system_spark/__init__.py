"""weather_database_system_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline ``iDarshanaPatil/Weather-Database-System``
(a MongoDB → ClickHouse → Redis → Express weather-data pipeline; see SURVEY.md),
plus the large-scale training-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal columns).

Design stance (SURVEY.md §7):
- DataFrame / SQL API first; Catalyst owns optimization.
- Parquet is the canonical store; zones bronze/silver/gold/cache.
- UDFs only where built-ins genuinely can't express the semantics, and then
  Arrow-batched (pandas_udf / applyInPandas / mapInPandas), never per-row.
- Every operator designed for a 1000-executor / 100 TB deployment even though
  tests run on local[32]: broadcast small dims, partition-prune on date keys,
  avoid driver-side collects, keep plans inside whole-stage codegen.
"""

from weather_database_system_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
