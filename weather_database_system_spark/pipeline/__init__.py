"""Weather-pipeline parity: the reference's four-stage pipeline
(fetch → Mongo raw/enriched → ClickHouse warehouse → Redis cache → API)
re-owned natively in Spark as bronze/silver/gold/cache Parquet zones
(SURVEY.md §1.3, §7)."""
