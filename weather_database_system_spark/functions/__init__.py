"""Scalar function surface (SURVEY §2B: string/date/math + array/map/JSON
families) — the built-in `pyspark.sql.functions` coverage a user of the
reference's SQL layer expects, demonstrated oracle-checked."""
