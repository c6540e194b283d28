"""Physical-plan introspection: assert the plan properties (pushdown,
pruning, broadcast, partial aggregation, shuffle count) that make a query
scale — SURVEY §4's "built-in" table, made checkable."""

from weather_database_system_spark.plans.inspect import (  # noqa: F401
    broadcast_join_count,
    formatted_plan,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
    wholestage_codegen_count,
)
