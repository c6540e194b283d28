"""Operators: the engine's query surface.

Each module exposes

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]`` — one
  entry per operator, runnable against a testdata scale-factor directory.
- ``ORACLE: dict[str, str]`` — the DuckDB-ANSI-SQL equivalent for each
  SQL-expressible query (omitted for genuinely non-relational ops, which the
  driver then checks rows-only).

Column names are aliased identically on both sides; doubles produced by
aggregation are rounded on both sides (sums → 2 dp, ratios/avgs → 4 dp,
similarities → 6 dp) so the order-insensitive value-hash is stable across
engines' float summation orders.
"""
