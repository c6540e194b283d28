"""Sources: readers for the engine's canonical inputs.

- ``star``: the TPC-H-ish star schema parquet tables (TESTDATA.md).
- ``weather_api``: the Open-Meteo-shaped payload source (synthetic generator
  + struct-of-arrays pivot), re-owning the reference's HTTP fetch stage
  (fetchStocktonWeather.js) as a Spark-native source.
"""
