"""Geospatial operators over the star schema — the grid-blocked spatial
join family a weather engine needs (nearest station, density maps), built
the scale-honest way Spark lacks natively.

The reference stores one city's observations (BASELINE.json); a fleet
deployment asks "which station is nearest to this sensor/customer, within
radius R" — a join Spark has no operator for. The naive form is a cross
join + argmin (O(n·m)); the scale form is GRID BLOCKING: hash every point
to an R-sized cell, replicate the SMALLER side into its 3×3 cell
neighborhood (a constant ×9, the spatial analog of the salted join's dim
replication), equi-join on the cell, and keep pairs within R. The cover
guarantee is geometric, not statistical: any point within euclidean R of
a query point differs by ≤ R per axis, so it lies in the 3×3 neighborhood
of the query's cell — the blocking can never miss a true neighbor
(pytest-pinned against a brute-force cross join).

Coordinates are synthetic — the star schema has no lat/lon — derived
from integer keys by pure arithmetic replayed identically in the DuckDB
oracle (the pseudo-partsupp precedent: the hash check proves the JOIN
REWRITE, not the derivation). Distances stay in exact integer space
(squared milli-degree units) — no floating trig, no cross-engine drift;
a production haversine swaps into the same plan shape.

At 100 TB: both sides shuffle once on the cell key (uniform by
construction at realistic point densities — a hot cell is a dense city,
the salted-join remedy composes), the ×9 replication rides the small
side, and the argmin is one window over matched pairs, never a global
sort. Density skew is VISIBLE via station_density_grid (the occupancy
rollup below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from weather_database_system_spark.sources.star import load_table

# Synthetic coordinate derivation (deterministic, overflow-safe: keys are
# ≤ ~2e5 at every SF, multipliers keep products far inside int64).
LAT_SPAN, LON_SPAN = 180_000, 360_000   # milli-degree grid extents
CUST_LAT_MUL, CUST_LON_MUL = 48_271, 69_621
SUPP_LAT_MUL, SUPP_LON_MUL = 16_807, 39_916_801 % 100_000
RADIUS = 9_000                          # milli-degrees; also the cell size


def _cust_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    return c.select(
        "c_custkey",
        F.pmod(F.col("c_custkey") * CUST_LAT_MUL, F.lit(LAT_SPAN)).alias("lat"),
        F.pmod(F.col("c_custkey") * CUST_LON_MUL, F.lit(LON_SPAN)).alias("lon"),
    )


def _station_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    return s.select(
        "s_suppkey",
        F.pmod(F.col("s_suppkey") * SUPP_LAT_MUL, F.lit(LAT_SPAN)).alias("slat"),
        F.pmod(F.col("s_suppkey") * SUPP_LON_MUL, F.lit(LON_SPAN)).alias("slon"),
    )


def nearest_station_within_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every customer point, the nearest station (supplier) within
    euclidean RADIUS, via the 3×3 grid-blocked join described in the
    module docstring; customers with no station inside R are absent
    (inner semantics — identical in the oracle). Argmin tie-break:
    (dist2, s_suppkey) — a total order in exact integers.

    Oracle: the UNREWRITTEN brute-force form — cross join, distance
    filter, per-customer row_number — proving the blocked join finds
    exactly the same nearest stations."""
    return _blocked_nearest(
        _cust_points(spark, sf_dir),
        _station_points(spark, sf_dir),
        RADIUS,
    ).orderBy("c_custkey")


def detect_hot_cells(
    points: DataFrame, radius: int, min_count: int
) -> DataFrame:
    """Hot spatial cells by fact-side occupancy — the spatial instance
    of the hot-key detector: cells whose point count reaches
    ``min_count``, keyed by the PACKED cell string ``salted_join``
    consumes. Same safety contract as every hot-key set fed to
    salted_join: wrong/approximate detection costs balance, never rows.
    ``points`` must carry (lat, lon). One map-side-combined aggregate on
    the bounded cell key; at 100 TB this is the density-grid rollup the
    dashboard already computes, reused as the skew detector."""
    return (
        points.groupBy(
            F.concat_ws(
                ",",
                F.floor(F.col("lat") / radius),
                F.floor(F.col("lon") / radius),
            ).alias("__cell")
        )
        .count()
        .filter(F.col("count") >= min_count)
        .select("__cell")
    )


def _blocked_nearest(
    cust: DataFrame,
    st: DataFrame,
    radius: int,
    hot_cells: DataFrame | None = None,
) -> DataFrame:
    """Library body of the grid-blocked nearest join over any
    (c_custkey, lat, lon) / (s_suppkey, slat, slon) integer-point
    frames. Boundary semantics pytest-pinned: inclusive at dist² = R²,
    diagonal-at-(R,R) excluded, cell-edge points covered, equidistant
    ties broken by s_suppkey.

    ``hot_cells`` (optional, a __cell-keyed frame from
    ``detect_hot_cells``): routes the cell equi-join through
    ``salted_join`` so a dense city's cell scatters over N_SALTS
    reducers — the composition the module docstring promises, pinned
    row-identical to the plain path in tests/test_plans.py. None (the
    registry default) keeps the plain two-column cell join."""
    cust = cust.select(
        "*",
        F.floor(F.col("lat") / radius).alias("cx"),
        F.floor(F.col("lon") / radius).alias("cy"),
    )
    # replicate the SMALL side (stations) into the 3×3 neighborhood
    st = st.select(
        "*",
        F.explode(
            F.expr(
                "flatten(transform(sequence(-1, 1), dx -> "
                "transform(sequence(-1, 1), dy -> struct(dx, dy))))"
            )
        ).alias("o"),
    ).select(
        "s_suppkey", "slat", "slon",
        (F.floor(F.col("slat") / radius) + F.col("o.dx")).alias("cx"),
        (F.floor(F.col("slon") / radius) + F.col("o.dy")).alias("cy"),
    )
    if hot_cells is None:
        joined = cust.join(st, ["cx", "cy"])
    else:
        from weather_database_system_spark.operators.scale import salted_join

        def packed(df: DataFrame) -> DataFrame:
            return df.withColumn(
                "__cell", F.concat_ws(",", "cx", "cy")
            ).drop("cx", "cy")

        # fact side = customers (the dense-city side); salt scatters a
        # hot cell's customers, station replicas multiply only for the
        # hot cells — identical rows to the plain join by salted_join's
        # identity guarantee
        joined = salted_join(
            packed(cust), packed(st), "__cell", hot_cells,
            F.xxhash64("c_custkey"),
        ).drop("__cell")
    d2 = (
        (F.col("lat") - F.col("slat")) * (F.col("lat") - F.col("slat"))
        + (F.col("lon") - F.col("slon")) * (F.col("lon") - F.col("slon"))
    )
    pairs = (
        joined
        .select("c_custkey", "s_suppkey", d2.alias("dist2"))
        .filter(F.col("dist2") <= radius * radius)
    )
    w = W.partitionBy("c_custkey").orderBy("dist2", "s_suppkey")
    return (
        pairs.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "s_suppkey", "dist2")
    )


HOT_CELL_MIN = 4  # cells with ≥4 customers get salted (test-SF-tuned)


def nearest_station_salted_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked registry form of the SALTED spatial composition
    (r14 VERDICT task #3, following the ``salted_join_cms_checked``
    pattern at scale.py): the same nearest-station-within-R question,
    but with hot cells detected by ``detect_hot_cells`` (occupancy ≥
    HOT_CELL_MIN) routing the cell equi-join through ``salted_join`` —
    a dense city's cell scatters over N_SALTS reducers instead of
    melting one. The output spine IS the existing nearest-station
    result computed FROM the salted join's rows, plus the engine-decided
    claim ``salted_identity_ok`` = the salted result's row set equals
    the plain blocked join's (anti-joined both ways — rows are unique
    per c_custkey, so set equality is row identity). The oracle is the
    same UNREWRITTEN brute-force cross join + argmin with the claim
    pinned TRUE, so a hash match proves BOTH rewrites (grid blocking AND
    salting) lose nothing, end-to-end. The identity audit is a
    test-SF-only yardstick (a second blocked join + two anti-joins); a
    100 TB pass runs the salted path bare — ``salted_join``'s identity
    guarantee holds for ANY detector output, pytest-pinned."""
    from weather_database_system_spark.session import track_persisted

    cust = _cust_points(spark, sf_dir)
    st = _station_points(spark, sf_dir)
    hot = detect_hot_cells(cust, RADIUS, HOT_CELL_MIN)
    salted = track_persisted(
        _blocked_nearest(cust, st, RADIUS, hot_cells=hot).persist()
    )
    plain = _blocked_nearest(cust, st, RADIUS)
    on = ["c_custkey", "s_suppkey", "dist2"]
    a_po = plain.join(salted, on, "left_anti").agg(
        F.count("*").alias("n_only_plain")
    )
    a_so = salted.join(plain, on, "left_anti").agg(
        F.count("*").alias("n_only_salted")
    )
    claims = a_po.crossJoin(F.broadcast(a_so)).select(
        ((F.col("n_only_plain") == 0) & (F.col("n_only_salted") == 0))
        .cast("int")
        .alias("salted_identity_ok")
    )
    return (
        salted.crossJoin(F.broadcast(claims))
        .select("c_custkey", "s_suppkey", "dist2", "salted_identity_ok")
        .orderBy("c_custkey")
    )


def station_density_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-occupancy rollup over the station grid: points per cell plus
    the cell's bounding extents — the density map that (a) feeds
    dashboards and (b) makes spatial skew VISIBLE before it melts a
    reducer (a hot cell here is the hot key the salted join remedies).
    One scan, one map-side-combined aggregate on the cell key.

    PRECONDITION (r13 VERDICT task #7): coordinates must be NON-NEGATIVE
    — guaranteed here by the ``pmod`` construction in _station_points.
    The oracle's ``slat // RADIUS`` and Spark's ``floor(slat / RADIUS)``
    agree only on non-negative operands; DuckDB's ``//`` truncates
    toward zero on negatives in some versions while floor rounds down,
    so a signed-coordinate extension MUST switch the oracle to
    ``floor(slat / RADIUS)`` explicitly. Self-enforced below: a negative
    coordinate fails the query rather than silently diverging. The
    assert is threaded through the USED slat expression — an assert in
    its own dropped column gets column-pruned by Catalyst and never
    evaluates (found by probing the first version of this guard; pytest
    pins that this one actually fires on a negative coordinate)."""
    return _density_grid(_station_points(spark, sf_dir))


def _density_grid(points: DataFrame) -> DataFrame:
    """Library body of the density rollup over any (slat, slon) frame,
    with the non-negativity guard fused into the consumed slat column."""
    nonneg = F.assert_true(
        (F.col("slat") >= 0) & (F.col("slon") >= 0),
        F.lit(
            "station_density_grid: negative coordinate — the // vs "
            "floor(/) oracle equivalence only holds for non-negative "
            "values; update the oracle before extending the domain"
        ),
    )
    st = points.select(
        # assert_true yields NULL on success, so this IS slat — with the
        # guard un-prunably fused into a column the aggregate consumes
        F.when(nonneg.isNull(), F.col("slat")).alias("slat"),
        "slon",
    )
    return (
        st.groupBy(
            F.floor(F.col("slat") / RADIUS).alias("cx"),
            F.floor(F.col("slon") / RADIUS).alias("cy"),
        )
        .agg(
            F.count("*").alias("n_stations"),
            F.min("slat").alias("lat_min"),
            F.max("slat").alias("lat_max"),
            F.min("slon").alias("lon_min"),
            F.max("slon").alias("lon_max"),
        )
        .orderBy("cx", "cy")
    )


_SQL_CUST = f"""
    SELECT c_custkey,
           (c_custkey * {CUST_LAT_MUL}) % {LAT_SPAN} AS lat,
           (c_custkey * {CUST_LON_MUL}) % {LON_SPAN} AS lon
    FROM customer
"""
_SQL_ST = f"""
    SELECT s_suppkey,
           (s_suppkey * {SUPP_LAT_MUL}) % {LAT_SPAN} AS slat,
           (s_suppkey * {SUPP_LON_MUL}) % {LON_SPAN} AS slon
    FROM supplier
"""

ORACLE: dict[str, str] = {
    # the UNREWRITTEN brute-force nearest-neighbor: cross join + distance
    # filter + per-customer argmin — matching it proves the 3×3
    # grid-blocked equi-join misses no true neighbor
    "nearest_station_within_radius": f"""
        WITH c AS ({_SQL_CUST}), s AS ({_SQL_ST}),
        pairs AS (
            SELECT c_custkey, s_suppkey,
                   (lat - slat) * (lat - slat)
                   + (lon - slon) * (lon - slon) AS dist2
            FROM c, s
            WHERE (lat - slat) * (lat - slat)
                  + (lon - slon) * (lon - slon) <= {RADIUS * RADIUS}
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY c_custkey ORDER BY dist2, s_suppkey) AS rn
            FROM pairs
        )
        SELECT c_custkey, s_suppkey, dist2
        FROM ranked WHERE rn = 1
        ORDER BY c_custkey
    """,
    # same brute-force replay as nearest_station_within_radius; the
    # engine-decided identity claim (salted rows ≡ plain rows) is pinned
    # TRUE — a hash match proves grid blocking AND salting lose nothing
    "nearest_station_salted_checked": f"""
        WITH c AS ({_SQL_CUST}), s AS ({_SQL_ST}),
        pairs AS (
            SELECT c_custkey, s_suppkey,
                   (lat - slat) * (lat - slat)
                   + (lon - slon) * (lon - slon) AS dist2
            FROM c, s
            WHERE (lat - slat) * (lat - slat)
                  + (lon - slon) * (lon - slon) <= {RADIUS * RADIUS}
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY c_custkey ORDER BY dist2, s_suppkey) AS rn
            FROM pairs
        )
        SELECT c_custkey, s_suppkey, dist2, 1 AS salted_identity_ok
        FROM ranked WHERE rn = 1
        ORDER BY c_custkey
    """,
    "station_density_grid": f"""
        WITH s AS ({_SQL_ST})
        SELECT slat // {RADIUS} AS cx, slon // {RADIUS} AS cy,
               count(*) AS n_stations,
               min(slat) AS lat_min, max(slat) AS lat_max,
               min(slon) AS lon_min, max(slon) AS lon_max
        FROM s
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
}

QUERIES = {
    "nearest_station_within_radius": nearest_station_within_radius,
    "nearest_station_salted_checked": nearest_station_salted_checked,
    "station_density_grid": station_density_grid,
}
