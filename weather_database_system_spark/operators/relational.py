"""Relational operator surface (SURVEY.md §2A parity + §2B completeness).

Every reference operator (cited file:line into /root/reference/) is
re-expressed over the driver's star schema with idiomatic DataFrame code;
Catalyst supplies pushdown/pruning/join-selection. The mapping of the
reference's weather domain onto the star schema:

- ``events`` plays the hourly observation feed (ts ≙ observation timestamp,
  event_type ≙ city, value ≙ temperatureC).
- ``orders``/``lineitem`` provide the volume for joins/aggregates the
  reference delegates to ClickHouse.

Cross-engine determinism rules (shared with the DuckDB oracle in ORACLE):

- Monetary/additive SUMs go through an exact DECIMAL(30,10) cast so the
  result is independent of float summation order (Spark's partial aggregation
  sums in a different order than any single-threaded engine) — and then a
  half-up ROUND on the exact decimal, which both engines resolve identically.
- Scalar (non-aggregated) doubles are rounded with floor(x*s + 0.5)/s — pure
  IEEE ops that both engines evaluate bit-identically — because Spark's
  round() rounds the shortest decimal repr (HALF_UP on "x.885") while DuckDB
  rounds the binary value (x.88499..), and they disagree on half-looking
  doubles.
- AVG is computed as double(decimal_sum)/count, then floor-rounded: same
  operand bits on both engines ⇒ same quotient bits.
- DATE values are emitted as 'yyyy-MM-dd' strings: Spark hands pandas
  datetime.date objects while DuckDB hands datetime64 — strings canonicalize
  identically under any value-hash.

Scale notes (100 TB): every query groups/joins on bounded-cardinality or
date-derived keys, so shuffles hash-partition evenly; dimension sides of
joins are broadcast; no driver-side collects inside operators. Decimal sums
cost ~2× a double sum but stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from weather_database_system_spark.session import track_persisted
from weather_database_system_spark.sources.star import load_table

DEC = "decimal(30,10)"


def _fr(c: Column, nd: int = 2) -> Column:
    """Portable floor-based rounding: floor(x*10^nd + 0.5)/10^nd.

    Bit-identical across engines for identical input doubles (see module
    docstring); use for non-aggregated doubles."""
    s = 10 ** nd
    return F.floor(c * s + F.lit(0.5)) / s


def _sum2(c: Column, nd: int = 2) -> Column:
    """Order-independent monetary sum: exact decimal accumulation, then a
    half-up round both engines agree on, surfaced as double."""
    return F.round(F.sum(c.cast(DEC)), nd).cast("double")


def _avg4(c: Column, nd: int = 4) -> Column:
    """Cross-engine-stable mean: double(exact decimal sum) / count, then
    portable floor-rounding."""
    return _fr(F.sum(c.cast(DEC)).cast("double") / F.count(c), nd)


def _dstr(c: Column) -> Column:
    return F.date_format(c, "yyyy-MM-dd")


def spread_fact(df: DataFrame) -> DataFrame:
    """Round-robin repartition AFTER a scan that produced fewer partitions
    than cores — the optimization guide's unsplittable-input remedy
    (§2.5). The driver testdata writes ONE parquet row group per table,
    and a row group is the atomic split unit, so every fact scan is at
    most one real task no matter the byte size — the whole
    scan → partial-agg (or scan → probe-side join → agg) pipeline above
    it serializes on one core. The exchange moves only the PROJECTED
    columns once and unlocks the remaining cores for the heavy
    aggregation work above the scan (pricing_summary measured 1.5-2.0 →
    ~1.0 s warm at sf0.1/local[32]). Scale-adaptive by construction, not
    a tuned constant — the precise guarantee (ADVICE r18): this is a
    no-op exactly when the observed scan already has >= defaultParallelism
    partitions, which covers any healthily-split large input; a cluster
    whose filtered scan lands BELOW defaultParallelism (few huge
    row groups, very high core count) does still get the round-robin —
    intentionally, since that is the same starved-pipeline shape the
    remedy exists for, at the cost of shuffling the projected columns
    once. The df.rdd.getNumPartitions() probe forces one extra
    physical-plan conversion per query build (~55 ms measured at r19 on
    the scan+filter subplan) — accepted as the price of an OBSERVED
    partition count: the cheap alternatives mis-handle exactly the cases
    the guard exists for (a file-size estimate via df.inputFiles(),
    ~14 ms, cannot see an upstream repartition, so it would re-shuffle
    an input that is already wide — measured and rejected r19).
    Round-robin is
    retry-safe (spark.sql.execution.sortBeforeRepartition, on by
    default); every consumer below is key-hashed aggregation/join, so
    results are partitioning-independent."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() >= sc.defaultParallelism:
        return df
    return df.repartition(sc.defaultParallelism)


# SQL fragments mirroring the helpers above, for the DuckDB oracle.
def _sql_fr(expr: str, nd: int = 2) -> str:
    s = 10 ** nd
    return f"floor(({expr}) * {s} + 0.5) / {s}"


def _sql_sum2(expr: str, nd: int = 2) -> str:
    return f"CAST(round(sum(CAST(({expr}) AS DECIMAL(30,10))), {nd}) AS DOUBLE)"


def _sql_avg4(expr: str, nd: int = 4) -> str:
    return _sql_fr(
        f"CAST(sum(CAST(({expr}) AS DECIMAL(30,10))) AS DOUBLE) / count({expr})", nd
    )


# ---------------------------------------------------------------------------
# Reference-parity operators (§2A)
# ---------------------------------------------------------------------------

def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped pricing summary.

    The widest aggregate the engine runs: scan → filter (pushed to parquet)
    → hash agg on two low-cardinality keys → sort. Exercises the reference's
    core GROUP BY pattern (etlToClickHouse.js:157-173) at fact-table volume.
    Map-side partial aggregation makes the shuffle carry only
    |returnflag×linestatus| rows per partition — scale-independent.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        spread_fact(
            li.filter(
                F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
            )
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _sum2(F.col("l_quantity")).alias("sum_qty"),
            _sum2(F.col("l_extendedprice")).alias("sum_base_price"),
            _sum2(disc_price).alias("sum_disc_price"),
            _sum2(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            _avg4(F.col("l_quantity")).alias("avg_qty"),
            _avg4(F.col("l_extendedprice")).alias("avg_price"),
            _avg4(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core analytic query (etlToClickHouse.js:157-173):
    GROUP BY city, toStartOfMonth(date) with avg/sum/count — mapped onto
    events (event_type ≙ city, value ≙ temperatureC/rainfallMm)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.col("event_type"),
            _dstr(F.date_trunc("month", F.col("ts"))).alias("month"),
        )
        .agg(
            _avg4(F.col("value")).alias("avg_value"),
            _sum2(F.col("value")).alias("total_value"),
            F.count("*").alias("rows_loaded"),
        )
        .orderBy("event_type", "month")
    )


def monthly_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized filtered query (backend/routes/monthly.js:58-70):
    WHERE city = ? ORDER BY month — parameter bound as a real predicate, not
    string-spliced SQL. Predicate + projection push down to the parquet scan."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == F.lit("click"))
        .groupBy(_dstr(F.date_trunc("month", F.col("ts"))).alias("month"))
        .agg(
            _avg4(F.col("value")).alias("avg_value"),
            _sum2(F.col("value")).alias("total_value"),
            F.count("*").alias("rows_loaded"),
        )
        .orderBy("month")
    )


def projection_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table projection + multi-key sort (clickhouseToRedis.js:27-46:
    SELECT cols FROM monthly_agg ORDER BY city, month). Column pruning reaches
    the scan; range-partitioned sort avoids a single-reducer bottleneck."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderstatus", "o_orderpriority", "o_orderkey")
    )


def coercion_fill_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-field null fallback policy (fetchStocktonWeather.js:73-75,88-92:
    toNumber(v, fallback) — null default, 0 for rainfall/gusts), plus the
    null-preserving unit conversion temperatureF = C*9/5+32 (:97)."""
    ev = load_table(spark, sf_dir, "events")
    raw = F.when(F.col("value") >= 0.5, F.col("value"))  # simulate missing readings
    return ev.select(
        "event_id",
        _fr(raw, 4).alias("value_nullable"),
        _fr(F.coalesce(raw, F.lit(0.0)), 4).alias("value_zero_filled"),
        _fr(raw * 9 / 5 + 32, 4).alias("value_fahrenheit"),
    ).orderBy("event_id")


def derived_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-column arithmetic (fetchStocktonWeather.js:97) at fact volume:
    null-propagating expression evaluated inside whole-stage codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _fr(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("revenue"),
        _fr(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 2).alias("charge"),
    ).orderBy("l_orderkey", "l_linenumber")


def date_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp normalization (etlToClickHouse.js:82-95: toCHDateTime /
    gmtToClickHouseDateTime → 'YYYY-MM-DD hh:mm:ss'): engine-side it is one
    date_format; invalid inputs become null (Spark's default parse behavior)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_normalized"),
        _dstr(F.col("ts")).alias("event_date"),
        F.hour("ts").alias("event_hour"),
    ).orderBy("event_id")


def presentation_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Presentation projections (dashboard/dashboard.js:91-97): month →
    'MMM yyyy' label, measures rounded to 1 dp."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.col("event_type"),
            F.date_format(F.date_trunc("month", F.col("ts")), "MMM yyyy").alias("month_label"),
        )
        .agg(_avg4(F.col("value"), 1).alias("avg_value_1dp"))
        .orderBy("event_type", "month_label")
    )


def lineage_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flatten + project with lineage metadata (etlToClickHouse.js:97-122):
    date from timestamp, null-coalesced id, constant load-metadata columns
    (rows_loaded=1, sync_interval_min=60, load_mode='incremental')."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        _dstr(F.col("o_orderdate")).alias("order_date"),
        F.coalesce(F.col("o_orderpriority"), F.lit("")).alias("priority_filled"),
        F.lit(1).alias("rows_loaded"),
        F.lit(60).alias("sync_interval_min"),
        F.lit("incremental").alias("load_mode"),
    ).orderBy("o_orderkey")


def count_diagnostic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagnostics count probe (backend/routes/diagnostics.js:80-100:
    SELECT count() FROM monthly_agg)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(F.count("*").alias("total"))


def filter_limit_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + LIMIT sample probe (backend/routes/diagnostics.js:102-121);
    made deterministic with an explicit sort key."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "event_type", _fr(F.col("value"), 4).alias("value"))
        .orderBy("event_id")
        .limit(5)
    )


# ---------------------------------------------------------------------------
# Relational completeness (§2B): joins
# ---------------------------------------------------------------------------

def join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join (region→nation→customer→orders→lineitem), revenue per
    nation in a date window. Dimensions are broadcast (no shuffle for their
    sides); the orders⋈lineitem equi-join shuffles on orderkey — at 100 TB
    both facts would be bucketed on orderkey to make it co-located."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("r_name", "n_name")
        .agg(
            _sum2(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers with zero orders; count coalesced
    to 0. Aggregate-before-join keeps the shuffled side small (one row per
    custkey before the join) — the scalable shape."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n"), _sum2(F.col("o_totalprice")).alias("spend")
    )
    return (
        customer.join(per_cust, customer.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("spend"), F.lit(0.0)).alias("total_spend"),
        )
        .orderBy("c_custkey")
    )


def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join ≙ EXISTS: customers holding at least one open order.
    Semi joins shuffle only the keys of the probe side — prefer over
    join+distinct at scale."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    open_orders = orders.filter(F.col("o_orderstatus") == "O")
    return (
        customer.join(open_orders, customer.c_custkey == open_orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def join_anti_unordered_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join ≙ NOT EXISTS: parts never shipped in 2001+."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    recent = li.filter(F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp"))
    return (
        part.join(recent, part.p_partkey == recent.l_partkey, "left_anti")
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    )


def join_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: customer count vs supplier count per nationkey,
    preserving nations present on only one side."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = customer.groupBy("c_nationkey").agg(F.count("*").alias("n_customers"))
    s = supplier.groupBy("s_nationkey").agg(F.count("*").alias("n_suppliers"))
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
        .select(
            F.coalesce(F.col("c_nationkey"), F.col("s_nationkey")).alias("nationkey"),
            F.coalesce(F.col("n_customers"), F.lit(0)).alias("n_customers"),
            F.coalesce(F.col("n_suppliers"), F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


def sole_return_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped double-correlated-subquery join: suppliers who were
    the SOLE supplier with returned items (l_returnflag = 'R') on finalized
    multi-supplier orders — per lineitem l1 the textbook form is

        EXISTS     (l2: same order, different supplier)
        NOT EXISTS (l3: same order, different supplier, returnflag 'R')

    which naïvely plans TWO self-joins of the fact table (three lineitem
    scans, three fact-sized shuffles — Q21 is the classic optimizer
    stress test for exactly this). The scale-honest rewrite runs ONE
    grouped pass instead: dedupe lineitem to (order, supplier,
    has_return) — partial map-side aggregation collapses each order's
    ~4-7 lines before the shuffle — then one per-order aggregate derives
    n_suppliers / n_return_suppliers / the sole returning supplier, and
    the EXISTS pair becomes the filter n_suppliers > 1 AND
    n_return_suppliers = 1. The second groupBy's input is one row per
    (order, supplier) — a fraction of the fact table. Orders joins on the
    already-aggregated per-order rows (AQE broadcasts its filtered side
    when small); supplier is a broadcast dim. lineitem is scanned ONCE
    (plan-pinned in test_plans).

    The DuckDB oracle deliberately runs the UNREWRITTEN correlated
    EXISTS / NOT EXISTS form, so the hash check proves the rewrite's
    semantic equivalence, not just its self-consistency."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", (F.col("l_returnflag") == "R").alias("is_r")
    )
    # NOT spread_fact: the first groupBy is (order, supplier)-grained, so
    # map-side combine barely collapses and the round-robin exchange would
    # just add a second fact shuffle (A/B'd: 1.6 -> 1.74 s at sf0.1).
    pairs = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_r").alias("has_r")
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum(F.col("has_r").cast("int")).alias("n_r_supp"),
        F.max(F.when(F.col("has_r"), F.col("l_suppkey"))).alias("sole_supp"),
    )
    culprit = per_order.filter((F.col("n_supp") > 1) & (F.col("n_r_supp") == 1))
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        culprit.join(orders_f, culprit.l_orderkey == orders_f.o_orderkey)
        .groupBy("sole_supp")
        .agg(F.count("*").alias("n_orders"))
        .join(F.broadcast(supplier), F.col("sole_supp") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "n_orders")
        .orderBy(F.col("n_orders").desc(), "s_name")
    )


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped distribution query: how many customers placed k
    qualifying orders, for every k INCLUDING k = 0 — the one TPC-H query
    built on a LEFT OUTER join with a join-side predicate (the order
    filter must live in the join condition, not a post-join WHERE, or the
    zero-order customers vanish) and a double aggregation (per-customer
    count → histogram of counts).

    Scale shape — the classic aggregate-pushdown-below-outer-join rewrite:
    instead of shuffling the full customer × orders join and counting
    after, qualifying orders aggregate to one row per o_custkey FIRST
    (one map-side-combined shuffle of the fact table), the LEFT join then
    carries pre-aggregated counts (AQE broadcasts the aggregate side when
    small), unmatched customers coalesce to 0 — exactly count(o_orderkey)
    over the textbook outer join, which counts nothing for the padded
    NULL row — and the histogram shuffle moves one row per distinct
    count. The oracle runs the UNREWRITTEN textbook form (outer join,
    then count, then histogram), so the hash check proves the pushdown's
    equivalence, NULL semantics included."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    return (
        customer.join(per_cust, customer.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def small_quantity_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped correlated-average filter: revenue carried by
    lineitems whose quantity is below 20 % of their part's average
    quantity, reported per brand. The textbook form is a correlated
    scalar subquery per lineitem —

        l_quantity < 0.2 * (SELECT avg(l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = l.l_partkey)

    — which naïvely re-aggregates the fact table once per row, and even
    decorrelated plans a fact-side self-join (two lineitem scans). The
    engine runs the single-scan window rewrite: sum/count of quantity
    OVER (PARTITION BY l_partkey) ride the same shuffle the probe rows
    take, so the fact table is scanned ONCE and shuffled ONCE (per-part
    row counts are bounded — TPC-H-style data has ~30 lines/part at any
    SF — so window partitions never skew). The brand rollup then moves
    one row per surviving line through a broadcast join with the part
    dim.

    Cross-engine exactness: the threshold compare runs in INTEGER space
    — `5 * qty * cnt < sum_qty` (l_quantity is integral 1..50 by the
    TPC-H spec this synthetic schema follows; bigint is exact where a
    float `0.2 * avg` would put boundary rows at the mercy of the
    division). The DuckDB oracle runs the UNREWRITTEN correlated form,
    so the hash check proves the window rewrite's equivalence."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_extendedprice",
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    w = W.partitionBy("l_partkey")
    small = li.select(
        "l_partkey",
        "l_extendedprice",
        (
            F.col("qty") * F.lit(5) * F.count("*").over(w)
            < F.sum("qty").over(w)
        ).alias("is_small"),
    ).filter("is_small")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        small.join(F.broadcast(part), small.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_small_lines"),
            _sum2(F.col("l_extendedprice")).alias("small_revenue"),
        )
        .orderBy("p_brand")
    )


LARGE_ORDER_MIN_QTY = 250  # sum(l_quantity) threshold ≈ p99 of the synthetic data


def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume-customer query: orders whose total
    lineitem quantity exceeds LARGE_ORDER_MIN_QTY, with the customer who
    placed them. The textbook form joins customer × orders × lineitem,
    re-aggregates the join, and probes an IN subquery that aggregates
    lineitem AGAIN (two fact-sized aggregations, one of them over a
    3-way join). The engine aggregates lineitem ONCE (map-side-combined
    per-order sum — the partial agg collapses each order's ~4 lines
    before the shuffle), filters to the qualifying ~1 %, and REUSES that
    aggregate as both the IN-probe and the sum_qty output column; orders
    joins the tiny filtered aggregate (AQE broadcasts it), customer
    joins on the result. lineitem is scanned ONCE (plan-pinned).

    Integer quantity sums are exact cross-engine; the oracle runs the
    UNREWRITTEN textbook form (3-way join + HAVING-filtered IN subquery,
    aggregating lineitem twice), proving the reuse rewrite equivalent."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("bigint").alias("qty")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("qty").alias("sum_qty"))
        .filter(F.col("sum_qty") > LARGE_ORDER_MIN_QTY)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(customer, F.col("o_custkey") == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            _dstr(F.col("o_orderdate")).alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )


IDLE_CUTOFF = "2001-01-01"  # last ~7 months of the synthetic order history


def wealthy_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped "global-customer-sentiment" query: per market
    segment, the count and total balance of customers whose account
    balance beats the average positive balance but who placed no order
    since IDLE_CUTOFF. Textbook shape = an uncorrelated scalar AVG
    subquery (threshold) + a correlated NOT EXISTS (idleness). The
    engine computes the threshold as ONE 1-row aggregate broadcast over
    the customer scan (the sanctioned 1-row-crossJoin shape — no
    per-row subquery), turns NOT EXISTS into a LEFT ANTI join against
    the date-filtered order keys (anti joins shuffle only keys), and
    rolls up the ~5 segments last.

    Cross-engine exactness: `bal > avg(bal)` is decided as
    `bal * cnt > sum` in exact DECIMAL(12,2) space — the division-free
    form both engines resolve identically (a double average would put
    boundary customers at the mercy of summation order). The oracle
    runs the UNREWRITTEN scalar-subquery + NOT EXISTS form."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", F.col("c_acctbal").cast("decimal(12,2)").alias("bal")
    )
    stats = cust.filter(F.col("bal") > 0).agg(
        F.sum("bal").alias("bal_sum"), F.count("*").alias("bal_cnt")
    )
    wealthy = cust.crossJoin(F.broadcast(stats)).filter(
        F.col("bal") * F.col("bal_cnt") > F.col("bal_sum")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(IDLE_CUTOFF).cast("timestamp"))
        .select("o_custkey")
    )
    return (
        wealthy.join(recent, wealthy.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("bal"), 2).cast("double").alias("total_balance"),
        )
        .orderBy("c_mktsegment")
    )


def quarterly_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped top-supplier query, extended to every quarter:
    the supplier(s) with the maximum net revenue within each shipping
    quarter. The textbook form materializes a revenue view and probes
    `total_revenue = (SELECT max(total_revenue) FROM revenue)` — a
    correlated re-aggregation of the view. The engine computes the
    per-(quarter, supplier) revenue in one map-side-combined fact
    shuffle, reduces it to a quarters-sized max table (map-side partials
    emit one row per quarter per task), and broadcast-joins that back
    onto the same aggregate — the aggregate is persisted (the repo's
    shared-branch discipline) so the view is computed once and lineitem
    scanned once. A window partitioned by quarter would be the compact
    alternative, but its partition width is the SUPPLIER count (a
    dim that grows with SF — ~1e9 rows/quarter at 100 TB in one task
    per quarter); the broadcast-max form keeps every stage either fully
    parallel or quarters-sized. Supplier names arrive by broadcast.

    Ties on the max are kept by BOTH engines (Q15 semantics): revenue
    is the order-independent decimal sum rounded to 2 dp, so equality
    — and therefore the tie set — is decided on identical bits
    cross-engine. The oracle runs the UNREWRITTEN correlated-max form
    over the same view, proving the window rewrite equivalent."""
    # spread_fact REVERTED here (r19, VERDICT r18 contested item): the
    # groupBy key (qtr, l_suppkey) is supplier-grained, so map-side
    # partial aggregation barely reduces the stream and the round-robin
    # added a full 4-column fact shuffle ahead of it for nothing. The
    # driver measured ×0.74 at 32 cores; a 5-round interleaved
    # same-session A/B this round confirmed it (spread 4.06 s median vs
    # 3.21 s without, identical results).
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_suppkey", "l_extendedprice", "l_discount"
    )
    per = track_persisted(
        li.groupBy(
            F.concat(
                F.year("l_shipdate"), F.lit("-Q"), F.quarter("l_shipdate")
            ).alias("qtr"),
            "l_suppkey",
        )
        .agg(
            _sum2(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
        .persist()
    )
    qmax = per.groupBy("qtr").agg(F.max("total_revenue").alias("max_rev"))
    top = per.join(F.broadcast(qmax), "qtr").filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        top.join(F.broadcast(supplier), top.l_suppkey == supplier.s_suppkey)
        .select("qtr", "s_suppkey", "s_name", "total_revenue")
        .orderBy("qtr", "s_suppkey")
    )


# The Q7 nation pair — chosen so BOTH trade directions are populated even
# at sf0.001 (the parity suite's default SF), keeping the check non-vacuous.
TRADE_NATIONS = ("NATION_13", "NATION_19")


def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped bilateral trade volume: revenue shipped between a
    pair of nations (both directions), per shipping year. The textbook
    form joins supplier × lineitem × orders × customer × nation n1 ×
    nation n2 and filters the pair with an OR predicate AFTER the 6-way
    join. The engine pushes the pair membership into BOTH dimension
    scans first — supplier and customer each filter to the 2 qualifying
    nations BEFORE touching a fact table, so only the ~2/25 of lineitem
    sold by a pair supplier survives the first join and only the ~2/25
    of orders placed by a pair customer survives the second; the
    residual `supp ≠ cust` inequality runs post-join on the tiny
    survivor set. It then aggregates on the integer nationkey pair +
    year (map-side combine on a 2×2×7-value grain) and attaches nation
    NAMES to the years-sized aggregate by broadcast — the textbook form
    drags the names through the fact shuffle. supplier is broadcast;
    at 100 TB customer⋈orders stays a shuffled equi-join (customer
    scales with SF) and everything downstream of the pair filters is
    ~8 % of the fact volume.

    Revenue is the exact-decimal `_sum2`; years/keys are integers — the
    hash compare is exact. The oracle runs the UNREWRITTEN 6-way-join +
    post-join OR form, proving the pushdown rewrite equivalent."""
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*TRADE_NATIONS)
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("s_nationkey").alias("supp_nkey"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("c_nationkey").alias("cust_nkey"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    vol = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nkey") != F.col("cust_nkey"))
        .groupBy("supp_nkey", "cust_nkey", F.year("l_shipdate").alias("l_year"))
        .agg(
            _sum2(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )
    names = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        vol.join(
            F.broadcast(names.select(F.col("n_nationkey").alias("sk"),
                                     F.col("n_name").alias("supp_nation"))),
            F.col("supp_nkey") == F.col("sk"),
        )
        .join(
            F.broadcast(names.select(F.col("n_nationkey").alias("ck"),
                                     F.col("n_name").alias("cust_nation"))),
            F.col("cust_nkey") == F.col("ck"),
        )
        .select("supp_nation", "cust_nation", "l_year", "revenue")
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


MKT_REGION = "ASIA"          # the Q8 customer region
MKT_TARGET_NATION = "NATION_12"  # the supplier nation whose share is measured


def regional_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: of all revenue sold to customers in
    MKT_REGION, the fraction supplied by MKT_TARGET_NATION, per order
    year. The textbook form is a 7-table join with a CASE inside a
    division of two aggregates. The engine resolves the customer-region
    membership as a semi-join against a broadcast 5-row nation set
    (region⋈nation collapses to keys before any fact is read), tags
    each surviving line with a boolean via a broadcast supplier⋈nation
    lookup, and computes numerator and denominator in ONE conditional
    aggregate pass — a single fact shuffle on the year grain.

    Cross-engine exactness: numerator and denominator are exact-decimal
    `_sum2` columns (emitted for auditability); the share divides the
    two ROUNDED doubles — identical operand bits on both engines ⇒
    identical IEEE quotient — then floor-rounds at 4 dp. The oracle
    runs the UNREWRITTEN CASE-inside-division 7-table form."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == MKT_REGION)
    rnations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(rnations), F.col("c_nationkey") == F.col("n_nationkey"), "semi")
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", (F.col("n_name") == MKT_TARGET_NATION).alias("is_target"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("vol"),
    )
    num = _sum2(F.when(F.col("is_target"), F.col("vol")).otherwise(F.lit(0.0)))
    den = _sum2(F.col("vol"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey, "semi")
        .groupBy("o_year")
        .agg(num.alias("target_revenue"), den.alias("total_revenue"))
        .select(
            "o_year",
            "target_revenue",
            "total_revenue",
            _fr(F.col("target_revenue") / F.col("total_revenue"), 4).alias(
                "mkt_share"
            ),
        )
        .orderBy("o_year")
    )


RETURN_QTR_START, RETURN_QTR_END = "2001-01-01", "2001-04-01"  # the Q10 quarter


def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item reporting: the top 20 customers by
    revenue lost to returned lineitems (l_returnflag = 'R') on orders
    placed in one quarter. The textbook form joins customer × orders ×
    lineitem × nation and groups on the full 4-column customer tuple.
    The engine aggregates FIRST — the date-filtered orders⋈returned-
    lineitem join reduces to one row per customer key before any
    dimension is touched (the group-by key is c_custkey alone; the
    name/nation columns are functionally dependent and join onto the
    customers-sized aggregate afterwards) — so the shuffle moves
    (custkey, revenue) pairs, not customer tuples. Top-20 runs as a
    TakeOrdered over the aggregate, never a global sort of the fact.

    The tie order is total (revenue DESC — exact 2-dp decimal — then
    c_custkey), so the LIMIT cut is deterministic cross-engine. The
    oracle runs the UNREWRITTEN group-on-customer-tuple form."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(RETURN_QTR_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(RETURN_QTR_END).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("vol"),
    )
    lost = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(_sum2(F.col("vol")).alias("revenue"))
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        lost.join(cust, lost.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "c_acctbal", "revenue")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


PROMO_YEAR_START, PROMO_YEAR_END = "2000-01-01", "2001-01-01"  # the Q14 window


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promotion effect: the percentage of gross
    discounted revenue carried by promo-class parts, per shipping month
    of one year. The textbook form is CASE-inside-division over a
    part⋈lineitem join. The engine prunes part to (p_partkey, is_promo
    boolean) — 9 bytes a row — broadcasts it, and computes numerator /
    denominator in one conditional aggregate over the month grain; the
    fact is scanned once, shuffled once (12 groups, map-side combined).
    At 100 TB part scales with SF, so the broadcast degrades to a
    shuffled equi-join chosen by AQE — the aggregate shape is unchanged.

    Numerator/denominator are exact-decimal `_sum2` doubles (emitted);
    the percentage is 100·num/den floor-rounded at 4 dp — identical
    operand bits ⇒ identical quotient bits cross-engine. The oracle
    runs the UNREWRITTEN CASE-inside-division join form."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_type") == "PROMO").alias("is_promo")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(PROMO_YEAR_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(PROMO_YEAR_END).cast("timestamp"))
    ).select(
        "l_partkey",
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("vol"),
    )
    num = _sum2(F.when(F.col("is_promo"), F.col("vol")).otherwise(F.lit(0.0)))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("ship_month")
        .agg(num.alias("promo_revenue"), _sum2(F.col("vol")).alias("total_revenue"))
        .select(
            "ship_month",
            "promo_revenue",
            "total_revenue",
            _fr(
                F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 4
            ).alias("promo_pct"),
        )
        .orderBy("ship_month")
    )


# Q19 branch table: (brand, size lo/hi, quantity lo/hi). Brands chosen from
# the synthetic 25-brand domain; windows overlap so the disjunction is not
# partition-disjoint (the interesting case for pushdown).
DISJ_BRANCH = (
    ("Brand#4", 1, 15, 1, 20),
    ("Brand#19", 10, 30, 10, 30),
    ("Brand#16", 20, 50, 20, 50),
)


def disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive-predicate revenue: revenue from
    lineitems matching ANY of three (brand, size-window, quantity-window)
    conjunctions, per brand. The textbook form puts the whole
    OR-of-ANDs in the WHERE of a part⋈lineitem join — naïvely nothing
    is pushable because no single conjunct holds across branches. The
    engine factors the disjunction: the UNION of each side's branch
    ranges pushes into that side's scan (part: brand IN (b1,b2,b3) AND
    size in the hull; lineitem: quantity in the hull — both visible as
    PushedFilters), the filtered part side collapses to a 3-brand
    broadcast, and only the residual per-branch OR runs post-join on
    the pre-filtered survivors. Catalyst does NOT derive these superset
    predicates itself from an OR across two relations — the factoring
    is the operator's value.

    Revenue is the exact-decimal `_sum2`; counts are integers. The
    oracle runs the UNREWRITTEN single-WHERE OR-of-conjunctions form,
    proving the factored pushdown equivalent."""
    brands = [b for b, *_ in DISJ_BRANCH]
    size_lo = min(b[1] for b in DISJ_BRANCH)
    size_hi = max(b[2] for b in DISJ_BRANCH)
    qty_lo = min(b[3] for b in DISJ_BRANCH)
    qty_hi = max(b[4] for b in DISJ_BRANCH)
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin(*brands)
        & F.col("p_size").between(size_lo, size_hi)
    ).select("p_partkey", "p_brand", "p_size")
    # NOT spread_fact: the broadcast part join prunes to 3 brands right
    # after the scan, so the heavy work is already tiny — the round-robin
    # exchange was pure overhead (A/B'd: 0.70 -> 1.31 s at sf0.1).
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(qty_lo, qty_hi)
    ).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    branch_ok = None
    for b, slo, shi, qlo, qhi in DISJ_BRANCH:
        cond = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(slo, shi)
            & F.col("l_quantity").between(qlo, qhi)
        )
        branch_ok = cond if branch_ok is None else (branch_ok | cond)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(branch_ok)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            _sum2(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# Fourth TPC-H-shape wave: the partsupp-family shapes (Q2/Q9/Q11/Q16/Q20),
# grounded on a PSEUDO-partsupp derived from lineitem — the testdata star
# schema has no partsupp table, so the (partkey, suppkey) grain is derived
# as "every pair that ever traded", with min unit price as the cost and
# shipped quantity as the stock analog. The derivation is identical in the
# engine and the DuckDB oracle, so the hash check still proves each
# rewrite; what each query exercises is the textbook DECORRELATION shape.
# ---------------------------------------------------------------------------

FORECAST_YEAR_START, FORECAST_YEAR_END = "2000-01-01", "2001-01-01"  # Q6 window


def discount_elimination_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped forecasting query: the revenue increase from
    eliminating small discounts — sum(l_extendedprice · l_discount) over
    a ship-year, a discount band, and a quantity cap. Deliberately the
    SIMPLEST shape in the TPC-H sweep: zero joins, one scan, one 1-row
    aggregate — its whole value is that all three predicates reach the
    parquet scan as PushedFilters (plan-pinned) and the sum is map-side
    combined to one row per task. At 100 TB this is the I/O-bound
    query: with a date-partitioned layout the year window prunes
    partitions before any row is read.

    The discount band compares identical doubles against identical
    literals (0.05/0.07 parse to the same bits in both engines); the
    revenue term is the exact-decimal `_sum2`. Oracle: the same
    single-WHERE textbook form (no rewrite to prove here — the pair
    exists to pin the pushdown plan and the exact aggregate)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(FORECAST_YEAR_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(FORECAST_YEAR_END).cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _sum2(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


MIN_COST_PART_TYPE = "LARGE"  # the Q2 part family


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped minimum-cost-supplier query: for every part of one
    type family, the supplier(s) offering it at the lowest unit cost,
    with supplier attributes, top-100 by account balance. The textbook
    form probes `cost = (SELECT min(cost) FROM ps WHERE ps.partkey =
    p.partkey)` — a correlated scalar MIN re-aggregating the pair table
    per row. The engine (a) pushes the part-family filter BELOW the
    pair aggregation via a broadcast semi join on the fact scan (the
    textbook aggregates every part first), and (b) resolves the
    per-part min as a parts-sized aggregate equi-joined back on
    partkey — both sides arrive partkey-keyed, and a window over
    PARTITION BY l_partkey is rejected for the same reason as Q15's:
    its partition width is suppliers-per-part, which grows with SF.

    Unit cost floor-rounds to 4 dp BEFORE the min (portable IEEE ops on
    identical doubles), so the min, the tie set, and the top-100 cut
    (total order: balance DESC, partkey, suppkey — balances are 2-dp
    parquet doubles) are engine-exact. The oracle runs the UNREWRITTEN
    correlated-min form over the same pseudo-partsupp CTE."""
    fam = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == MIN_COST_PART_TYPE
    ).select("p_partkey", "p_name")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        _fr(F.col("l_extendedprice") / F.col("l_quantity"), 4).alias("unit"),
    ).join(F.broadcast(fam.select("p_partkey")),
           F.col("l_partkey") == F.col("p_partkey"), "semi")
    ps = track_persisted(
        li.groupBy("l_partkey", "l_suppkey").agg(F.min("unit").alias("cost"))
        .persist()
    )
    pmin = ps.groupBy("l_partkey").agg(F.min("cost").alias("min_cost"))
    best = ps.join(pmin, "l_partkey").filter(F.col("cost") == F.col("min_cost"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        best.join(F.broadcast(supplier), best.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(fam), best.l_partkey == fam.p_partkey)
        # the LIMIT cut orders by KEYS (suppkey, not name): (acctbal,
        # partkey, suppkey) is structurally total — name uniqueness would
        # be a data assumption this way needs no pin for
        .orderBy(F.col("s_acctbal").desc(), F.col("l_partkey"), "s_suppkey")
        .limit(100)
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("l_partkey").alias("p_partkey"), "p_name", "cost",
        )
    )


PROFIT_NAME_PART = "widget"   # the Q9 part-name substring
PROFIT_COST_RATE = "0.1"      # pseudo unit cost = rate × p_retailprice


def nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped product-profit query: profit per supplier nation
    per order year over a part-name family, where profit = discounted
    revenue − pseudo cost (PROFIT_COST_RATE × p_retailprice × quantity —
    the schema has no ps_supplycost). The classic 6-table star
    aggregation with an expression combining columns from two tables.
    The engine prunes part to (key, retailprice) and filters the name
    family BEFORE the fact join (broadcast), computes the profit
    expression inside the scan's codegen, and aggregates once on the
    (nation, year) grain; supplier and nation broadcast. The textbook
    form computes the same thing through a flat 6-way join.

    The profit term is exact-decimal summed (`_sum2`); quantities are
    integral and retailprice/discount arithmetic uses identical doubles
    — engine-exact. Oracle: the UNREWRITTEN flat-join form."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(PROFIT_NAME_PART)
    ).select("p_partkey", "p_retailprice")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(float(PROFIT_COST_RATE)) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", "o_year")
        .agg(_sum2(amount).alias("profit"))
        .orderBy("n_name", F.col("o_year").desc())
    )


def important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped important-stock query: the parts whose traded
    value exceeds 1.5× the average per-part value. The textbook form is a
    GROUP BY ... HAVING against an uncorrelated scalar subquery that
    re-aggregates THE SAME fact table. The engine aggregates once
    (persisted), reduces the partials to ONE row (total + part count),
    and broadcasts that row back over the aggregate — the fact table is
    scanned once and the threshold costs one 1-row exchange. The
    compare `value · n_parts > 1.5 · total` runs on the DOUBLE casts of
    the exact decimal sums — NOT on the decimals themselves: the
    product of two decimal(38,10)s overflows Spark's precision cap and
    silently drops scale (the changepoint_mean_shift lesson), whereas
    identical double operand bits give an identical IEEE compare in
    both engines. The "1.5× average" form keeps selectivity
    scale-invariant (a fixed fraction à la TPC-H's 0.0001/SF would
    select everything at small SF and nothing at large; the synthetic
    part values are near-uniform with max ≈ 1.75-1.89× average across
    sf0.001..0.1, so 1.5 selects a real 2/29/252-part tail, probed).

    Oracle: the UNREWRITTEN HAVING-with-scalar-subqueries form (which
    scans lineitem three times), proving the compute-once rewrite."""
    li = load_table(spark, sf_dir, "lineitem")
    val = track_persisted(
        li.groupBy("l_partkey")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC))
            .alias("v")
        )
        .persist()
    )
    tot = val.agg(F.sum("v").alias("total"), F.count("*").alias("n_parts"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(
            F.col("v").cast("double") * F.col("n_parts")
            > F.lit(1.5) * F.col("total").cast("double")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("v"), 2).cast("double").alias("value"),
        )
        .orderBy(F.col("value").desc(), "p_partkey")
    )


FAMILY_SIZES = (1, 5, 9, 13, 17, 21, 25, 29)  # Q16's size IN-list (INCLUDED sizes)


def supplier_count_by_part_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped supplier-count query: how many distinct suppliers
    trade each (brand, size) family, for sizes in an IN-list, excluding
    one brand and excluding "complaint" suppliers (negative account
    balance — the schema's analog of Q16's comment LIKE filter). The
    textbook form is a NOT IN subquery over supplier plus a
    count(DISTINCT) over the pair table. The engine derives the
    distinct (partkey, suppkey) pairs from the fact ONCE, resolves NOT
    IN as a LEFT ANTI join against the tiny excluded-supplier set
    (broadcast — NULL-safe by construction since keys are non-null),
    and pushes both part predicates into the dimension scan before the
    pair join. Distinct-count shuffles on the (brand, size) grain.

    Counts are integers; ordering is total (count DESC, brand, size).
    Oracle: the UNREWRITTEN NOT-IN form."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(*FAMILY_SIZES)
    ).select("p_partkey", "p_brand", "p_size")
    excl = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        pairs.join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .join(F.broadcast(excl), pairs.l_suppkey == excl.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


EXCESS_NAME_PREFIX = "red "  # the Q20 part family (p_name = 'red <noun>')


def excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped excess-stock query: suppliers who carry more than
    3× their FAIR share of any family part's traded quantity (the
    schema's analog of ps_availqty > 0.5 × shipped; an absolute-share
    threshold à la the textbook's 0.5 is scale-DEPENDENT here because
    suppliers-per-part grows with SF — 25 % of a part's volume happens
    at sf0.001 and never at sf0.01+, probed — while the fair-share
    multiple selects a stable tail at every SF). The textbook form is
    a doubly-nested IN — supplier IN (pairs WHERE part IN (family) AND
    qty > correlated-total-subquery). The engine flattens it: family
    keys broadcast-semi into the fact scan, ONE (partkey, suppkey)
    aggregation (persisted), per-part totals AND supplier counts
    re-aggregated from those partials and equi-joined back (never a
    per-row subquery), the share test decided in exact BIGINT space
    (qty·n_suppliers > 3·total — integral quantities, guard-pinned),
    and the surviving supplier keys semi-join the supplier dim.

    Oracle: the UNREWRITTEN nested-IN + correlated-subquery form."""
    fam = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith(EXCESS_NAME_PREFIX)
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", F.col("l_quantity").cast("bigint").alias("qty")
    ).join(F.broadcast(fam), F.col("l_partkey") == F.col("p_partkey"), "semi")
    q = track_persisted(
        li.groupBy("l_partkey", "l_suppkey").agg(F.sum("qty").alias("sq")).persist()
    )
    ptot = q.groupBy("l_partkey").agg(
        F.sum("sq").alias("tq"), F.count("*").alias("ns")
    )
    hot = (
        q.join(ptot, "l_partkey")
        .filter(F.col("sq") * F.col("ns") > F.lit(3) * F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        supplier.join(F.broadcast(hot), supplier.s_suppkey == hot.l_suppkey, "semi")
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


# Q12's pseudo columns: the schema has no l_shipmode / l_commitdate /
# l_receiptdate, so all three derive DETERMINISTICALLY from existing
# integer keys — identically in engine and oracle (the pseudo-partsupp
# precedent), so the hash check still proves the rewrite, not the
# derivation. Lags are integer days: commit_lag ∈ [-5, 25],
# receipt_lag ∈ [-4, 9]; mode indexes a 7-element list.
SHIPMODES = ("MAIL", "SHIP", "AIR", "RAIL", "TRUCK", "FOB", "REG AIR")
SHIPMODE_TARGETS = ("MAIL", "SHIP")  # Q12's two audited modes
HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")
RECEIPT_YEAR_START, RECEIPT_YEAR_END = "2000-01-01", "2001-01-01"
COMMIT_LAG_MAX, RECEIPT_LAG_MAX = 25, 9  # derivation bounds (see above)


def shipmode_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped shipping-mode audit: for two ship modes, how many
    late-shipped lines (shipped after the commit date, received after
    commit) arrived in the audit year, split by order priority — the
    classic two-way conditional count over an orders⋈lineitem join.
    Completes the 22/22 TPC-H shape sweep (r11 VERDICT #3).

    The engine rewrite vs the textbook join-then-CASE form:
    (a) every lineitem-side predicate (mode IN-list, ship<commit,
        commit<receipt, receipt-year window) is applied BELOW the join,
        so only qualifying (orderkey, shipmode) pairs reach the shuffle;
    (b) the receipt-year window IMPLIES a bound on the physical
        l_shipdate column (receipt = ship + lags, lags bounded by
        construction), so the engine adds the redundant derived-bound
        predicate — a real parquet PushedFilter that prunes row groups /
        date partitions before any row materializes, where the textbook
        predicate on the DERIVED receipt date can never push;
    (c) the priority CASE is classified INSIDE the orders scan
        (is_high: 1-byte int), so the join shuffles an int instead of a
        15-char priority string and the aggregate is two plain sums.
    At 100 TB both sides shuffle on orderkey (orders is fact-sized —
    never broadcast); the shuffled payload is 2 small columns per side.

    Oracle: the UNREWRITTEN textbook form — full-table CTE deriving the
    pseudo columns, join, WHERE on the derived dates only (no shipdate
    bound), CASE-sum counts — so the hash match certifies both the
    derived-bound pushdown and the classify-before-join rewrite."""
    modes = F.array(*[F.lit(m) for m in SHIPMODES])
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            F.element_at(
                modes,
                ((F.col("l_orderkey") + 3 * F.col("l_linenumber")) % 7 + 1)
                .cast("int"),
            ).alias("l_shipmode"),
            (F.col("l_partkey") % 31 - 5).cast("int").alias("commit_lag"),
            (F.col("l_suppkey") % 14 - 4).cast("int").alias("receipt_lag"),
            F.col("l_shipdate"),
        )
        # (b) derived bound on the PHYSICAL column — pushable. receipt =
        # ship + commit_lag + receipt_lag with lags ≤ 25 + 9 = 34 days,
        # so receipt ≥ START ⇒ ship ≥ START − 34d, receipt < END ⇒
        # ship < END (qualifying rows have positive lags). Conservative,
        # implied by the semantic predicates below — plan-pinned.
        .filter(
            (
                F.col("l_shipdate")
                >= F.date_sub(
                    F.lit(RECEIPT_YEAR_START).cast("date"),
                    COMMIT_LAG_MAX + RECEIPT_LAG_MAX,
                ).cast("timestamp")
            )
            & (F.col("l_shipdate") < F.lit(RECEIPT_YEAR_END).cast("timestamp"))
        )
        .withColumn(
            "l_commitdate",
            F.date_add(F.col("l_shipdate").cast("date"), F.col("commit_lag")),
        )
        .withColumn(
            "l_receiptdate",
            F.date_add(F.col("l_commitdate"), F.col("receipt_lag")),
        )
        # (a) the semantic Q12 predicates, all below the join
        .filter(
            F.col("l_shipmode").isin(*SHIPMODE_TARGETS)
            & (F.col("l_commitdate") < F.col("l_receiptdate"))
            & (F.col("l_shipdate").cast("date") < F.col("l_commitdate"))
            & (F.col("l_receiptdate") >= F.lit(RECEIPT_YEAR_START).cast("date"))
            & (F.col("l_receiptdate") < F.lit(RECEIPT_YEAR_END).cast("date"))
        )
        .select("l_orderkey", "l_shipmode")
    )
    # (c) classify priority inside the orders scan: the join moves an int
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").isin(*HIGH_PRIORITIES).cast("int")
        .alias("is_high"),
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_shipmode")
        .agg(
            F.sum("is_high").alias("high_line_count"),
            F.sum(1 - F.col("is_high")).alias("low_line_count"),
        )
        .orderBy("l_shipmode")
    )


YOY_PREV, YOY_CURR = 1999, 2000  # both full shipdate years; decline
# selects ~half the 25 brands at every SF (probed sf0.001/0.01/0.1:
# 14/12/12) — a non-vacuous, scale-stable split


def yoy_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q75-shaped year-over-year decline report: per part brand,
    current- vs prior-year revenue and the delta, for brands whose
    revenue DECLINED. The textbook form aggregates each year in its own
    subquery and equi-joins the two aggregates on brand — two fact
    scans, two shuffles, plus the join. The engine scans once: both
    ship-years in one pushable shipdate window, part pruned to
    (key, brand) and broadcast, ONE conditional aggregate producing
    both years' sums per brand, the decline filter and delta computed
    on the already-rounded doubles (identical operand bits ⇒ identical
    IEEE compare/subtract in both engines).

    At 100 TB the two-subquery form is strictly 2× the scan and 2× the
    shuffle for the same answer; this shape is the standard pattern for
    ANY same-fact-different-slice comparison (year/channel/source).

    Oracle: the UNREWRITTEN two-CTE join form, proving the single-pass
    conditional rewrite."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # NOT spread_fact: the year filter + broadcast join leave too little
    # aggregation CPU to pay for a round-robin exchange (A/B'd: wash).
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(f"{YOY_PREV}-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{YOY_CURR + 1}-01-01").cast("timestamp"))
    )
    year = F.year("l_shipdate")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            _sum2(F.when(year == YOY_PREV, rev).otherwise(F.lit(0))).alias(
                "prev_revenue"
            ),
            _sum2(F.when(year == YOY_CURR, rev).otherwise(F.lit(0))).alias(
                "curr_revenue"
            ),
            # the textbook inner join only reports brands present in BOTH
            # years — the conditional rewrite makes that explicit instead
            # of inheriting it from the data (all 25 brands have both
            # years at every test SF, but the semantics must not rely on it)
            F.count(F.when(year == YOY_PREV, 1)).alias("n_prev"),
            F.count(F.when(year == YOY_CURR, 1)).alias("n_curr"),
        )
    )
    return (
        agg.filter(
            (F.col("n_prev") > 0)
            & (F.col("n_curr") > 0)
            & (F.col("curr_revenue") < F.col("prev_revenue"))
        )
        .select(
            "p_brand",
            "prev_revenue",
            "curr_revenue",
            _fr(F.col("curr_revenue") - F.col("prev_revenue"), 2).alias(
                "revenue_delta"
            ),
        )
        .orderBy("revenue_delta", "p_brand")
    )


FREQ_MIN_DAYS = 20      # part "frequent" if shipped on ≥ this many days
BEST_YEAR = 1998        # the reporting window (full shipdate year)
# "best customer" = lifetime spend within 2× of the top spender
# (2·s ≥ max(s) as s+s ≥ max — addition, never a precision-39 multiply);
# selects 45/150 customers at sf0.001, 361/1500 at sf0.01 (probed)


def frequent_best_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q23-shaped composite (the benchmark's hardest query
    family): monthly revenue from FREQUENT items (parts shipped on ≥
    FREQ_MIN_DAYS distinct days over all history) bought by BEST
    customers (lifetime spend within 2× of the maximum spender), inside
    one reporting year. The textbook form is two independent CTE
    pipelines feeding IN-subqueries applied AFTER the fact⋈orders join.

    The engine restructures for scale:
    - frequent set: ONE lineitem pass pruned to (partkey, ship-day),
      countDistinct per part (two-phase internally — never a distinct
      materialization), ≥-filter → a part-keyed SEMI join on the fact.
    - best set: ONE orders pass → per-customer decimal spend, the max
      as a 1-row broadcast (the sanctioned claims shape), s+s ≥ max in
      exact decimal(28,10) — and the semi-filter applies to the ORDERS
      side BEFORE the fact join (the Q7 dims-filter-early pattern), so
      the expensive orderkey shuffle moves only best-customer orders.
    - fact pass: the reporting-year bound is a parquet PushedFilter;
      the frequent semi-join prunes lines before the orders join.

    At 100 TB the textbook plan ships every 1998 line through the join
    and THEN discards ~everything (best customers are a 2-30 % slice);
    filtering both join inputs first moves the shuffles from corpus-
    sized to answer-sized. Oracle: the UNREWRITTEN two-CTE + two
    IN-subqueries form."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    freq = (
        li.select("l_partkey", F.date_format("l_shipdate", "yyyy-MM-dd").alias("d"))
        .groupBy("l_partkey")
        .agg(F.countDistinct("d").alias("n_days"))
        .filter(F.col("n_days") >= FREQ_MIN_DAYS)
        .select("l_partkey")
    )
    from weather_database_system_spark.session import track_persisted

    # persisted: the spend aggregate feeds BOTH the 1-row max and the
    # threshold filter — without it the orders scan + customer shuffle
    # run twice (caught by this query's own plan pin)
    spend = track_persisted(
        orders.groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC))
            .cast("decimal(28,10)")
            .alias("s")
        )
        .persist()
    )
    mx = spend.agg(F.max("s").alias("mx"))
    best = (
        spend.crossJoin(F.broadcast(mx))
        .filter((F.col("s") + F.col("s")) >= F.col("mx"))
        .select("o_custkey")
    )
    o_best = orders.select("o_orderkey", "o_custkey").join(
        best, "o_custkey", "leftsemi"
    )
    month_lines = (
        li.filter(
            (F.col("l_shipdate") >= F.lit(f"{BEST_YEAR}-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(f"{BEST_YEAR + 1}-01-01").cast("timestamp"))
        )
        .select(
            "l_orderkey",
            "l_partkey",
            F.date_format("l_shipdate", "yyyy-MM").alias("month"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
        .join(freq, "l_partkey", "leftsemi")
    )
    return (
        month_lines.join(o_best, month_lines.l_orderkey == o_best.o_orderkey)
        .groupBy("month")
        .agg(
            F.count("*").alias("n_lines"),
            _sum2(F.col("rev")).alias("revenue"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# Relational completeness (§2B): aggregates beyond avg/sum/count
# ---------------------------------------------------------------------------

def agg_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full aggregate set: min/max/stddev/variance/count-distinct per group
    (reference only ever uses avg/sum/count — etlToClickHouse.js:163-166)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            _fr(F.min("l_extendedprice"), 2).alias("min_price"),
            _fr(F.max("l_extendedprice"), 2).alias("max_price"),
            _fr(F.stddev_samp("l_quantity"), 4).alias("stddev_qty"),
            _fr(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
        .orderBy("l_returnflag")
    )


def agg_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (continuous definition shared with the
    oracle). The approx_percentile / approx_count_distinct sketch variants are
    exercised in tests with tolerance — sketches are engine-specific so they
    cannot hash-match a different engine. Oracle-canonical only: exact
    percentile buffers every group value, so the production quantile path is
    the sketch shape (``approx_distinct_users_scale``,
    ``quantile_bucket_decile_approx``)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            _fr(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50_price"),
            _fr(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_price"),
            _fr(F.percentile("l_quantity", F.lit(0.25)), 4).alias("p25_qty"),
        )
        .orderBy("l_linestatus")
    )


def rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP — subtotals + grand total in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(_sum2(F.col("l_quantity")).alias("sum_qty"), F.count("*").alias("n"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


def cube_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE — all grouping-set combinations."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(_sum2(F.col("o_totalprice")).alias("sum_price"), F.count("*").alias("n"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (sum/count over CASE WHEN) — the freshness
    ladder shape (backend/routes/monthly.js:36-42) applied as an aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice"))
    indicator = F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            _sum2(urgent).alias("urgent_value"),
            F.count(urgent).alias("urgent_n"),
            _avg4(indicator).alias("urgent_share"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Relational completeness (§2B): window functions
# ---------------------------------------------------------------------------

def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by value: row_number over a per-key window.
    The canonical scale-safe top-k — no global sort, one shuffle on the
    partition key; deterministic via orderkey tiebreak."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "rk", "o_orderkey", _fr(F.col("o_totalprice"), 2).alias("o_totalprice"))
        .orderBy("o_custkey", "rk")
    )


def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: month-over-month delta of monthly totals per
    event_type (the reference's monthly_agg consumers chart exactly this
    trend — dashboard/dashboard.js:91-97 — but ClickHouse computed no deltas).
    Totals stay exact decimals until the final presentation round, so deltas
    are order-independent too."""
    ev = load_table(spark, sf_dir, "events")
    monthly = ev.groupBy(
        "event_type", _dstr(F.date_trunc("month", F.col("ts"))).alias("month")
    ).agg(F.sum(F.col("value").cast(DEC)).alias("total"))
    w = W.partitionBy("event_type").orderBy("month")
    return monthly.select(
        "event_type",
        "month",
        F.round(F.col("total"), 2).cast("double").alias("total_value"),
        F.round(F.col("total") - F.lag("total").over(w), 2).cast("double").alias("delta_prev_month"),
        F.round(F.lead("total").over(w), 2).cast("double").alias("next_month_total"),
    ).orderBy("event_type", "month")


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) revenue per supplier ordered by ship date — rows
    frame with fully deterministic ordering keys; exact decimal accumulation.

    The ordering must be TOTAL over every value the frame accumulates: the
    synthetic lineitem carries duplicate (l_orderkey, l_linenumber) pairs
    (~20 % of keys at sf0.1), and the r11 sf0.1 parity sweep caught two
    rows tied on (shipdate, orderkey, linenumber) within one supplier
    partition with DIFFERENT revenues — a ROWS-frame prefix sum then
    depends on which engine happens to order the tie first (one row in
    600 000 mismatched; the sf0.01 gate has zero such collisions and
    never saw it). Tie-breaking by the summands (l_extendedprice,
    l_discount) restores engine-independence: any ordering ambiguity left
    is between identical-revenue rows, whose prefix multiset is the same
    either way."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy(
            "l_shipdate",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            "l_discount",
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    running = F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)).over(w)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(running, 2).cast("double").alias("running_revenue"),
    ).orderBy("l_suppkey", "l_orderkey", "l_linenumber")


def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over part prices within brand."""
    part = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return part.select(
        "p_brand",
        "p_partkey",
        _fr(F.col("p_retailprice"), 2).alias("p_retailprice"),
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(w).alias("price_quartile"),
    ).orderBy("p_brand", "price_rank", "p_partkey")


def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / lead / first+last over an explicit
    whole-partition ROWS frame — the remaining window-function surface
    (rank/dense_rank/ntile live in window_rank_dense, lag in
    window_lag_delta, RANGE frames in window_rolling_1h). The ordering key
    (c_acctbal, c_custkey) is total, so the distribution functions are
    deterministic under ties; last_value carries the explicit
    unbounded-following frame because the default frame stops at CURRENT
    ROW — the classic silently-wrong default both engines share."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").asc(), F.col("c_custkey"))
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        cust.select(
            F.col("c_nationkey").cast("int").alias("nation"),
            "c_custkey",
            _fr(F.col("c_acctbal"), 2).alias("acctbal"),
            _fr(F.percent_rank().over(w), 6).alias("pct_rank"),
            _fr(F.cume_dist().over(w), 6).alias("cume_dist"),
            F.lead("c_custkey", 1).over(w).alias("next_custkey"),
            F.first("c_custkey").over(wf).alias("poorest_custkey"),
            F.last("c_custkey").over(wf).alias("richest_custkey"),
        )
        .orderBy("nation", "c_custkey")
    )


def window_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-user rolling 1-hour event sum/count, frame
    bounded by event-TIME (epoch seconds), not row position — the
    batch-mode twin of a sliding stream aggregate, and the frame type the
    rest of the window family doesn't cover. Exact decimal accumulation;
    count breaks ties deterministically (same-timestamp rows share a frame
    in RANGE semantics on both engines)."""
    ev = load_table(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts")
    w = (
        W.partitionBy("user_id")
        .orderBy(epoch)
        .rangeBetween(-3600, 0)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round(F.sum(F.col("value").cast(DEC)).over(w), 2)
            .cast("double")
            .alias("rolling_1h_value"),
            F.count("*").over(w).alias("rolling_1h_events"),
        )
        .orderBy("user_id", "event_id")
    )


def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by value (ORDER BY … LIMIT k): Spark plans TakeOrdered —
    per-partition heaps, no full sort; scale-independent result size."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", _fr(F.col("o_totalprice"), 2).alias("o_totalprice"))
    )


# ---------------------------------------------------------------------------
# Relational completeness (§2B): set ops, pivot/unpivot
# ---------------------------------------------------------------------------

def set_union_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of customer-nations and supplier-nations."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .union(supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
        .orderBy("nationkey")
    )


def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations with both customers and suppliers."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .intersect(supplier.select(F.col("s_nationkey").alias("nationkey")))
        .orderBy("nationkey")
    )


def set_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: nations with customers but no well-capitalized supplier."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .subtract(
            supplier.filter(F.col("s_acctbal") > 5000)
            .select(F.col("s_nationkey").alias("nationkey"))
        )
        .orderBy("nationkey")
    )


def pivot_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts, priority × status matrix. Explicit pivot values
    keep the plan single-pass (no extra distinct scan)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
        .orderBy("o_orderpriority")
    )


def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (stack): wide measures → long (measure, value) rows, then
    aggregate per measure."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.selectExpr(
        "l_returnflag",
        "stack(3, 'quantity', l_quantity, 'extendedprice', l_extendedprice, 'discount', l_discount) as (measure, value)",
    )
    return (
        long.groupBy("l_returnflag", "measure")
        .agg(_sum2(F.col("value")).alias("total"), F.count("*").alias("n"))
        .orderBy("l_returnflag", "measure")
    )


# ---------------------------------------------------------------------------
# Relational completeness (§2B): JSON / string / scalar functions
# ---------------------------------------------------------------------------

def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON functions over the events.props string column (the reference
    JSON-parses at every boundary — clickhouseToRedis.js:71, monthly.js:23)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    # spread_fact REVERTED here (r19, VERDICT r18 #1): the r18 spread put
    # the raw `props` JSON string through the round-robin exchange —
    # shuffling the payload cost more than the one-task JSON parse it
    # parallelized (driver bench 0.413 → 0.714 s at 32c, break-even at
    # 8c). Parsing below the exchange would serialize on the one-split
    # scan anyway, so the scalable shape is simply no exchange: parse in
    # the scan pipeline, shuffle only the (k_bucket, partials) agg rows.
    return (
        ev.select(k.alias("k"))
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(F.count("*").alias("n"), F.sum("k").alias("sum_k"))
        .orderBy("k_bucket")
    )


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar surface: lower/upper/concat/substring/replace/length/
    split (the reference's string ops: escaping at monthly.js:58, lowercase
    keys at monthly.js:14)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.size(F.split("p_name", " ")).alias("name_words"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowels"),
    ).orderBy("p_partkey")


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped: unshipped-revenue top-10 — segment-filtered customer
    (broadcast) ⋈ orders ⋈ lineitem, revenue per order, TakeOrdered top-10.
    The classic join+agg+top-k ladder a serving API issues ad hoc."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1997-06-30").cast("timestamp")
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", _dstr(F.col("o_orderdate")).alias("o_orderdate"), "o_orderpriority")
        .agg(_sum2(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def late_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped: orders with at least one lineitem shipped >60 days
    after the order date, counted per priority — EXISTS (semi join) + date
    arithmetic. Semi join shuffles only keys; the date predicate pushes into
    the lineitem⋈orders join condition."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = orders.alias("o")
    late = li.alias("l").join(
        o,
        (F.col("l.l_orderkey") == F.col("o.o_orderkey"))
        & (F.col("l.l_shipdate") > F.date_add(F.col("o.o_orderdate"), 60)),
        "left_semi",
    )  # lineitems that are late w.r.t. their order
    late_orders = orders.join(
        late.select("l_orderkey").distinct(),
        F.col("o_orderkey") == F.col("l_orderkey"),
        "left_semi",
    )
    return (
        late_orders.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_late_orders"))
        .orderBy("o_orderpriority")
    )


def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic array aggregation: per nation, its region name and the
    lexicographically sorted supplier-name list joined to one string
    (collect_list is order-nondeterministic — sort_array pins it; the
    oracle's list(x ORDER BY x) is the SQL twin)."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.array_join(F.sort_array(F.collect_list("s_name")), ",").alias("supplier_names"),
        )
        .orderBy("n_name")
    )


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the generalization under rollup/cube: revenue
    at (returnflag, linestatus), (returnflag) and grand-total grains in ONE
    pass. Spark expands the sets map-side (Expand node) so the fact table is
    still scanned once and the shuffle carries |sets|×|groups| rows — the
    same single-scan contract ClickHouse-style engines promise for
    WITH TOTALS. grouping_id disambiguates the null-as-subtotal rows."""
    li = spread_fact(load_table(spark, sf_dir, "lineitem"))
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            _sum2(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_rows"),
            F.grouping_id().cast("int").alias("gid"),
        )
        .orderBy(
            F.col("gid"),
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


GRAIN_TOP_K = 3          # brands reported per grain
GRAIN_YEAR = 2000        # the audited ship-year (full year in the data)


def rollup_topk_per_grain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS-Q67-shaped ranked rollup: the top-K revenue brands WITHIN
    EACH QUARTER of a ship-year and ACROSS the whole year, in one
    result. The textbook form runs one aggregate+rank query per grain
    and UNION ALLs them — N+1 fact scans for N+1 grains. The engine
    computes every grain in ONE pass: a GROUPING SETS aggregate (Expand
    — the fact is scanned once, the shuffle carries |sets|×|groups|
    rows) feeds ONE window that ranks brands inside each
    (grouping-set, quarter) partition; partition count = grains, width
    = |brands| — both constants, so the window never skews.

    The composite is the piece grouping_sets_revenue and
    window_topk_per_group each cover alone: rank-within-rollup-grain,
    the shape of every "top movers per period AND overall" report.
    Revenue is `_sum2`-exact; ranks ride row_number over the total
    (revenue DESC, brand) order, so the top-K cut is engine-exact.
    NULL quarter marks the year grain (the rollup convention), surfaced
    as quarter 0 so the oracle compare never hashes a NULL key.

    Oracle: the UNREWRITTEN per-grain UNION ALL (two aggregate scans +
    two ranked subqueries), proving the Expand+window rewrite."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(f"{GRAIN_YEAR}-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{GRAIN_YEAR + 1}-01-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    grains = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.quarter("l_shipdate").alias("qtr"), "p_brand", rev.alias("r"))
        .groupingSets([["qtr", "p_brand"], ["p_brand"]], "qtr", "p_brand")
        .agg(_sum2(F.col("r")).alias("revenue"))
    )
    # qtr 0 = the year grain (quarters are 1-4, so 0 is free) — the
    # coalesce happens BEFORE the window, making qtr alone the grain
    # key: 5 partitions, each |brands| wide
    w = W.partitionBy("qtr").orderBy(F.col("revenue").desc(), "p_brand")
    ranked = grains.withColumn(
        "qtr", F.coalesce(F.col("qtr"), F.lit(0)).cast("int")
    ).withColumn("brand_rank", F.row_number().over(w).cast("int"))
    return (
        ranked.filter(F.col("brand_rank") <= GRAIN_TOP_K)
        .select(
            F.when(F.col("qtr") == 0, F.lit("year")).otherwise(
                F.lit("quarter")
            ).alias("grain"),
            "qtr",
            "p_brand",
            "revenue",
            "brand_rank",
        )
        .orderBy("qtr", "brand_rank")
    )


def histogram_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram over events.value: width-25 buckets clamped at
    10 — the one-shuffle shape of every monitoring histogram at 100 TB
    (bucket cardinality is constant, so the aggregate never skews, and the
    bucketing expression stays in codegen)."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 25), F.lit(10)).cast("int")
    return (
        ev.select(bucket.alias("bucket"), "value")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            _sum2(F.col("value")).alias("sum_value"),
        )
        .select("bucket", (F.col("bucket") * 25).alias("bucket_lo"), "n", "sum_value")
        .orderBy("bucket")
    )


SKYLINE_BUCKETS = 32  # phase-1 partitions for the distributed skyline


def _skyline_filter(df: DataFrame, part_cols: list) -> DataFrame:
    """One skyline pass: a row survives iff no strictly-cheaper row has an
    equal-or-earlier date (RANGE frame on integer cents excludes the equal-
    price band) and no equal-price row has a strictly earlier date."""
    w_cheaper = (
        W.partitionBy(*part_cols)
        .orderBy("pc")
        .rangeBetween(W.unboundedPreceding, -1)
    )
    w_equal = W.partitionBy(*part_cols, "pc")
    return (
        df.withColumn("m1", F.min("ds").over(w_cheaper))
        .withColumn("m2", F.min("ds").over(w_equal))
        .filter(
            (F.col("m1").isNull() | (F.col("m1") > F.col("ds")))
            & (F.col("ds") == F.col("m2"))
        )
        .drop("m1", "m2")
    )


def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline / Pareto frontier (Börzsönyi, Kossmann, Stocker 2001,
    "The Skyline Operator"): orders not dominated on (price, date) — no
    other order is both cheaper-or-equal AND earlier-or-equal with at
    least one strict. The multi-criteria shortlist query (cheapest-AND-
    earliest tradeoff curve) relational engines added SKYLINE OF syntax
    for; here it composes from two window passes per phase.

    Distributed shape — skylines are distributive, so this avoids the
    single-partition global window: phase 1 computes a LOCAL skyline
    inside each of SKYLINE_BUCKETS hash buckets (any bucket-mate dominator
    is also a global dominator, so no skyline row is lost); phase 2 runs
    the same filter globally on the tiny survivor union (bounded by the
    sum of per-bucket skyline sizes — O(buckets·log n) for random data).
    The strictly-cheaper band uses a RANGE frame over integer price cents,
    so "price < mine" is exact frame arithmetic, not an epsilon. The
    oracle is the single-pass formulation — an independent implementation
    the two-phase plan must equal exactly (the distributivity proof,
    executed)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("pc"),
        F.col("o_orderdate").cast("long").alias("ds"),
        _dstr(F.col("o_orderdate")).alias("order_date"),
    )
    local = _skyline_filter(
        o.withColumn("b", F.pmod("o_orderkey", F.lit(SKYLINE_BUCKETS))), ["b"]
    )
    return (
        _skyline_filter(local, [])
        .select("o_orderkey", "o_totalprice", "order_date")
        .orderBy("o_totalprice", "o_orderkey")
    )


ORACLE: dict[str, str] = {
    "skyline_pareto": """
        WITH t AS (
            SELECT o_orderkey, o_totalprice,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS pc,
                   epoch(o_orderdate) AS ds,
                   strftime(o_orderdate, '%Y-%m-%d') AS order_date
            FROM orders
        ),
        sc AS (
            SELECT *,
                   min(ds) OVER (ORDER BY pc
                       RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1,
                   min(ds) OVER (PARTITION BY pc) AS m2
            FROM t
        )
        SELECT o_orderkey, o_totalprice, order_date
        FROM sc
        WHERE (m1 IS NULL OR m1 > ds) AND ds = m2
        ORDER BY o_totalprice, o_orderkey
    """,
    "shipping_priority": f"""
        SELECT l_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o_orderpriority,
               {_sql_sum2('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
          AND l_shipdate  > TIMESTAMP '1997-06-30 00:00:00'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "late_orders_by_priority": """
        SELECT o_orderpriority, count(*) AS n_late_orders
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        )
        GROUP BY 1
        ORDER BY 1
    """,
    "agg_collect_sorted": """
        SELECT n_name,
               count(*) AS n_suppliers,
               array_to_string(list(s_name ORDER BY s_name), ',') AS supplier_names
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name
    """,
    "pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {_sql_sum2('l_quantity')}                                        AS sum_qty,
               {_sql_sum2('l_extendedprice')}                                   AS sum_base_price,
               {_sql_sum2('l_extendedprice * (1 - l_discount)')}                AS sum_disc_price,
               {_sql_sum2('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}  AS sum_charge,
               {_sql_avg4('l_quantity')}                                        AS avg_qty,
               {_sql_avg4('l_extendedprice')}                                   AS avg_price,
               {_sql_avg4('l_discount')}                                        AS avg_disc,
               count(*)                                                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "monthly_rollup": f"""
        SELECT event_type,
               strftime(date_trunc('month', ts), '%Y-%m-%d') AS month,
               {_sql_avg4('value')}                          AS avg_value,
               {_sql_sum2('value')}                          AS total_value,
               count(*)                                      AS rows_loaded
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "monthly_filtered": f"""
        SELECT strftime(date_trunc('month', ts), '%Y-%m-%d') AS month,
               {_sql_avg4('value')}                          AS avg_value,
               {_sql_sum2('value')}                          AS total_value,
               count(*)                                      AS rows_loaded
        FROM events
        WHERE event_type = 'click'
        GROUP BY 1
        ORDER BY 1
    """,
    "projection_sort": """
        SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
        FROM orders
        ORDER BY o_orderstatus, o_orderpriority, o_orderkey
    """,
    "coercion_fill_policy": f"""
        SELECT event_id,
               {_sql_fr('CASE WHEN value >= 0.5 THEN value END', 4)}               AS value_nullable,
               {_sql_fr('coalesce(CASE WHEN value >= 0.5 THEN value END, 0)', 4)}  AS value_zero_filled,
               {_sql_fr('CASE WHEN value >= 0.5 THEN value END * 9 / 5 + 32', 4)}  AS value_fahrenheit
        FROM events
        ORDER BY event_id
    """,
    "derived_revenue": f"""
        SELECT l_orderkey, l_linenumber,
               {_sql_fr('l_extendedprice * (1 - l_discount)', 2)}                AS revenue,
               {_sql_fr('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 2)}  AS charge
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber
    """,
    "date_normalization": """
        SELECT event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_normalized,
               strftime(ts, '%Y-%m-%d')          AS event_date,
               CAST(hour(ts) AS INT)             AS event_hour
        FROM events
        ORDER BY event_id
    """,
    "presentation_format": f"""
        SELECT event_type,
               strftime(date_trunc('month', ts), '%b %Y') AS month_label,
               {_sql_avg4('value', 1)}                    AS avg_value_1dp
        FROM events
        GROUP BY event_type, month_label
        ORDER BY event_type, month_label
    """,
    "lineage_projection": """
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               coalesce(o_orderpriority, '')     AS priority_filled,
               1                                 AS rows_loaded,
               60                                AS sync_interval_min,
               'incremental'                     AS load_mode
        FROM orders
        ORDER BY o_orderkey
    """,
    "count_diagnostic": "SELECT count(*) AS total FROM events",
    "filter_limit_sample": f"""
        SELECT event_id, user_id, event_type, {_sql_fr('value', 4)} AS value
        FROM events WHERE event_type = 'click'
        ORDER BY event_id LIMIT 5
    """,
    "join_star_revenue": f"""
        SELECT r_name, n_name,
               {_sql_sum2('l_extendedprice * (1 - l_discount)')} AS revenue,
               count(*)                                          AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
    """,
    "join_left_order_counts": f"""
        SELECT c_custkey, c_mktsegment,
               coalesce(n, 0)          AS n_orders,
               coalesce(spend, 0.0)    AS total_spend
        FROM customer
        LEFT JOIN (
            SELECT o_custkey, count(*) AS n, {_sql_sum2('o_totalprice')} AS spend
            FROM orders GROUP BY o_custkey
        ) ON c_custkey = o_custkey
        ORDER BY c_custkey
    """,
    "join_semi_active_customers": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        ORDER BY c_custkey
    """,
    "join_anti_unordered_parts": """
        SELECT p_partkey, p_name, p_brand
        FROM part
        WHERE NOT EXISTS (SELECT 1 FROM lineitem
                          WHERE l_partkey = p_partkey
                            AND l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
        ORDER BY p_partkey
    """,
    "join_full_outer_nation_presence": """
        SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
               coalesce(n_customers, 0)           AS n_customers,
               coalesce(n_suppliers, 0)           AS n_suppliers
        FROM (SELECT c_nationkey, count(*) AS n_customers FROM customer GROUP BY 1) c
        FULL OUTER JOIN (SELECT s_nationkey, count(*) AS n_suppliers FROM supplier GROUP BY 1) s
          ON c_nationkey = s_nationkey
        ORDER BY nationkey
    """,
    # deliberately the UNREWRITTEN correlated form (two EXISTS self-joins):
    # matching the engine's single-grouped-pass rewrite proves semantic
    # equivalence of the Q21-shaped rewrite, not just self-consistency
    "sole_return_supplier": """
        WITH culprit AS (
            SELECT DISTINCT l1.l_suppkey, l1.l_orderkey
            FROM lineitem l1
            JOIN orders ON o_orderkey = l1.l_orderkey
            WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
              AND EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lineitem l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_returnflag = 'R')
        )
        SELECT s_suppkey, s_name, count(*) AS n_orders
        FROM culprit JOIN supplier ON s_suppkey = l_suppkey
        GROUP BY 1, 2
        ORDER BY n_orders DESC, s_name
    """,
    # the UNREWRITTEN Q13 textbook form: outer join first, count second —
    # matching the engine's aggregate-pushdown rewrite proves equivalence
    # (count(o_orderkey) counts nothing for the padded NULL row ≙ the
    # engine's coalesce-to-0 on the pre-aggregated side)
    "customer_order_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer LEFT OUTER JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey) pc
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    # the UNREWRITTEN Q17 correlated-scalar-subquery form (per-row
    # re-aggregation of lineitem); matching the engine's single-scan
    # window rewrite proves equivalence. The compare is division-free
    # integer math (5*qty*cnt < sum), exact on both engines.
    "small_quantity_part_revenue": f"""
        SELECT p_brand,
               count(*) AS n_small_lines,
               {_sql_sum2('l_extendedprice')} AS small_revenue
        FROM lineitem l JOIN part ON p_partkey = l_partkey
        WHERE CAST(l_quantity AS BIGINT) * 5
              * (SELECT count(*) FROM lineitem l2
                 WHERE l2.l_partkey = l.l_partkey)
            < (SELECT sum(CAST(l_quantity AS BIGINT)) FROM lineitem l2
               WHERE l2.l_partkey = l.l_partkey)
        GROUP BY p_brand
        ORDER BY p_brand
    """,
    # the UNREWRITTEN Q18 textbook form: 3-way join re-aggregated, plus
    # the HAVING-filtered IN subquery aggregating lineitem a second time
    # — matching the engine's aggregate-once-and-reuse rewrite proves it
    "large_volume_orders": f"""
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o_totalprice,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM customer, orders, lineitem
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey
                             HAVING sum(CAST(l_quantity AS BIGINT)) > {LARGE_ORDER_MIN_QTY})
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
    """,
    # the UNREWRITTEN Q22 form: uncorrelated scalar AVG subquery (as the
    # division-free bal*cnt > sum compare, exact in DECIMAL(12,2)) plus
    # a correlated NOT EXISTS — matching the engine's 1-row-broadcast +
    # anti-join rewrite proves it
    "wealthy_idle_customers": f"""
        SELECT c_mktsegment,
               count(*) AS n_customers,
               CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
                   AS total_balance
        FROM customer c
        WHERE CAST(c_acctbal AS DECIMAL(12,2))
              * (SELECT count(*) FROM customer WHERE c_acctbal > 0)
            > (SELECT sum(CAST(c_acctbal AS DECIMAL(12,2))) FROM customer
               WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c.c_custkey
                            AND o_orderdate >= TIMESTAMP '{IDLE_CUTOFF} 00:00:00')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    # the UNREWRITTEN Q15 form: the revenue view probed by a correlated
    # max re-aggregation — matching the engine's quarter-partitioned
    # window rewrite proves it; the 2-dp decimal rounding makes the tie
    # set identical cross-engine
    "quarterly_top_supplier": f"""
        WITH rev AS (
            SELECT CAST(year(l_shipdate) AS VARCHAR) || '-Q'
                       || CAST(quarter(l_shipdate) AS VARCHAR) AS qtr,
                   l_suppkey,
                   {_sql_sum2('l_extendedprice * (1 - l_discount)')} AS total_revenue
            FROM lineitem
            GROUP BY 1, 2
        )
        SELECT qtr, s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev r2
                               WHERE r2.qtr = rev.qtr)
        ORDER BY qtr, s_suppkey
    """,
    # the UNREWRITTEN Q7 textbook form: 6-way join with the nation-pair
    # OR predicate applied AFTER the join — matching the engine's
    # pushed-into-both-dims rewrite proves the factoring equivalent.
    # year() is cast to INTEGER to match Spark's int32 year().
    "nation_trade_volume": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               {_sql_sum2('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = '{TRADE_NATIONS[0]}' AND n2.n_name = '{TRADE_NATIONS[1]}')
            OR (n1.n_name = '{TRADE_NATIONS[1]}' AND n2.n_name = '{TRADE_NATIONS[0]}'))
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    # the UNREWRITTEN Q8 textbook form: 7-table join, CASE inside the
    # share division — matching the engine's semi-join + one-pass
    # conditional-aggregate rewrite proves it. The share divides the
    # two already-rounded sums (identical bits cross-engine).
    "regional_market_share": f"""
        WITH all_nations AS (
            SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                   l_extendedprice * (1 - l_discount) AS vol,
                   n2.n_name AS supp_nation
            FROM lineitem, orders, customer, supplier,
                 nation n1, nation n2, region
            WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
              AND l_suppkey = s_suppkey
              AND c_nationkey = n1.n_nationkey
              AND n1.n_regionkey = r_regionkey
              AND r_name = '{MKT_REGION}'
              AND s_nationkey = n2.n_nationkey
        ), shares AS (
            SELECT o_year,
                   {_sql_sum2("CASE WHEN supp_nation = '" + MKT_TARGET_NATION + "' THEN vol ELSE 0 END")}
                       AS target_revenue,
                   {_sql_sum2('vol')} AS total_revenue
            FROM all_nations
            GROUP BY o_year
        )
        SELECT o_year, target_revenue, total_revenue,
               {_sql_fr('target_revenue / total_revenue', 4)} AS mkt_share
        FROM shares
        ORDER BY o_year
    """,
    # the UNREWRITTEN Q10 textbook form: group on the full customer
    # tuple AFTER the 4-way join — matching the engine's aggregate-first
    # rewrite (group on c_custkey, dims joined onto the aggregate)
    # proves the functional-dependence factoring. Total tie order
    # (exact 2-dp revenue DESC, custkey) makes LIMIT 20 deterministic.
    "returned_item_customers": f"""
        SELECT c_custkey, c_name, n_name, c_acctbal,
               {_sql_sum2('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '{RETURN_QTR_START} 00:00:00'
          AND o_orderdate <  TIMESTAMP '{RETURN_QTR_END} 00:00:00'
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, n_name, c_acctbal
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    # the UNREWRITTEN Q14 textbook form: CASE-inside-division over the
    # part join — matching the engine's pruned-broadcast conditional
    # aggregate proves it
    "promo_revenue_share": f"""
        WITH m AS (
            SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
                   {_sql_sum2("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
                       AS promo_revenue,
                   {_sql_sum2('l_extendedprice * (1 - l_discount)')} AS total_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '{PROMO_YEAR_START} 00:00:00'
              AND l_shipdate <  TIMESTAMP '{PROMO_YEAR_END} 00:00:00'
            GROUP BY ship_month
        )
        SELECT ship_month, promo_revenue, total_revenue,
               {_sql_fr('100.0 * promo_revenue / total_revenue', 4)} AS promo_pct
        FROM m
        ORDER BY ship_month
    """,
    # the UNREWRITTEN Q19 textbook form: the whole OR-of-conjunctions in
    # one WHERE over the plain join — matching the engine's factored
    # superset-pushdown + residual-OR rewrite proves the factoring
    "disjunctive_brand_revenue": f"""
        SELECT p_brand,
               count(*) AS n_lines,
               {_sql_sum2('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE {' OR '.join(
            f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi}"
            f" AND l_quantity BETWEEN {qlo} AND {qhi})"
            for b, slo, shi, qlo, qhi in DISJ_BRANCH
        )}
        GROUP BY p_brand
        ORDER BY p_brand
    """,
    # Q6: same textbook single-WHERE form — the pair pins the pushdown
    # plan and the exact decimal aggregate, not a rewrite
    "discount_elimination_revenue": f"""
        SELECT {_sql_sum2('l_extendedprice * l_discount')} AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{FORECAST_YEAR_START} 00:00:00'
          AND l_shipdate <  TIMESTAMP '{FORECAST_YEAR_END} 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    # the UNREWRITTEN Q2 textbook form: the pseudo-partsupp aggregated
    # over ALL parts, probed by a correlated scalar MIN per row —
    # matching the engine's family-filter-pushdown + aggregate-equi-join
    # rewrite proves both (the min is per-partkey, so filtering the
    # family before or after the pair aggregation is equivalence the
    # hash check certifies rather than assumes)
    "min_cost_supplier": f"""
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   min({_sql_fr('l_extendedprice / l_quantity', 4)}) AS cost
            FROM lineitem GROUP BY 1, 2
        )
        SELECT s_acctbal, s_name, n_name,
               l_partkey AS p_partkey, p_name, cost
        FROM ps, part, supplier, nation
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND p_type = '{MIN_COST_PART_TYPE}' AND s_nationkey = n_nationkey
          AND cost = (SELECT min(cost) FROM ps ps2
                      WHERE ps2.l_partkey = ps.l_partkey)
        ORDER BY s_acctbal DESC, p_partkey, s_suppkey
        LIMIT 100
    """,
    # the UNREWRITTEN Q9 textbook form: flat 6-way join with the
    # two-table profit expression in the aggregate
    "nation_profit": f"""
        SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
               {_sql_sum2(
                   'l_extendedprice * (1 - l_discount) - '
                   + PROFIT_COST_RATE + ' * p_retailprice * l_quantity'
               )} AS profit
        FROM lineitem, part, supplier, orders, nation
        WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
          AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
          AND p_name LIKE '%{PROFIT_NAME_PART}%'
        GROUP BY 1, 2
        ORDER BY n_name, o_year DESC
    """,
    # the UNREWRITTEN Q11 textbook form: HAVING against scalar
    # subqueries that re-aggregate the same table (three lineitem
    # scans) — matching the engine's aggregate-once + 1-row-broadcast
    # rewrite proves it. The compare mirrors the engine's double-cast
    # form exactly (see the operator docstring for why not decimal).
    "important_part_value": """
        WITH val AS (
            SELECT l_partkey,
                   sum(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(30,10))) AS v
            FROM lineitem GROUP BY 1
        )
        SELECT l_partkey AS p_partkey, CAST(round(v, 2) AS DOUBLE) AS value
        FROM val
        WHERE CAST(v AS DOUBLE) * (SELECT count(*) FROM val)
              > 1.5 * CAST((SELECT sum(v) FROM val) AS DOUBLE)
        ORDER BY value DESC, p_partkey
    """,
    # the UNREWRITTEN Q16 textbook form: NOT IN subquery + distinct
    # count over the pseudo pair table
    "supplier_count_by_part_family": f"""
        SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs, part
        WHERE p_partkey = l_partkey
          AND p_brand <> 'Brand#1'
          AND p_size IN ({', '.join(str(s) for s in FAMILY_SIZES)})
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
    # the UNREWRITTEN Q20 textbook form: doubly-nested IN with a
    # correlated per-part total subquery — matching the engine's
    # flattened aggregate-join form proves the decorrelation
    "excess_share_suppliers": f"""
        WITH fam AS (SELECT p_partkey FROM part
                     WHERE p_name LIKE '{EXCESS_NAME_PREFIX}%'),
        q AS (
            SELECT l_partkey, l_suppkey,
                   sum(CAST(l_quantity AS BIGINT)) AS sq
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM fam)
            GROUP BY 1, 2
        )
        SELECT s_suppkey, s_name, n_name, s_acctbal
        FROM supplier, nation
        WHERE s_nationkey = n_nationkey
          AND s_suppkey IN (
              SELECT l_suppkey FROM q
              WHERE sq * (SELECT count(*) FROM q q2
                          WHERE q2.l_partkey = q.l_partkey)
                    > 3 * (SELECT sum(sq) FROM q q3
                           WHERE q3.l_partkey = q.l_partkey))
        ORDER BY s_suppkey
    """,
    # the UNREWRITTEN Q12 textbook form: the pseudo columns derived over
    # the FULL table (no shipdate bound — the oracle filters only the
    # derived receipt/commit dates, so the hash match certifies the
    # engine's derived-bound parquet pushdown is lossless), join first,
    # CASE-sum after — matching the engine's classify-before-join +
    # filter-below-join rewrite proves both
    "shipmode_priority_counts": f"""
        WITH li AS (
            SELECT l_orderkey,
                   ([{', '.join(f"'{m}'" for m in SHIPMODES)}])[
                       CAST((l_orderkey + 3 * l_linenumber) % 7 + 1 AS INTEGER)
                   ] AS l_shipmode,
                   CAST(l_shipdate AS DATE) AS ship_d,
                   CAST(l_shipdate AS DATE)
                       + CAST(l_partkey % 31 - 5 AS INTEGER) AS l_commitdate,
                   CAST(l_shipdate AS DATE)
                       + CAST(l_partkey % 31 - 5 AS INTEGER)
                       + CAST(l_suppkey % 14 - 4 AS INTEGER) AS l_receiptdate
            FROM lineitem
        )
        SELECT l_shipmode,
               CAST(sum(CASE WHEN o_orderpriority IN
                        ({', '.join(f"'{p}'" for p in HIGH_PRIORITIES)})
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN
                        ({', '.join(f"'{p}'" for p in HIGH_PRIORITIES)})
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM li JOIN orders ON o_orderkey = l_orderkey
        WHERE l_shipmode IN ({', '.join(f"'{m}'" for m in SHIPMODE_TARGETS)})
          AND l_commitdate < l_receiptdate
          AND ship_d < l_commitdate
          AND l_receiptdate >= DATE '{RECEIPT_YEAR_START}'
          AND l_receiptdate <  DATE '{RECEIPT_YEAR_END}'
        GROUP BY l_shipmode
        ORDER BY l_shipmode
    """,
    # the UNREWRITTEN TPC-DS-Q75-shaped form: one aggregate subquery PER
    # YEAR, equi-joined on brand (two fact scans) — matching the engine's
    # single-scan conditional aggregate proves the rewrite
    # the UNREWRITTEN Q23 textbook form: two independent CTE pipelines,
    # a scalar max subquery, and both IN-filters applied AFTER the
    # fact⋈orders join — matching the engine's filter-both-inputs-first
    # semi-join form proves the restructure. Arithmetic mirrored exactly:
    # decimal(28,10) spends, s+s ≥ max (addition, never a precision-39
    # multiply)
    "frequent_best_customer_revenue": f"""
        WITH freq AS (
            SELECT l_partkey
            FROM (SELECT DISTINCT l_partkey,
                         strftime(l_shipdate, '%Y-%m-%d') AS d
                  FROM lineitem)
            GROUP BY l_partkey
            HAVING count(*) >= {FREQ_MIN_DAYS}
        ),
        spend AS (
            SELECT o_custkey,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(30,10)))
                        AS DECIMAL(28,10)) AS s
            FROM orders GROUP BY 1
        ),
        best AS (
            SELECT o_custkey FROM spend
            WHERE s + s >= (SELECT max(s) FROM spend)
        )
        SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
               count(*) AS n_lines,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(30,10))), 2) AS DOUBLE)
                   AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '{BEST_YEAR}-01-01'
          AND l.l_shipdate <  TIMESTAMP '{BEST_YEAR + 1}-01-01'
          AND l.l_partkey IN (SELECT l_partkey FROM freq)
          AND o.o_custkey IN (SELECT o_custkey FROM best)
        GROUP BY 1
        ORDER BY 1
    """,
    "yoy_revenue_delta": f"""
        WITH prev AS (
            SELECT p_brand, {_sql_sum2('l_extendedprice * (1 - l_discount)')} AS prev_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '{YOY_PREV}-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '{YOY_PREV + 1}-01-01 00:00:00'
            GROUP BY p_brand
        ),
        curr AS (
            SELECT p_brand, {_sql_sum2('l_extendedprice * (1 - l_discount)')} AS curr_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '{YOY_CURR}-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '{YOY_CURR + 1}-01-01 00:00:00'
            GROUP BY p_brand
        )
        SELECT prev.p_brand, prev_revenue, curr_revenue,
               {_sql_fr('curr_revenue - prev_revenue', 2)} AS revenue_delta
        FROM prev JOIN curr ON prev.p_brand = curr.p_brand
        WHERE curr_revenue < prev_revenue
        ORDER BY revenue_delta, prev.p_brand
    """,
    "agg_statistics": f"""
        SELECT l_returnflag,
               {_sql_fr('min(l_extendedprice)', 2)}    AS min_price,
               {_sql_fr('max(l_extendedprice)', 2)}    AS max_price,
               {_sql_fr('stddev_samp(l_quantity)', 4)} AS stddev_qty,
               {_sql_fr('var_samp(l_quantity)', 4)}    AS var_qty,
               count(DISTINCT l_suppkey)               AS n_suppliers,
               count(DISTINCT l_partkey)               AS n_parts
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "agg_quantiles": f"""
        SELECT l_linestatus,
               {_sql_fr('quantile_cont(l_extendedprice, 0.5)', 4)}  AS p50_price,
               {_sql_fr('quantile_cont(l_extendedprice, 0.9)', 4)}  AS p90_price,
               {_sql_fr('quantile_cont(l_quantity, 0.25)', 4)}      AS p25_qty
        FROM lineitem
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    "rollup_totals": f"""
        SELECT l_returnflag, l_linestatus,
               {_sql_sum2('l_quantity')} AS sum_qty, count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "cube_totals": f"""
        SELECT o_orderstatus, o_orderpriority,
               {_sql_sum2('o_totalprice')} AS sum_price, count(*) AS n
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    "conditional_agg": f"""
        SELECT o_orderstatus,
               {_sql_sum2("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END")} AS urgent_value,
               count(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END)         AS urgent_n,
               {_sql_avg4("CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END")}     AS urgent_share
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    "window_topk_per_group": f"""
        SELECT o_custkey, rk, o_orderkey, {_sql_fr('o_totalprice', 2)} AS o_totalprice
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (PARTITION BY o_custkey
                                           ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
            FROM orders
        ) ranked
        WHERE rk <= 3
        ORDER BY o_custkey, rk
    """,
    "window_lag_delta": """
        WITH monthly AS (
            SELECT event_type,
                   strftime(date_trunc('month', ts), '%Y-%m-%d') AS month,
                   sum(CAST(value AS DECIMAL(30,10))) AS total
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, month,
               CAST(round(total, 2) AS DOUBLE) AS total_value,
               CAST(round(total - lag(total) OVER (PARTITION BY event_type ORDER BY month), 2) AS DOUBLE) AS delta_prev_month,
               CAST(round(lead(total) OVER (PARTITION BY event_type ORDER BY month), 2) AS DOUBLE)        AS next_month_total
        FROM monthly
        ORDER BY event_type, month
    """,
    # ordering tie-broken by the summands — see window_running_sum's
    # docstring (duplicate (orderkey, linenumber) keys in the data)
    "window_running_sum": """
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10)))
                     OVER (PARTITION BY l_suppkey
                           ORDER BY l_shipdate, l_orderkey, l_linenumber,
                                    l_extendedprice, l_discount
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_revenue
        FROM lineitem
        ORDER BY l_suppkey, l_orderkey, l_linenumber
    """,
    "window_rolling_1h": """
        SELECT user_id, event_id,
               CAST(round(sum(CAST(value AS DECIMAL(30,10)))
                     OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
                   AS rolling_1h_value,
               count(*) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                              RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
                   AS rolling_1h_events
        FROM events
        ORDER BY user_id, event_id
    """,
    "window_rank_dense": f"""
        SELECT p_brand, p_partkey, {_sql_fr('p_retailprice', 2)} AS p_retailprice,
               price_rank, price_dense_rank, price_quartile
        FROM (
            SELECT p_brand, p_partkey, p_retailprice,
                   CAST(rank()       OVER w AS INT) AS price_rank,
                   CAST(dense_rank() OVER w AS INT) AS price_dense_rank,
                   CAST(ntile(4)     OVER w AS INT) AS price_quartile
            FROM part
            WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
        ) ranked
        ORDER BY p_brand, price_rank, p_partkey
    """,
    "window_distribution_funcs": f"""
        SELECT CAST(c_nationkey AS INT) AS nation,
               c_custkey,
               {_sql_fr('c_acctbal', 2)} AS acctbal,
               {_sql_fr('percent_rank() OVER w', 6)} AS pct_rank,
               {_sql_fr('cume_dist() OVER w', 6)} AS cume_dist,
               lead(c_custkey, 1) OVER w AS next_custkey,
               first_value(c_custkey) OVER wf AS poorest_custkey,
               last_value(c_custkey) OVER wf AS richest_custkey
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey),
               wf AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY nation, c_custkey
    """,
    "topk_global": f"""
        SELECT o_orderkey, o_custkey, {_sql_fr('o_totalprice', 2)} AS o_totalprice
        FROM (
            SELECT * FROM orders
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 10
        ) top
        ORDER BY o_orderkey
    """,
    "set_union_nations": """
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey FROM supplier
        ORDER BY nationkey
    """,
    "set_intersect_nations": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
        ORDER BY nationkey
    """,
    "set_except_nations": """
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
        ORDER BY nationkey
    """,
    "pivot_status_matrix": """
        SELECT o_orderpriority,
               count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
               count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
               count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "unpivot_measures": f"""
        WITH long AS (
            SELECT l_returnflag, 'quantity' AS measure, l_quantity AS value FROM lineitem
            UNION ALL
            SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
            UNION ALL
            SELECT l_returnflag, 'discount', l_discount FROM lineitem
        )
        SELECT l_returnflag, measure, {_sql_sum2('value')} AS total, count(*) AS n
        FROM long
        GROUP BY l_returnflag, measure
        ORDER BY l_returnflag, measure
    """,
    "json_extract_props": """
        SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
               count(*)                                            AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
    "string_functions": """
        SELECT p_partkey,
               lower(p_name)                                    AS name_lower,
               upper(p_brand)                                   AS brand_upper,
               concat_ws('|', p_brand, p_type)                  AS brand_type,
               substring(p_type, 1, 5)                          AS type_prefix,
               CAST(length(p_name) AS INT)                      AS name_len,
               CAST(len(string_split(p_name, ' ')) AS INT)      AS name_words,
               regexp_replace(p_name, '[aeiou]', '', 'g')       AS name_novowels
        FROM part
        ORDER BY p_partkey
    """,
    # the UNREWRITTEN DS-Q67-shaped form: one aggregate+rank query PER
    # GRAIN, UNION ALLed (two fact scans) — matching the engine's single
    # Expand+window pass proves the rewrite
    "rollup_topk_per_grain": f"""
        WITH base AS (
            SELECT CAST(quarter(l_shipdate) AS INTEGER) AS qtr, p_brand,
                   l_extendedprice * (1 - l_discount) AS r
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '{GRAIN_YEAR}-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '{GRAIN_YEAR + 1}-01-01 00:00:00'
        ),
        per_quarter AS (
            SELECT 'quarter' AS grain, qtr, p_brand,
                   {_sql_sum2('r')} AS revenue,
                   CAST(row_number() OVER (
                       PARTITION BY qtr
                       ORDER BY {_sql_sum2('r')} DESC, p_brand
                   ) AS INTEGER) AS brand_rank
            FROM base GROUP BY qtr, p_brand
        ),
        per_year AS (
            SELECT 'year' AS grain, 0 AS qtr, p_brand,
                   {_sql_sum2('r')} AS revenue,
                   CAST(row_number() OVER (
                       ORDER BY {_sql_sum2('r')} DESC, p_brand
                   ) AS INTEGER) AS brand_rank
            FROM base GROUP BY p_brand
        )
        SELECT grain, qtr, p_brand, revenue, brand_rank
        FROM (SELECT * FROM per_quarter UNION ALL SELECT * FROM per_year)
        WHERE brand_rank <= {GRAIN_TOP_K}
        ORDER BY qtr, brand_rank
    """,
    "grouping_sets_revenue": f"""
        SELECT l_returnflag, l_linestatus,
               {_sql_sum2('l_extendedprice * (1 - l_discount)')} AS revenue,
               count(*) AS n_rows,
               CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "histogram_value_buckets": f"""
        SELECT bucket,
               bucket * 25 AS bucket_lo,
               count(*) AS n,
               {_sql_sum2('value')} AS sum_value
        FROM (SELECT CAST(least(floor(value / 25), 10) AS INT) AS bucket, value
              FROM events)
        GROUP BY bucket
        ORDER BY bucket
    """,
}


QUERIES = {
    "skyline_pareto": skyline_pareto,
    "pricing_summary": pricing_summary,
    "monthly_rollup": monthly_rollup,
    "monthly_filtered": monthly_filtered,
    "projection_sort": projection_sort,
    "coercion_fill_policy": coercion_fill_policy,
    "derived_revenue": derived_revenue,
    "date_normalization": date_normalization,
    "presentation_format": presentation_format,
    "lineage_projection": lineage_projection,
    "count_diagnostic": count_diagnostic,
    "filter_limit_sample": filter_limit_sample,
    "join_star_revenue": join_star_revenue,
    "join_left_order_counts": join_left_order_counts,
    "join_semi_active_customers": join_semi_active_customers,
    "join_anti_unordered_parts": join_anti_unordered_parts,
    "join_full_outer_nation_presence": join_full_outer_nation_presence,
    "sole_return_supplier": sole_return_supplier,
    "customer_order_distribution": customer_order_distribution,
    "small_quantity_part_revenue": small_quantity_part_revenue,
    "large_volume_orders": large_volume_orders,
    "wealthy_idle_customers": wealthy_idle_customers,
    "quarterly_top_supplier": quarterly_top_supplier,
    "nation_trade_volume": nation_trade_volume,
    "regional_market_share": regional_market_share,
    "returned_item_customers": returned_item_customers,
    "promo_revenue_share": promo_revenue_share,
    "disjunctive_brand_revenue": disjunctive_brand_revenue,
    "discount_elimination_revenue": discount_elimination_revenue,
    "min_cost_supplier": min_cost_supplier,
    "nation_profit": nation_profit,
    "important_part_value": important_part_value,
    "supplier_count_by_part_family": supplier_count_by_part_family,
    "excess_share_suppliers": excess_share_suppliers,
    "shipmode_priority_counts": shipmode_priority_counts,
    "yoy_revenue_delta": yoy_revenue_delta,
    "frequent_best_customer_revenue": frequent_best_customer_revenue,
    "rollup_topk_per_grain": rollup_topk_per_grain,
    "agg_statistics": agg_statistics,
    "agg_quantiles": agg_quantiles,
    "rollup_totals": rollup_totals,
    "cube_totals": cube_totals,
    "conditional_agg": conditional_agg,
    "window_topk_per_group": window_topk_per_group,
    "window_lag_delta": window_lag_delta,
    "window_running_sum": window_running_sum,
    "window_rank_dense": window_rank_dense,
    "window_distribution_funcs": window_distribution_funcs,
    "window_rolling_1h": window_rolling_1h,
    "topk_global": topk_global,
    "set_union_nations": set_union_nations,
    "set_intersect_nations": set_intersect_nations,
    "set_except_nations": set_except_nations,
    "pivot_status_matrix": pivot_status_matrix,
    "unpivot_measures": unpivot_measures,
    "json_extract_props": json_extract_props,
    "string_functions": string_functions,
    "shipping_priority": shipping_priority,
    "late_orders_by_priority": late_orders_by_priority,
    "agg_collect_sorted": agg_collect_sorted,
    "grouping_sets_revenue": grouping_sets_revenue,
    "histogram_value_buckets": histogram_value_buckets,
}
