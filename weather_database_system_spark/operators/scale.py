"""Scale patterns and the SQL entry point.

Three things a 100 TB deployment leans on, demonstrated as oracle-checked
queries:

- **Salted two-stage aggregation** (``skew_salted_agg``): when a group key is
  hot (one event_type = 40% of a 100 TB feed), a single hash-agg shuffle
  sends the hot key to one reducer. Salting splits each key into S
  sub-groups, aggregates partially per (key, salt), then merges the S
  partials — the hot key's work spreads over S reducers. The result is
  IDENTICAL to the unsalted groupBy (the oracle proves it: its SQL is the
  plain GROUP BY), because sum/count are reassociable and the value sums
  accumulate in exact decimals.
- **Sketch aggregates** (``approx_distinct_users``): HLL++/KLL sketches are
  mergeable (map-side partial, tiny shuffle payload) — the only viable shape
  for COUNT(DISTINCT) over 100 TB. Sketch values are engine-specific, so the
  query also emits the exact values; the sketch columns get a tolerance test
  in pytest instead of an oracle hash (rows-only for the driver).
- **SQL API** (``sql_*``): every query surface the engine exposes is equally
  reachable through ``spark.sql`` over registered views — including
  correlated subqueries, which Catalyst decorrelates into joins (SURVEY §4's
  RewriteCorrelatedScalarSubquery, exercised here on purpose).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_database_system_spark.operators.relational import (
    DEC,
    _fr,
    _sql_avg4,
    _sql_fr,
)
from weather_database_system_spark.sources.star import load_table, register_views

N_SALTS = 8


def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over events: count + decimal-exact sum
    + mean per event_type, with the hot-key shuffle split across N_SALTS
    reducers. Stage 1 groups on (event_type, salt); stage 2 merges partials
    per event_type. Equivalent to the plain GROUP BY — and checked as such."""
    ev = load_table(spark, sf_dir, "events")
    salted = ev.withColumn("salt", F.pmod(F.hash("event_id"), F.lit(N_SALTS)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast(DEC)).alias("s"),
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("s"), 2).cast("double").alias("total_value"),
        )
        .orderBy("event_type")
    )


HOT_MIN_LINES = 8  # fact rows per key to classify the key as hot; the
# hot set is PROVABLY bounded: |{k : count(k) ≥ H}| ≤ N/H, so it always
# broadcasts. Non-vacuous at every SF (77 / 734 hot orders at
# sf0.001 / 0.01, probed).


def skew_split_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-split (salted) equi-join — the manual remedy for a shuffled
    join whose key distribution has heavy hitters, complementing
    skew_salted_agg on the join side and AQE's runtime skew-join split
    (which only fires on sort-merge joins past size thresholds; this
    form is plan-level and portable). One pass detects the hot keys
    (per-key fact counts ≥ HOT_MIN_LINES — a bounded, broadcastable set
    by construction), then a SINGLE join runs with composite keys:

    - fact side: salt = xxhash64(row-unique cols) mod N_SALTS for hot
      keys, 0 for cold — the hot key's rows scatter over N_SALTS
      reducers instead of stalling one;
    - dim side: hot keys REPLICATE ×N_SALTS (explode a salt sequence),
      cold keys carry salt 0 — every fact row still meets exactly one
      dim row, so the join result is row-identical to the plain join.

    The oracle runs the plain (unsalted) join + aggregate, proving the
    equivalence the way skew_salted_agg's oracle does for aggregation.
    At 100 TB the cost is |hot|·(N_SALTS−1) extra dim rows — bounded by
    N_SALTS·N/HOT_MIN — against removing the straggler tail; the
    detection pass is a combiner-friendly key count that production
    would replace with a sampled or sketched (count-min) estimate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey",
        "l_extendedprice", "l_discount",
    )
    from weather_database_system_spark.session import track_persisted

    # persisted: the hot set feeds BOTH join sides — without it the
    # detection aggregate (a full fact scan) runs twice
    hot = track_persisted(
        li.groupBy("l_orderkey")
        .agg(F.count("*").alias("n_lines"))
        .filter(F.col("n_lines") >= HOT_MIN_LINES)
        .select("l_orderkey", F.lit(True).alias("is_hot"))
        .persist()
    )
    fact = li.join(
        F.broadcast(hot), "l_orderkey", "left"
    ).withColumn(
        "salt",
        F.when(
            F.col("is_hot"),
            F.pmod(F.xxhash64("l_linenumber", "l_partkey"), F.lit(N_SALTS)),
        ).otherwise(F.lit(0).cast("bigint")),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    dim = (
        orders.join(
            F.broadcast(hot),
            orders.o_orderkey == hot.l_orderkey,
            "left",
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.explode(
                F.sequence(
                    F.lit(0).cast("bigint"),
                    F.when(
                        F.col("is_hot"), F.lit(N_SALTS - 1).cast("bigint")
                    ).otherwise(F.lit(0).cast("bigint")),
                )
            ).alias("salt"),
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        fact.join(
            dim,
            (fact.l_orderkey == dim.o_orderkey) & (fact.salt == dim.salt),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum(rev.cast(DEC)), 2).cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: DataFrame,
    salt_expr,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Library form of the skew-split join (see skew_split_join for the
    registry-checked instance): inner equi-join ``fact ⋈ dim`` on ``key``
    with the keys in ``hot_keys`` salted over ``n_salts`` reducers.

    Correct for ANY ``hot_keys`` set — empty, exact, a superset, even
    every key: each fact row carries exactly one salt and meets exactly
    one dim replica, so the output is row-identical to the plain join
    regardless of what the detector returned. A wrong or approximate
    detector costs only performance (missed hot key → one hot reducer;
    spurious hot key → n_salts−1 extra dim rows), never rows — which is
    what makes sketched detection (detect_hot_keys_cms) safe to drive it.

    ``salt_expr``: any Column scattering a hot key's fact rows (e.g.
    xxhash64 of row-unique columns); its distribution affects balance,
    not correctness. A NULL-valued ``salt_expr`` on a hot fact row is
    coalesced to salt 0 (dim replica 0 always exists), so nullable salt
    inputs degrade balance — NULL rows pile on one reducer — never rows
    (ADVICE r12 #1)."""
    for col in ("__is_hot", "__salt"):
        for side, df in (("fact", fact), ("dim", dim), ("hot_keys", hot_keys)):
            if col in df.columns:
                raise ValueError(
                    f"salted_join reserves column name {col!r}; "
                    f"{side} already carries it (ADVICE r12 #2)"
                )
    hot = F.broadcast(
        hot_keys.select(key).distinct().withColumn("__is_hot", F.lit(True))
    )
    f = (
        fact.join(hot, key, "left")
        .withColumn(
            "__salt",
            F.when(
                F.col("__is_hot"),
                F.coalesce(
                    F.pmod(salt_expr, F.lit(n_salts)).cast("bigint"),
                    F.lit(0).cast("bigint"),
                ),
            ).otherwise(F.lit(0).cast("bigint")),
        )
        .drop("__is_hot")
    )
    d = (
        dim.join(hot, key, "left")
        .withColumn(
            "__salt",
            F.explode(
                F.sequence(
                    F.lit(0).cast("bigint"),
                    F.when(
                        F.col("__is_hot"), F.lit(n_salts - 1).cast("bigint")
                    ).otherwise(F.lit(0).cast("bigint")),
                )
            ),
        )
        .drop("__is_hot")
    )
    return f.join(d, [key, "__salt"]).drop("__salt")


CMS_DETECT_D = 3     # detector sketch depth
CMS_DETECT_W = 1024  # detector sketch width


def detect_hot_keys_cms(
    fact: DataFrame,
    key: str,
    min_count: int,
    d: int = CMS_DETECT_D,
    w: int = CMS_DETECT_W,
) -> DataFrame:
    """Count-min hot-key detector for salted_join: DataFrame[key] of every
    key whose CM frequency ESTIMATE is ≥ min_count. CM never undercounts,
    so the result is a SUPERSET of the true hot set — combined with
    salted_join's any-set correctness this gives the directional
    guarantee that matters: no true heavy hitter is ever left unsalted
    (no straggler survives), and false positives only add benign extra
    dim replicas (≤ d·N/(w·min_count) of them in expectation).

    Counter state is d·w rows regardless of fact size (the
    heavy_hitters_cms shape); the candidate probe here is one
    distinct-keys pass — in the streaming deployment the counters are
    maintained online (foreachBatch partials, sum-merged; additivity
    pytest-pinned in test_streaming), so detection prices at the key
    cardinality, not the fact volume."""
    ks = F.col(key).cast("string")
    buckets = [
        F.pmod(F.xxhash64(F.concat(F.lit(f"{j}|"), ks)), F.lit(w)).alias(f"b{j}")
        for j in range(d)
    ]
    jb = fact.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), b.alias("b"))
                    for j, b in enumerate(buckets)
                ]
            )
        ).alias("jb")
    ).select("jb.j", "jb.b")
    counters = jb.groupBy("j", "b").agg(F.count("*").alias("c"))
    cand = fact.select(key).distinct().select(F.col(key), *buckets)
    for j in range(d):
        cj = counters.filter(F.col("j") == j).select(
            F.col("b").alias(f"cb{j}"), F.col("c").alias(f"c{j}")
        )
        cand = cand.join(F.broadcast(cj), F.col(f"b{j}") == F.col(f"cb{j}"))
    est = F.least(*[F.col(f"c{j}") for j in range(d)])
    return cand.filter(est >= min_count).select(key)


FP_BUCKETS = 32  # fingerprint buckets (the Merkle level's fan-out)
FP_MOD = (1 << 61) - 1  # Mersenne prime: digest stays int64, sum stays mergeable


def _fp_rv(prefix: str = "") -> "F.Column":
    """The fingerprint's canonical row hash over the orders columns
    (shared by the batch digest, the streaming twin, and the divergence
    report): '|'-joined canonical string → first 15 md5 hex digits →
    int64. ``prefix`` optionally qualifies column names (joined frames)."""
    p = prefix
    canon = F.concat_ws(
        "|",
        F.col(p + "o_orderkey").cast("string"),
        F.col(p + "o_custkey").cast("string"),
        F.col(p + "o_orderstatus"),
        _fr(F.col(p + "o_totalprice"), 2).cast("decimal(18,2)").cast("string"),
        F.date_format(p + "o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        F.col(p + "o_orderpriority"),
    )
    return F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("bigint")


def _fp_digests(o: DataFrame) -> DataFrame:
    """Per-bucket (bucket, n_rows, checksum) digests of an orders-shaped
    frame — the fingerprint aggregate shared by all three operators."""
    return (
        o.select(
            F.pmod("o_orderkey", F.lit(FP_BUCKETS)).alias("bucket"),
            _fp_rv().alias("rv"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            (F.sum(F.col("rv").cast("decimal(28,0)")) % F.lit(FP_MOD))
            .cast("long")
            .alias("checksum"),
        )
    )


def table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent per-bucket table checksum — the cross-replica
    consistency check a 100 TB deployment runs after replication,
    migration, or an engine swap (exactly this repo's use case: prove a
    Spark copy equals the reference warehouse without shipping rows).

    Each row canonicalizes to a '|'-joined string (explicit decimal/
    timestamp formatting — never raw double→string, whose scientific
    notation thresholds differ across engines), hashes to the first 15
    md5 hex digits (60 bits — fits int64 exactly in BOTH engines:
    Spark ``conv(…,16,10)``, DuckDB ``CAST('0x…' AS BIGINT)``), and the
    bucket checksum is the SUM of row hashes modulo the Mersenne prime
    2^61 - 1 (keeps the digest inside int64 for every engine and client
    while staying commutative and mergeable): the check is scan-order-
    and partitioning-independent — ONE scan, one 32-key shuffle, no
    sort. Per-bucket (vs one global digest) is the
    Merkle level: a mismatch localizes to n/FP_BUCKETS rows, and bucket
    rows from different replicas/shards merge by comparison without any
    re-read. Collision odds: forging equality needs correlated 60-bit
    sums; for drift DETECTION (the ops use case) a single changed row
    flips its bucket with probability 1 − 2⁻⁶⁰.

    The oracle recomputes the identical canonical hash sums in DuckDB —
    a genuinely independent engine agreeing on every bucket IS the
    operator working. NULL policy: these six columns are non-null in
    this dataset (profiled); a nullable deployment must add an explicit
    NULL sentinel per column, because concat_ws(skip) and ||(propagate)
    canonicalize NULLs differently across engines."""
    return _fp_digests(load_table(spark, sf_dir, "orders")).orderBy("bucket")


FP_STREAM_BATCHES = 4  # simulated micro-batches in the streaming twin


def table_fingerprint_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the STREAMING fingerprint ingest — the
    heavy_hitters_cms_stream pattern applied to the replica checksum:
    rows split into deterministic micro-batches (o_custkey mod K —
    orthogonal to the o_orderkey bucketing, so every bucket receives
    rows from every batch), per-batch digest PARTIALS built
    independently, blind-appended and merged by count-addition +
    modular checksum-addition at read time. Because
    (a mod M + b mod M) mod M = (a + b) mod M, partials compose
    without any read-modify-write — a continuously-ingesting 100 TB
    table maintains its fingerprint by appending K·FP_BUCKETS-row
    partials per batch, and replicas compare digests without ever
    re-reading history.

    Claims: ``merge_additive_ok`` — zero (bucket, n_rows, checksum)
    rows differ between the merged partials and the single-pass
    ``table_fingerprint`` (anti-joined both ways over the two 32-row
    digest tables — never a fact-sized pass). The oracle replays the
    single-pass digests and asserts the claim held."""
    o = load_table(spark, sf_dir, "orders")
    rows = o.select(
        F.pmod("o_custkey", F.lit(FP_STREAM_BATCHES)).alias("batch"),
        F.pmod("o_orderkey", F.lit(FP_BUCKETS)).alias("bucket"),
        _fp_rv().alias("rv"),
    )
    # per-micro-batch digest partials (what each foreachBatch appends) ...
    partials = rows.groupBy("batch", "bucket").agg(
        F.count("*").alias("n"),
        (F.sum(F.col("rv").cast("decimal(28,0)")) % F.lit(FP_MOD))
        .cast("long")
        .alias("c"),
    )
    # ... blind-appended and merged by (+, + mod M) at read time; each
    # partial checksum < M < 2^61, so the K-term long sum cannot overflow
    merged = partials.groupBy("bucket").agg(
        F.sum("n").alias("n_rows"),
        F.pmod(F.sum("c"), F.lit(FP_MOD)).alias("checksum"),
    )
    single = table_fingerprint(spark, sf_dir)
    mismatches = merged.join(
        single, ["bucket", "n_rows", "checksum"], "anti"
    ).union(single.join(merged, ["bucket", "n_rows", "checksum"], "anti"))
    additive = mismatches.agg((F.count("*") == 0).alias("merge_additive_ok"))
    return (
        merged.crossJoin(F.broadcast(additive))
        .select("bucket", "n_rows", "checksum", "merge_additive_ok")
        .orderBy("bucket")
    )


FP_DIVERGE_MOD = 977   # prime key-slice selector for the simulated drift
FP_DIVERGE_RES = 3
FP_DIVERGE_DELTA = 100.0


def fingerprint_divergence_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fingerprint's USE case end-to-end: localize replica drift.
    A simulated replica of orders carries a deterministic value
    mutation (+FP_DIVERGE_DELTA on o_totalprice for keys ≡
    FP_DIVERGE_RES mod FP_DIVERGE_MOD — the diff_snapshots
    bucket-mutation precedent, spread across digest buckets by the
    prime modulus). Both sides reduce to their FP_BUCKETS-row digest
    tables; the report is the buckets whose checksums differ, with both
    digests and both counts — counts MATCH on every diverged bucket
    here, demonstrating exactly the drift class a row count can never
    catch. Comparison work is 2×32 digest rows, not table rows: the
    replicas could live in different datacenters and ship only
    digests.

    Oracle: DuckDB recomputes both digest tables and the same
    divergence join — cross-engine agreement on WHICH buckets diverged
    (and both checksum values) is the replication-repair contract."""
    o = load_table(spark, sf_dir, "orders")
    replica = o.withColumn(
        "o_totalprice",
        F.when(
            F.pmod("o_orderkey", F.lit(FP_DIVERGE_MOD)) == FP_DIVERGE_RES,
            F.col("o_totalprice") + F.lit(FP_DIVERGE_DELTA),
        ).otherwise(F.col("o_totalprice")),
    )
    a = _fp_digests(o).select(
        "bucket",
        F.col("n_rows").alias("n_rows_a"),
        F.col("checksum").alias("checksum_a"),
    )
    b = _fp_digests(replica).select(
        "bucket",
        F.col("n_rows").alias("n_rows_b"),
        F.col("checksum").alias("checksum_b"),
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("checksum_a") != F.col("checksum_b"))
        .orderBy("bucket")
    )


FP_NULL_SENTINEL = "\x00NULL\x00"  # outside any sane value alphabet


def _fp_canonical_cell(name: str, dtype, null_sentinel: str) -> "F.Column":
    """Render one column to its canonical string under the fingerprint
    contract (the generalization of ``_fp_rv``'s per-column rules):

    - string: as-is; integral/boolean: decimal-digit cast; decimal(p,s):
      plain cast (both Spark and DuckDB render fixed-point decimals at
      full declared scale, never scientific notation)
    - date: 'yyyy-MM-dd'; timestamp: 'yyyy-MM-dd HH:mm:ss.SSSSSS'
      (full microseconds — unlike the orders-specific ``_fp_rv``, whose
      date-valued o_orderdate lets it truncate to seconds, a generic
      frame must not hash sub-second drift to equality)
    - float/double: REJECTED — raw floating-point → string crosses
      scientific-notation thresholds differently across engines; cast
      to an explicit-scale decimal first (that cast IS the contract)
    - anything else (array/map/struct/binary): REJECTED — canonicalize
      to one of the supported scalars first
    - NULL: replaced by ``null_sentinel`` (concat_ws SKIPS nulls, which
      would alias (NULL,'x') with ('x',NULL); the sentinel must stay
      outside the live value alphabet, as must the '|' separator)."""
    from pyspark.sql import types as T

    col = F.col(name)
    if isinstance(dtype, T.StringType):
        rendered = col
    elif isinstance(
        dtype,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.BooleanType),
    ):
        rendered = col.cast("string")
    elif isinstance(dtype, T.DecimalType):
        rendered = col.cast("string")
    elif isinstance(dtype, T.DateType):
        rendered = F.date_format(col, "yyyy-MM-dd")
    elif isinstance(dtype, T.TimestampType):
        rendered = F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    elif isinstance(dtype, (T.FloatType, T.DoubleType)):
        raise ValueError(
            f"fingerprint: column {name!r} is {dtype.simpleString()} — raw "
            "floating-point canonicalization is engine-dependent "
            "(scientific-notation thresholds); cast to an explicit-scale "
            "decimal first"
        )
    else:
        raise ValueError(
            f"fingerprint: column {name!r} has unsupported type "
            f"{dtype.simpleString()}; canonicalize to a supported scalar first"
        )
    return F.coalesce(rendered, F.lit(null_sentinel))


def fingerprint(
    df: DataFrame,
    cols: list[str] | None = None,
    buckets: int = FP_BUCKETS,
    null_sentinel: str = FP_NULL_SENTINEL,
) -> DataFrame:
    """Library form of ``table_fingerprint`` for ARBITRARY frames (r13
    VERDICT task #2): order-independent per-bucket (bucket, n_rows,
    checksum) digests over ``cols`` (default: every column, in schema
    order — pass an explicit list when replicas disagree on column
    order). Same digest algebra as the registry yardstick: canonical
    '|'-joined row string (per-type rules in ``_fp_canonical_cell``) →
    first 15 md5 hex digits → int64 row hash; bucket = pmod(row hash,
    buckets) — no natural key needed, and a drifted row flips BOTH its
    old and new bucket; checksum = Σ row-hash mod 2^61−1 (int64-safe in
    every engine/client, commutative, mergeable).

    Mergeability (hypothesis-pinned in tests/test_properties.py):
    ``fingerprint(shard_1 ∪ … ∪ shard_k)`` equals
    ``merge_fingerprints(fingerprint(shard_1), …)`` row-for-row, for
    arbitrary frames and arbitrary shardings — so 100 TB replicas
    digest independently, ship ≤ ``buckets`` rows each, and compare
    without moving data. Row-order/partitioning invariance follows from
    the same algebra (sum is commutative).

    NULL policy is explicit (the registry operator's documented
    requirement, made self-enforcing here): NULL cells render as
    ``null_sentinel``, which — like the '|' separator — must not occur
    in live string values, or distinct rows could alias."""
    names = list(cols) if cols is not None else [f.name for f in df.schema.fields]
    by_name = {f.name: f.dataType for f in df.schema.fields}
    missing = [n for n in names if n not in by_name]
    if missing:
        raise ValueError(f"fingerprint: columns not in frame: {missing}")
    if len(set(names)) != len(names):
        # a repeated column double-renders into the canonical string —
        # a digest of a DIFFERENT virtual table that still looks
        # plausible; two replicas passing differently-duplicated lists
        # would report false divergence (r14 VERDICT task #5)
        raise ValueError(
            "fingerprint: duplicate columns in cols: "
            f"{sorted({n for n in names if names.count(n) > 1})}"
        )
    if buckets < 1:
        raise ValueError("fingerprint: buckets must be >= 1")
    canon = F.concat_ws(
        "|", *[_fp_canonical_cell(n, by_name[n], null_sentinel) for n in names]
    )
    rv = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("bigint")
    # the digest CONFIG rides the bucket column's metadata (survives
    # select/union/parquet round-trips): merge_fingerprints refuses to
    # combine digests produced under different configurations, where
    # unionByName would otherwise succeed and yield a plausible-looking
    # but meaningless comparison table (ADVICE r14 #5)
    fp_meta = {
        "fp_buckets": buckets,
        "fp_cols": names,
        "fp_null_sentinel": null_sentinel,
    }
    return (
        df.select(F.pmod(rv, F.lit(buckets)).alias("bucket"), rv.alias("rv"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            (F.sum(F.col("rv").cast("decimal(28,0)")) % F.lit(FP_MOD))
            .cast("long")
            .alias("checksum"),
        )
        .select(
            F.col("bucket").alias("bucket", metadata=fp_meta),
            "n_rows",
            "checksum",
        )
    )


def merge_fingerprints(*parts: DataFrame) -> DataFrame:
    """Combine per-shard ``fingerprint`` digest tables into the digest
    of the union, without touching rows: counts add, checksums add
    modulo 2^61−1 ((a mod M + b mod M) mod M = (a+b) mod M). The sum
    runs in decimal(28,0), so any realistic shard count stays exact
    before the final mod.

    Refuses digests produced under DIFFERENT configurations (bucket
    count, column list, null sentinel — carried in the bucket column's
    metadata by ``fingerprint``): mismatched digests would merge into a
    plausible-looking table whose rows mean nothing, producing a false
    divergence (or false agreement) report — the exact failure the tool
    exists to detect (ADVICE r14 #5). Digest tables that never came
    from ``fingerprint`` (no metadata) are rejected for the same
    reason."""
    if not parts:
        raise ValueError("merge_fingerprints: need at least one digest table")
    configs = []
    for i, p in enumerate(parts):
        meta = dict(p.schema["bucket"].metadata or {})
        if "fp_buckets" not in meta:
            raise ValueError(
                f"merge_fingerprints: part {i} carries no fingerprint "
                "config metadata — only fingerprint() outputs (or their "
                "parquet round-trips) are mergeable"
            )
        configs.append(meta)
    if any(c != configs[0] for c in configs[1:]):
        raise ValueError(
            "merge_fingerprints: parts were produced under different "
            f"configurations: {configs[0]} vs "
            f"{next(c for c in configs if c != configs[0])} — digests "
            "are only comparable per (buckets, cols, null_sentinel)"
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return allp.groupBy("bucket").agg(
        F.sum("n_rows").alias("n_rows"),
        (F.sum(F.col("checksum").cast("decimal(28,0)")) % F.lit(FP_MOD))
        .cast("long")
        .alias("checksum"),
    )


def fingerprint_generic_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked exercise of the GENERIC ``fingerprint`` library
    path (r14; the orders yardstick ``table_fingerprint`` keeps its
    hard-coded ``_fp_rv`` and stays untouched): the same table digested
    through ``fingerprint(df)``'s per-type canonicalization — integral
    (o_orderkey), string (o_orderstatus), decimal (o_totalprice, which
    arrives as DOUBLE and therefore takes the contract's prescribed
    move: portable round + explicit-scale decimal cast BEFORE
    fingerprinting, exactly what the library's raw-float rejection
    instructs), and timestamp (o_orderdate at the library's full
    microsecond format). Bucketing is the library rule — pmod(row hash,
    32), no natural key — so this digest is deliberately NOT comparable
    to table_fingerprint's o_orderkey-bucketed one. The DuckDB oracle
    recomputes the library's canonical strings per type rule
    (microseconds via strftime %f); agreement on all 32 buckets
    driver-checks the generic path end-to-end, upgrading it from
    pytest-only coverage."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        _fr(F.col("o_totalprice"), 2).cast("decimal(18,2)").alias("o_totalprice"),
        "o_orderdate",
    )
    return fingerprint(o).orderBy("bucket")


def salted_join_cms_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable registry form of the ``salted_join`` +
    ``detect_hot_keys_cms`` library pair (r12 VERDICT task #3) — the
    100 TB skew-deployment story as a green CORRECTNESS entry, following
    the ``dedup_minhash_lsh_fast_checked`` pattern: the sketch-driven
    plan runs for real, and every output row carries engine-decided
    claim columns the oracle asserts as held.

    The operator under test: lineitem ⋈ orders with the hot-key set
    SKETCHED (count-min estimate ≥ HOT_MIN_LINES — xxhash64 counters
    DuckDB can never replay) driving the salt split. Claims:

    - ``detector_superset_ok`` — the exact hot set (per-key count ≥
      HOT_MIN_LINES) minus the CMS set is EMPTY: CM never undercounts,
      so no true heavy hitter is ever left unsalted.
    - ``salted_identity_ok`` — the salted join's output MULTISET equals
      the plain inner join's (per-row group counts anti-joined both
      ways): the sketch's false positives added dim replicas, never rows.

    The output spine is a per-priority aggregate computed FROM the salted
    join's rows, so the oracle's plain-join SQL hash-checks the salted
    path end-to-end on top of the claims. The multiset audit is a
    test-SF-only yardstick (two extra groupBys over the join output); a
    100 TB pass runs salted_join bare — pytest pins row-identity for
    arbitrary detectors including empty/superset/all."""
    from weather_database_system_spark.session import track_persisted

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey",
        "l_extendedprice", "l_discount",
    )
    dim = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    # both persisted: each feeds two consumers (claim + join / claim +
    # spine flag) — without it the detection aggregates re-scan the fact
    exact_hot = track_persisted(
        li.groupBy("l_orderkey")
        .agg(F.count("*").alias("n_lines"))
        .filter(F.col("n_lines") >= HOT_MIN_LINES)
        .select("l_orderkey")
        .persist()
    )
    cms_hot = track_persisted(
        detect_hot_keys_cms(li, "l_orderkey", HOT_MIN_LINES).persist()
    )
    salted = salted_join(
        li, dim, "l_orderkey", cms_hot, F.xxhash64("l_linenumber", "l_partkey")
    )
    plain = li.join(dim, "l_orderkey")

    cols = plain.columns  # key, line cols, o_orderpriority
    pm = plain.groupBy(*cols).agg(F.count("*").alias("n"))
    sm = salted.groupBy(*cols).agg(F.count("*").alias("n"))
    on = cols + ["n"]
    a_sup = exact_hot.join(cms_hot, "l_orderkey", "left_anti").agg(
        F.count("*").alias("n_det_missed")
    )
    a_po = pm.join(sm, on, "left_anti").agg(F.count("*").alias("n_only_plain"))
    a_so = sm.join(pm, on, "left_anti").agg(F.count("*").alias("n_only_salted"))
    # 1-row aggregates fused broadcast-side — the sanctioned claims shape
    claims = (
        a_sup.crossJoin(F.broadcast(a_po))
        .crossJoin(F.broadcast(a_so))
        .select(
            (F.col("n_det_missed") == 0)
            .cast("int")
            .alias("detector_superset_ok"),
            ((F.col("n_only_plain") == 0) & (F.col("n_only_salted") == 0))
            .cast("int")
            .alias("salted_identity_ok"),
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    spine = (
        salted.join(
            F.broadcast(exact_hot.withColumn("__hot", F.lit(True))),
            "l_orderkey",
            "left",
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.countDistinct(
                F.when(F.col("__hot"), F.col("l_orderkey"))
            ).alias("n_hot_orders"),
            F.round(F.sum(rev.cast(DEC)), 2).cast("double").alias("revenue"),
        )
    )
    return (
        spine.crossJoin(F.broadcast(claims))
        .select(
            "o_orderpriority", "n_lines", "n_hot_orders", "revenue",
            "detector_superset_ok", "salted_identity_ok",
        )
        .orderBy("o_orderpriority")
    )


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch vs exact distinct counts per event_type: HLL++
    (approx_count_distinct, rsd=1%) checked against the exact
    countDistinct, plus approx median vs exact — each sketch emitted as a
    PINNED tolerance claim the DuckDB oracle can decide
    (r6 verdict #5): ``hll_within_5pct`` =
    |approx − exact| ≤ max(3, 0.05·exact) and ``p50_within_5pct`` =
    |approx_p50 − exact_p50| ≤ 0.05·max(1, |exact_p50|). The oracle
    replays the exact columns and asserts both claims held, so the sketch
    path is hash-checked instead of rows-only.

    The exact columns exist ONLY as the error-bound yardstick at test sf —
    exact percentile buffers every group value and countDistinct expands the
    shuffle, neither survives unbounded groups at 100 TB. The
    production-designated variant is ``approx_distinct_users_scale``
    (sketch-only plan + a bolt-on yardstick join that emits the same
    pinned claims, so it too is hash-checked — r7 verdict #5)."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        _fr(F.percentile("value", F.lit(0.5)), 6).alias("exact_p50"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("approx_p50"),
    )
    hll_ok = F.abs(F.col("approx_users") - F.col("exact_users")) <= F.greatest(
        F.lit(3.0), 0.05 * F.col("exact_users")
    )
    p50_ok = F.abs(F.col("approx_p50") - F.col("exact_p50")) <= 0.05 * F.greatest(
        F.lit(1.0), F.abs(F.col("exact_p50"))
    )
    return agg.select(
        "event_type",
        "exact_users",
        "exact_p50",
        hll_ok.cast("int").alias("hll_within_5pct"),
        p50_ok.cast("int").alias("p50_within_5pct"),
    ).orderBy("event_type")


def _sketch_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production plan of ``approx_distinct_users_scale``: HLL++
    distinct users and KLL-style approx median per event_type, sketches
    ONLY. Both are mergeable fixed-size summaries — the agg is
    map-side-combined with an O(sketch) shuffle payload per group, the
    only COUNT(DISTINCT)/percentile shape that survives 100 TB (VERDICT
    r2 'What's wrong' #1). This is what a deployment materializes; the
    registry wrapper below bolts the test-scale yardstick on top."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("approx_p50"),
    )


def approx_distinct_users_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``_sketch_user_stats`` (the production sketch-only plan, unchanged)
    joined to a SEPARATE exact yardstick aggregation — affordable at test
    SF, dropped in deployment — emitting the engine-replayable
    ``n_events`` plus the PINNED claims ``hll_within_5pct`` /
    ``p50_within_5pct`` (same bounds as ``approx_distinct_users``). The
    DuckDB oracle replays event_type/n_events and asserts both claims
    held, so the sketch path is hash-checked instead of rows-only (r7
    verdict #5). Unlike ``approx_distinct_users`` — which fuses exact and
    sketch learners into ONE agg for the comparison demo — the sketch agg
    here keeps its deployable shape and the yardstick is a bolt-on
    broadcast join the driver check exercises. pytest additionally bounds
    the raw sketch values via ``_sketch_user_stats``."""
    ev = load_table(spark, sf_dir, "events")
    sk = _sketch_user_stats(spark, sf_dir)
    yard = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("exact_users"),
        _fr(F.percentile("value", F.lit(0.5)), 6).alias("exact_p50"),
    )
    j = sk.join(F.broadcast(yard), "event_type")
    hll_ok = F.abs(F.col("approx_users") - F.col("exact_users")) <= F.greatest(
        F.lit(3.0), 0.05 * F.col("exact_users")
    )
    p50_ok = F.abs(F.col("approx_p50") - F.col("exact_p50")) <= 0.05 * F.greatest(
        F.lit(1.0), F.abs(F.col("exact_p50"))
    )
    return j.select(
        "event_type",
        "n_events",
        hll_ok.cast("int").alias("hll_within_5pct"),
        p50_ok.cast("int").alias("p50_within_5pct"),
    ).orderBy("event_type")


# Deterministic hash-based sampling: Knuth multiplicative hash → bucket.
# Spark's sample()/sampleBy() use engine-private RNG streams, which makes a
# sampled 100 TB corpus irreproducible across engines/runs — hash-mod
# sampling is the production pattern (stable under reruns, joinable, and
# auditable), and it's exactly replayable in SQL.
#
# The bucket takes the product's HIGH bits ((id*K) div 2^24, mod 100), not
# (id*K) mod 100: a low-bits mod of a multiplicative hash is just a fixed
# permutation of id mod 100, so any periodic id-assignment pattern (sharded
# ranges, strided ids) would hit a handful of buckets and skew every stratum
# rate. High bits mix all input bits (Knuth's actual scheme). The id is
# first reduced mod 2^31 so the product stays inside int64 — identical
# BIGINT arithmetic in Spark and DuckDB, so bucketing is engine-exact.
_KNUTH = 2654435761
_ID_MOD = 2_147_483_648  # 2^31
_HI_DIV = 16_777_216  # 2^24
STRATUM_PCT = {"click": 10, "view": 5, "purchase": 100, "error": 100, "signup": 50}
SPLIT_PCT = (("train", 80), ("valid", 10), ("test", 10))


def _bucket(name: str):
    # `div` (not `/`) keeps the arithmetic in exact BIGINTs: the product is
    # up to ~2^62 and a double division would lose low bits.
    return F.expr(
        f"pmod((pmod({name}, {_ID_MOD}) * {_KNUTH}) div {_HI_DIV}, 100)"
    )


def _sql_bucket(name: str) -> str:
    return f"((({name} % {_ID_MOD}) * {_KNUTH}) // {_HI_DIV}) % 100"


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling: keep an event iff its hash
    bucket falls under the stratum's configured rate (downsample dominant
    classes, keep rare ones whole — the class-rebalancing pass of a
    training pipeline). Map-only at any scale: no shuffle until the audit
    aggregation, membership reproducible run-to-run and engine-to-engine."""
    ev = load_table(spark, sf_dir, "events")
    rate = F.lit(None).cast("int")
    for k, v in STRATUM_PCT.items():
        rate = F.when(F.col("event_type") == k, v).otherwise(rate)
    sampled = ev.select("event_id", "event_type", _bucket("event_id").alias("b"), rate.alias("rate"))
    return (
        sampled.filter(F.col("b") < F.col("rate"))
        .select("event_id", "event_type")
        .orderBy("event_id")
    )


def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split over documents by hash bucket — the
    leakage-safe split (membership is a pure function of the id: adding
    data or re-running never moves a doc across splits). Returns the
    per-split × per-language audit counts."""
    docs = load_table(spark, sf_dir, "documents")
    b = _bucket("doc_id")
    lo = 0
    split = F.lit(None).cast("string")
    for name, pct in SPLIT_PCT:
        split = F.when((b >= lo) & (b < lo + pct), name).otherwise(split)
        lo += pct
    return (
        docs.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("split", "lang")
    )


def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery through the SQL surface: orders above half the max
    price. The threshold uses max (exact cross-engine; an avg-of-doubles
    threshold would put boundary rows at the mercy of summation order)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.5
        ORDER BY o_orderkey
        """
    )


def sql_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS via spark.sql: customers with no order in 1997.
    Catalyst decorrelates this into an anti-join — no per-row re-execution."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        )
        ORDER BY c_custkey
        """
    )


def sql_groupby_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING through the SQL surface, with the portable
    decimal-exact mean."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT o_custkey, count(*) AS n_orders,
               {_sql_avg4('o_totalprice', 2)} AS avg_price
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) >= 15
        ORDER BY o_custkey
        """
    )


MAD_K = 0.6745     # Φ⁻¹(0.75): scales MAD to σ-equivalent units for normal data
MAD_THRESH = 3.5   # Iglewicz & Hoaglin (1993) recommended modified-z cutoff
# Pinned sketch tolerance for the approx twin's claim column: the sketch
# mscore must land within this absolute distance of the exact mscore on
# every flagged row. approx_percentile at accuracy 10000 bounds rank error
# to n/10000 — at test SF that is ~1 adjacent value around the median, so
# 0.5 (one-seventh of the 3.5 flag bar) is a ≥10× margin while still
# catching any real sketch regression (a mis-merged summary is off by
# whole score units, not hundredths).
MAD_APPROX_TOL = 0.5


def _mad_anomaly(
    spark: SparkSession, sf_dir: str, *, approx: bool, expose_approx: bool = False
) -> DataFrame:
    """Shared body for the robust-outlier twins; ``approx`` switches the
    median learner between exact ``percentile`` (oracle-replayable) and the
    mergeable ``approx_percentile`` sketch (the only shape that survives an
    unbounded group at 100 TB — same twin pattern as rfm_segmentation).

    In approx mode BOTH learners run in the same two aggregations: the
    exact med/mad are the test-scale yardstick that defines the emitted
    row set (oracle-replayable), the sketch med/mad are the path under
    test, and ``approx_close`` is the PINNED per-row claim
    |mscore_sketch − mscore_exact| ≤ MAD_APPROX_TOL the DuckDB oracle
    asserts held (r7 verdict #5 — the rfm_segmentation_approx contract).
    ``expose_approx`` additionally emits the raw sketch mscore for the
    pytest that bounds it directly."""
    ev = load_table(spark, sf_dir, "events")
    eq = "percentile({c}, 0.5)"
    aq = "approx_percentile({c}, 0.5, 10000)"
    med_cols = [_fr(F.expr(eq.format(c="value")), 6).alias("med")]
    if approx:
        med_cols.append(_fr(F.expr(aq.format(c="value")), 6).alias("med_a"))
    med = ev.groupBy("event_type").agg(*med_cols)
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad_cols = [
        F.min("med").alias("med"),
        _fr(F.expr(eq.format(c="adev")), 6).alias("mad"),
    ]
    if approx:
        dev = dev.withColumn("adev_a", F.abs(F.col("value") - F.col("med_a")))
        mad_cols += [
            F.min("med_a").alias("med_a"),
            _fr(F.expr(aq.format(c="adev_a")), 6).alias("mad_a"),
        ]
    mads = dev.groupBy("event_type").agg(*mad_cols)
    scored = dev.drop("med", "med_a").join(F.broadcast(mads), "event_type")
    mscore = F.lit(MAD_K) * (F.col("value") - F.col("med")) / F.col("mad")
    out = [
        "event_id",
        "event_type",
        "value",
        "med",
        "mad",
        _fr(mscore, 4).alias("mscore"),
    ]
    if approx:
        mscore_a = F.lit(MAD_K) * (F.col("value") - F.col("med_a")) / F.col("mad_a")
        close = (F.col("mad_a") > 0) & (
            F.abs(mscore_a - mscore) <= MAD_APPROX_TOL
        )
        out.append(close.cast("int").alias("approx_close"))
        if expose_approx:
            out.append(_fr(mscore_a, 4).alias("mscore_a"))
    return (
        scored.filter((F.col("mad") > 0) & (F.abs(mscore) > MAD_THRESH))
        .select(*out)
        .orderBy("event_id")
    )


def anomaly_mad_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier report: modified z-score 0.6745·(x−median)/MAD per
    event_type, flagging |M| > 3.5 (Iglewicz & Hoaglin's resistant
    alternative to mean/σ z-scores, which outliers themselves corrupt).
    The anomaly report every metrics pipeline runs over its event feed.

    Scale shape: three map-only scans of the fact table (median pass,
    MAD pass, scoring pass) with two 5-row broadcast joins — never a
    window over the low-cardinality event_type key (that would hash 100 TB
    into 5 partitions). Thresholds are _fr-rounded to 6 decimals before
    every comparison, so the Spark and DuckDB score boundaries are
    engine-exact by construction. Exact-percentile variant: the
    oracle-replayable twin; production uses anomaly_mad_zscore_approx."""
    return _mad_anomaly(spark, sf_dir, approx=False)


def _mad_sketch_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DEPLOYABLE sketch-only MAD anomaly plan: medians and MADs from
    the mergeable approx_percentile sketch alone (map-side partials, tiny
    shuffle payload — exact percentile on an unbounded group never ships
    at 100 TB), flags selected by the SKETCH criterion. This is what a
    100 TB deployment runs; it contains no exact-percentile learner
    anywhere (pytest pins that plan property and bounds its flag set
    against the exact twin). The registry surface below fuses a
    test-scale exact yardstick into the same aggs instead — affordable at
    test SF, and the only way the DuckDB hash check can decide the row
    set — the same fused-yardstick compromise as _rfm_scored."""
    ev = load_table(spark, sf_dir, "events")
    aq = "approx_percentile({c}, 0.5, 10000)"
    med = ev.groupBy("event_type").agg(
        _fr(F.expr(aq.format(c="value")), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mads = dev.groupBy("event_type").agg(
        F.min("med").alias("med"),
        _fr(F.expr(aq.format(c="adev")), 6).alias("mad"),
    )
    scored = dev.drop("med").join(F.broadcast(mads), "event_type")
    mscore = F.lit(MAD_K) * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        scored.filter((F.col("mad") > 0) & (F.abs(mscore) > MAD_THRESH))
        .select(
            "event_id",
            "event_type",
            "value",
            "med",
            "mad",
            _fr(mscore, 4).alias("mscore"),
        )
        .orderBy("event_id")
    )


def anomaly_mad_zscore_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry surface of the sketch MAD twin (deployable form:
    ``_mad_sketch_only`` above). Runs BOTH learners in the same two
    aggregations — the exact med/mad are the test-scale yardstick that
    defines the emitted row set (oracle-replayable), the sketch med/mad
    are the path under test — and emits the PINNED per-row claim
    ``approx_close`` = |mscore_sketch − mscore_exact| ≤ MAD_APPROX_TOL,
    which the DuckDB oracle asserts held (r7 verdict #5): a sketch
    straying past its bound now hash-mismatches instead of hiding behind
    a rows-only check. tests/test_extensions.py additionally bounds the
    raw sketch mscore and keeps the sketch-only plan regression-guarded."""
    return _mad_anomaly(spark, sf_dir, approx=True)


MERGE_CUTOFF = "2024-01-16"  # snapshot/delta boundary for the merge demo


def rollup_merge_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-view-maintenance merge: aggregate the OLD half (days
    before MERGE_CUTOFF) and the NEW half into separate partial algebraic
    states (count, exact-decimal sum, min, max), then MERGE the states —
    sum-of-sums, min-of-mins — and finalize. The oracle is the direct
    single-pass GROUP BY over all events, proving
    merge(partial(old), partial(new)) == direct(all): the algebraic
    refresh contract every incremental rollup (Delta MERGE / materialized
    view refresh) depends on. Group key is (event_type, hour-of-day) so
    every group genuinely spans both halves — the merge is never vacuous
    (pytest pins this).

    At 100 TB the two partial aggs are yesterday's stored snapshot and
    today's delta; only the delta is scanned per refresh. Decimal sums make
    the merge exact at any split count; min/max/count are trivially
    reassociable."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").alias("hour_of_day"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.col("value").cast(DEC).alias("v"),
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", "hour_of_day").agg(
            F.count("*").alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )

    old = partial(ev.filter(F.col("day") < MERGE_CUTOFF))
    new = partial(ev.filter(F.col("day") >= MERGE_CUTOFF))
    merged = (
        old.unionByName(new)
        .groupBy("event_type", "hour_of_day")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("s").alias("s"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )
    return merged.select(
        "event_type",
        "hour_of_day",
        "n_events",
        F.round("s", 2).cast("double").alias("total_value"),
        F.col("mn").cast("double").alias("min_value"),
        F.col("mx").cast("double").alias("max_value"),
        _fr(F.col("s").cast("double") / F.col("n_events"), 4).alias("avg_value"),
    ).orderBy("event_type", "hour_of_day")


def hll_partial_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count rollup: per-DAY HLL sketch partials
    (``hll_sketch_agg`` — Apache DataSketches, the same family MLlib and
    BigQuery expose) unioned into per-WEEK distinct-user estimates with
    ``hll_union_agg``. This is the non-algebraic counterpart of
    rollup_merge_incremental: COUNT(DISTINCT) has no mergeable exact state,
    so at 100 TB the ONLY viable refresh is sketch partials — each day's
    sketch is a few KB regardless of row count, the weekly merge touches 7
    sketches instead of re-scanning the raw feed, and the same partials
    roll up to month/quarter for free.

    Emits the exact weekly distinct (one extra agg, affordable at test
    scale — the error-bound yardstick) plus ``hll_within_5pct``: the
    sketch estimate's PINNED tolerance claim,
    |approx − exact| ≤ max(3, 0.05·exact) (lgK=14 → σ≈0.81 %, so 5 % is a
    ≥6σ bound; the absolute floor covers near-empty smoke-SF weeks). The
    raw estimate is engine-specific, but the claim is engine-decidable —
    the DuckDB oracle replays week/n_days/exact and asserts the claim
    held, so the sketch path is hash-checked instead of rows-only (r6
    verdict #5). pytest additionally pins the raw estimate's bound."""
    # week key = the week's START DATE, not weekofyear(): a bare week number
    # collapses days from different years into one group and ISO-boundary
    # days (Jan 1 in ISO week 52/53) into the wrong year entirely.
    ev = load_table(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias("week"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "user_id",
    )
    daily = ev.groupBy("week", "day").agg(
        F.expr("hll_sketch_agg(user_id, 14)").alias("sk")
    )
    weekly = daily.groupBy("week").agg(
        F.count("*").alias("n_days"),
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("approx_users"),
    )
    exact = ev.groupBy("week").agg(F.countDistinct("user_id").alias("exact_users"))
    within = F.abs(F.col("approx_users") - F.col("exact_users")) <= F.greatest(
        F.lit(3.0), 0.05 * F.col("exact_users")
    )
    return (
        weekly.join(exact, "week")
        .select(
            "week",
            "n_days",
            "exact_users",
            within.cast("int").alias("hll_within_5pct"),
        )
        .orderBy("week")
    )


BLOOM_M = 1 << 14   # bloom filter bits (16384 → 256 int64 words)
BLOOM_K = 5         # hash functions per key
# Pinned FP-rate claim bounds: the observed rate must stay within
# BLOOM_FP_MARGIN× the theoretical (1 − e^(−kn/m))^k — at test SFs the
# non-matching key population is ~10⁴, putting ≥20σ inside a 1.5× margin —
# plus an absolute floor covering near-empty filters at smoke SF, where
# theory ≈ 5e-6 and a single (deterministic) collision among ~10³ probe
# keys would otherwise breach any multiplicative bound.
BLOOM_FP_MARGIN = 1.5
BLOOM_FP_FLOOR = 0.002


def _bloom_audit(spark: SparkSession, sf_dir: str):
    """Bloom-filter semi-join reduction — the join-pushdown pattern behind
    Spark's own runtime bloom-filter join and every distributed semi-join
    optimizer: build a Bloom filter over the BUILD side's join keys,
    broadcast its bit array, and prefilter the PROBE side
    map-side BEFORE the exact join — rows that cannot match never enter the
    shuffle. At 100 TB the filter is a few KB standing in for a key set too
    big to broadcast exactly; shuffle volume drops by the non-matching
    fraction at an FP-rate cost of (1 − e^(−kn/m))^k.

    The filter build is distributed (explode keys × k hash seeds → distinct
    bit positions — a bounded ≤ m-row aggregate, the same driver-state
    class as any broadcast build side); membership tests are pure int64
    bit arithmetic in whole-stage codegen. The emitted audit carries the
    engine-exact columns (probe rows, true matches, key count, the
    theoretical FP bound) plus two PINNED claims the DuckDB oracle
    asserts (r7 verdict #5 pattern): ``no_false_negative`` — zero hit
    rows rejected by the filter (structural for a correct Bloom test) —
    and ``fp_within_bound`` — the observed FP rate inside
    BLOOM_FP_MARGIN× the theoretical (1 − e^(−kn/m))^k plus an absolute
    floor for near-empty-filter SFs. The raw xxhash64-dependent counts
    stay out of the output, so the whole audit is hash-checked instead of
    rows-only.

    Build side: URGENT orders (a selective, high-cardinality key set —
    ~20 % of o_orderkey); probe side: lineitem. The classic selective
    dimension semi-join where bloom pushdown pays."""
    build_keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("okey"))
        .distinct()
    )
    pos = (
        build_keys.select(
            F.explode(
                F.array(
                    *[
                        F.pmod(F.xxhash64("okey", F.lit(i)), F.lit(BLOOM_M))
                        for i in range(BLOOM_K)
                    ]
                )
            ).alias("p")
        )
        .distinct()
        .collect()
    )
    words = [0] * (BLOOM_M // 64)
    for r in pos:
        words[r.p // 64] |= 1 << (r.p % 64)
    # two's-complement into int64 range for the literal array
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    from weather_database_system_spark.operators.similarity import _lit_arr

    warr = _lit_arr(words)

    probe = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.col("l_orderkey").alias("okey")
    )
    hashed = probe.withColumn("bw", warr).withColumns(
        {
            f"h{i}": F.pmod(F.xxhash64("okey", F.lit(i)), F.lit(BLOOM_M))
            for i in range(BLOOM_K)
        }
    )
    # SQL-level shiftrightunsigned accepts a column bit count (the Python
    # wrapper requires a literal int, hence expr here)
    might = " AND ".join(
        f"((shiftrightunsigned(element_at(bw, CAST(h{i} div 64 AS INT) + 1), "
        f"CAST(h{i} % 64 AS INT)) & 1) = 1)"
        for i in range(BLOOM_K)
    )
    # ONE aggregate pass computes the whole audit: probe scanned once, the
    # 5 hash probes evaluated once per row, membership via a left join
    # marker (the previous formulation ran five separate count() jobs and
    # re-evaluated the bit tests for both the prefilter and FP counts).
    flags = hashed.withColumn("might", F.expr(might)).join(
        build_keys.withColumn("hit", F.lit(1)), "okey", "left"
    )
    stats = flags.agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum(F.col("might").cast("long")).alias("n_prefiltered"),
        F.sum((F.col("hit") == 1).cast("long")).alias("n_true_match"),
        F.sum((F.col("might") & F.col("hit").isNull()).cast("long")).alias(
            "n_false_pos"
        ),
        F.sum((~F.col("might") & (F.col("hit") == 1)).cast("long")).alias(
            "n_false_neg"
        ),
    ).collect()[0]
    n_keys = build_keys.count()
    theory = (1.0 - 2.718281828459045 ** (-BLOOM_K * n_keys / BLOOM_M)) ** BLOOM_K
    return stats, n_keys, theory


def bloom_prefilter_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registry surface of ``_bloom_audit`` (see its docstring for the
    operator and scale shape): exact columns + the two pinned claims."""
    stats, n_keys, theory = _bloom_audit(spark, sf_dir)
    fp_rate = stats.n_false_pos / max(stats.n_probe - stats.n_true_match, 1)
    fp_ok = fp_rate <= BLOOM_FP_MARGIN * theory + BLOOM_FP_FLOOR
    import math as _math

    return spark.createDataFrame(
        [
            (
                stats.n_probe,
                stats.n_true_match,
                n_keys,
                _math.floor(theory * 1e6 + 0.5) / 1e6,  # portable _fr(·, 6)
                int(stats.n_false_neg == 0),
                int(fp_ok),
            )
        ],
        "n_probe long, n_true_match long, n_keys long, fp_rate_theory double, "
        "no_false_negative int, fp_within_bound int",
    )


def diff_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / CDC extract: given two keyed snapshots of the same
    table, classify every key as insert / delete / update by a full outer
    join on the key plus a value comparison — the change-data-capture
    primitive behind Delta MERGE reconciliation, warehouse audit diffs, and
    backfill verification. Unchanged keys (the overwhelming majority at
    100 TB) are filtered out BEFORE the result materializes, so the output
    is delta-sized, and the full outer join shuffles both sides once on the
    (high-cardinality, uniform) key.

    The two snapshots derive deterministically from orders via the shared
    Knuth hash bucket: 'old' lacks bucket 15-19 (→ inserts), 'new' lacks
    bucket 10-14 (→ deletes) and bumps prices in bucket 0-9 (→ updates) —
    both engines reconstruct identical snapshots, so the diff is
    oracle-exact."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", _bucket("o_orderkey").alias("bkt")
    )
    old = orders.filter(~F.col("bkt").between(15, 19)).select(
        "o_orderkey", F.col("o_totalprice").alias("old_price")
    )
    new = orders.filter(~F.col("bkt").between(10, 14)).select(
        "o_orderkey",
        F.when(
            F.col("bkt") <= 9, F.col("o_totalprice") + 100.0
        ).otherwise(F.col("o_totalprice")).alias("new_price"),
    )
    joined = old.join(new, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("old_price").isNull(), "insert")
        .when(F.col("new_price").isNull(), "delete")
        .when(F.col("old_price") != F.col("new_price"), "update")
    )
    return (
        joined.select("o_orderkey", change.alias("change_type"), "old_price", "new_price")
        .filter(F.col("change_type").isNotNull())
        .orderBy("o_orderkey")
    )


PROFILE_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")


def data_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile of the event feed — null counts and
    exact distinct cardinalities for every column in ONE pass (the
    ingestion-gate report every pipeline runs before accepting a batch).
    Multiple exact COUNT(DISTINCT)s in one aggregate plan through Spark's
    Expand (rows × |columns| — the standard cost, map-side combined);
    at 100 TB the same query swaps in approx_count_distinct per column
    (see approx_distinct_users) with no shape change. The wide 1-row
    aggregate is unpivoted to one row per column via a literal stack —
    no second scan."""
    ev = load_table(spark, sf_dir, "events")
    ag = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}")
            for c in PROFILE_COLS
        ],
        *[F.countDistinct(c).alias(f"nd_{c}") for c in PROFILE_COLS],
    )
    stacked = ag.select(
        "n_rows",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"nn_{c}").alias("n_nulls"),
                        F.col(f"nd_{c}").alias("n_distinct"),
                    )
                    for c in PROFILE_COLS
                ]
            )
        ).alias("s"),
    )
    return stacked.select(
        F.col("s.column").alias("column"),
        "n_rows",
        F.col("s.n_nulls").alias("n_nulls"),
        F.col("s.n_distinct").alias("n_distinct"),
        _fr(F.col("s.n_distinct") / F.col("n_rows"), 6).alias("distinct_ratio"),
    ).orderBy("column")


def entity_fuzzy_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity matching (record linkage): Levenshtein-scored
    candidate pairs generated ONLY within a blocking key — the standard
    linkage discipline (Fellegi-Sunter pipelines, dedupe.io) that turns an
    O(n²) all-pairs comparison into Σ|block|² bounded work. Block = the
    name minus its last two characters; within a block, pairs at edit
    distance ≤ 1 are fuzzy near-matches (a one-character typo apart). Emits
    the per-entity near-match degree — the signal an entity-resolution pass
    clusters on.

    Scale shape: one equi-join shuffle on the block key (never a cross
    join; the no-cartesian guard covers this like every registry query);
    block sizes are bounded by the key design, the skew knob every linkage
    system exposes. Levenshtein is codegen'd JVM-side and identical to
    DuckDB's, so the operator is oracle-exact."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    blocked = cust.withColumn(
        "blk", F.expr("substring(c_name, 1, length(c_name) - 2)")
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("ka"),
            F.col("b.c_custkey").alias("kb"),
            F.levenshtein(F.col("a.c_name"), F.col("b.c_name")).alias("dist"),
        )
        .filter(F.col("dist") <= 1)
    )
    counts = (
        pairs.select(F.col("ka").alias("c_custkey"))
        .unionByName(pairs.select(F.col("kb").alias("c_custkey")))
        .groupBy("c_custkey")
        .agg(F.count("*").alias("n_fuzzy_matches"))
    )
    return (
        cust.join(counts, "c_custkey", "left")
        .fillna(0, ["n_fuzzy_matches"])
        .select("c_custkey", "c_name", "n_fuzzy_matches")
        .orderBy("c_custkey")
    )


ZORDER_BITS = 8     # interleaved bits per dimension (16-bit z-values)
ZORDER_SHIFT = 9    # file id = zval >> 9 → 512 z-values per file


def _z_interleave(ub: str, db: str, *, spark_side: bool) -> str:
    """Bit-interleave expression for z = …d₂u₂d₁u₁d₀u₀ over two ZORDER_BITS
    ints — same arithmetic rendered for Spark SQL (shiftleft/shiftright
    functions) or DuckDB (<< >> operators)."""
    if spark_side:
        terms = [
            f"shiftleft(shiftright({ub}, {i}) & 1, {2 * i}) + "
            f"shiftleft(shiftright({db}, {i}) & 1, {2 * i + 1})"
            for i in range(ZORDER_BITS)
        ]
    else:
        terms = [
            f"((({ub} >> {i}) & 1) << {2 * i}) + ((({db} >> {i}) & 1) << {2 * i + 1})"
            for i in range(ZORDER_BITS)
        ]
    return " + ".join(f"({t})" for t in terms)


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) data layout — the multi-dimensional clustering
    behind Delta Lake OPTIMIZE ZORDER BY and the classic UB-tree: interleave
    the bits of two filter dimensions (user bucket, day of month) into one
    z-value and cut files along fixed z-ranges. Because the curve alternates
    bits, every file's rows span at most 2^⌈9/2⌉ = 32 user buckets AND at
    most 16 days — so per-file min/max statistics prune file scans for
    point/range predicates on EITHER dimension. A time-sorted layout prunes
    only time predicates (a user_id query reads every file); a user-sorted
    layout only user predicates. The emitted audit is exactly the min/max
    footer a lakehouse writer would store per file.

    Map-only: z-value and file id are pure per-row bit arithmetic in
    whole-stage codegen; the audit agg shuffles once on the bounded file-id
    key. At 100 TB this is the REWRITE plan for one OPTIMIZE pass — the
    sort into z-order is a repartitionByRange on zval, and the stats here
    quantify the pruning it buys."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr(f"CAST(pmod(user_id, {1 << ZORDER_BITS}) AS INT)").alias("ub"),
        (F.dayofmonth("ts") - 1).alias("db"),
    )
    z = ev.select(
        "ub",
        "db",
        F.expr(_z_interleave("ub", "db", spark_side=True)).alias("zval"),
    ).select("ub", "db", F.expr(f"zval div {1 << ZORDER_SHIFT}").alias("file_id"))
    return (
        z.groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("ub").alias("ub_min"),
            F.max("ub").alias("ub_max"),
            F.min("db").alias("db_min"),
            F.max("db").alias("db_max"),
        )
        .select(
            "file_id",
            "n_rows",
            "ub_min",
            "ub_max",
            "db_min",
            "db_max",
            (F.col("ub_max") - F.col("ub_min") + 1).alias("ub_span"),
            (F.col("db_max") - F.col("db_min") + 1).alias("db_span"),
        )
        .orderBy("file_id")
    )


def _sql_stratum_case() -> str:
    whens = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in STRATUM_PCT.items()
    )
    return f"CASE event_type {whens} END"


def _mad_oracle(extra: str) -> str:
    """Exact-percentile MAD replay; ``extra`` appends the approx twin's
    constant-true claim column (the Spark side emits 0 there iff the
    sketch breaks its pinned bound, which the hash check then catches)."""
    return f"""
        WITH med AS (
            SELECT event_type,
                   {_sql_fr('quantile_cont(value, 0.5)', 6)} AS med
            FROM events GROUP BY 1
        ),
        dev AS (
            SELECT e.event_id, e.event_type, e.value, m.med,
                   abs(e.value - m.med) AS adev
            FROM events e JOIN med m USING (event_type)
        ),
        mads AS (
            SELECT event_type, min(med) AS med,
                   {_sql_fr('quantile_cont(adev, 0.5)', 6)} AS mad
            FROM dev GROUP BY 1
        )
        SELECT d.event_id, d.event_type, d.value, m.med, m.mad,
               {_sql_fr(f'{MAD_K} * (d.value - m.med) / m.mad', 4)} AS mscore{extra}
        FROM dev d JOIN mads m USING (event_type)
        WHERE m.mad > 0
          AND abs({MAD_K} * (d.value - m.med) / m.mad) > {MAD_THRESH}
        ORDER BY d.event_id
    """


def _sql_split_case() -> str:
    parts, lo = [], 0
    for name, pct in SPLIT_PCT:
        parts.append(f"WHEN b >= {lo} AND b < {lo + pct} THEN '{name}'")
        lo += pct
    return "CASE " + " ".join(parts) + " END"


ORACLE: dict[str, str] = {
    # pinned-tolerance replays (r6 verdict #5): the exact yardstick columns
    # are replayed and the sketch claims asserted as held — if a sketch
    # ever exceeds its pinned bound the Spark side emits 0 and the hash
    # check catches it.
    "approx_distinct_users": f"""
        SELECT event_type,
               count(DISTINCT user_id) AS exact_users,
               {_sql_fr('quantile_cont(value, 0.5)', 6)} AS exact_p50,
               CAST(1 AS INT) AS hll_within_5pct,
               CAST(1 AS INT) AS p50_within_5pct
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "bloom_prefilter_semi_join": f"""
        WITH bk AS (
            SELECT DISTINCT o_orderkey FROM orders
            WHERE o_orderpriority = '1-URGENT'
        ),
        agg AS (SELECT count(*) AS n_keys FROM bk)
        SELECT (SELECT count(*) FROM lineitem) AS n_probe,
               (SELECT count(*) FROM lineitem l
                JOIN bk b ON l.l_orderkey = b.o_orderkey) AS n_true_match,
               n_keys,
               floor(power(1.0 - power(2.718281828459045,
                                       -({BLOOM_K}.0 * n_keys) / {BLOOM_M}.0),
                           {BLOOM_K}) * 1e6 + 0.5) / 1e6 AS fp_rate_theory,
               CAST(1 AS INT) AS no_false_negative,
               CAST(1 AS INT) AS fp_within_bound
        FROM agg
    """,
    "approx_distinct_users_scale": """
        SELECT event_type,
               count(*) AS n_events,
               CAST(1 AS INT) AS hll_within_5pct,
               CAST(1 AS INT) AS p50_within_5pct
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "hll_partial_rollup": """
        SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
               count(DISTINCT strftime(ts, '%Y-%m-%d')) AS n_days,
               count(DISTINCT user_id) AS exact_users,
               CAST(1 AS INT) AS hll_within_5pct
        FROM events GROUP BY 1 ORDER BY 1
    """,
    # the approx twin replays the SAME exact row set (its output rows are
    # yardstick-selected) and asserts the pinned sketch claim held
    "anomaly_mad_zscore": _mad_oracle(extra=""),
    "anomaly_mad_zscore_approx": _mad_oracle(
        extra=", CAST(1 AS INT) AS approx_close"
    ),
    "diff_snapshots": f"""
        WITH base AS (
            SELECT o_orderkey, o_totalprice,
                   {_sql_bucket('o_orderkey')} AS bkt
            FROM orders
        ),
        old AS (
            SELECT o_orderkey, o_totalprice AS old_price
            FROM base WHERE bkt NOT BETWEEN 15 AND 19
        ),
        new AS (
            SELECT o_orderkey,
                   CASE WHEN bkt <= 9 THEN o_totalprice + 100.0
                        ELSE o_totalprice END AS new_price
            FROM base WHERE bkt NOT BETWEEN 10 AND 14
        )
        SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
               CASE WHEN old_price IS NULL THEN 'insert'
                    WHEN new_price IS NULL THEN 'delete'
                    WHEN old_price <> new_price THEN 'update' END AS change_type,
               old_price, new_price
        FROM old FULL OUTER JOIN new USING (o_orderkey)
        WHERE CASE WHEN old_price IS NULL THEN 'insert'
                   WHEN new_price IS NULL THEN 'delete'
                   WHEN old_price <> new_price THEN 'update' END IS NOT NULL
        ORDER BY o_orderkey
    """,
    "data_quality_profile": f"""
        WITH ag AS (
            SELECT count(*) AS n_rows,
                   {", ".join(f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_{c}, count(DISTINCT {c}) AS nd_{c}" for c in PROFILE_COLS)}
            FROM events
        )
        SELECT s.column, n_rows, s.n_nulls, s.n_distinct,
               {_sql_fr('s.n_distinct * 1.0 / n_rows', 6)} AS distinct_ratio
        FROM ag, LATERAL (
            {" UNION ALL ".join(f"SELECT '{c}' AS column, nn_{c} AS n_nulls, nd_{c} AS n_distinct" for c in PROFILE_COLS)}
        ) s
        ORDER BY s.column
    """,
    "entity_fuzzy_blocking": """
        WITH c AS (
            SELECT c_custkey, c_name,
                   substring(c_name, 1, length(c_name) - 2) AS blk
            FROM customer
        ),
        pairs AS (
            SELECT a.c_custkey AS ka, b.c_custkey AS kb
            FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
            WHERE levenshtein(a.c_name, b.c_name) <= 1
        ),
        counts AS (
            SELECT k AS c_custkey, count(*) AS n_fuzzy_matches FROM (
                SELECT ka AS k FROM pairs UNION ALL SELECT kb AS k FROM pairs
            ) GROUP BY 1
        )
        SELECT c.c_custkey, c.c_name,
               COALESCE(n_fuzzy_matches, 0) AS n_fuzzy_matches
        FROM c LEFT JOIN counts USING (c_custkey)
        ORDER BY c.c_custkey
    """,
    "zorder_layout": f"""
        WITH dims AS (
            SELECT CAST(user_id % {1 << ZORDER_BITS} AS INT) AS ub,
                   day(ts) - 1 AS db
            FROM events
        ),
        z AS (
            SELECT ub, db,
                   ({_z_interleave('ub', 'db', spark_side=False)})
                       // {1 << ZORDER_SHIFT} AS file_id
            FROM dims
        )
        SELECT file_id, count(*) AS n_rows,
               min(ub) AS ub_min, max(ub) AS ub_max,
               min(db) AS db_min, max(db) AS db_max,
               max(ub) - min(ub) + 1 AS ub_span,
               max(db) - min(db) + 1 AS db_span
        FROM z
        GROUP BY file_id
        ORDER BY file_id
    """,
    "rollup_merge_incremental": f"""
        SELECT event_type,
               hour(ts) AS hour_of_day,
               count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(30,10))), 2) AS DOUBLE)
                   AS total_value,
               CAST(min(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS min_value,
               CAST(max(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS max_value,
               -- divide by count(*) — the merge's count STATE — not
               -- count(value): must match the Spark side under NULL values
               {_sql_fr('CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) / count(*)', 4)} AS avg_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "stratified_sample": f"""
        SELECT event_id, event_type
        FROM events
        WHERE {_sql_bucket('event_id')} < {_sql_stratum_case()}
        ORDER BY event_id
    """,
    "train_test_split": f"""
        SELECT {_sql_split_case()} AS split, lang, count(*) AS n_docs
        FROM (SELECT {_sql_bucket('doc_id')} AS b, lang FROM documents)
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    # the independent-engine recomputation of the canonical row-hash
    # sums — DuckDB agreeing on all 32 bucket checksums IS the check
    "table_fingerprint": f"""
        WITH r AS (
            SELECT o_orderkey % {FP_BUCKETS} AS bucket,
                   CAST('0x' || substr(md5(
                       CAST(o_orderkey AS VARCHAR) || '|' ||
                       CAST(o_custkey AS VARCHAR) || '|' ||
                       o_orderstatus || '|' ||
                       CAST(CAST({_sql_fr('o_totalprice', 2)} AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
                       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || '|' ||
                       o_orderpriority
                   ), 1, 15) AS BIGINT) AS rv
            FROM orders
        )
        SELECT bucket, count(*) AS n_rows,
               CAST(sum(rv) % 2305843009213693951 AS BIGINT) AS checksum
        FROM r
        GROUP BY bucket
        ORDER BY bucket
    """,
    # the generic library path recomputed per its type rules: digits for
    # integrals, full-scale decimal strings, %f microsecond timestamps,
    # bucket = row-hash mod 32 (non-negative, so % == pmod)
    "fingerprint_generic_orders": f"""
        WITH r AS (
            SELECT CAST('0x' || substr(md5(
                       CAST(o_orderkey AS VARCHAR) || '|' ||
                       o_orderstatus || '|' ||
                       CAST(CAST({_sql_fr('o_totalprice', 2)} AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
                       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S.%f')
                   ), 1, 15) AS BIGINT) AS rv
            FROM orders
        )
        SELECT rv % {FP_BUCKETS} AS bucket, count(*) AS n_rows,
               CAST(sum(rv) % {(1 << 61) - 1} AS BIGINT) AS checksum
        FROM r
        GROUP BY bucket
        ORDER BY bucket
    """,
    # both digest tables recomputed independently, same divergence join;
    # counts equal on every diverged bucket — value drift only
    "fingerprint_divergence_report": f"""
        WITH a AS (
            SELECT o_orderkey % {FP_BUCKETS} AS bucket, count(*) AS n_rows_a,
                   CAST(sum(CAST('0x' || substr(md5(
                       CAST(o_orderkey AS VARCHAR) || '|' ||
                       CAST(o_custkey AS VARCHAR) || '|' ||
                       o_orderstatus || '|' ||
                       CAST(CAST({_sql_fr('o_totalprice', 2)} AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
                       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || '|' ||
                       o_orderpriority
                   ), 1, 15) AS BIGINT)) % {(1 << 61) - 1} AS BIGINT) AS checksum_a
            FROM orders GROUP BY 1
        ),
        r AS (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   CASE WHEN o_orderkey % {FP_DIVERGE_MOD} = {FP_DIVERGE_RES}
                        THEN o_totalprice + {FP_DIVERGE_DELTA}
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM orders
        ),
        b AS (
            SELECT o_orderkey % {FP_BUCKETS} AS bucket, count(*) AS n_rows_b,
                   CAST(sum(CAST('0x' || substr(md5(
                       CAST(o_orderkey AS VARCHAR) || '|' ||
                       CAST(o_custkey AS VARCHAR) || '|' ||
                       o_orderstatus || '|' ||
                       CAST(CAST({_sql_fr('o_totalprice', 2)} AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
                       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || '|' ||
                       o_orderpriority
                   ), 1, 15) AS BIGINT)) % {(1 << 61) - 1} AS BIGINT) AS checksum_b
            FROM r GROUP BY 1
        )
        SELECT a.bucket, n_rows_a, checksum_a, n_rows_b, checksum_b
        FROM a JOIN b ON a.bucket = b.bucket
        WHERE checksum_a <> checksum_b
        ORDER BY a.bucket
    """,
    # the streaming twin's spine is the SAME single-pass digests (the
    # micro-batch split cannot change modular sums); the additivity
    # claim is engine-decided and pinned TRUE
    "table_fingerprint_stream": f"""
        WITH r AS (
            SELECT o_orderkey % {FP_BUCKETS} AS bucket,
                   CAST('0x' || substr(md5(
                       CAST(o_orderkey AS VARCHAR) || '|' ||
                       CAST(o_custkey AS VARCHAR) || '|' ||
                       o_orderstatus || '|' ||
                       CAST(CAST({_sql_fr('o_totalprice', 2)} AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
                       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || '|' ||
                       o_orderpriority
                   ), 1, 15) AS BIGINT) AS rv
            FROM orders
        )
        SELECT bucket, count(*) AS n_rows,
               CAST(sum(rv) % {(1 << 61) - 1} AS BIGINT) AS checksum,
               TRUE AS merge_additive_ok
        FROM r
        GROUP BY bucket
        ORDER BY bucket
    """,
    # the CMS-driven library salted join: the oracle replays the plain
    # join + the EXACT hot-key census and asserts both pinned claims held
    # (CM-superset detection, multiset row identity)
    "salted_join_cms": f"""
        WITH hot AS (
            SELECT l_orderkey FROM lineitem
            GROUP BY 1 HAVING count(*) >= {HOT_MIN_LINES}
        )
        SELECT o.o_orderpriority,
               count(*) AS n_lines,
               count(DISTINCT CASE WHEN h.l_orderkey IS NOT NULL
                                   THEN l.l_orderkey END) AS n_hot_orders,
               CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                                   AS DECIMAL(30,10))), 2) AS DOUBLE) AS revenue,
               CAST(1 AS INT) AS detector_superset_ok,
               CAST(1 AS INT) AS salted_identity_ok
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        LEFT JOIN hot h ON l.l_orderkey = h.l_orderkey
        GROUP BY 1
        ORDER BY 1
    """,
    # the plain (unsalted) join + aggregate — matching the engine's
    # hot-key-salted composite join proves row-identical results
    "skew_split_join": """
        SELECT o_orderpriority,
               count(*) AS n_lines,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(30,10))), 2) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "skew_salted_agg": """
        SELECT event_type,
               count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(30,10))), 2) AS DOUBLE) AS total_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "sql_scalar_subquery": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.5
        ORDER BY o_orderkey
    """,
    "sql_correlated_exists": """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        )
        ORDER BY c_custkey
    """,
    "sql_groupby_having": f"""
        SELECT o_custkey, count(*) AS n_orders,
               {_sql_avg4('o_totalprice', 2)} AS avg_price
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) >= 15
        ORDER BY o_custkey
    """,
}

QUERIES = {
    "anomaly_mad_zscore": anomaly_mad_zscore,
    "anomaly_mad_zscore_approx": anomaly_mad_zscore_approx,  # pinned-tolerance
    "rollup_merge_incremental": rollup_merge_incremental,
    "zorder_layout": zorder_layout,
    "diff_snapshots": diff_snapshots,
    "data_quality_profile": data_quality_profile,
    "entity_fuzzy_blocking": entity_fuzzy_blocking,
    "hll_partial_rollup": hll_partial_rollup,  # rows-only: sketch estimate
    "bloom_prefilter_semi_join": bloom_prefilter_semi_join,  # pinned-tolerance
    "stratified_sample": stratified_sample,
    "train_test_split": train_test_split,
    "skew_split_join": skew_split_join,
    "salted_join_cms": salted_join_cms_checked,
    "table_fingerprint": table_fingerprint,
    "fingerprint_generic_orders": fingerprint_generic_orders,
    "table_fingerprint_stream": table_fingerprint_stream,
    "fingerprint_divergence_report": fingerprint_divergence_report,
    "skew_salted_agg": skew_salted_agg,
    "approx_distinct_users": approx_distinct_users,
    "approx_distinct_users_scale": approx_distinct_users_scale,
    "sql_scalar_subquery": sql_scalar_subquery,
    "sql_correlated_exists": sql_correlated_exists,
    "sql_groupby_having": sql_groupby_having,
}
