"""Similarity search over the ``embeddings`` table (BASELINE.json extension).

Three tiers, mirroring how an ANN service scales:

- ``ann_brute_force``: exact cosine top-k, long-form joins + decimal-exact
  dot products. The correctness baseline every approximate method is
  validated against; oracle-checked bit-for-bit.
- ``ann_ivf_label``: IVF-style two-stage search — coarse quantization to a
  centroid (here the labeled partition, standing in for k-means cells),
  probe only the best cell, exact re-rank inside it. The candidate set drops
  from N to N/cells: this is the 100 TB shape (cells partition the table, a
  query touches one partition). Fully oracle-checked, including the
  centroid computation.
- ``ann_bruteforce_pandas``: the same brute-force math as an Arrow-batched
  vectorized numpy matmul (mapInPandas) — the JVM↔Python batch path you use
  when the scoring really is Python (custom metrics, learned rerankers).
  Rows-only check (numpy float accumulation can't bit-match a SQL oracle).

Query set = vec_id < N_QUERIES; candidates = the rest. Ranking ties are
broken by vec_id so results are deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from weather_database_system_spark.operators.relational import DEC, _fr
from weather_database_system_spark.session import track_persisted
from weather_database_system_spark.operators.dedup import (
    _dot_dec,
    _emb_double,
    _long_embeddings,
)
from weather_database_system_spark.sources.star import load_table

N_QUERIES = 10
TOP_K = 5


def _norms(long: DataFrame) -> DataFrame:
    return long.groupBy("vec_id").agg(
        F.sqrt(F.sum((F.col("val") * F.col("val")).cast(DEC)).cast("double")).alias("nrm")
    )


def ann_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: the bounded query set (N_QUERIES whole vectors)
    broadcast against the candidate scan; each pair's dot runs as a
    zip_with/aggregate decimal fold inside codegen. One map-side pass over
    the candidates + a window top-k — no shuffle of candidate data and no
    64× long-form explosion (n=5 medians at sf0.1: 1.68s vs 2.67s for the
    dim-equi-join formulation — the r02 bench's 2.33s reading was n=2
    noise). The decimal fold keeps every score bit-identical
    to the oracle's long-form SQL. This is the scale shape whenever the
    query set is bounded; for huge query sets, tile both sides (blocked
    matmul via mapInPandas, see ann_bruteforce_pandas) or move to the
    LSH/IVF variants below."""
    vecs = _emb_double(spark, sf_dir).select(
        "vec_id", "emb", F.sqrt(_dot_dec(F.col("emb"), F.col("emb"))).alias("nrm")
    )
    q = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("nrm").alias("qnrm"),
    )
    # spread the candidate scan: one parquet split at small SF = ONE task
    # for the broadcast-NLJ probe side, serializing every decimal dot
    # fold (the semdedup/PQ repartition rationale; no-op at 100 TB)
    c = vecs.filter(F.col("vec_id") >= N_QUERIES).repartition(
        spark.sparkContext.defaultParallelism, "vec_id"
    )
    cos = _dot_dec(F.col("qemb"), F.col("emb")) / (F.col("qnrm") * F.col("nrm"))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        c.crossJoin(F.broadcast(q))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", _fr(F.col("cos"), 6).alias("cosine"))
        .orderBy("query_id", "rank")
    )


def ann_ivf_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style search: (1) per-label centroids (exact decimal means), (2)
    route each query to its best centroid by cosine, (3) exact top-3 within
    that cell only. Probing 1 of ~10 cells ⇒ ~10× less work than brute
    force; at scale the cells are k-means cells and the table is
    partitioned by cell id, so step 3 reads one partition."""
    emb = load_table(spark, sf_dir, "embeddings")
    long = _long_embeddings(spark, sf_dir).join(
        emb.select("vec_id", "label"), "vec_id"
    )
    cand = long.filter(F.col("vec_id") >= N_QUERIES)
    centroids = cand.groupBy("label", "dim").agg(
        (F.sum(F.col("val").cast(DEC)).cast("double") / F.count("val")).alias("cval")
    )
    cnorm = centroids.groupBy("label").agg(
        F.sqrt(F.sum((F.col("cval") * F.col("cval")).cast(DEC)).cast("double")).alias("cnrm")
    )
    q = long.filter(F.col("vec_id") < N_QUERIES).alias("q")
    qnorm = _norms(q.select("vec_id", "dim", "val"))

    qc = (
        q.join(centroids.alias("ce"), F.col("q.dim") == F.col("ce.dim"))
        .groupBy(F.col("q.vec_id").alias("query_id"), F.col("ce.label").alias("label"))
        .agg(F.sum((F.col("q.val") * F.col("ce.cval")).cast(DEC)).cast("double").alias("dot"))
    )
    qc_cos = (
        qc.join(qnorm.alias("qn"), qc.query_id == F.col("qn.vec_id"))
        .join(cnorm.alias("cn"), "label")
        .select("query_id", "label", (F.col("dot") / (F.col("qn.nrm") * F.col("cn.cnrm"))).alias("ccos"))
    )
    wbest = W.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("label"))
    best = (
        qc_cos.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select("query_id", F.col("label").alias("best_label"))
    )

    cand_best = cand.alias("c").join(
        best.alias("b"), F.col("c.label") == F.col("b.best_label")
    )
    dots = (
        q.join(cand_best, (F.col("q.dim") == F.col("c.dim")) & (F.col("q.vec_id") == F.col("b.query_id")))
        .groupBy(
            F.col("b.query_id").alias("query_id"),
            F.col("b.best_label").alias("best_label"),
            F.col("c.vec_id").alias("neighbor_id"),
        )
        .agg(F.sum((F.col("q.val") * F.col("c.val")).cast(DEC)).cast("double").alias("dot"))
    )
    norms = _norms(_long_embeddings(spark, sf_dir))
    cos = (F.col("dot") / (F.col("qn.nrm") * F.col("nc.nrm"))).alias("cos")
    wk = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        dots.join(qnorm.alias("qn"), dots.query_id == F.col("qn.vec_id"))
        .join(norms.alias("nc"), dots.neighbor_id == F.col("nc.vec_id"))
        .select("query_id", "best_label", "neighbor_id", cos)
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= 3)
        .select("query_id", "best_label", "rank", "neighbor_id", _fr(F.col("cos"), 6).alias("cosine"))
        .orderBy("query_id", "rank")
    )


K_CELLS = 8           # k-means cells
KMEANS_ITERS = 2      # Lloyd iterations (deterministic, unrolled in SQL too)


def _l2_dec(a, b):
    """Exact squared-L2 distance: per-dim squared differences (IEEE,
    engine-identical) accumulated in DECIMAL(30,10). Stays decimal — the
    argmin compares exactly, no double rounding in the ordering key."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: ((x - y) * (x - y)).cast(DEC)),
        F.lit(0).cast(DEC),
        lambda acc, v: (acc + v).cast(DEC),
    )


_CONST_COLS: dict = {}
_CONST_COLS_GW = None
_KEYED_COLS_MAX = 64  # bounded: trained-codebook keys churn in production


def _const_cols(key: str, build):
    """Build-once cache for CONSTANT column expressions (column names and
    literal constants only — never runtime data such as trained
    centroids). Every Column operator is a Py4J round trip, so the
    64-wide flat-column lists the int64-grid operators use (element_at
    projections, per-dim sums, the unrolled pair dot) cost 0.5-1.5 s of
    pure driver time PER QUERY CALL to rebuild — for expression trees
    that are bit-identical every time. Columns are immutable unresolved
    expression templates tied to the JVM, not to a session or plan, so
    one instance serves every query in the process (PySpark resolves a
    fresh copy per plan). Cached builders must therefore depend only on
    module constants (or, via _keyed_cols, on values fully captured by
    the key) — never on session config or free variables the key misses.

    The cache is keyed to the live Py4J gateway (ADVICE r18): cached
    Columns wrap JVM expression objects, so entries from a previous
    gateway would be dead references if the JVM were ever recycled.
    SparkSession stop/recreate keeps the gateway (same JVM) and the
    cache stays valid across it — exactly the tests' cold-session probe."""
    global _CONST_COLS_GW
    from pyspark import SparkContext

    gw = SparkContext._gateway
    if gw is not _CONST_COLS_GW:
        _CONST_COLS.clear()
        _CONST_COLS_GW = gw
    if key not in _CONST_COLS:
        _CONST_COLS[key] = build()
    return _CONST_COLS[key]


def _keyed_cols(kind: str, content_key: str, build):
    """_const_cols generalized to DATA-DEPENDENT expression templates
    (VERDICT r18 #4): the key embeds a canonical rendering of every
    runtime value that shapes the tree (e.g. ``repr(books)`` for the PQ
    codebooks), so a cache hit returns a bit-identical template and any
    value change misses. This caches expression CONSTRUCTION only — the
    values themselves are recomputed by their training actions on every
    query call; no data or results are stored, exactly as with
    _const_cols (the Py4J-chatter cost being amortized is guide §4's
    driver boundary, measured ~1.6 s per ann_product_quantization call
    in the r18 profile). Bounded FIFO eviction: trained values churn in
    production, and an unbounded template cache would pin their JVM
    expression trees forever."""
    key = (kind, content_key)
    cached = _const_cols(key, build)
    # FIFO-evict oldest data-keyed entries; plain _const_cols entries
    # (2-tuples with small constant keys) are few and never evicted.
    if len(_CONST_COLS) > _KEYED_COLS_MAX:
        for k in list(_CONST_COLS):
            if len(_CONST_COLS) <= _KEYED_COLS_MAX:
                break
            if k != key:
                del _CONST_COLS[k]
    return cached


def _lit_arr(values):
    """Literal array column in ONE Py4J round trip.

    ``F.lit(list)`` builds ``array(lit(v0), lit(v1), ...)`` — one Py4J
    call PER ELEMENT, which at K×dims scale (512-1024 elements per Lloyd
    codebook) costs 0.7-2.5 s of pure driver time PER EXPRESSION BUILD
    and dominated semdedup_prune / ann_product_quantization wall-clock at
    test SF (profiled r18: 5.8 s / 4.2 s of the queries' 8.7 s / 5.8 s sat
    outside every Spark job). Rendering the same values as one SQL array
    literal and parsing it is a single round trip (~3 ms) and
    constant-folds to the identical Literal: ``repr(float)`` emits the
    shortest digits that round-trip, and Spark's parser reads them with
    Java's correctly-rounded ``Double.parseDouble``, so double values are
    BIT-identical to the per-element path (validated against F.lit on
    max-double / denormal / -0.0). The explicit CAST pins the exact
    array type F.lit's element typing produced (INT leaves unless a
    value needs BIGINT — F.array's own widening rule), so plan types are
    unchanged too."""
    def render(v) -> tuple[str, tuple[int, str]]:
        """→ (sql, (array_depth, scalar_kind)); INT widens to BIGINT when
        siblings mix (F.array's own coercion), other mixes are a bug."""
        if isinstance(v, (list, tuple)):
            parts = [render(x) for x in v]
            kinds = {k for _, k in parts}
            if not kinds:
                raise ValueError("empty literal array (type is ambiguous)")
            depths = {d for d, _ in kinds}
            scalars = {s for _, s in kinds}
            if len(depths) > 1 or not scalars <= {"INT", "BIGINT", "DOUBLE"}:
                raise TypeError(f"incompatible literal array kinds: {kinds}")
            if len(scalars) > 1:
                if scalars != {"INT", "BIGINT"}:
                    raise TypeError(f"mixed literal leaf types: {scalars}")
                scalar = "BIGINT"
            else:
                scalar = scalars.pop()
            sql = "array(" + ",".join(s for s, _ in parts) + ")"
            return sql, (depths.pop() + 1, scalar)
        if isinstance(v, bool):
            raise TypeError("bool literal arrays unsupported")
        if isinstance(v, float):
            if v != v or v in (float("inf"), float("-inf")):
                raise ValueError("non-finite literal")
            return repr(v) + "D", (0, "DOUBLE")
        if isinstance(v, int):
            return str(v), (0, "INT" if -(2**31) <= v < 2**31 else "BIGINT")
        raise TypeError(f"unsupported literal leaf {type(v)}")

    sql, (depth, scalar) = render(list(values))
    kind = scalar
    for _ in range(depth):
        kind = f"ARRAY<{kind}>"
    return F.expr(f"CAST({sql} AS {kind})")


def _cell_argmin_expr(cents: list[tuple[int, list[float]]], col=None):
    """Nearest-centroid cell id as ONE map-side expression over the ``emb``
    double array (or any array column passed as ``col`` — the PQ subspace
    slices use this): per cell an exact-decimal d² fold against the centroid's
    literal array, argmin via array_min over (d², cell) structs —
    lexicographic struct comparison = d² asc then cell asc, the same
    tie-break the crossJoin+row_number formulation ordered by. The decimal
    fold keeps the comparison exact (no double rounding in the ordering
    key), so assignment is bit-identical to the join form and the DuckDB
    oracle's SQL training replay.

    This is the `_semdedup_cell_expr` shape ported to the double/decimal
    IVF-PQ family (r5 verdict #3): the previous
    crossJoin(broadcast(cents)) + row_number over partitionBy(vec_id)
    forced an N×K-row hash exchange per Lloyd iteration; a projection is
    absorbed by the scan pipeline — zero exchange, nothing to skew."""
    return F.array_min(_cell_entries_expr(cents, col))["cell"]


def _cell_entries_expr(cents: list[tuple[int, list[float]]], col=None):
    """The (d², cell) struct array behind _cell_argmin_expr — exposed so
    multi-probe routing can array_sort + slice the SAME entries (identical
    distances, identical tie-break).

    The centroid data lives in TWO nested-array literals (single Literal
    nodes), not K unrolled per-cell expression arms: every Lloyd round
    rebuilds this expression with fresh centroids, and a K×dims-arm tree
    (~1000s of nodes) costs seconds of driver-side analysis/codegen PER
    ROUND with zero cache reuse — measured 5-7 s/round at PQ's M×K=64
    codebook vs ~1 s with the constant-size tree. Executor-side work is
    identical (the same K×dims fold per row, HOF-interpreted either way).
    named_struct, not struct+alias: aliases on struct children are
    stripped when this expression nests inside ANOTHER struct (the PQ
    encode projection), leaving col1/col2 field names."""
    if col is None:
        # The emb-column form is rebuilt identically on every query call
        # once a quantizer is trained — cache the template on the centroid
        # VALUES (_keyed_cols; construction only, ~30 Py4J round trips per
        # build saved). Callers passing an explicit col (the PQ subspace
        # slices) cache at their own call sites with keys that include it.
        return _keyed_cols(
            "cell_entries_emb", repr(cents),
            lambda: _cell_entries_expr(cents, F.col("emb")),
        )
    cs = sorted(cents)
    return _cell_entries_from(
        _lit_arr([c for c, _ in cs]), _lit_arr([v for _, v in cs]), col
    )


def _cell_entries_from(ids, vals, col):
    """`_cell_entries_expr` generalized to arbitrary id/value expressions:
    ``ids``/``vals`` may be literals (the normal per-round driver-state
    path) or COLUMNS from a 1-row broadcast — the two-rounds-per-
    materialization fold (r6 verdict #3) computes round-1 centroids inside
    the plan and feeds them here as array columns, so round-2 assignment
    never waits on a driver round trip."""
    return F.transform(
        ids,
        lambda cid, i: F.named_struct(
            F.lit("d2"), _l2_dec(col, F.element_at(vals, i + 1)),
            F.lit("cell"), cid,
        ),
    )


IVF_LITERAL_ROUTER_MAX = 64  # cells; beyond this the centroid set rides a
# 1-row broadcast instead of a Python literal: F.lit of a nested
# K×dims array converts per-element over Py4J — measured 4.7 s of pure
# DRIVER time at K=179×64 (r16), which single-handedly erased the √N
# stored-index win the sizing rule exists to deliver. createDataFrame
# batches the same values through the pickle serializer in ~100 ms, and
# the sanctioned 1-row-anchor BNLJ (the _lloyd_two_rounds round-2 shape)
# feeds them to the SAME _cell_entries_from fold — executor math, tie
# break, and results are bit-identical; only the transport differs. The
# pinned registry geometry (K_CELLS=8) stays on the literal path so its
# plan pins (single ivf_index scan, no extra BNLJ) hold byte-for-byte.


def _centroid_row_of(spark, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """Driver-side centroid list as a 1-row (ids, vals) broadcast anchor
    — the large-K transport (see IVF_LITERAL_ROUTER_MAX)."""
    cs = sorted(cents)
    return spark.createDataFrame(
        [([c for c, _ in cs], [v for _, v in cs])],
        "ids array<int>, vals array<array<double>>",
    )


def _assign_cells(cand: DataFrame, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """Nearest-centroid assignment as a pure projection (see
    _cell_argmin_expr). ``cents`` is the bounded driver-side centroid list —
    K rows, the same centroids-as-driver-state shape as MLlib KMeans.
    Past IVF_LITERAL_ROUTER_MAX cells the centroids ride a 1-row
    broadcast anchor instead of a literal (same fold, same results)."""
    if len(cents) <= IVF_LITERAL_ROUTER_MAX:
        return cand.select(
            "vec_id", "emb", _cell_argmin_expr(cents).alias("cell")
        )
    anchor = _centroid_row_of(cand.sparkSession, cents)
    return cand.crossJoin(F.broadcast(anchor)).select(
        "vec_id",
        "emb",
        F.array_min(
            _cell_entries_from(F.col("ids"), F.col("vals"), F.col("emb"))
        )["cell"].alias("cell"),
    )


def _lloyd_round(
    cand: DataFrame, cents: list[tuple[int, list[float]]], dims: int
) -> list[tuple[int, list[float]]]:
    """One Lloyd round = the map-side argmin projection + ONE
    (cell, dim)-keyed aggregation (map-side combined, K×dims groups,
    skew-free); the K mean vectors are finished driver-side from the
    K×dims collected rows. float(decimal_sum) / n is the same
    correctly-rounded IEEE double as the oracle's
    CAST(sum(DECIMAL) AS DOUBLE) / count, so training stays bit-identical
    to the SQL replay.

    Why ONE sum column over posexplode instead of dims flat sum columns:
    the round's plan is new each time (fresh centroid literals), so it
    recompiles every round — a 64-column DECIMAL aggregate costs seconds
    of whole-stage codegen PER ROUND (measured 2-6 s at 64 columns vs
    ~0.1 s for this shape; the same janino-pressure lesson as
    _semdedup_cell_expr's fold); the exploded shuffle is K×dims partial
    rows per partition, trivial at any scale."""
    # assignment in its own select BEFORE the explode: a generator and a
    # projection in one select evaluate the projection per GENERATED row,
    # re-running the K×dims argmin fold dims× per vector (and
    # CollapseProject would inline it through a chained projection — the
    # Generate node is the barrier that pins one evaluation per vector)
    rows = _lloyd_partials(_assign_cells(cand, cents)).collect()
    acc: dict[int, dict[int, float]] = {}
    for r in rows:
        acc.setdefault(r["cell"], {})[r["dim"]] = float(r["s"]) / r["n"]
    return sorted(
        (cell, [byd[i] for i in range(dims)]) for cell, byd in acc.items()
    )


def _lloyd_partials(assigned: DataFrame) -> DataFrame:
    """(cell, dim) → (n, Σval) partials for one Lloyd update — the explode
    in its own select AFTER the assignment projection (the Generate node
    pins one argmin evaluation per vector, see _lloyd_round)."""
    return (
        assigned.select("cell", F.posexplode("emb").alias("dim", "val"))
        .groupBy("cell", "dim")
        .agg(F.count("*").alias("n"), F.sum(F.col("val").cast(DEC)).alias("s"))
    )


def _centroid_row(parts: DataFrame) -> DataFrame:
    """Fold (cell, dim, n, s) partials into ONE row of (ids, vals) nested
    arrays — the in-plan twin of _lloyd_round's driver finish.
    CAST(DECIMAL AS DOUBLE) / n is the same correctly-rounded IEEE double
    as the driver's float(decimal_sum) / n (both conversions round half to
    even on the exact decimal value; n < 2^53), so centroids computed here
    are bit-identical to the collected form and the oracle replay still
    applies verbatim. K×dims partial rows collapse to a 1-row broadcast —
    nothing here scales with the data."""
    # constant agg/transform templates — built once per process (the
    # _pq_two_rounds fold rationale; guide §4 driver boundary)
    ent_c, cent_c, cc_c, ids_c, vals_c = _const_cols(
        "lloyd_centroid_row",
        lambda: (
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("dim"),
                        (F.col("s").cast("double") / F.col("n")).alias("mu"),
                    )
                )
            ).alias("ent"),
            F.transform("ent", lambda e: e["mu"]).alias("cent"),
            F.array_sort(F.collect_list(F.struct("cell", "cent"))).alias("cc"),
            F.transform("cc", lambda x: x["cell"]).alias("ids"),
            F.transform("cc", lambda x: x["cent"]).alias("vals"),
        ),
    )
    return (
        parts.groupBy("cell")
        .agg(ent_c)
        .select("cell", cent_c)
        .groupBy()
        .agg(cc_c)
        .select(ids_c, vals_c)
    )


def _lloyd_two_rounds(
    cand: DataFrame, cents: list[tuple[int, list[float]]], dims: int
) -> list[tuple[int, list[float]]]:
    """TWO Lloyd rounds in ONE materialization (r6 verdict #3 — the
    dedup.py fixpoint trick applied to training): round 1 assigns against
    the driver-state centroid literals and its (cell, dim) means collapse
    IN-PLAN to a 1-row broadcast (_centroid_row — bit-identical to the
    collected form); round 2 assigns against those array columns via the
    sanctioned 1-row-anchor BNLJ and only ITS partials cross the driver.
    Halves both the driver round trips and the per-round plan
    analysis/codegen cost (fresh centroid literals defeat the codegen
    cache — the dominant local cost of the similarity family per the r6
    audit); executor work per round is unchanged."""
    c1 = _centroid_row(_lloyd_partials(_assign_cells(cand, cents)))
    a2 = cand.crossJoin(F.broadcast(c1)).select(
        "vec_id",
        "emb",
        F.array_min(
            _cell_entries_from(F.col("ids"), F.col("vals"), F.col("emb"))
        )["cell"].alias("cell"),
    )
    rows = _lloyd_partials(a2).collect()
    acc: dict[int, dict[int, float]] = {}
    for r in rows:
        acc.setdefault(r["cell"], {})[r["dim"]] = float(r["s"]) / r["n"]
    return sorted(
        (cell, [byd[i] for i in range(dims)]) for cell, byd in acc.items()
    )


def _pq_entries(books, sub, argmin):
    """Per-row M-entry array of (m, cell, subvector) structs — each argmin
    evaluated once per vector inside the array build (see the PQ training
    comment: a projection sharing a select with its generator would
    re-evaluate the argmin per GENERATED row; the explode's input array is
    evaluated once). ``argmin(m)`` supplies the per-subspace assignment
    expression — literal codebooks for round 1, broadcast array columns
    for the folded round 2."""
    return F.array(*[
        F.named_struct(
            F.lit("m"), F.lit(m),
            F.lit("cell"), argmin(m),
            F.lit("svec"), sub(m),
        )
        for m in range(len(books))
    ])


def _pq_partials(cand, books, sub, entries=None):
    """(m, cell, dim) → (n, Σval) partials for one batched-PQ Lloyd update:
    ONE pass over the cached candidates (M-entry struct array exploded to
    M rows, then the subvector to dims — an M-branch union re-scanned the
    cache M times)."""
    if entries is None:
        def _build():
            return _pq_entries(
                books, sub, lambda m: _cell_argmin_expr(books[m], sub(m))
            )

        # content-keyed template cache (VERDICT r18 #4) — only when sub is
        # the module's canonical subspace slicer, so the key fully
        # determines the tree
        entries = (
            _keyed_cols("pq_ent1", repr(books), _build)
            if sub is _pq_sub else _build()
        )
    return (
        cand.select(F.explode(entries).alias("e"))
        .select(
            F.col("e.m").alias("m"),
            F.col("e.cell").alias("cell"),
            F.posexplode("e.svec").alias("dim", "val"),
        )
        .groupBy("m", "cell", "dim")
        .agg(F.count("*").alias("n"), F.sum(F.col("val").cast(DEC)).alias("s"))
    )


def _pq_books_from_rows(rows):
    """Driver finish for one batched-PQ Lloyd update (float(decimal)/n —
    see _lloyd_round's correctly-rounded-divide note)."""
    acc: dict[int, dict[int, dict[int, float]]] = {}
    for r in rows:
        acc.setdefault(r["m"], {}).setdefault(r["cell"], {})[r["dim"]] = (
            float(r["s"]) / r["n"]
        )
    return [
        sorted(
            (cell, [byd[i] for i in range(PQ_SUBDIM)])
            for cell, byd in acc[m].items()
        )
        for m in sorted(acc)
    ]


def _pq_two_rounds(cand, books, sub):
    """TWO batched-PQ Lloyd rounds in ONE materialization — the
    _lloyd_two_rounds fold with an extra subspace level: round-1
    (m, cell, dim) partials collapse in-plan to a 1-row broadcast of
    per-subspace (ids, vals) nested arrays (CAST(DECIMAL AS DOUBLE)/n —
    bit-identical to the collected form, see _centroid_row), round-2
    assignment reads them through element_at(·, m+1), and only round-2
    partials cross the driver. Halves the KMEANS_ITERS driver round trips
    and per-round plan recompiles that dominate PQ's local cost (r6
    verdict #3)."""
    # the fold's agg/transform columns are CONSTANT templates (column
    # names only) rebuilt per training call — ~0.3 s of Py4J chatter at
    # the driver (measured r19); build them once per process
    ent_c, cent_c, cc_c, mids_c, mvals_c, bb_c, bids_c, bvals_c = _const_cols(
        "pq_c1_fold",
        lambda: (
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("dim"),
                        (F.col("s").cast("double") / F.col("n")).alias("mu"),
                    )
                )
            ).alias("ent"),
            F.transform("ent", lambda e: e["mu"]).alias("cent"),
            F.array_sort(F.collect_list(F.struct("cell", "cent"))).alias("cc"),
            F.transform("cc", lambda x: x["cell"]).alias("mids"),
            F.transform("cc", lambda x: x["cent"]).alias("mvals"),
            F.array_sort(F.collect_list(F.struct("m", "mids", "mvals"))).alias("bb"),
            F.transform("bb", lambda x: x["mids"]).alias("bids"),
            F.transform("bb", lambda x: x["mvals"]).alias("bvals"),
        ),
    )
    c1 = (
        _pq_partials(cand, books, sub)
        .groupBy("m", "cell")
        .agg(ent_c)
        .select("m", "cell", cent_c)
        .groupBy("m")
        .agg(cc_c)
        .select("m", mids_c, mvals_c)
        .groupBy()
        .agg(bb_c)
        .select(bids_c, bvals_c)
    )
    def _build_ent2():
        return _pq_entries(
            books,
            sub,
            lambda m: F.array_min(
                _cell_entries_from(
                    F.element_at(F.col("bids"), m + 1),
                    F.element_at(F.col("bvals"), m + 1),
                    sub(m),
                )
            )["cell"],
        )

    # round-2 assignment reads the broadcast (bids, bvals) COLUMNS — the
    # tree depends only on the subspace count, so it caches on that alone
    ent2 = (
        _keyed_cols("pq_ent2", str(len(books)), _build_ent2)
        if sub is _pq_sub else _build_ent2()
    )
    rows = _pq_partials(
        cand.crossJoin(F.broadcast(c1)), books, sub, entries=ent2
    ).collect()
    return _pq_books_from_rows(rows)


def ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with a REAL learned coarse quantizer: seeded deterministic
    k-means (Lloyd), then one-cell probe + exact re-rank.

    (1) init: the K lowest-id candidate vectors are the starting centroids
        (deterministic and SQL-expressible — no RNG to reconcile across
        engines); (2) KMEANS_ITERS Lloyd rounds, each an O(N·K·dims)
        map-side assignment (the K centroids fold into a literal argmin
        projection — zero exchange between scan and assignment, see
        _cell_argmin_expr; only K centroid rows cross the driver per
        round) + a (cell, dim)-keyed mean; (3) queries route to their
        nearest learned centroid; (4) exact decimal-cosine top-3 within
        that single cell.

    At 100 TB the learned cells become the table's physical partitioning,
    step 4 reads one partition, and the Lloyd rounds run on a sample — the
    shape is identical. Every arithmetic step (d², means, cosines) runs
    through exact DECIMAL accumulation, so cell assignment and ranking are
    bit-reproducible and the DuckDB oracle replays the whole training loop.
    Replaces the label-cell stand-in (ann_ivf_label) as the canonical IVF;
    recall vs brute force for both is measured in test_extensions."""
    vecs, cand, assigned, cents = _train_ivf(spark, sf_dir)

    q = vecs.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "emb")
    qbest = _assign_cells(q, cents).select(
        F.col("vec_id").alias("query_id"), F.col("cell").alias("best_cell")
    )

    qv, cv = vecs.alias("qv"), vecs.alias("cv")
    cos = _dot_dec(F.col("qv.emb"), F.col("cv.emb")) / (F.col("qv.nrm") * F.col("cv.nrm"))
    wk = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        qbest.join(assigned.alias("m"), qbest.best_cell == F.col("m.cell"))
        .select("query_id", "best_cell", F.col("m.vec_id").alias("neighbor_id"))
        .join(qv, F.col("query_id") == F.col("qv.vec_id"))
        .join(cv, F.col("neighbor_id") == F.col("cv.vec_id"))
        .select("query_id", "best_cell", "neighbor_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= 3)
        .select("query_id", "best_cell", "rank", "neighbor_id", _fr(F.col("cos"), 6).alias("cosine"))
        .orderBy("query_id", "rank")
    )


def _train_ivf(spark: SparkSession, sf_dir: str):
    """Shared IVF trainer: deterministic lowest-id init + KMEANS_ITERS
    Lloyd rounds over the persisted candidates; returns (vecs, cand,
    assigned, cents) for the probe stage. Factored out so the single-probe
    and multi-probe variants train IDENTICALLY (same centroids → the
    oracle replay applies verbatim to both)."""
    vecs = _emb_double(spark, sf_dir).select(
        "vec_id", "emb", F.sqrt(_dot_dec(F.col("emb"), F.col("emb"))).alias("nrm")
    )
    # repartition before persist: the small-SF parquet is one split, and the
    # argmin projection's K×dims decimal folds are the CPU-bound stage —
    # spread them (a no-op at 100 TB where the scan is already wide)
    cand = track_persisted(
        vecs.filter(F.col("vec_id") >= N_QUERIES)
        .select("vec_id", "emb")
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .persist()
    )

    cents = train_ivf_centroids(cand)
    assigned = _assign_cells(cand, cents).select("vec_id", "cell")
    return vecs, cand, assigned, cents


IVF_K_MIN = K_CELLS   # cell-count floor = the pinned test-SF constant
IVF_CELL_COEF = 1.0   # K = max(IVF_K_MIN, round(coef·√N))


def ivf_cell_count(n: int) -> int:
    """K ∝ √N cell sizing — the FAISS nlist rule (r16, VERDICT r15 task
    #2). With K fixed, cells grow linearly with the corpus and the
    per-probe gather/re-rank erodes the stored-index win (measured in
    tools/index_economics.py --multiples: 3.2× at 4× corpus → 1.25× at
    16× at the fixed test-SF K); K ∝ √N keeps |cell| ≈ √N/coef so probe
    cost AND routing cost grow as √N, the balance point. The registry
    slots pin ``k_cells=K_CELLS`` instead so their DuckDB Lloyd replays
    are untouched."""
    import math

    return max(IVF_K_MIN, int(round(IVF_CELL_COEF * math.sqrt(max(n, 0)))))


def train_ivf_centroids(
    cand: DataFrame, k_cells: int = K_CELLS
) -> list[tuple[int, list[float]]]:
    """Frame-level deterministic Lloyd trainer over any (vec_id, emb)
    candidate frame: ``k_cells`` lowest-vec_id init (default: the pinned
    registry constant), KMEANS_ITERS rounds advancing in pairs (two per
    materialization — r6 verdict #3). Factored out of ``_train_ivf`` so
    the index lifecycle can train a quantizer on ANY sample (the FAISS
    train() contract) — e.g. the base corpus before incremental
    ``append_ivf_vectors`` batches."""
    init = sorted(cand.orderBy("vec_id").limit(k_cells).collect(),
                  key=lambda r: r["vec_id"])
    cents = [(cell, list(r["emb"])) for cell, r in enumerate(init)]
    dims = len(cents[0][1])
    for _ in range(KMEANS_ITERS // 2):
        cents = _lloyd_two_rounds(cand, cents, dims)
    if KMEANS_ITERS % 2:
        cents = _lloyd_round(cand, cents, dims)
    return cents


NPROBE = 2  # cells probed by the multi-probe variant


def ann_ivf_kmeans_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with multi-cell probing — the recall knob every production IVF
    index exposes (FAISS nprobe): route each query to its NPROBE nearest
    learned centroids and exact-re-rank the UNION of those cells. Probing
    one cell recall-cliffs whenever a query sits near a Voronoi boundary
    (its true neighbors live in the second-closest cell); nprobe=2 reads
    2/K of the table instead of 1/K — still a partition-pruned fraction at
    100 TB — and strictly dominates single-probe recall (pytest pins
    recall(nprobe=2) ≥ recall(nprobe=1) vs the brute-force ranking).

    Training is shared with ann_ivf_kmeans (_train_ivf — identical
    centroids), so the DuckDB oracle replays the same Lloyd loop and only
    the probe CTE widens from rk = 1 to rk <= NPROBE. The NPROBE cells per
    query come from ONE map-side expression: array_sort over the same
    (d², cell) literal structs the argmin uses, sliced to NPROBE —
    lexicographic sort = d² asc then cell asc, the argmin's tie-break."""
    vecs, cand, assigned, cents = _train_ivf(spark, sf_dir)

    q = vecs.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "emb")
    qcells = q.select(
        F.col("vec_id").alias("query_id"),
        F.explode(
            F.transform(
                F.slice(F.array_sort(_cell_entries_expr(cents)), 1, NPROBE),
                lambda e: e["cell"],
            )
        ).alias("cell"),
    )

    qv, cv = vecs.alias("qv"), vecs.alias("cv")
    cos = _dot_dec(F.col("qv.emb"), F.col("cv.emb")) / (F.col("qv.nrm") * F.col("cv.nrm"))
    wk = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        qcells.join(assigned.alias("m"), qcells.cell == F.col("m.cell"))
        .select("query_id", F.col("m.vec_id").alias("neighbor_id"))
        .join(qv, F.col("query_id") == F.col("qv.vec_id"))
        .join(cv, F.col("neighbor_id") == F.col("cv.vec_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= 3)
        .select("query_id", "rank", "neighbor_id", _fr(F.col("cos"), 6).alias("cosine"))
        .orderBy("query_id", "rank")
    )


def build_ivf_index(
    spark: SparkSession, sf_dir: str, path: str, k_cells: int | None = None
) -> None:
    """Build the IVF index ONCE (the ingest-side cost every production
    vector store amortizes — FAISS train()+add()): run the shared
    deterministic Lloyd trainer and persist BOTH halves of the index —
    ``centroids/`` (K rows: cell, emb — the routing table, KB-scale) and
    ``assignments/`` (vec_id → cell, written partitionBy(cell) so each
    learned cell IS a directory and a probe reads only its own files —
    the physical-partitioning promise in ann_ivf_kmeans's docstring made
    literal). Doubles round-trip parquet exactly, so a query routed via
    the stored centroids lands in the same cell as the in-query trainer.

    Sizing at scale (r16, VERDICT r15 task #2): ``k_cells=None`` — the
    deployment default — sizes K = max(IVF_K_MIN, round(coef·√N)) from
    the candidate count (the FAISS nlist rule, ``ivf_cell_count``), so
    cells stay √N-bounded instead of growing linearly with the corpus;
    measured at 16× corpus growth the fixed-K win had eroded to 1.25×
    and √N-sizing restores it (tools/index_economics.py --multiples,
    NOTES r16). The registry slot pins ``k_cells=K_CELLS`` via
    ``ensure_ivf_index`` so its DuckDB Lloyd replay is untouched."""
    vecs = _emb_double(spark, sf_dir).select("vec_id", "emb")
    cand = track_persisted(
        vecs.filter(F.col("vec_id") >= N_QUERIES)
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .persist()
    )
    if k_cells is None:
        k_cells = ivf_cell_count(cand.count())
    cents = train_ivf_centroids(cand, k_cells)
    assigned = _assign_cells(cand, cents).select("vec_id", "cell")
    _write_ivf_centroids(spark, cents, path)
    _write_ivf_assignments(assigned, path)


def _write_ivf_centroids(spark, cents, path: str) -> None:
    spark.createDataFrame(
        [(c, v) for c, v in cents], "cell int, emb array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def _write_ivf_assignments(assigned: DataFrame, path: str, mode="overwrite") -> None:
    (
        assigned.select("vec_id", "cell")
        .repartition("cell")
        .write.mode(mode)
        .partitionBy("cell")
        .parquet(f"{path}/assignments")
    )


def read_ivf_centroids(spark: SparkSession, path: str) -> list[tuple[int, list[float]]]:
    """The stored routing table as the bounded driver-side centroid list
    every assignment/probe expression folds from — K rows, KB-scale."""
    return sorted(
        (int(r["cell"]), list(r["emb"]))
        for r in spark.read.parquet(f"{path}/centroids").collect()
    )


IVF_INDEX_ALGO = 1  # bump on any training/layout/semantics change


def ensure_ivf_index(
    spark: SparkSession, sf_dir: str, k_cells: int | None = K_CELLS
) -> str:
    """Build the IVF index for ``sf_dir``'s embeddings IF its stored
    generation is absent or stale (marker mismatch: algo version, config
    constants, or source file signature changed), else reuse it
    untouched. Returns the live generation path. Shared by BOTH prebuilt
    registry variants, so one sweep trains Lloyd once instead of twice
    (r14 VERDICT task #6) — and the skip path removes the ADVICE r14 #2
    hazard where the second build's overwrite deleted parquet files
    under the first call's still-lazy plan. A rebuild writes a NEW
    generation and atomically promotes the slot's manifest pointer
    (session.ensure_index), never disturbing readers of the old one.

    ``k_cells`` defaults to the PINNED registry constant so the DuckDB
    Lloyd replay is untouched; ``k_cells=None`` selects √N sizing
    (``ivf_cell_count`` — the deployment geometry, used by
    tools/index_economics.py) and lives in its OWN slot: sharing the
    registry slot would make the two configurations endlessly rebuild
    over each other's marker."""
    from weather_database_system_spark.session import (
        ensure_index,
        scratch_path,
        source_signature,
    )

    meta = {
        "kind": "ivf_index",
        "algo": IVF_INDEX_ALGO,
        "k_cells": "sqrt" if k_cells is None else k_cells,
        "coef": IVF_CELL_COEF if k_cells is None else None,
        "iters": KMEANS_ITERS,
        "n_queries": N_QUERIES,
        "source": source_signature(sf_dir, "embeddings"),
    }
    if k_cells == K_CELLS:
        meta.pop("coef")  # keep the pinned registry meta EXACTLY as r15's
    slot = "ivf_index" if k_cells == K_CELLS else (
        f"ivf_index_k{k_cells}" if k_cells is not None else "ivf_index_sqrt"
    )
    return ensure_index(
        scratch_path(slot, sf_dir),
        meta,
        lambda gen: build_ivf_index(spark, sf_dir, gen, k_cells=k_cells),
    )


def append_ivf_vectors(spark: SparkSession, vecs: DataFrame, path: str) -> None:
    """Incremental add to a STORED IVF index (the FAISS add() contract,
    r14 VERDICT task #1 — giving the vector index the trigram index's
    lifecycle): assign the NEW (vec_id, emb array<double>) batch to the
    stored centroids via the SAME literal argmin fold the query path
    routes with — no retraining, no read of existing assignments — and
    blind-append the (vec_id, cell) rows into their cell directories.
    Because assignment is a pure deterministic function of (emb, stored
    centroids), append ≡ bulk-add of the union against the same
    quantizer, exactly (pytest-pinned, incl. search results); a retried
    at-least-once batch duplicates rows, which the query path's
    candidate dedup makes harmless (results unchanged — bytes only,
    until compaction). Appending chains an append event onto the
    generation's stamp (session.append_index_marker — r16 unification
    of the old IVF marker-delete with the other families: ensure_* still
    reads the index as stale, so ``ensure_ivf_index`` would rebuild the
    slot, but manifest-loss recovery resolves to the index WITH its
    appends) and runs under the slot writer lease (append vs compaction
    serializes or fails loudly, never silently drops rows). At 100 TB
    this is the only ingest shape that works: one argmin projection over
    the batch + K directory appends — index bytes, never a corpus
    retrain. Ingest loops pass the SLOT path: every call re-resolves the
    live generation (session.slot_live), so appends keep landing in the
    current generation across compaction promotes."""
    from weather_database_system_spark.session import (
        append_index_marker,
        slot_live,
        slot_writer_lease,
    )

    with slot_writer_lease(path, "append_ivf"):
        live = slot_live(path)
        cents = read_ivf_centroids(spark, live)
        _write_ivf_assignments(
            _assign_cells(vecs.select("vec_id", "emb"), cents),
            live,
            mode="append",
        )
        append_index_marker(live)


def compact_ivf_assignments(spark: SparkSession, path: str) -> str:
    """Maintenance pass restoring the one-file-generation-per-cell layout
    after ``append_ivf_vectors`` batches: read every appended file
    generation, rewrite once repartitioned by cell, and swap. Row-
    preserving by construction — search results unchanged (pytest-pinned)
    — only file counts shrink, and only assignment bytes shuffle (the
    KB-scale centroids are carried over verbatim). Manifest-managed
    slots get an atomic pointer promote (in-flight readers keep their
    generation); explicit flat directories swap in place
    (session.compact_into_generation). Accepts a slot path (re-resolved
    to the live generation). Returns the live index path."""
    import shutil

    from weather_database_system_spark.session import (
        compact_into_generation,
        slot_live,
        slot_writer_lease,
    )

    with slot_writer_lease(path, "compact_ivf"):
        live = slot_live(path)

        def rewrite(dst: str) -> None:
            shutil.copytree(f"{live}/centroids", f"{dst}/centroids")
            (
                spark.read.parquet(f"{live}/assignments")
                .repartition("cell")
                .write.mode("overwrite")
                .partitionBy("cell")
                .parquet(f"{dst}/assignments")
            )

        return compact_into_generation(live, rewrite)


def ann_ivf_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deployment form of IVF search (r14, completing the prebuilt-
    index pair with trigram_search_prebuilt): the quantizer is TRAINED
    AND STORED once by ``build_ivf_index``; the QUERY path reads the K
    stored centroid rows (collected to the same literal argmin fold the
    trainer uses — KB-scale driver state), routes each query to its
    cell, and joins the probed cells against the cell-partitioned
    assignments directory, so at 100 TB a probe reads 1/K of the index
    BY DIRECTORY (static layout, not statistics) before gathering only
    candidate vectors for the exact decimal re-rank. No Lloyd iteration,
    no full-corpus assignment pass, appears anywhere in the query plan
    (plan-pinned: the only embeddings scans are the query rows and the
    two gather sides; assignments come from the index files).

    Output is IDENTICAL to ann_ivf_kmeans — same training determinism,
    same single-cell probe, same exact re-rank — so the same DuckDB
    oracle (full Lloyd replay in SQL) proves the stored index round-trip
    loses nothing. The build runs at most once per (source, config):
    ``ensure_ivf_index``'s marker lets this entry, the nprobe twin, any
    repeated sweep, and a later cold session share ONE stored build
    (r14 VERDICT task #6; ADVICE r14 #2). Reference parity: extension
    surface; cf. FAISS IVF / Jégou et al. 2011 for the public
    algorithm."""
    path = ensure_ivf_index(spark, sf_dir)
    return ann_ivf_query_prebuilt(spark, sf_dir, path, nprobe=1)


def _route_query_cells(
    spark: SparkSession,
    q: DataFrame,
    cents: list[tuple[int, list[float]]],
    nprobe: int = 1,
) -> DataFrame:
    """Route (vec_id, emb) query rows to their ``nprobe`` nearest stored
    centroids → (query_id, cell) rows. Factored out of
    ann_ivf_query_prebuilt (r17) so the IVF+PQ composition routes with
    the IDENTICAL expressions: single-probe is the argmin fold
    (_assign_cells — literal centroids or the 1-row broadcast anchor
    past IVF_LITERAL_ROUTER_MAX), multi-probe the array_sort-and-slice
    over the same (d², cell) entries — lexicographic sort = d² asc then
    cell asc, the argmin's tie-break."""
    if nprobe == 1:
        return _assign_cells(q, cents).select(
            F.col("vec_id").alias("query_id"), F.col("cell")
        )
    if len(cents) <= IVF_LITERAL_ROUTER_MAX:
        return q.select(
            F.col("vec_id").alias("query_id"),
            F.explode(
                F.transform(
                    F.slice(F.array_sort(_cell_entries_expr(cents)), 1, nprobe),
                    lambda e: e["cell"],
                )
            ).alias("cell"),
        )
    # large-K transport: same entries fold off a 1-row broadcast
    return q.crossJoin(
        F.broadcast(_centroid_row_of(spark, cents))
    ).select(
        F.col("vec_id").alias("query_id"),
        F.explode(
            F.transform(
                F.slice(
                    F.array_sort(
                        _cell_entries_from(
                            F.col("ids"), F.col("vals"), F.col("emb")
                        )
                    ),
                    1,
                    nprobe,
                ),
                lambda e: e["cell"],
            )
        ).alias("cell"),
    )


def ann_ivf_query_prebuilt(
    spark: SparkSession,
    sf_dir: str,
    path: str | None = None,
    nprobe: int = 1,
    queries_df: DataFrame | None = None,
) -> DataFrame:
    """QUERY-ONLY half of prebuilt IVF search: routes via the stored
    centroids, probes the stored cell-partitioned assignments — never
    trains, never builds, so a fresh session holding nothing but the
    index files answers it (pytest-pinned cold read). ``nprobe=1``
    emits the single-probe shape (with best_cell); ``nprobe>1`` the
    multi-probe shape. Probed candidates are deduped on (query_id,
    neighbor_id) BEFORE the gather: stored assignments may legitimately
    carry duplicate rows after at-least-once streaming appends (a
    retried micro-batch blind-appends its batch twice), and a duplicate
    candidate would otherwise occupy two of the top-3 ranks — the IVF
    instance of the trigram gate fix (ADVICE r14 #1). The dedup runs on
    probe-sized rows (nprobe/K of the index), never the corpus.

    ``queries_df`` is the CALLER's query set (r16, VERDICT r15 task
    #1): (query_id long, emb array<double>) rows that need NOT exist in
    the indexed corpus — routing assigns them to stored centroids and
    norms come from the provided vectors, so an arbitrary embedding
    finds its nearest indexed neighbors. Default: the registry's pinned
    first-N_QUERIES corpus rows, keeping the DuckDB oracle hermetic."""
    from weather_database_system_spark.session import scratch_path, slot_live

    path = slot_live(
        path if path is not None else scratch_path("ivf_index", sf_dir)
    )
    cents = read_ivf_centroids(spark, path)
    assigned = spark.read.parquet(f"{path}/assignments")

    vecs = _emb_double(spark, sf_dir).select("vec_id", "emb")
    if queries_df is None:
        q = vecs.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "emb")
    else:
        q = queries_df.select(F.col("query_id").alias("vec_id"), "emb")
    single = nprobe == 1
    qcells = _route_query_cells(spark, q, cents, nprobe)

    out_cols = (
        ["query_id", "best_cell", "rank", "neighbor_id"]
        if single
        else ["query_id", "rank", "neighbor_id"]
    )
    cand_cols = ["query_id", "neighbor_id"] + (["best_cell"] if single else [])
    # query norms come from the QUERY vectors themselves (a KB-scale
    # frame — broadcast), so out-of-corpus queries work; candidate norms
    # are computed AFTER the gather, on probe-sized rows only — a
    # pre-join nrm projection priced a corpus-wide decimal fold into
    # every probe (measured ~2 s of the adaptive-K probe at 16× corpus,
    # r16; same doubles either way: sqrt(dec) per side, then multiply)
    qv = q.alias("qv")
    cv = vecs.alias("cv")
    cos = _dot_dec(F.col("qv.emb"), F.col("cv.emb")) / (
        F.sqrt(_dot_dec(F.col("qv.emb"), F.col("qv.emb")))
        * F.sqrt(_dot_dec(F.col("cv.emb"), F.col("cv.emb")))
    )
    wk = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        F.broadcast(qcells)
        .join(assigned.alias("m"), "cell")
        .select(
            "query_id",
            F.col("m.vec_id").alias("neighbor_id"),
            F.col("cell").alias("best_cell"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(*cand_cols)
        .join(qv, F.col("query_id") == F.col("qv.vec_id"))
        .join(cv, F.col("neighbor_id") == F.col("cv.vec_id"))
        .select(*cand_cols, cos.alias("cos"))
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= 3)
        .select(*out_cols, _fr(F.col("cos"), 6).alias("cosine"))
        .orderBy("query_id", "rank")
    )


def ann_ivf_prebuilt_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-cell probing against the STORED IVF index — the deployment
    form with the recall knob every production IVF exposes (FAISS
    nprobe), completing the prebuilt pair exactly as
    ann_ivf_kmeans_nprobe completes the in-query pair. Routing: each
    query's NPROBE nearest stored centroids from the same one-expression
    array_sort-and-slice the in-query variant uses (lexicographic (d²,
    cell) structs — the argmin's tie-break); the probed (query, cell)
    pairs broadcast against the cell-partitioned assignments directory,
    so a probe reads NPROBE/K of the index by directory and dynamic
    partition pruning skips the rest. Output identical to
    ann_ivf_kmeans_nprobe (same deterministic training, stored and
    read back loss-free), so the same widened-probe-CTE oracle replays
    it; recall(nprobe=2) ≥ recall(nprobe=1) is pinned for the in-query
    twin and transfers verbatim (identical outputs). Shares the stored
    build with ann_ivf_prebuilt via ``ensure_ivf_index`` — one Lloyd
    train per sweep instead of two, and no overwrite-under-lazy-plan
    hazard (r14 VERDICT task #6; ADVICE r14 #2)."""
    path = ensure_ivf_index(spark, sf_dir)
    return ann_ivf_query_prebuilt(spark, sf_dir, path, nprobe=NPROBE)


IVF_APPEND_MOD = 5  # vec_id % 5 == 4 arrives as the incremental batch


def ann_ivf_prebuilt_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked exercise of the IVF index LIFECYCLE (r15, VERDICT
    r14 task #1): the index is populated in two generations — a bulk
    build of the base corpus (vec_id % 5 != 4) followed by an
    ``append_ivf_vectors`` ingest batch of the rest — and the query
    runs over the appended index. The quantizer is trained once on the
    full candidate sample and STORED; the append assigns its batch to
    those stored centroids via the same argmin fold the bulk build uses,
    so append ≡ rebuild EXACTLY (assignment is a pure deterministic
    function of (emb, stored centroids), and parquet round-trips doubles
    exactly). Training on the full sample is the FAISS train-then-add
    flow with the training sample = the whole corpus at test SF — which
    is precisely what lets the EXISTING full-Lloyd DuckDB oracle replay
    this end-to-end: a hash match proves the two-generation index
    answers bit-identically to the one-shot build (and hence to
    ann_ivf_kmeans / ann_ivf_prebuilt). The base-trained variant — new
    vectors arriving AFTER a quantizer trained without them, where
    append ≡ bulk-add-of-union at the same centroids but not ≡ retrain
    — is pytest-pinned (oracle-free by nature: retraining is a
    different quantizer, not a wrong one). At-least-once ingest (a
    retried batch appending twice) is also pytest-pinned harmless via
    the query path's candidate dedup.

    Same build-once economics as the other prebuilt entries: the
    two-generation state is stamped with its own marker AFTER the append
    (``append_ivf_vectors`` itself drops any marker — an appended index
    is not a pure build of its source — so the stamp here asserts the
    FULL recorded lifecycle, not just the bulk build), and repeated
    calls reuse it instead of retraining Lloyd per sweep."""
    from weather_database_system_spark.session import (
        ensure_index,
        scratch_path,
        source_signature,
    )

    meta = {
        "kind": "ivf_index_appended",
        "algo": IVF_INDEX_ALGO,
        "append_mod": IVF_APPEND_MOD,
        "k_cells": K_CELLS,
        "iters": KMEANS_ITERS,
        "n_queries": N_QUERIES,
        "source": source_signature(sf_dir, "embeddings"),
    }

    def _build(gen: str) -> None:
        _, cand, assigned, cents = _train_ivf(spark, sf_dir)
        _write_ivf_centroids(spark, cents, gen)
        is_batch = (
            F.pmod(F.col("vec_id"), F.lit(IVF_APPEND_MOD)) == IVF_APPEND_MOD - 1
        )
        _write_ivf_assignments(assigned.filter(~is_batch), gen)
        append_ivf_vectors(
            spark, cand.filter(is_batch).select("vec_id", "emb"), gen
        )

    path = ensure_index(scratch_path("ivf_index_appended", sf_dir), meta, _build)
    return ann_ivf_query_prebuilt(spark, sf_dir, path, nprobe=1)


def ann_ivf_sqrt_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The √N-SIZED stored IVF configuration under the FULL value-exact
    oracle (r17, VERDICT r16 task #2 — previously the deployment
    geometry was only tool-measured while every registry entry pinned
    k_cells=K_CELLS): builds/reuses the ``ivf_index_sqrt`` slot
    (``ensure_ivf_index(k_cells=None)`` — K = max(IVF_K_MIN,
    round(coef·√N)), the FAISS nlist rule) and runs the standard
    single-probe stored-index search against it. The DuckDB oracle
    replays the ENTIRE √N-sized Lloyd training with K computed
    DYNAMICALLY in SQL (greatest(K_MIN, floor(coef·√n)+0.5) over the
    candidate count — exact at every SF, since √integer is never an
    exact half, floor(x+0.5) equals Python's round here), so the
    deployment-recommended configuration gets the same bit-exact
    value/hash gate as the pinned-K entries — stronger than a
    claims-only check. One engine-decided claim rides along:
    ``sized_ok`` pins that the STORED centroid count actually equals
    ivf_cell_count(N) for the corpus it indexes (the stored bytes match
    the sizing rule, not merely the query math). Since r18 (ADVICE r17
    #3) the oracle COMPUTES the same claim from its own replayed
    training — count of surviving final centroids vs the SQL sizing
    rule — instead of pinning TRUE: a data distribution that empties a
    Lloyd cell reads as sized_ok=0 on BOTH sides (a surfaced sizing
    signal, not an opaque hash mismatch), while a mis-sized or stale
    STORE still fails the gate against the clean replay. Recall/cost
    trade of
    this geometry vs pinned-K is measured in tools/ivf_recall.py; the
    warm economics in tools/index_economics.py --multiples (NOTES r16).
    Reference parity: extension surface; cf. FAISS nlist guidance."""
    path = ensure_ivf_index(spark, sf_dir, k_cells=None)
    cents = read_ivf_centroids(spark, path)
    # the sizing audit reads INDEX bytes, not the corpus (review r17 —
    # a per-call corpus count() taxed every replay of a query advertised
    # as index-priced): the stored assignment table's own vector
    # population must size K per the rule, which also makes the claim a
    # stored-state consistency check rather than a rebuild of build-time
    # input. A parquet count() is footer-metadata-only (no column scan —
    # ADVICE r17 #3 flagged the previous distinct().count()), exact here
    # because this slot is ensure-built once and never appended (the
    # append lifecycle runs in its own ivf_index_appended slot), so rows
    # == distinct vec_ids by construction.
    n_cand = spark.read.parquet(f"{path}/assignments").count()
    sized_ok = int(len(cents) == ivf_cell_count(n_cand))
    return (
        ann_ivf_query_prebuilt(spark, sf_dir, path, nprobe=1)
        .select(
            "query_id",
            "best_cell",
            "rank",
            "neighbor_id",
            "cosine",
            F.lit(sized_ok).cast("int").alias("sized_ok"),
        )
        .orderBy("query_id", "rank")
    )


def ann_ivf_prebuilt_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT read of the stored IVF index — the second family to
    surface the grace-generation time travel as a registry query (r17,
    VERDICT r16 task #5; bm25_prebuilt_snapshot is the template and the
    proof ``session.snapshot_generation`` generalizes). IVF is where a
    snapshot diverging from live matters most: appends mutate cell
    directories, so an in-flight training job reading the retained
    pre-compaction generation must see the index AS OF its promote, not
    the compactor's rewrite. The two-generation state is created once
    through the REAL maintenance path (ensure-build, then one gated
    row-preserving ``compact_ivf_assignments`` whose promote retains the
    pre-compaction generation); because compaction preserves rows and
    centroids verbatim, the snapshot's search answers equal the live
    ones — pinned by the engine-decided ``snapshot_equals_live`` claim
    (anti-joined both ways over the full output), so the standard
    full-Lloyd DuckDB oracle with the claim pinned TRUE proves the
    retained generation is a faithful, readable snapshot. Snapshot
    immutability under a post-snapshot append that diverges live is
    pytest-pinned for the family lifecycle."""
    from weather_database_system_spark.session import (
        ensure_snapshot_state,
        scratch_path,
        slot_live,
        snapshot_equals_live_claim,
    )

    ensure_ivf_index(spark, sf_dir)
    slot = scratch_path("ivf_index", sf_dir)
    snap = ensure_snapshot_state(
        slot, lambda s: compact_ivf_assignments(spark, s)
    )
    snap_df = ann_ivf_query_prebuilt(spark, sf_dir, snap, nprobe=1)
    live_df = ann_ivf_query_prebuilt(spark, sf_dir, slot_live(slot), nprobe=1)
    # cosine is safe in the claim key: the dot products accumulate in
    # DECIMAL (order-independent), so identical generation content gives
    # bit-identical cosines regardless of file layout — unlike the
    # float-summed adc_d2 the PQ-family snapshots must exclude
    on = ["query_id", "best_cell", "rank", "neighbor_id", "cosine"]
    claims = snapshot_equals_live_claim(snap_df, live_df, on)
    return (
        snap_df.crossJoin(F.broadcast(claims))
        .select(*on, "snapshot_equals_live")
        .orderBy("query_id", "rank")
    )


PQ_M = 4        # subspaces (EMB_DIMS / PQ_SUBDIM)
PQ_SUBDIM = 16  # dims per subspace
PQ_K = 16       # codewords per subspace codebook
PQ_TOPK = 5     # ADC neighbors returned per query


def ann_product_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization ANN (Jégou, Douze, Schmid 2011 — the FAISS
    IndexPQ shape): split each vector into PQ_M subspaces, learn a PQ_K-word
    codebook per subspace with the SAME deterministic decimal Lloyd used by
    ann_ivf_kmeans (lowest-id init, exact-d² argmin), encode every candidate
    as PQ_M one-byte codes, and answer queries by Asymmetric Distance
    Computation: per query, a PQ_M×PQ_K lookup table of exact subspace
    distances; a candidate's approximate d² is the sum of its M table
    entries. Completes the ANN family (brute force / IVF / LSH / PQ).

    Why this survives 100 TB: the stored index is M bytes per vector (16×
    compression of a 64-float vector), codebooks and query tables are KB-
    scale broadcasts, and scoring is a map-side broadcast join on (m, code)
    + a (query, vec) sum — candidates never shuffle their raw floats. The
    Lloyd training runs once (on a sample, in production) and is the same
    driver-state shape as the IVF quantizer: all M codebooks advance
    together, one job per global round (map-side argmin projections over
    the persisted candidates + one (m, cell, dim)-keyed agg — zero
    exchange between scan and assignment), M×K mean vectors as the only
    driver state, and encoding is ONE projection emitting all M codes.

    The per-row ADC output is not SQL-replayable (M coupled Lloyd loops +
    float table sums), so the REGISTRY surface is
    ``ann_product_quantization_checked`` — replayable per-query spine +
    pinned quantization-error/gain claims; pytest grounds the ADC output
    here against a full numpy replay of training + encoding + table
    scoring, and measures recall vs the exact brute-force ranking."""
    vecs = _emb_double(spark, sf_dir)
    # repartition before persist: spread the per-subspace argmin folds (the
    # CPU-bound stage) across cores — the one-split small-SF scan otherwise
    # evaluates them serially (no-op at 100 TB, see ann_ivf_kmeans)
    cand = track_persisted(
        vecs.filter(F.col("vec_id") >= N_QUERIES)
        .select("vec_id", "emb")
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .persist()
    )
    q = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "emb"
    )
    books = train_pq_books(cand)
    return _adc_topk(encode_pq_codes(cand, books), _pq_qtable(q, books))


def _pq_sub(m: int):
    """Subspace m of the ``emb`` column (1-based slice)."""
    return F.slice(F.col("emb"), m * PQ_SUBDIM + 1, PQ_SUBDIM)


def train_pq_books(cand: DataFrame) -> list[list[tuple[int, list[float]]]]:
    """Batched deterministic PQ training over any (vec_id, emb) candidate
    frame: all M subspace codebooks advance together so each Lloyd round
    is ONE job (M unioned argmin+posexplode branches over the cached
    candidates → one (m, cell, dim)-keyed agg, M·K·SUBDIM rows
    collected). Per-subspace Lloyd loops ran M× the driver round trips
    and — the real cost — M×ITERS plan recompiles (fresh centroid
    literals defeat the codegen cache; measured seconds per round).
    Factored out of ann_product_quantization for the stored-index
    lifecycle (the FAISS train() half)."""
    init = sorted(cand.orderBy("vec_id").limit(PQ_K).collect(),
                  key=lambda r: r["vec_id"])
    books = [
        [
            (cell, list(r["emb"][m * PQ_SUBDIM: (m + 1) * PQ_SUBDIM]))
            for cell, r in enumerate(init)
        ]
        for m in range(PQ_M)
    ]
    # rounds advance in pairs — two per materialization (r6 verdict #3;
    # see _pq_two_rounds)
    for _ in range(KMEANS_ITERS // 2):
        books = _pq_two_rounds(cand, books, _pq_sub)
    if KMEANS_ITERS % 2:
        books = _pq_books_from_rows(
            _pq_partials(cand, books, _pq_sub).collect()
        )
    return books


def encode_pq_codes(vecs: DataFrame, books) -> DataFrame:
    """(vec_id, m, code) codes for every vector — ONE projection computes
    all M codes per vector (no M-way join of per-subspace assignments).
    A pure deterministic function of (emb, books): the property that
    makes PQ-code appends ≡ rebuild exactly (the FAISS add() half)."""
    return vecs.select(
        "vec_id",
        F.explode(_pq_code_entries(books)).alias("mc"),
    ).select("vec_id", F.col("mc.m").alias("m"), F.col("mc.code").alias("code"))


def _pq_code_entries(books):
    """The all-M-codes array-of-structs generator input shared by
    encode_pq_codes and _encode_cell_codes — content-key-cached on the
    codebook values (VERDICT r18 #4: this tree was the largest single
    piece of ann_product_quantization's residual driver-side build time)."""
    return _keyed_cols(
        "pq_encode", repr(books),
        lambda: F.array(*[
            F.struct(
                F.lit(m).alias("m"),
                _cell_argmin_expr(books[m], _pq_sub(m)).alias("code"),
            )
            for m in range(PQ_M)
        ]),
    )


def _pq_qtable(q: DataFrame, books) -> DataFrame:
    """Per-query ADC distance tables: M×PQ_K codebook entries unfold from
    three flat nested-array literals via one transform+explode — a
    projection, no centroid DataFrame to cross-join and no M×K-arm
    expression tree (same analysis-cost rationale as _cell_argmin_expr).
    ``q`` carries (query_id, emb)."""
    return q.select(
        "query_id",
        F.explode(
            _keyed_cols("pq_qtable", repr(books), lambda: _qtable_entries(books))
        ).alias("e"),
    ).select(
        "query_id",
        F.col("e.m").alias("m"),
        F.col("e.code").alias("code"),
        F.col("e.d2").alias("d2"),
    )


def _qtable_entries(books):
    """The M×PQ_K (m, code, d2) struct array behind _pq_qtable and
    _pq_qtable_cells — one builder so the twins cannot drift, cached
    content-keyed by the callers (the tree burns ~3 _lit_arr parses plus
    one HOF lambda per build; identical for identical codebooks)."""
    ms_l = _lit_arr([m for m in range(PQ_M) for _ in books[m]])
    codes_l = _lit_arr([cell for m in range(PQ_M) for cell, _ in books[m]])
    vals_l = _lit_arr([cvals for m in range(PQ_M) for _, cvals in books[m]])
    return F.transform(
        ms_l,
        lambda mm, i: F.named_struct(
            F.lit("m"), mm,
            F.lit("code"), F.element_at(codes_l, i + 1),
            F.lit("d2"),
            _l2_dec(
                F.slice(F.col("emb"), mm * PQ_SUBDIM + 1, PQ_SUBDIM),
                F.element_at(vals_l, i + 1),
            ).cast("double"),
        ),
    )


def _adc_topk(codes_long: DataFrame, qtable: DataFrame) -> DataFrame:
    """ADC scoring tail: map-side broadcast join on (m, code), per
    (query, vec) table-entry sum, top-PQ_TOPK by approximate d²."""
    adc = (
        codes_long.join(F.broadcast(qtable), ["m", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").alias("adc_d2"))
    )
    wk = W.partitionBy("query_id").orderBy(F.col("adc_d2").asc(), F.col("vec_id"))
    return (
        adc.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= PQ_TOPK)
        .select(
            "query_id",
            "rank",
            F.col("vec_id").alias("neighbor_id"),
            _fr(F.col("adc_d2"), 6).alias("adc_d2"),
        )
        .orderBy("query_id", "rank")
    )


# Pinned-claim bounds for ann_product_quantization_checked (r11; closes
# the last rows-only registry entry). Measured basis (sf0.001 / 0.01 /
# 0.1) over the 50 returned (query, neighbor) pairs per SF:
#   max |adc_d2 − true_d2|   1.367 / 1.246 / 1.431   vs the 3.0 pin
#     (ADC replaces each candidate subvector by its centroid, so the
#      error is the per-subspace quantization distortion — a property of
#      the embedding distribution, stable under regeneration; ≥2.1×
#      margin. A broken dequant/table/zigzag-class defect lands far
#      beyond typical d² ≈ 2.)
#   mean true_d2 of returned / population mean d2  0.853 / 0.867 / 0.828
#     vs the 0.95 pin — PQ's returned neighbors must be genuinely closer
#     than a random candidate (recall itself is data-limited ~20 % top-1
#     on this near-orthogonal corpus — too flaky to pin; the ratio is the
#     robust form of the same "beats random" contract the pytest checks).
PQ_ADC_ERR_MAX = 3.0
PQ_GAIN_RATIO_MAX = 0.95


def ann_product_quantization_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable registry form of ``ann_product_quantization`` —
    the PQ analogue of the fast-dedup ``*_checked`` wrappers: the float
    ADC path (M coupled Lloyd loops + float table sums) is not SQL-
    replayable, so the registry surface is the replayable per-query spine
    plus engine-decided claims about the PQ plan, broadcast onto every
    row:

    - ``n_results``        — exact column: PQ returns exactly PQ_TOPK
      neighbors per query (the oracle replays the literal).
    - ``adc_err_ok``       — max |adc_d2 − true d²| over all returned
      pairs ≤ PQ_ADC_ERR_MAX (quantization-distortion bound; see the
      measured basis above).
    - ``pq_gain_ok``       — mean true d² of returned neighbors ≤
      PQ_GAIN_RATIO_MAX × the population mean d², where the population
      mean is computed in closed form (E‖q−x‖² = ‖q‖² + E‖x‖² − 2·q·E[x])
      from ONE 1-row candidate aggregate — no all-pairs stage even in the
      audit.

    The true-d² yardstick join touches only N_QUERIES × PQ_TOPK rows and
    is a test-SF-only bolt-on; the deployable plan
    (``ann_product_quantization``) is unchanged and is what bench.py
    times. The numpy replay pytest remains the primary defense (exact
    neighbor-set equality); these claims make the driver's CORRECTNESS
    gate see the operator."""
    return _pq_checked(spark, sf_dir, ann_product_quantization(spark, sf_dir))


def _pq_checked(spark: SparkSession, sf_dir: str, pq_raw: DataFrame) -> DataFrame:
    """The claims audit of ann_product_quantization_checked, factored so
    the stored-index form (ann_pq_prebuilt) emits the same replayable
    spine + pinned claims over ITS ADC output — one audit, two plans."""
    pq = track_persisted(pq_raw.persist())
    vecs = _emb_double(spark, sf_dir)
    cand = vecs.filter(F.col("vec_id") >= N_QUERIES)
    q = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )

    sq = F.aggregate(
        F.zip_with("qemb", "cemb", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    pairs = (
        pq.join(F.broadcast(q), "query_id")
        .join(
            cand.select(
                F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("cemb")
            ),
            "neighbor_id",
        )
        .select("query_id", "adc_d2", sq.alias("true_d2"))
    )

    # population mean d² in closed form: one 1-row candidate aggregate
    # (mean vector + mean squared norm), then per-query algebra — the
    # audit itself never pairs queries with candidates.
    cstats = cand.agg(
        F.array(
            *[F.avg(F.element_at("emb", d + 1)) for d in range(EMB_DIMS)]
        ).alias("mean_vec"),
        F.avg(
            F.aggregate("emb", F.lit(0.0), lambda acc, v: acc + v * v)
        ).alias("mean_sq"),
    )
    qdot = F.aggregate(
        F.zip_with("qemb", "mean_vec", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    qsq = F.aggregate("qemb", F.lit(0.0), lambda acc, v: acc + v * v)
    pop = (
        q.crossJoin(F.broadcast(cstats))
        .select((qsq + F.col("mean_sq") - 2 * qdot).alias("pop_d2"))
        .agg(F.avg("pop_d2").alias("pop_mean"))
    )

    audit = pairs.agg(
        F.max(F.abs(F.col("adc_d2") - F.col("true_d2"))).alias("max_err"),
        F.avg("true_d2").alias("ret_mean"),
    )
    claims = audit.crossJoin(F.broadcast(pop)).select(
        (F.col("max_err") <= F.lit(PQ_ADC_ERR_MAX))
        .cast("int")
        .alias("adc_err_ok"),
        (F.col("ret_mean") <= F.lit(PQ_GAIN_RATIO_MAX) * F.col("pop_mean"))
        .cast("int")
        .alias("pq_gain_ok"),
    )
    return (
        pq.groupBy("query_id")
        .agg(F.count("*").cast("int").alias("n_results"))
        .crossJoin(F.broadcast(claims))
        .select("query_id", "n_results", "adc_err_ok", "pq_gain_ok")
        .orderBy("query_id")
    )


PQ_INDEX_ALGO = 1  # bump on any training/encoding/layout change
PQ_APPEND_MOD = 2  # candidate vec_id % 2 == 1 arrives as the ingest batch


def _write_pq_codebooks(spark: SparkSession, books, path: str) -> None:
    rows = [
        (m, code, vals)
        for m in range(PQ_M)
        for code, vals in books[m]
    ]
    spark.createDataFrame(
        rows, "m int, code int, vals array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")


def read_pq_books(spark: SparkSession, path: str):
    """The stored codebooks as the driver-side M×PQ_K structure every
    encode/qtable expression folds from — M·K rows, KB-scale."""
    rows = spark.read.parquet(f"{path}/codebooks").collect()
    books = [[] for _ in range(PQ_M)]
    for r in sorted(rows, key=lambda r: (int(r["m"]), int(r["code"]))):
        books[int(r["m"])].append((int(r["code"]), list(r["vals"])))
    return books


def _write_pq_codes(codes_long: DataFrame, path: str, mode="overwrite") -> None:
    n_part = codes_long.sparkSession.sparkContext.defaultParallelism
    (
        codes_long.repartitionByRange(n_part, "vec_id")
        .sortWithinPartitions("vec_id", "m")
        .write.mode(mode)
        .parquet(f"{path}/codes")
    )


def build_pq_index(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Build the PQ index ONCE (FAISS IndexPQ train()+add()): train the
    M codebooks with the shared deterministic batched Lloyd and persist
    both halves — ``codebooks/`` (M·K rows, the KB-scale routing state)
    and ``codes/`` (vec_id, m, code — M small ints per vector, the 16×
    compressed store that replaces raw floats at 100 TB), vec_id-sorted
    so each file covers a tight id range."""
    vecs = _emb_double(spark, sf_dir)
    cand = track_persisted(
        vecs.filter(F.col("vec_id") >= N_QUERIES)
        .select("vec_id", "emb")
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .persist()
    )
    books = train_pq_books(cand)
    _write_pq_codebooks(spark, books, path)
    _write_pq_codes(encode_pq_codes(cand, books), path)


def append_pq_codes(spark: SparkSession, vecs: DataFrame, path: str) -> None:
    """Incremental add to a STORED PQ index: encode the NEW (vec_id, emb
    array<double>) batch with the stored codebooks — encoding is a pure
    deterministic function of (emb, books), so append ≡ bulk-encode of
    the union EXACTLY, no retraining — and blind-append the (vec_id, m,
    code) rows. A retried at-least-once batch duplicates code rows; the
    prebuilt query path distincts (vec_id, m) before the ADC sum (a
    duplicated row would otherwise DOUBLE its subspace's distance
    contribution and corrupt the ranking — the sharpest duplicate
    hazard of the four stored indexes, pytest-pinned). Appending chains
    an append event onto the generation's stamp
    (session.append_index_marker: ensure_* still reads it as stale, but
    manifest-loss recovery keeps the appends) and runs under the slot
    writer lease (append vs compaction serializes or fails loudly).
    Ingest loops pass the SLOT path: every call re-resolves the live
    generation (session.slot_live)."""
    from weather_database_system_spark.session import (
        append_index_marker,
        slot_live,
        slot_writer_lease,
    )

    with slot_writer_lease(path, "append_pq"):
        live = slot_live(path)
        books = read_pq_books(spark, live)
        _write_pq_codes(
            encode_pq_codes(vecs.select("vec_id", "emb"), books),
            live,
            mode="append",
        )
        append_index_marker(live)


def compact_pq_codes(spark: SparkSession, path: str) -> str:
    """Row-preserving layout restore for the codes table after appended
    file generations (codebooks — KB-scale — carried over verbatim).
    Manifest-managed slots promote an atomic pointer; explicit flat
    directories swap in place (session.compact_into_generation).
    Accepts a slot path (re-resolved to the live generation). Returns
    the live index path."""
    import shutil

    from weather_database_system_spark.session import (
        compact_into_generation,
        slot_live,
        slot_writer_lease,
    )

    with slot_writer_lease(path, "compact_pq"):
        live = slot_live(path)

        def rewrite(dst: str) -> None:
            shutil.copytree(f"{live}/codebooks", f"{dst}/codebooks")
            n_part = spark.sparkContext.defaultParallelism
            (
                spark.read.parquet(f"{live}/codes")
                .repartitionByRange(n_part, "vec_id")
                .sortWithinPartitions("vec_id", "m")
                .write.mode("overwrite")
                .parquet(f"{dst}/codes")
            )

        return compact_into_generation(live, rewrite)


def ensure_pq_index(spark: SparkSession, sf_dir: str) -> str:
    """Marker-gated build of the registry's PQ index slot, through the
    REAL lifecycle: codebooks trained once on the full candidate sample,
    bulk encode of the base half (candidate vec_id % 2 == 0), then one
    ``append_pq_codes`` ingest batch of the rest — stamped AFTER the
    append so the marker asserts the recorded two-generation state."""
    from weather_database_system_spark.session import (
        ensure_index,
        scratch_path,
        source_signature,
    )

    meta = {
        "kind": "pq_index",
        "algo": PQ_INDEX_ALGO,
        "append_mod": PQ_APPEND_MOD,
        "pq_m": PQ_M,
        "pq_subdim": PQ_SUBDIM,
        "pq_k": PQ_K,
        "iters": KMEANS_ITERS,
        "n_queries": N_QUERIES,
        "source": source_signature(sf_dir, "embeddings"),
    }

    def _build(gen: str) -> None:
        vecs = _emb_double(spark, sf_dir)
        cand = track_persisted(
            vecs.filter(F.col("vec_id") >= N_QUERIES)
            .select("vec_id", "emb")
            .repartition(spark.sparkContext.defaultParallelism, "vec_id")
            .persist()
        )
        books = train_pq_books(cand)
        _write_pq_codebooks(spark, books, gen)
        is_batch = F.pmod("vec_id", F.lit(PQ_APPEND_MOD)) == PQ_APPEND_MOD - 1
        _write_pq_codes(encode_pq_codes(cand.filter(~is_batch), books), gen)
        append_pq_codes(spark, cand.filter(is_batch), gen)

    return ensure_index(scratch_path("pq_index", sf_dir), meta, _build)


def ann_pq_query_prebuilt(
    spark: SparkSession,
    sf_dir: str,
    path: str | None = None,
    queries_df: DataFrame | None = None,
) -> DataFrame:
    """QUERY-ONLY half of stored-PQ search: reads the M·K stored codebook
    rows (collected into the same literal qtable fold the in-query form
    builds — KB-scale driver state) and ADC-scores the stored codes —
    no training, no encoding of the candidate corpus, no raw candidate
    floats anywhere in the plan. Stored codes pass through ONE distinct
    on (vec_id, m) before the table-sum: duplicates from at-least-once
    appends would otherwise double that subspace's distance contribution
    (duplicated code values are identical — encoding is deterministic —
    so the distinct loses nothing).

    ``queries_df`` is the CALLER's query set (r16, VERDICT r15 task
    #1): (query_id long, emb array<double>) rows, in-corpus or not —
    the asymmetric-distance table is computed from the RAW query vector
    against the stored codebooks, which is exactly what makes
    out-of-corpus queries PQ's normal case (Jégou et al. 2011 §III).
    Default: the registry's pinned first-N_QUERIES corpus rows, keeping
    the DuckDB oracle hermetic."""
    from weather_database_system_spark.session import scratch_path, slot_live

    path = slot_live(
        path if path is not None else scratch_path("pq_index", sf_dir)
    )
    books = read_pq_books(spark, path)
    codes = spark.read.parquet(f"{path}/codes").dropDuplicates(["vec_id", "m"])
    if queries_df is None:
        q = _emb_double(spark, sf_dir).filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "emb"
        )
    else:
        q = queries_df.select("query_id", "emb")
    return _adc_topk(codes, _pq_qtable(q, books))


def ann_pq_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stored-index deployment form of PQ search (r15, completing
    the stored-index QUARTET: trigram postings, IVF, dedup, PQ): the
    codebooks and the compressed code store are built ONCE through the
    real train-then-add lifecycle (ensure_pq_index: bulk encode + one
    appended ingest batch) and the query reads ONLY index bytes — M
    small ints per candidate instead of 64 floats, the whole point of
    PQ at 100 TB. Codebooks are trained on the full candidate sample,
    and encoding against stored books is a pure function, so the
    two-generation store holds exactly the one-shot build's codes and
    the ADC output is bit-identical to ann_product_quantization —
    wrapped in the SAME replayable spine + pinned claims
    (_pq_checked), replaying the SAME oracle. The equality itself is
    pytest-pinned; the float-ADC interior remains covered by the numpy
    replay pytest."""
    path = ensure_pq_index(spark, sf_dir)
    return _pq_checked(spark, sf_dir, ann_pq_query_prebuilt(spark, sf_dir, path))


# --- IVF+PQ composition (FAISS IVFADC — Jégou, Douze, Schmid 2011 §IV) ---
#
# The production shape at 100 TB (r17, VERDICT r16 task #1): the stored
# IVF index re-ranks gathered raw floats and the stored PQ index scans
# the WHOLE code table; composing them prices a query at Σ|probed
# cells| CODE rows — √N-sized cells route the query, asymmetric
# distance computation scores only the probed cells' M-byte codes, raw
# candidate floats appear NOWHERE in the query plan. Codes are encoded
# against the raw vectors (the FAISS ``by_residual=false`` variant) so
# encoding stays a pure function of (emb, books) — the property that
# makes append ≡ rebuild exactly and lets the PQ claims idiom transfer
# verbatim; residual encoding (quantize x − centroid) trades that
# replay-exactness for lower distortion and is the documented variant
# at real scale.

IVFPQ_INDEX_ALGO = 1  # bump on any training/encoding/layout change


def _encode_cell_codes(frame: DataFrame, books) -> DataFrame:
    """(cell, vec_id, m, code) rows from a (vec_id, cell, emb) frame:
    all M subspace codes unfold from one array-of-structs generator
    input (the encode_pq_codes shape); the cell column — computed in
    its own select below the Generate (the _lloyd_round barrier
    rationale) — passes through. ``emb`` is whatever the caller
    quantizes: raw vectors for the plain composition, residuals for
    the by_residual form."""
    return frame.select(
        "vec_id",
        "cell",
        F.explode(_pq_code_entries(books)).alias("mc"),
    ).select(
        "cell", "vec_id", F.col("mc.m").alias("m"), F.col("mc.code").alias("code")
    )


def _encode_ivfpq(
    vecs: DataFrame,
    cents: list[tuple[int, list[float]]],
    books,
) -> DataFrame:
    """(cell, vec_id, m, code) rows for the RAW-vector composition:
    route with the stored centroids, encode the raw subvectors. Pure
    deterministic function of (emb, stored centroids, stored books) —
    append ≡ bulk-encode of the union exactly."""
    return _encode_cell_codes(
        _assign_cells(vecs.select("vec_id", "emb"), cents), books
    )


def _residual_from(ids, vals, emb_col, cell_col):
    """emb − centroid[cell], the residual every IVFADC ``by_residual``
    stage quantizes: the centroid is looked up by CELL ID through a map
    literal/column (Lloyd can drop emptied cells, so positional
    element_at over a dense array would mis-index)."""
    return F.zip_with(
        emb_col,
        F.element_at(F.map_from_arrays(ids, vals), cell_col),
        lambda a, b: a - b,
    )


def _with_residual(
    vecs: DataFrame, cents: list[tuple[int, list[float]]]
) -> DataFrame:
    """(vec_id, cell, emb=residual) for a (vec_id, emb) frame: assign
    each vector to its stored cell, then subtract that cell's centroid.
    Past IVF_LITERAL_ROUTER_MAX cells the centroid map rides the 1-row
    broadcast anchor instead of a Py4J literal (the routing
    transport)."""
    assigned = _assign_cells(vecs.select("vec_id", "emb"), cents)
    cs = sorted(cents)
    if len(cs) <= IVF_LITERAL_ROUTER_MAX:
        ids = _lit_arr([c for c, _ in cs])
        vals = _lit_arr([v for _, v in cs])
        return assigned.select(
            "vec_id",
            "cell",
            _residual_from(ids, vals, F.col("emb"), F.col("cell")).alias("emb"),
        )
    anchor = _centroid_row_of(vecs.sparkSession, cents)
    return assigned.crossJoin(F.broadcast(anchor)).select(
        "vec_id",
        "cell",
        _residual_from(
            F.col("ids"), F.col("vals"), F.col("emb"), F.col("cell")
        ).alias("emb"),
    )


def _write_ivfpq_codes(codes: DataFrame, path: str, mode: str = "overwrite") -> None:
    (
        codes.select("cell", "vec_id", "m", "code")
        .repartition("cell")
        .write.mode(mode)
        .partitionBy("cell")
        .parquet(f"{path}/codes")
    )


def build_ivfpq_index(
    spark: SparkSession, sf_dir: str, path: str, k_cells: int | None = None
) -> None:
    """Build the IVF+PQ index ONCE (FAISS IndexIVFPQ train()+add()):
    train the √N-sized coarse quantizer (``k_cells=None`` → the
    ivf_cell_count rule; an explicit K pins test geometry) and the M
    subspace codebooks with the shared deterministic Lloyd trainers,
    then persist all three halves — ``centroids/`` (K rows, the routing
    table), ``codebooks/`` (M·K rows, the ADC tables' source), and
    ``codes/`` PARTITIONED BY CELL (cell, vec_id, m, code): each learned
    cell IS a directory of M-byte codes, so a probe reads nprobe/K of a
    16×-compressed store by directory — the only layout in the ANN
    family where BOTH prunings (cell partition + float→code compression)
    compound."""
    vecs = _emb_double(spark, sf_dir).select("vec_id", "emb")
    cand = track_persisted(
        vecs.filter(F.col("vec_id") >= N_QUERIES)
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .persist()
    )
    if k_cells is None:
        k_cells = ivf_cell_count(cand.count())
    cents = train_ivf_centroids(cand, k_cells)
    books = train_pq_books(cand)
    _write_ivf_centroids(spark, cents, path)
    _write_pq_codebooks(spark, books, path)
    _write_ivfpq_codes(_encode_ivfpq(cand, cents, books), path)


def ensure_ivfpq_index(spark: SparkSession, sf_dir: str) -> str:
    """Marker-gated build of the IVF+PQ slot at the DEPLOYMENT geometry
    (√N cells — the configuration the sizing rule recommends is exactly
    what this index stores and the registry entry oracle-checks)."""
    from weather_database_system_spark.session import (
        ensure_index,
        scratch_path,
        source_signature,
    )

    meta = {
        "kind": "ivfpq_index",
        "algo": IVFPQ_INDEX_ALGO,
        "k_cells": "sqrt",
        "coef": IVF_CELL_COEF,
        "iters": KMEANS_ITERS,
        "pq_m": PQ_M,
        "pq_subdim": PQ_SUBDIM,
        "pq_k": PQ_K,
        "n_queries": N_QUERIES,
        "source": source_signature(sf_dir, "embeddings"),
    }
    return ensure_index(
        scratch_path("ivfpq_index", sf_dir),
        meta,
        lambda gen: build_ivfpq_index(spark, sf_dir, gen),
    )


def append_ivfpq_vectors(spark: SparkSession, vecs: DataFrame, path: str) -> None:
    """Incremental add to a STORED IVF+PQ index: route the new (vec_id,
    emb array<double>) batch with the stored centroids AND encode it
    with the stored codebooks in the one shared projection
    (_encode_ivfpq — both pure functions, so append ≡ bulk build of the
    union exactly, pytest-pinned), then blind-append into the cell
    directories. A retried at-least-once batch duplicates code rows;
    the query path distincts (query, vec, m) before the ADC sum (the
    append_pq_codes hazard — a duplicate would double one subspace's
    distance). Chains the append onto the generation's stamp and runs
    under the slot writer lease, exactly as the other five families."""
    from weather_database_system_spark.session import (
        append_index_marker,
        slot_live,
        slot_writer_lease,
    )

    with slot_writer_lease(path, "append_ivfpq"):
        live = slot_live(path)
        cents = read_ivf_centroids(spark, live)
        books = read_pq_books(spark, live)
        _write_ivfpq_codes(
            _encode_ivfpq(vecs.select("vec_id", "emb"), cents, books),
            live,
            mode="append",
        )
        append_index_marker(live)


def compact_ivfpq_codes(spark: SparkSession, path: str) -> str:
    """Row-preserving layout restore for the cell-partitioned code store
    after appended file generations (centroids + codebooks — KB-scale —
    carried over verbatim). Manifest-managed slots promote an atomic
    pointer; flat directories swap in place. Returns the live path."""
    import shutil

    from weather_database_system_spark.session import (
        compact_into_generation,
        slot_live,
        slot_writer_lease,
    )

    with slot_writer_lease(path, "compact_ivfpq"):
        live = slot_live(path)

        def rewrite(dst: str) -> None:
            shutil.copytree(f"{live}/centroids", f"{dst}/centroids")
            shutil.copytree(f"{live}/codebooks", f"{dst}/codebooks")
            (
                spark.read.parquet(f"{live}/codes")
                .repartition("cell")
                .write.mode("overwrite")
                .partitionBy("cell")
                .parquet(f"{dst}/codes")
            )

        return compact_into_generation(live, rewrite)


def ann_ivfpq_query_prebuilt(
    spark: SparkSession,
    sf_dir: str,
    path: str | None = None,
    nprobe: int = 1,
    queries_df: DataFrame | None = None,
) -> DataFrame:
    """QUERY-ONLY half of IVF+PQ search: route via the stored centroids
    (the IDENTICAL _route_query_cells expressions the stored-IVF query
    uses), then ADC-score ONLY the probed cells' stored codes — the
    (query, cell) pairs broadcast against the cell-partitioned codes
    directory (dynamic partition pruning reads nprobe/K of the store by
    directory), the per-query M×K distance table broadcasts KB-scale,
    and the score is a (query, vec)-keyed sum of M table entries. Raw
    candidate floats appear NOWHERE: query cost = Σ|probed cells| code
    rows — cell pruning × 16× code compression, the FAISS IVFADC
    promise. Probed codes dedup on (query, vec, m) BEFORE the sum
    (at-least-once appends; a duplicate row would double one subspace's
    contribution). ``queries_df``: the caller's (query_id long, emb
    array<double>) rows, in-corpus or not — routing and the ADC table
    both derive from the raw caller vector."""
    from weather_database_system_spark.session import scratch_path, slot_live

    path = slot_live(
        path if path is not None else scratch_path("ivfpq_index", sf_dir)
    )
    cents = read_ivf_centroids(spark, path)
    books = read_pq_books(spark, path)
    codes = spark.read.parquet(f"{path}/codes")
    if queries_df is None:
        q = _emb_double(spark, sf_dir).filter(F.col("vec_id") < N_QUERIES).select(
            "vec_id", "emb"
        )
    else:
        q = queries_df.select(F.col("query_id").alias("vec_id"), "emb")
    qcells = _route_query_cells(spark, q, cents, nprobe)
    qtable = _pq_qtable(
        q.select(F.col("vec_id").alias("query_id"), "emb"), books
    )
    cand = (
        F.broadcast(qcells)
        .join(codes, "cell")
        .select("query_id", "vec_id", "m", "code")
        .dropDuplicates(["query_id", "vec_id", "m"])
    )
    adc = (
        cand.join(F.broadcast(qtable), ["query_id", "m", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").alias("adc_d2"))
    )
    wk = W.partitionBy("query_id").orderBy(F.col("adc_d2").asc(), F.col("vec_id"))
    return (
        adc.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= PQ_TOPK)
        .select(
            "query_id",
            "rank",
            F.col("vec_id").alias("neighbor_id"),
            _fr(F.col("adc_d2"), 6).alias("adc_d2"),
        )
        .orderBy("query_id", "rank")
    )


def ann_ivfpq_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry surface of the IVF+PQ composition (r17, VERDICT r16 task
    #1): per-query EXACT spine + engine-decided claims, the
    ann_pq_prebuilt oracle pattern widened with routing:

    - ``best_cell``   — exact column: the query's routed cell; the
      oracle replays the √N-sized Lloyd training (dynamic K in SQL) and
      routes each query itself.
    - ``n_results``   — exact column: min(PQ_TOPK, |probed cell|); the
      oracle counts each cell's distinct members from its replayed
      final assignment.
    - ``adc_err_ok``  — max |adc_d2 − true d²| over returned pairs ≤
      PQ_ADC_ERR_MAX (same books, same raw-vector encoding → the same
      measured quantization-distortion bound as the PQ entries).
    - ``cells_ok``    — every returned neighbor's cell, RECOMPUTED from
      its raw embedding against the stored centroids, equals the
      query's probed cell: candidates ⊆ probed cells checked against an
      independent derivation, not the join that produced them.

    The audit joins touch only N_QUERIES×PQ_TOPK rows (test-SF bolt-on);
    the deployable plan (ann_ivfpq_query_prebuilt) is what a cluster
    runs and is plan-pinned to ONE cell-pruned codes scan with no raw
    candidate floats."""
    path = ensure_ivfpq_index(spark, sf_dir)
    return _ivfpq_checked(spark, sf_dir, path, nprobe=1)


def ann_ivfpq_prebuilt_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall knob on the COMPOSED index (r17): NPROBE nearest √N
    stored centroids per query, ADC over the UNION of those cells'
    stored codes — the same dynamic partition pruning now keeps
    nprobe/K directories instead of one. Same spine/claims surface as
    ann_ivfpq_prebuilt minus best_cell (multi-probe has no single
    routed cell); n_results = min(PQ_TOPK, |union of probed cells|) is
    replayed exactly by the dynamic-K oracle's member census over the
    widened routing CTE, and cells_ok verifies every returned
    neighbor's independently recomputed cell lies IN the query's probed
    set. Shares the stored build with ann_ivfpq_prebuilt
    (ensure_ivfpq_index — one composed build per sweep)."""
    path = ensure_ivfpq_index(spark, sf_dir)
    return _ivfpq_checked(spark, sf_dir, path, nprobe=NPROBE)


def _ivfpq_checked(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    nprobe: int,
    query_fn=None,
    top_df: DataFrame | None = None,
) -> DataFrame:
    """Spine + claims audit shared by the single-/multi-probe and
    raw-/residual-encoded IVF+PQ registry forms (the _pq_checked
    factoring): replayable per-query result counts (plus best_cell when
    nprobe=1), ADC-error bound, and candidates ⊆ probed cells — the
    neighbor's cell RECOMPUTED from its raw embedding against the
    stored centroids, not read back from the join that produced it.
    ``query_fn`` selects the query half; both encodings approximate the
    same exact ‖q−x‖², so one audit serves both. ``top_df`` lets a
    caller that already built (and will reuse) the query frame share
    ONE persisted plan instead of constructing a second."""
    single = nprobe == 1
    if query_fn is None:
        query_fn = ann_ivfpq_query_prebuilt
    top = track_persisted(
        (
            top_df
            if top_df is not None
            else query_fn(spark, sf_dir, path, nprobe=nprobe)
        ).persist()
    )
    cents = read_ivf_centroids(spark, path)

    vecs = _emb_double(spark, sf_dir)
    q = vecs.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "emb")
    qcells = _route_query_cells(spark, q, cents, nprobe)

    counts = top.groupBy("query_id").agg(
        F.count("*").cast("int").alias("n_results")
    )
    spine_cols = (
        ["query_id", "best_cell", "n_results"]
        if single
        else ["query_id", "n_results"]
    )
    spine = (
        qcells.select("query_id", *(["cell"] if single else []))
        .dropDuplicates(["query_id"])
        .join(counts, "query_id", "left")
        .select(
            "query_id",
            *([F.col("cell").alias("best_cell")] if single else []),
            F.coalesce(F.col("n_results"), F.lit(0)).cast("int").alias("n_results"),
        )
    )

    # claims audit: true d² + independently recomputed neighbor cell on
    # the ≤ N_QUERIES×PQ_TOPK returned pairs only
    qe = q.select(F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb"))
    ce = vecs.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("cemb")
    )
    sq = F.aggregate(
        F.zip_with("qemb", "cemb", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    pairs = (
        top.join(F.broadcast(qcells), "query_id")
        .join(F.broadcast(qe), "query_id")
        .join(ce, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "adc_d2",
            "cell",
            sq.alias("true_d2"),
            _cell_argmin_expr(cents, F.col("cemb")).alias("ncell"),
        )
    )
    # multi-probe duplicates each returned pair once per probed cell:
    # the membership flag is max(ncell == cell) per pair, and the error
    # audit dedups pairs before the max
    per_pair = pairs.groupBy("query_id", "neighbor_id").agg(
        F.max(F.abs(F.col("adc_d2") - F.col("true_d2"))).alias("err"),
        F.max((F.col("ncell") == F.col("cell")).cast("int")).alias("in_probed"),
    )
    claims = per_pair.agg(
        (F.max("err") <= F.lit(PQ_ADC_ERR_MAX)).cast("int").alias("adc_err_ok"),
        (F.min("in_probed") == 1).cast("int").alias("cells_ok"),
    )
    return (
        spine.crossJoin(F.broadcast(claims))
        .select(*spine_cols, "adc_err_ok", "cells_ok")
        .orderBy("query_id")
    )


# --- residual-encoded IVF+PQ (FAISS by_residual=true, the IndexIVFPQ
# default): quantize x − centroid[cell(x)] instead of x. Residuals
# concentrate around the origin (the coarse quantizer has absorbed the
# cell's mean), so the same M×K codebook budget spends its codewords on
# a tighter distribution — lower ADC distortion for identical index
# bytes. The target metric is unchanged (‖(q−c) − (x−c)‖² ≡ ‖q−x‖²);
# only the quantization grid moves. The query-side cost is one residual
# projection per (query, probed cell) and a (query, cell)-keyed ADC
# table — both still KB-scale broadcasts.

IVFPQ_RES_ALGO = 1  # bump on any training/encoding/layout change


def _pq_qtable_cells(qr: DataFrame, books) -> DataFrame:
    """Per-(query, probed-cell) ADC tables over RESIDUAL query vectors:
    the _pq_qtable expansion with the cell column carried through, so
    the ADC join matches a candidate's codes against the table of ITS
    cell's residual frame. ``qr`` carries (query_id, cell, emb) where
    emb is the residual q − centroid[cell]."""
    return qr.select(
        "query_id",
        "cell",
        F.explode(
            _keyed_cols("pq_qtable", repr(books), lambda: _qtable_entries(books))
        ).alias("e"),
    ).select(
        "query_id",
        "cell",
        F.col("e.m").alias("m"),
        F.col("e.code").alias("code"),
        F.col("e.d2").alias("d2"),
    )


def build_ivfpq_residual_index(
    spark: SparkSession, sf_dir: str, path: str, k_cells: int | None = None
) -> None:
    """Build the residual-encoded IVF+PQ index ONCE: train the √N coarse
    quantizer, compute every candidate's residual against its assigned
    centroid, train the M codebooks ON THE RESIDUALS (same deterministic
    batched Lloyd — init is the PQ_K lowest-vec_id residuals), and
    persist centroids + residual codebooks + cell-partitioned residual
    codes. Same layout as the raw composition; only what the codes MEAN
    differs (recorded in the marker's by_residual field)."""
    vecs = _emb_double(spark, sf_dir).select("vec_id", "emb")
    cand = track_persisted(
        vecs.filter(F.col("vec_id") >= N_QUERIES)
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .persist()
    )
    if k_cells is None:
        k_cells = ivf_cell_count(cand.count())
    cents = train_ivf_centroids(cand, k_cells)
    resid = track_persisted(_with_residual(cand, cents).persist())
    books = train_pq_books(resid.select("vec_id", "emb"))
    _write_ivf_centroids(spark, cents, path)
    _write_pq_codebooks(spark, books, path)
    _write_ivfpq_codes(_encode_cell_codes(resid, books), path)


def ensure_ivfpq_residual_index(spark: SparkSession, sf_dir: str) -> str:
    """Marker-gated build of the residual-composition slot (√N cells —
    the same deployment geometry as the raw composition, its own slot
    so the two encodings never rebuild over each other's marker)."""
    from weather_database_system_spark.session import (
        ensure_index,
        scratch_path,
        source_signature,
    )

    meta = {
        "kind": "ivfpq_res_index",
        "algo": IVFPQ_RES_ALGO,
        "by_residual": True,
        "k_cells": "sqrt",
        "coef": IVF_CELL_COEF,
        "iters": KMEANS_ITERS,
        "pq_m": PQ_M,
        "pq_subdim": PQ_SUBDIM,
        "pq_k": PQ_K,
        "n_queries": N_QUERIES,
        "source": source_signature(sf_dir, "embeddings"),
    }
    return ensure_index(
        scratch_path("ivfpq_res_index", sf_dir),
        meta,
        lambda gen: build_ivfpq_residual_index(spark, sf_dir, gen),
    )


def append_ivfpq_residual_vectors(
    spark: SparkSession, vecs: DataFrame, path: str
) -> None:
    """Incremental add to the residual composition: assign, residualize
    against the STORED centroids, encode with the STORED residual books
    — all pure functions, so append ≡ rebuild exactly (the same
    property as every other family; pytest-pinned) — and blind-append
    under the writer lease with a chained marker."""
    from weather_database_system_spark.session import (
        append_index_marker,
        slot_live,
        slot_writer_lease,
    )

    with slot_writer_lease(path, "append_ivfpq_res"):
        live = slot_live(path)
        cents = read_ivf_centroids(spark, live)
        books = read_pq_books(spark, live)
        _write_ivfpq_codes(
            _encode_cell_codes(
                _with_residual(vecs.select("vec_id", "emb"), cents), books
            ),
            live,
            mode="append",
        )
        append_index_marker(live)


def ann_ivfpq_residual_query_prebuilt(
    spark: SparkSession,
    sf_dir: str,
    path: str | None = None,
    nprobe: int = 1,
    queries_df: DataFrame | None = None,
) -> DataFrame:
    """QUERY-ONLY half of residual IVF+PQ search: route via the stored
    centroids (identical _route_query_cells expressions), compute the
    query's RESIDUAL against each probed cell's centroid, and ADC-score
    only the probed cells' stored residual codes — the join carries the
    cell key so a candidate's codes always meet the table of its own
    cell's residual frame. Same index-priced plan shape as the raw
    composition: one cell-pruned codes scan, KB-scale broadcasts, raw
    candidate floats nowhere."""
    from weather_database_system_spark.session import scratch_path, slot_live

    path = slot_live(
        path if path is not None else scratch_path("ivfpq_res_index", sf_dir)
    )
    cents = read_ivf_centroids(spark, path)
    books = read_pq_books(spark, path)
    codes = spark.read.parquet(f"{path}/codes")
    if queries_df is None:
        q = _emb_double(spark, sf_dir).filter(F.col("vec_id") < N_QUERIES).select(
            "vec_id", "emb"
        )
    else:
        q = queries_df.select(F.col("query_id").alias("vec_id"), "emb")
    qcells = _route_query_cells(spark, q, cents, nprobe)
    cs = sorted(cents)
    qe = q.select(F.col("vec_id").alias("query_id"), "emb")
    if len(cs) <= IVF_LITERAL_ROUTER_MAX:
        qr = qcells.join(qe, "query_id").select(
            "query_id",
            "cell",
            _residual_from(
                _lit_arr([c for c, _ in cs]),
                _lit_arr([v for _, v in cs]),
                F.col("emb"),
                F.col("cell"),
            ).alias("emb"),
        )
    else:
        qr = (
            qcells.join(qe, "query_id")
            .crossJoin(F.broadcast(_centroid_row_of(spark, cents)))
            .select(
                "query_id",
                "cell",
                _residual_from(
                    F.col("ids"), F.col("vals"), F.col("emb"), F.col("cell")
                ).alias("emb"),
            )
        )
    qtable = _pq_qtable_cells(qr, books)
    cand = (
        F.broadcast(qcells)
        .join(codes, "cell")
        .select("query_id", "cell", "vec_id", "m", "code")
        .dropDuplicates(["query_id", "vec_id", "m"])
    )
    adc = (
        cand.join(F.broadcast(qtable), ["query_id", "cell", "m", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").alias("adc_d2"))
    )
    wk = W.partitionBy("query_id").orderBy(F.col("adc_d2").asc(), F.col("vec_id"))
    return (
        adc.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= PQ_TOPK)
        .select(
            "query_id",
            "rank",
            F.col("vec_id").alias("neighbor_id"),
            _fr(F.col("adc_d2"), 6).alias("adc_d2"),
        )
        .orderBy("query_id", "rank")
    )


def ann_ivfpq_residual_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry surface of the RESIDUAL composition — the FAISS
    IndexIVFPQ default (by_residual=true): residuals concentrate around
    the origin on clustered real-world distributions, so the same
    codebook budget quantizes a tighter grid. Spine and oracle are
    IDENTICAL to ann_ivfpq_prebuilt (same coarse quantizer, same
    routing, same member census — encoding changes what the codes
    mean, not which vectors sit in which cell); claims audit shared
    (_ivfpq_checked with this query half): adc_err_ok under the same
    distortion bound and cells_ok against the independently recomputed
    cell.

    Honest measurement (r17, NOTES): on THIS corpus residual and raw
    distortion are statistically indistinguishable (mean |adc−true|
    0.67–0.73 vs 0.61–0.69 across SFs; max ≈1.2 vs the 3.0 pin) — the
    synthetic embeddings are near-orthogonal, so cell centroids have
    small norms and residual ≈ raw. The entry therefore proves the
    by_residual MACHINERY (per-cell residual tables, residual-trained
    books, the cell-keyed ADC join) under the full oracle gate rather
    than a distortion win the data cannot exhibit; the numpy replay
    pytest pins exact neighbor sets either way."""
    path = ensure_ivfpq_residual_index(spark, sf_dir)
    return _ivfpq_checked(
        spark, sf_dir, path, nprobe=1, query_fn=ann_ivfpq_residual_query_prebuilt
    )


def ann_pq_prebuilt_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT read of the stored PQ index (r17 — snapshot reads
    generalized to every stored family): the ADC query answers from the
    RETAINED pre-compaction generation, wrapped in the same replayable
    spine + claims as ann_pq_prebuilt (_pq_checked), plus the
    engine-decided ``snapshot_equals_live`` claim over the raw ADC
    outputs — pinned TRUE by the row-preserving compaction."""
    from weather_database_system_spark.session import (
        ensure_snapshot_state,
        scratch_path,
        slot_live,
        snapshot_equals_live_claim,
    )

    ensure_pq_index(spark, sf_dir)
    slot = scratch_path("pq_index", sf_dir)
    snap = ensure_snapshot_state(slot, lambda s: compact_pq_codes(spark, s))
    # ONE snapshot query feeds both the claim and the checked spine
    # (persisted inside _pq_checked); the claim joins on the DISCRETE
    # columns only — adc_d2 is a float sum whose partial-aggregation
    # order can differ between the two generations' file layouts by an
    # ulp, and an ulp at a 1e-6 rounding boundary would flip the
    # pinned-TRUE claim (review r17)
    snap_raw = ann_pq_query_prebuilt(spark, sf_dir, snap)
    checked = _pq_checked(spark, sf_dir, snap_raw)
    live_raw = ann_pq_query_prebuilt(spark, sf_dir, slot_live(slot))
    on = ["query_id", "rank", "neighbor_id"]
    claims = snapshot_equals_live_claim(
        snap_raw.select(*on), live_raw.select(*on), on
    )
    return (
        checked.crossJoin(F.broadcast(claims))
        .select(
            "query_id",
            "n_results",
            "adc_err_ok",
            "pq_gain_ok",
            "snapshot_equals_live",
        )
        .orderBy("query_id")
    )


def ann_ivfpq_prebuilt_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT read of the composed IVF+PQ index (r17): cell-partitioned
    code directories mutate under appends, so reading the retained
    generation answers exactly as of the previous promote — same spine +
    claims as ann_ivfpq_prebuilt (_ivfpq_checked over the snapshot path)
    plus the engine-decided ``snapshot_equals_live`` claim over the raw
    ADC outputs, pinned TRUE by the row-preserving compaction."""
    from weather_database_system_spark.session import (
        ensure_snapshot_state,
        scratch_path,
        slot_live,
        snapshot_equals_live_claim,
    )

    ensure_ivfpq_index(spark, sf_dir)
    slot = scratch_path("ivfpq_index", sf_dir)
    snap = ensure_snapshot_state(slot, lambda s: compact_ivfpq_codes(spark, s))
    # one snapshot query shared by claim and spine; claim on DISCRETE
    # columns only (the adc_d2 float-sum/layout caveat — see
    # ann_pq_prebuilt_snapshot)
    snap_raw = ann_ivfpq_query_prebuilt(spark, sf_dir, snap)
    checked = _ivfpq_checked(spark, sf_dir, snap, nprobe=1, top_df=snap_raw)
    live_raw = ann_ivfpq_query_prebuilt(spark, sf_dir, slot_live(slot))
    on = ["query_id", "rank", "neighbor_id"]
    claims = snapshot_equals_live_claim(
        snap_raw.select(*on), live_raw.select(*on), on
    )
    return (
        checked.crossJoin(F.broadcast(claims))
        .select(
            "query_id",
            "best_cell",
            "n_results",
            "adc_err_ok",
            "cells_ok",
            "snapshot_equals_live",
        )
        .orderBy("query_id")
    )


def ann_bruteforce_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized brute-force scoring via mapInPandas: queries are collected
    once (tiny, bounded by N_QUERIES), broadcast into each Arrow batch, and
    scored with one numpy matmul per batch — the blocked-matmul shape of a
    GPU/BLAS scorer. Oracle-checked since r8 (shares ann_brute_force's
    decimal SQL): the 6-dp floor-rounding absorbs the float-association
    gap and a pytest pins the >2e-6 consecutive-rank score gap that makes
    cross-engine ordering deterministic; tests additionally validate rank
    overlap against ann_brute_force."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    qrows = emb.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding").collect()
    qids = np.array([r["vec_id"] for r in qrows])
    qmat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    bqids = spark.sparkContext.broadcast(qids)
    bqmat = spark.sparkContext.broadcast(qmat)

    def score(batches):
        for pdf in batches:
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ bqmat.value.T  # (batch, n_queries)
            n, k = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(bqids.value, n),
                    "neighbor_id": np.tile(pdf["vec_id"].to_numpy(), k),
                    "cosine": sims.T.ravel(),
                }
            )

    scored = (
        emb.filter(F.col("vec_id") >= N_QUERIES)
        .select("vec_id", "embedding")
        .mapInPandas(score, schema="query_id long, neighbor_id long, cosine double")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", _fr(F.col("cosine"), 6).alias("cosine"))
        .orderBy("query_id", "rank")
    )


N_PLANES = 16
N_TABLES = 4  # 4 planes per table


EMB_DIMS = 64  # embeddings-table vector width (TESTDATA schema)


def _hyperplanes(n_planes: int = N_PLANES, dims: int = EMB_DIMS) -> list[list[float]]:
    """Deterministic random hyperplanes, rounded to 6 decimals so the SAME
    literal values feed the Spark plan and the oracle SQL (decimal literals
    parse to identical doubles in both engines)."""
    import numpy as np

    rng = np.random.RandomState(42)
    return [[round(float(x), 6) for x in row] for row in rng.standard_normal((n_planes, dims))]


def _lsh_tables(spark: SparkSession, sf_dir: str):
    """Shared sign-random-projection machinery: per-vector norm + banded
    signatures (N_TABLES tables of N_PLANES/N_TABLES sign bits, each bit an
    exact decimal dot against a fixed literal hyperplane), plus the exploded
    (vec_id, tbl, sig) bucket table the candidate equi-joins run on."""
    per_table = N_PLANES // N_TABLES
    # the hyperplane bank is a seeded module constant — the N_PLANES
    # decimal-dot sign expressions build once per process (_const_cols;
    # r19, ~16 _lit_arr parses + HOF folds per call saved)
    bits = _const_cols(
        ("lsh_bits_dec", N_PLANES, EMB_DIMS),
        lambda: [
            F.when(_dot_dec(F.col("emb"), _lit_arr(p)) >= 0, "1").otherwise("0")
            for p in _hyperplanes()
        ],
    )
    # Lifecycle: tracked — callers release via session.release_persisted().
    # repartition first: the signature projection (N_PLANES decimal dots
    # per vector) ran as ONE task off the single small-SF parquet split
    # (the semdedup fp rationale; no-op at 100 TB).
    vecs = track_persisted(
        _emb_double(spark, sf_dir)
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .select(
            "vec_id",
            "emb",
            F.sqrt(_dot_dec(F.col("emb"), F.col("emb"))).alias("nrm"),
            *[
                F.concat(*bits[t * per_table : (t + 1) * per_table]).alias(f"sig{t}")
                for t in range(N_TABLES)
            ],
        ).persist()
    )
    tables = vecs.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("tbl"), F.col(f"sig{t}").alias("sig"))
                    for t in range(N_TABLES)
                ]
            )
        ).alias("b"),
    ).select("vec_id", "b.tbl", "b.sig")
    return vecs, tables


def embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup via LSH blocking — the sub-quadratic replacement
    for dedup.embedding_near_dup's exact all-pairs baseline: candidate pairs
    come ONLY from shared (table, signature) buckets (equi-join on uniform
    keys), then exact decimal cosine keeps pairs ≥ the near-dup threshold.
    At 100 TB the bucket join scales linearly in candidates while the
    baseline is quadratic in vectors. Recall vs the exact baseline is
    measured in tests; precision is exact (same cosine, same threshold)."""
    from weather_database_system_spark.operators.dedup import NEAR_DUP_COS

    vecs, tables = _lsh_tables(spark, sf_dir)
    a, b = tables.alias("a"), tables.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    va, vb = vecs.alias("va"), vecs.alias("vb")
    cos = _dot_dec(F.col("va.emb"), F.col("vb.emb")) / (F.col("va.nrm") * F.col("vb.nrm"))
    return (
        pairs.join(va, pairs.vec_a == F.col("va.vec_id"))
        .join(vb, pairs.vec_b == F.col("vb.vec_id"))
        .select("vec_a", "vec_b", cos.alias("cos"))
        .filter(F.col("cos") >= NEAR_DUP_COS)
        .select("vec_a", "vec_b", _fr(F.col("cos"), 6).alias("cosine"))
        .orderBy("vec_a", "vec_b")
    )


def ann_lsh_hyperplane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN — the sub-quadratic scale path.

    Sign-random-projection with banding: 16 fixed hyperplanes → 16 sign
    bits → 4 tables of 4-bit signatures. Candidates are vectors sharing ANY
    table's signature with the query (equi-join on (table, signature) —
    exactly the minhash banding shape; multi-table OR is what keeps recall
    usable: P[candidate] = 1-(1-p^4)^4 vs the single-table p^16). Exact
    cosine re-ranks the deduplicated candidates (top-3). At 100 TB the
    candidate join is a plain shuffled hash join on uniform keys; there is
    no all-pairs stage anywhere.

    Signature bits are in-projection array folds (no shuffle) over exact
    decimal dots, so bucket membership and ranking are engine-identical —
    the oracle recomputes everything long-form in SQL and must agree
    bit-for-bit. Recall vs ann_brute_force is measured in tests."""
    vecs, tables = _lsh_tables(spark, sf_dir)
    qt = tables.filter(F.col("vec_id") < N_QUERIES).alias("qt")
    ct = tables.filter(F.col("vec_id") >= N_QUERIES).alias("ct")
    pairs = (
        qt.join(ct, (F.col("qt.tbl") == F.col("ct.tbl")) & (F.col("qt.sig") == F.col("ct.sig")))
        .select(
            F.col("qt.vec_id").alias("query_id"),
            F.col("ct.vec_id").alias("neighbor_id"),
        )
        .distinct()
    )
    q, c = vecs.alias("q"), vecs.alias("c")
    cos = _dot_dec(F.col("q.emb"), F.col("c.emb")) / (F.col("q.nrm") * F.col("c.nrm"))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        pairs.join(q, pairs.query_id == F.col("q.vec_id"))
        .join(c, pairs.neighbor_id == F.col("c.vec_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "rank", "neighbor_id", _fr(F.col("cos"), 6).alias("cosine"))
        .orderBy("query_id", "rank")
    )


FP_SCALE = 1_000_000  # fixed-point quantization: 6 decimal digits


def _lsh_tables_fixedpoint(spark: SparkSession, sf_dir: str):
    """Sign-random-projection signatures over FIXED-POINT int64 dots — the
    production LSH shape: quantize each component to 6-decimal micro-units
    (floor(x·1e6 + 0.5), engine-identical IEEE ops), then every plane dot
    is a pure int64 multiply-accumulate — exact, order-independent, and an
    order of magnitude cheaper than the DECIMAL(30,10) fold (no BigDecimal
    in the loop, plain long arithmetic inside codegen). Bucket membership
    is therefore still bit-reproducible and SQL-replayable; only the
    re-rank cosine needs decimals. Products are ≤ ~4e12 and 64-dim sums
    ≤ ~3e14 — comfortably inside int64."""
    per_table = N_PLANES // N_TABLES
    q6 = F.transform(F.col("emb"), lambda x: F.floor(x * FP_SCALE + 0.5).cast("long"))
    # repartition first — same single-split serialization as _lsh_tables
    base = (
        _emb_double(spark, sf_dir)
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .select(
            "vec_id",
            "emb",
            F.sqrt(_dot_dec(F.col("emb"), F.col("emb"))).alias("nrm"),
            q6.alias("q6"),
        )
    )
    def idot(p: list[float]):
        pint = _lit_arr([int(round(x * FP_SCALE)) for x in p])
        return F.aggregate(
            F.zip_with(F.col("q6"), pint, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
    # seeded-constant bank — build the sign expressions once per process
    # (the _lsh_tables rationale)
    bits = _const_cols(
        ("lsh_bits_fp", N_PLANES, EMB_DIMS, FP_SCALE),
        lambda: [F.when(idot(p) >= 0, "1").otherwise("0") for p in _hyperplanes()],
    )
    vecs = track_persisted(
        base.select(
            "vec_id",
            "emb",
            "nrm",
            *[
                F.concat(*bits[t * per_table : (t + 1) * per_table]).alias(f"sig{t}")
                for t in range(N_TABLES)
            ],
        ).persist()
    )
    tables = vecs.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("tbl"), F.col(f"sig{t}").alias("sig"))
                    for t in range(N_TABLES)
                ]
            )
        ).alias("b"),
    ).select("vec_id", "b.tbl", "b.sig")
    return vecs, tables


def ann_lsh_fixedpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN with fixed-point int64 signatures (see
    _lsh_tables_fixedpoint) — same banding/candidate/re-rank structure as
    ann_lsh_hyperplane, but the signature stage runs in plain long
    arithmetic. Fully oracle-checked: the quantization is part of the
    operator's definition, so DuckDB replays it exactly. This is the
    headline-bench variant; the decimal twin stays as the reference
    formulation.

    Geometry (16 planes × 4 tables) is the measured recall/cost frontier,
    not a default (r4 audit, sf0.001/sf0.01 rank-1 recall + sf0.1 n=5
    medians): narrowing buckets to 24/4 drops recall 4→3 of 10 with NO
    speedup (signature folds grow with planes faster than the ~4×
    candidate cut saves re-rank), 32/4 recalls 0/10, and 24/6 recovers
    recall only by re-inflating candidates past the current count. The
    r3 bench's 3.24 s reading was in-session contention — the clean
    median of this exact code is ~2.5-2.7 s; at scale the residual cost
    is per-stage latency that amortizes, not data volume."""
    vecs, tables = _lsh_tables_fixedpoint(spark, sf_dir)
    qt = tables.filter(F.col("vec_id") < N_QUERIES).alias("qt")
    ct = tables.filter(F.col("vec_id") >= N_QUERIES).alias("ct")
    pairs = (
        qt.join(ct, (F.col("qt.tbl") == F.col("ct.tbl")) & (F.col("qt.sig") == F.col("ct.sig")))
        .select(
            F.col("qt.vec_id").alias("query_id"),
            F.col("ct.vec_id").alias("neighbor_id"),
        )
        .distinct()
    )
    q, c = vecs.alias("q"), vecs.alias("c")
    cos = _dot_dec(F.col("q.emb"), F.col("c.emb")) / (F.col("q.nrm") * F.col("c.nrm"))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        pairs.join(q, pairs.query_id == F.col("q.vec_id"))
        .join(c, pairs.neighbor_id == F.col("c.vec_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "rank", "neighbor_id", _fr(F.col("cos"), 6).alias("cosine"))
        .orderBy("query_id", "rank")
    )


SEMDEDUP_TAU = 0.45  # intra-cluster prune bar — same near-dup cosine as
                     # embedding_near_dup, so the two surfaces agree on
                     # what "semantic duplicate" means


def _semdedup_cell_expr(cents: dict[int, list[int]]):
    """Nearest-centroid cell id as ONE map-side expression over the ``qarr``
    int64 array and its precomputed self-dot ``qq``: per cell,
    d² = Σq² − 2·Σq·c + Σc² (algebraically identical to Σ(q−c)², exact in
    int64 — Σq² is the shared ``qq`` column and Σc² folds to a literal),
    argmin via array_min over (d², cell) structs (lexicographic = d² asc
    then cell asc — the same tie-break as the oracle's row_number ORDER BY
    d2, cell). No crossJoin, no per-vector window shuffle: assignment is a
    pure projection the scan pipeline absorbs.

    The per-cell dot is a zip_with/aggregate fold, NOT an unrolled
    multiply-add chain: K cells × EMB_DIMS terms unrolled (~1000 expression
    nodes) exceeds janino's 64 KB method limit, and the failed compile +
    whole-stage fallback costs seconds PER STAGE (new literals each round =
    no codegen cache hit) — measured 12.5 s warm vs ~3 s with the compact
    fold, whose interpreted per-element cost (K×dims ops/row) is noise.
    The centroid data lives in nested-array literals consumed by ONE
    transform lambda (the _cell_entries_expr shape) rather than K unrolled
    arms — constant-size expression tree regardless of K, so per-round
    analysis cost stays flat too."""
    cs = sorted(cents)
    return _keyed_cols(
        "semdedup_cell", repr(cents),
        lambda: _semdedup_cell_from(
            _lit_arr(cs),
            _lit_arr([cents[c] for c in cs]),
            _lit_arr([sum(v * v for v in cents[c]) for c in cs]),
        ),
    )


def _semdedup_cell_from(ids, vals, sq):
    """`_semdedup_cell_expr` generalized to arbitrary id/value/Σc²
    expressions — literals for the driver-state path, 1-row-broadcast
    array columns for the two-rounds-per-materialization fold (the
    _cell_entries_from pattern on the int64 grid)."""
    entries = F.transform(
        ids,
        lambda cid, i: F.named_struct(
            F.lit("d2"),
            F.col("qq")
            - F.lit(2)
            * F.aggregate(
                F.zip_with(
                    F.col("qarr"), F.element_at(vals, i + 1), lambda x, y: x * y
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
            + F.element_at(sq, i + 1),
            F.lit("cell"),
            cid,
        ),
    )
    return F.array_min(entries)["cell"]


def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the embedding
    space with a deterministic QUANTIZED Lloyd quantizer (lowest-id init,
    KMEANS_ITERS rounds, over ALL vectors — dedup has no query/candidate
    split), then within each cluster prune every vector whose cosine to a
    LOWER-ID cluster-mate is >= SEMDEDUP_TAU. The paper keeps one exemplar
    per intra-cluster duplicate group; min-id is the deterministic exemplar
    choice (same survivorship convention as dedup_clusters).

    The WHOLE pipeline — training included — runs on the int64 fixed-point
    grid (floor(x·1e6 + 0.5), see _lsh_tables_fixedpoint): distances are
    exact integer Σ(q−c)², centroid updates re-quantize to the grid via
    floor(Σq/n + 0.5) (Σq an exact long sum, one IEEE divide — both well
    inside double-exact range), so every training step is engine-identical
    and the DuckDB oracle replays training, assignment AND pruning
    bit-for-bit. (r4 verdict #3: training previously re-ran a DECIMAL
    distance fold per vector × K per iteration inside one giant nested
    plan, re-computed per downstream reference — 11.4 s at sf0.1; the
    int64 definition with per-round materialization is the production
    arithmetic.)

    Driver state: only the K centroid rows cross the driver per round —
    bounded by K (= corpus/target-cell-size), the same centroids-as-driver-
    state shape as Spark MLlib's own KMeans; vectors never leave executors.
    Each Lloyd round is ONE map-side-combined K-group aggregation over the
    persisted flat table (assignment is a projection — see
    _semdedup_cell_expr), so training costs 2 linear passes, not nested
    crossJoin+window replans.

    Scale shape: the ONLY pair stage is an equi-join on cell, so total work
    is Σ_cell |cell|² — the paper's own complexity, bounded by construction
    when K grows with the corpus. Pair dots are UNROLLED 64-term
    flat-column long expressions, not array folds: HOF lambdas run
    interpreted per element, and on the intra-cell pairs at sf0.1 the
    flat-column form measured 2.4× faster (bit-identical counts); a plain
    long multiply-add chain stays inside whole-stage codegen."""
    import math

    q6 = F.transform(F.col("emb"), lambda x: F.floor(x * FP_SCALE + 0.5).cast("long"))
    idot = lambda a, b: F.aggregate(  # noqa: E731 — norm only: once per vector
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    # repartition before persist: a small-SF embeddings table is ONE
    # parquet split, so the persisted fp — and every stage pipelined on
    # it: the Lloyd aggregations AND the broadcast-hash pair join, whose
    # probe side keeps fp's partitioning — ran as ONE task (profiled
    # 1.2 s serial for the pair stage alone at sf0.1). Spread it across
    # cores; a no-op at 100 TB where the input is many splits (the
    # ann_product_quantization cand rationale, applied here).
    fp = track_persisted(
        _emb_double(spark, sf_dir)
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .select("vec_id", q6.alias("q6"))
        .select(
            "vec_id",
            F.col("q6").alias("qarr"),
            idot(F.col("q6"), F.col("q6")).alias("qq"),
            *_const_cols(
                "sem_fp_flat",
                lambda: [
                    F.element_at("q6", i + 1).alias(f"q{i}")
                    for i in range(EMB_DIMS)
                ],
            ),
        )
        .withColumn("fnrm", F.sqrt(F.col("qq").cast("double")))
        .persist()
    )
    init = sorted(fp.orderBy("vec_id").limit(K_CELLS).collect(), key=lambda r: r.vec_id)
    cents = {
        cell: [row[f"q{i}"] for i in range(EMB_DIMS)]
        for cell, row in enumerate(init)
    }
    def agg_by(cell_expr, src):
        return src.groupBy(cell_expr.alias("cell")).agg(
            F.count("*").alias("n"),
            *_const_cols(
                "sem_dim_sums",
                lambda: [F.sum(f"q{i}").alias(f"s{i}") for i in range(EMB_DIMS)],
            ),
        )

    def finish(rows):
        # floor(Σq/n + 0.5): Σq exact in int64 and < 2^53, so the Python
        # divide is the same IEEE double the oracle's CAST(... AS DOUBLE)/n
        # produces — centroids re-quantize identically on both engines.
        return {
            r["cell"]: [
                math.floor(r[f"s{i}"] / r["n"] + 0.5) for i in range(EMB_DIMS)
            ]
            for r in rows
        }

    # TWO rounds per materialization (r6 verdict #3, the _lloyd_two_rounds
    # fold on the int64 grid): round-1 centroids re-quantize IN-PLAN —
    # floor(CAST(Σq AS DOUBLE)/n + 0.5), the same correctly-rounded divide
    # as the driver's math.floor — collapse to a 1-row broadcast of
    # (ids, vals, Σc²) arrays, and round-2 assignment folds against those
    # columns; only round-2 partials cross the driver.
    def two_rounds(cents):
        cent1 = _const_cols(
            "sem_requant_cent",
            lambda: F.array(*[
                F.floor(
                    F.col(f"s{i}").cast("double") / F.col("n") + F.lit(0.5)
                ).cast("long")
                for i in range(EMB_DIMS)
            ]),
        )
        c1 = (
            agg_by(_semdedup_cell_expr(cents), fp)
            .select("cell", cent1.alias("cent"))
            .select(
                "cell",
                "cent",
                F.aggregate(
                    F.col("cent"),
                    F.lit(0).cast("long"),
                    lambda a, v: a + v * v,
                ).alias("csq"),
            )
            .groupBy()
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("cell", "cent", "csq"))
                ).alias("cc")
            )
            .select(
                F.transform("cc", lambda x: x["cell"]).alias("ids"),
                F.transform("cc", lambda x: x["cent"]).alias("vals"),
                F.transform("cc", lambda x: x["csq"]).alias("sqs"),
            )
        )
        rows = agg_by(
            _semdedup_cell_from(F.col("ids"), F.col("vals"), F.col("sqs")),
            fp.crossJoin(F.broadcast(c1)),
        ).collect()
        return finish(rows)

    for _ in range(KMEANS_ITERS // 2):
        cents = two_rounds(cents)
    if KMEANS_ITERS % 2:
        cents = finish(agg_by(_semdedup_cell_expr(cents), fp).collect())
    side = fp.select(
        "vec_id",
        "fnrm",
        *[f"q{i}" for i in range(EMB_DIMS)],
        _semdedup_cell_expr(cents).alias("cell"),
    )
    assigned = side.select("vec_id", "cell")
    a, b = side.alias("a"), side.alias("b")

    def _pair_cos():
        dot = None
        for i in range(EMB_DIMS):
            term = F.col(f"a.q{i}") * F.col(f"b.q{i}")
            dot = term if dot is None else dot + term
        return dot / (F.col("a.fnrm") * F.col("b.fnrm"))

    cos = _const_cols("sem_pair_cos", _pair_cos)
    dups = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= SEMDEDUP_TAU)
        .groupBy(F.col("b.vec_id").alias("vec_id"))
        .agg(F.min(F.col("a.vec_id")).alias("pruned_by"))
    )
    return (
        assigned.join(dups, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            F.col("pruned_by").isNull().cast("int").alias("is_kept"),
            "pruned_by",
        )
        .orderBy("vec_id")
    )


def _sql_planes_values() -> str:
    rows = []
    for pid, plane in enumerate(_hyperplanes()):
        for dim, val in enumerate(plane, start=1):
            rows.append(f"({pid},{dim},{val!r})")
    return ",".join(rows)


_SQL_LONG = """
    SELECT vec_id, i AS dim, CAST(emb[i] AS DOUBLE) AS val
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
                 unnest(range(1, len(embedding) + 1)) AS i
          FROM embeddings)
"""

def _sql_ann_lsh() -> str:
    return f"""
        WITH long AS ({_SQL_LONG}),
        planes(pid, dim, val) AS (VALUES {_sql_planes_values()}),
        dots AS (
            SELECT l.vec_id, p.pid,
                   CAST(sum(CAST(l.val * p.val AS DECIMAL(30,10))) AS DOUBLE) AS dot
            FROM long l JOIN planes p ON l.dim = p.dim
            GROUP BY 1, 2
        ),
        sigs AS (
            SELECT vec_id, pid // {N_PLANES // N_TABLES} AS tbl,
                   string_agg(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, '' ORDER BY pid) AS sig
            FROM dots GROUP BY 1, 2
        ),
        norms AS (
            SELECT vec_id, sqrt(CAST(sum(CAST(val*val AS DECIMAL(30,10))) AS DOUBLE)) AS nrm
            FROM long GROUP BY 1
        ),
        pairs AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
            FROM sigs q JOIN sigs c ON q.tbl = c.tbl AND q.sig = c.sig
            WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
        ),
        pdots AS (
            SELECT p.query_id, p.neighbor_id,
                   CAST(sum(CAST(a.val * b.val AS DECIMAL(30,10))) AS DOUBLE) AS dot
            FROM pairs p
            JOIN long a ON a.vec_id = p.query_id
            JOIN long b ON b.vec_id = p.neighbor_id AND a.dim = b.dim
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT query_id, neighbor_id,
                   dot / (nq.nrm * nc.nrm) AS cos,
                   CAST(row_number() OVER (PARTITION BY query_id
                                           ORDER BY dot / (nq.nrm * nc.nrm) DESC, neighbor_id) AS INT) AS rank
            FROM pdots
            JOIN norms nq ON query_id = nq.vec_id
            JOIN norms nc ON neighbor_id = nc.vec_id
        )
        SELECT query_id, rank, neighbor_id,
               floor(cos * 1000000 + 0.5) / 1000000 AS cosine
        FROM ranked WHERE rank <= 3
        ORDER BY query_id, rank
    """


def _sql_iplanes_values() -> str:
    rows = []
    for pid, plane in enumerate(_hyperplanes()):
        for dim, val in enumerate(plane, start=1):
            rows.append(f"({pid},{dim},{int(round(val * FP_SCALE))})")
    return ",".join(rows)


def _sql_ann_lsh_fixedpoint() -> str:
    return f"""
        WITH long AS ({_SQL_LONG}),
        q6 AS (
            SELECT vec_id, dim,
                   CAST(floor(val * {FP_SCALE} + 0.5) AS BIGINT) AS v6
            FROM long
        ),
        iplanes(pid, dim, p6) AS (VALUES {_sql_iplanes_values()}),
        idots AS (
            SELECT l.vec_id, p.pid, sum(l.v6 * p.p6) AS dot
            FROM q6 l JOIN iplanes p ON l.dim = p.dim
            GROUP BY 1, 2
        ),
        sigs AS (
            SELECT vec_id, pid // {N_PLANES // N_TABLES} AS tbl,
                   string_agg(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, '' ORDER BY pid) AS sig
            FROM idots GROUP BY 1, 2
        ),
        norms AS (
            SELECT vec_id, sqrt(CAST(sum(CAST(val*val AS DECIMAL(30,10))) AS DOUBLE)) AS nrm
            FROM long GROUP BY 1
        ),
        pairs AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
            FROM sigs q JOIN sigs c ON q.tbl = c.tbl AND q.sig = c.sig
            WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
        ),
        pdots AS (
            SELECT p.query_id, p.neighbor_id,
                   CAST(sum(CAST(a.val * b.val AS DECIMAL(30,10))) AS DOUBLE) AS dot
            FROM pairs p
            JOIN long a ON a.vec_id = p.query_id
            JOIN long b ON b.vec_id = p.neighbor_id AND a.dim = b.dim
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT query_id, neighbor_id,
                   dot / (nq.nrm * nc.nrm) AS cos,
                   CAST(row_number() OVER (PARTITION BY query_id
                                           ORDER BY dot / (nq.nrm * nc.nrm) DESC, neighbor_id) AS INT) AS rank
            FROM pdots
            JOIN norms nq ON query_id = nq.vec_id
            JOIN norms nc ON neighbor_id = nc.vec_id
        )
        SELECT query_id, rank, neighbor_id,
               floor(cos * 1000000 + 0.5) / 1000000 AS cosine
        FROM ranked WHERE rank <= 3
        ORDER BY query_id, rank
    """


def _sql_near_dup_lsh() -> str:
    from weather_database_system_spark.operators.dedup import NEAR_DUP_COS

    return f"""
        WITH long AS ({_SQL_LONG}),
        planes(pid, dim, val) AS (VALUES {_sql_planes_values()}),
        dots AS (
            SELECT l.vec_id, p.pid,
                   CAST(sum(CAST(l.val * p.val AS DECIMAL(30,10))) AS DOUBLE) AS dot
            FROM long l JOIN planes p ON l.dim = p.dim
            GROUP BY 1, 2
        ),
        sigs AS (
            SELECT vec_id, pid // {N_PLANES // N_TABLES} AS tbl,
                   string_agg(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, '' ORDER BY pid) AS sig
            FROM dots GROUP BY 1, 2
        ),
        norms AS (
            SELECT vec_id, sqrt(CAST(sum(CAST(val*val AS DECIMAL(30,10))) AS DOUBLE)) AS nrm
            FROM long GROUP BY 1
        ),
        pairs AS (
            SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM sigs a JOIN sigs b
              ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id
        ),
        pdots AS (
            SELECT p.vec_a, p.vec_b,
                   CAST(sum(CAST(x.val * y.val AS DECIMAL(30,10))) AS DOUBLE) AS dot
            FROM pairs p
            JOIN long x ON x.vec_id = p.vec_a
            JOIN long y ON y.vec_id = p.vec_b AND x.dim = y.dim
            GROUP BY 1, 2
        )
        SELECT vec_a, vec_b,
               floor(dot / (na.nrm * nb.nrm) * 1000000 + 0.5) / 1000000 AS cosine
        FROM pdots
        JOIN norms na ON vec_a = na.vec_id
        JOIN norms nb ON vec_b = nb.vec_id
        WHERE dot / (na.nrm * nb.nrm) >= {NEAR_DUP_COS}
        ORDER BY vec_a, vec_b
    """


def _sql_ivf_sqrt_k() -> str:
    """The √N cell count as a DuckDB scalar subquery over the candidate
    CTE — the SQL twin of ``ivf_cell_count``. floor(x + 0.5) equals
    Python's round() here because √integer is never an exact half
    (n = (k+0.5)² = k²+k+0.25 has no integer solution), so the dynamic-K
    oracle replays the sizing rule bit-exactly at every SF."""
    return (
        f"(SELECT greatest({IVF_K_MIN}, "
        f"CAST(floor({IVF_CELL_COEF!r} * sqrt(count(DISTINCT vec_id)) + 0.5) "
        f"AS INT)) FROM cand)"
    )


def _sql_ivf_train_prefix(nprobe: int = 1, k_sql: str | None = None) -> str:
    """WITH-body replaying the ENTIRE deterministic k-means training,
    long-form, Lloyd rounds unrolled as CTE pairs (dist_i/assign_i →
    cent_{i+1}), through the final assignment (``fassign``) and query
    routing (``qbest``). ``nprobe`` widens the routing CTE from rk = 1
    to rk <= nprobe; ``k_sql`` overrides the pinned K_CELLS init size
    with an arbitrary SQL expression (``_sql_ivf_sqrt_k`` — the √N
    deployment geometry, r17). The IVF search oracle appends its
    re-rank tail; the IVF+PQ oracle appends a cell-census tail."""
    k = k_sql if k_sql is not None else str(K_CELLS)
    iters = []
    for i in range(KMEANS_ITERS):
        iters.append(f"""
        dist{i} AS (
            SELECT v.vec_id, c.cell,
                   sum(CAST((v.val - c.cval) * (v.val - c.cval) AS DECIMAL(30,10))) AS d2
            FROM cand v JOIN cent{i} c ON v.dim = c.dim
            GROUP BY 1, 2
        ),
        assign{i} AS (
            SELECT vec_id, cell FROM (
                SELECT vec_id, cell,
                       row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rk
                FROM dist{i}
            ) WHERE rk = 1
        ),
        cent{i + 1} AS (
            SELECT a.cell, v.dim,
                   CAST(sum(CAST(v.val AS DECIMAL(30,10))) AS DOUBLE) / count(v.val) AS cval
            FROM assign{i} a JOIN cand v ON a.vec_id = v.vec_id
            GROUP BY 1, 2
        )""")
    last = KMEANS_ITERS
    return f"""
        WITH long AS ({_SQL_LONG}),
        cand AS (SELECT * FROM long WHERE vec_id >= {N_QUERIES}),
        q AS (SELECT * FROM long WHERE vec_id < {N_QUERIES}),
        init AS (
            SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
            FROM (SELECT DISTINCT vec_id FROM cand ORDER BY vec_id LIMIT {k})
        ),
        cent0 AS (
            SELECT i.cell, v.dim, v.val AS cval
            FROM init i JOIN cand v ON i.vec_id = v.vec_id
        ),{",".join(iters)},
        fdist AS (
            SELECT v.vec_id, c.cell,
                   sum(CAST((v.val - c.cval) * (v.val - c.cval) AS DECIMAL(30,10))) AS d2
            FROM cand v JOIN cent{last} c ON v.dim = c.dim
            GROUP BY 1, 2
        ),
        fassign AS (
            SELECT vec_id, cell FROM (
                SELECT vec_id, cell,
                       row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rk
                FROM fdist
            ) WHERE rk = 1
        ),
        qdist AS (
            SELECT v.vec_id, c.cell,
                   sum(CAST((v.val - c.cval) * (v.val - c.cval) AS DECIMAL(30,10))) AS d2
            FROM q v JOIN cent{last} c ON v.dim = c.dim
            GROUP BY 1, 2
        ),
        qbest AS (
            SELECT vec_id AS query_id, cell AS best_cell FROM (
                SELECT vec_id, cell,
                       row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rk
                FROM qdist
            ) WHERE rk <= {nprobe}
        )"""


def _sql_ann_ivf_kmeans(
    nprobe: int = 1, k_sql: str | None = None, extra_cols: str = ""
) -> str:
    """DuckDB replay of IVF search end to end: the full Lloyd training
    prefix (``_sql_ivf_train_prefix``) plus the exact-cosine re-rank of
    the probed cells. ``extra_cols`` appends pinned-TRUE claim literals
    to the final projection (sized_ok / snapshot_equals_live entries)."""
    return f"""{_sql_ivf_train_prefix(nprobe, k_sql)},
        norms AS (
            SELECT vec_id, sqrt(CAST(sum(CAST(val*val AS DECIMAL(30,10))) AS DOUBLE)) AS nrm
            FROM long GROUP BY 1
        ),
        pdots AS (
            SELECT b.query_id, {"b.best_cell," if nprobe == 1 else ""}
                   m.vec_id AS neighbor_id,
                   CAST(sum(CAST(x.val * y.val AS DECIMAL(30,10))) AS DOUBLE) AS dot
            FROM qbest b
            JOIN fassign m ON m.cell = b.best_cell
            JOIN q x ON x.vec_id = b.query_id
            JOIN cand y ON y.vec_id = m.vec_id AND x.dim = y.dim
            GROUP BY {"1, 2, 3" if nprobe == 1 else "1, 2"}
        ),
        ranked AS (
            SELECT query_id, {"best_cell," if nprobe == 1 else ""} neighbor_id,
                   dot / (nq.nrm * nc.nrm) AS cos,
                   CAST(row_number() OVER (PARTITION BY query_id
                                           ORDER BY dot / (nq.nrm * nc.nrm) DESC, neighbor_id) AS INT) AS rank
            FROM pdots
            JOIN norms nq ON query_id = nq.vec_id
            JOIN norms nc ON neighbor_id = nc.vec_id
        )
        SELECT query_id, {"best_cell," if nprobe == 1 else ""} rank, neighbor_id,
               floor(cos * 1000000 + 0.5) / 1000000 AS cosine{extra_cols}
        FROM ranked WHERE rank <= 3
        ORDER BY query_id, rank
    """


def _sql_ann_ivfpq(nprobe: int = 1) -> str:
    """DuckDB replay of the IVF+PQ registry spine: the √N-sized Lloyd
    training prefix (dynamic K in SQL) routes every query and yields the
    final assignment; the tail is a per-cell member census — n_results
    is min(PQ_TOPK, |probed cell(s)|) because ADC scores every distinct
    member of the probed cell(s) (each vector's M codes all hit the
    query's M×K table). ``nprobe`` widens the census from the single
    best cell (with best_cell in the spine) to the distinct-member
    UNION of the probed cells. The float-ADC interior is not
    SQL-replayable (same as the PQ entries — M coupled Lloyd loops +
    float table sums); its claims replay as pinned-TRUE literals and
    the numpy replay pytests carry the exact neighbor-set check."""
    if nprobe == 1:
        return f"""{_sql_ivf_train_prefix(nprobe=1, k_sql=_sql_ivf_sqrt_k())},
        cellsz AS (
            SELECT cell, count(DISTINCT vec_id) AS n FROM fassign GROUP BY 1
        )
        SELECT b.query_id, b.best_cell,
               CAST(least({PQ_TOPK}, coalesce(sz.n, 0)) AS INT) AS n_results,
               CAST(1 AS INT) AS adc_err_ok,
               CAST(1 AS INT) AS cells_ok
        FROM qbest b LEFT JOIN cellsz sz ON b.best_cell = sz.cell
        ORDER BY query_id
    """
    return f"""{_sql_ivf_train_prefix(nprobe=nprobe, k_sql=_sql_ivf_sqrt_k())},
        members AS (
            SELECT DISTINCT b.query_id, m.vec_id
            FROM qbest b JOIN fassign m ON m.cell = b.best_cell
        ),
        census AS (
            SELECT query_id, count(*) AS n FROM members GROUP BY 1
        )
        SELECT qq.vec_id AS query_id,
               CAST(least({PQ_TOPK}, coalesce(c.n, 0)) AS INT) AS n_results,
               CAST(1 AS INT) AS adc_err_ok,
               CAST(1 AS INT) AS cells_ok
        FROM (SELECT DISTINCT vec_id FROM q) qq
        LEFT JOIN census c ON qq.vec_id = c.query_id
        ORDER BY query_id
    """


def _sql_semdedup() -> str:
    """DuckDB replay of semdedup_prune end-to-end: the unrolled QUANTIZED
    Lloyd loop (int64 grid distances, floor(Σq/n + 0.5) centroid
    re-quantization — over ALL vectors, no query/candidate split), final
    assignment, int64 fixed-point pair cosines, and the min-lower-id prune
    rule. Every training step is exact integer or one IEEE divide, so the
    replay is bit-for-bit."""
    iters = []
    for i in range(KMEANS_ITERS):
        iters.append(f"""
        dist{i} AS (
            SELECT v.vec_id, c.cell,
                   sum((v.qv - c.cq) * (v.qv - c.cq)) AS d2
            FROM q6 v JOIN cent{i} c ON v.dim = c.dim
            GROUP BY 1, 2
        ),
        assign{i} AS (
            SELECT vec_id, cell FROM (
                SELECT vec_id, cell,
                       row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rk
                FROM dist{i}
            ) WHERE rk = 1
        ),
        cent{i + 1} AS (
            SELECT a.cell, v.dim,
                   CAST(floor(CAST(sum(v.qv) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS cq
            FROM assign{i} a JOIN q6 v ON a.vec_id = v.vec_id
            GROUP BY 1, 2
        )""")
    last = KMEANS_ITERS
    return f"""
        WITH long AS ({_SQL_LONG}),
        q6 AS (
            SELECT vec_id, dim,
                   CAST(floor(val * {FP_SCALE} + 0.5) AS BIGINT) AS qv
            FROM long
        ),
        init AS (
            SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
            FROM (SELECT DISTINCT vec_id FROM q6 ORDER BY vec_id LIMIT {K_CELLS})
        ),
        cent0 AS (
            SELECT i.cell, v.dim, v.qv AS cq
            FROM init i JOIN q6 v ON i.vec_id = v.vec_id
        ),{",".join(iters)},
        fdist AS (
            SELECT v.vec_id, c.cell,
                   sum((v.qv - c.cq) * (v.qv - c.cq)) AS d2
            FROM q6 v JOIN cent{last} c ON v.dim = c.dim
            GROUP BY 1, 2
        ),
        fassign AS (
            SELECT vec_id, cell FROM (
                SELECT vec_id, cell,
                       row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rk
                FROM fdist
            ) WHERE rk = 1
        ),
        fnrm AS (
            SELECT vec_id, sqrt(CAST(sum(qv * qv) AS DOUBLE)) AS fnrm
            FROM q6 GROUP BY 1
        ),
        cpairs AS (
            SELECT a.vec_id AS va, b.vec_id AS vb
            FROM fassign a JOIN fassign b
              ON a.cell = b.cell AND a.vec_id < b.vec_id
        ),
        pdots AS (
            SELECT p.va, p.vb, CAST(sum(x.qv * y.qv) AS DOUBLE) AS idot
            FROM cpairs p
            JOIN q6 x ON x.vec_id = p.va
            JOIN q6 y ON y.vec_id = p.vb AND x.dim = y.dim
            GROUP BY 1, 2
        ),
        dups AS (
            SELECT d.vb AS vec_id, min(d.va) AS pruned_by
            FROM pdots d
            JOIN fnrm na ON d.va = na.vec_id
            JOIN fnrm nb ON d.vb = nb.vec_id
            WHERE d.idot / (na.fnrm * nb.fnrm) >= {SEMDEDUP_TAU}
            GROUP BY 1
        )
        SELECT f.vec_id, f.cell,
               CAST(d.pruned_by IS NULL AS INT) AS is_kept,
               d.pruned_by
        FROM fassign f LEFT JOIN dups d ON f.vec_id = d.vec_id
        ORDER BY f.vec_id
    """


ORACLE: dict[str, str] = {
    "ann_lsh_hyperplane": _sql_ann_lsh(),
    "semdedup_prune": _sql_semdedup(),
    "ann_lsh_fixedpoint": _sql_ann_lsh_fixedpoint(),
    "ann_ivf_kmeans": _sql_ann_ivf_kmeans(),
    "ann_ivf_kmeans_nprobe": _sql_ann_ivf_kmeans(nprobe=NPROBE),
    # the prebuilt-index deployment form answers the SAME question from the
    # stored centroid/assignment tables; the identical full-Lloyd-replay
    # oracle proves the index round-trip (train -> parquet -> route ->
    # probe -> re-rank) loses nothing
    "ann_ivf_prebuilt": _sql_ann_ivf_kmeans(),
    "ann_ivf_prebuilt_nprobe": _sql_ann_ivf_kmeans(nprobe=NPROBE),
    # the two-generation (bulk build + incremental append) index answers
    # bit-identically to the one-shot build — same full-Lloyd replay
    "ann_ivf_prebuilt_appended": _sql_ann_ivf_kmeans(),
    # the √N-sized deployment geometry under the full value/hash gate:
    # the SAME Lloyd replay with K computed dynamically in SQL (r17).
    # sized_ok is COMPUTED from the replayed training (ADVICE r17 #3),
    # not pinned: surviving final centroids vs the SQL sizing rule —
    # the exact twin of the engine's len(stored centroids) ==
    # ivf_cell_count(stored assignment rows), so an emptied Lloyd cell
    # reads 0 on both sides instead of failing as a hash mismatch
    "ann_ivf_sqrt_prebuilt": _sql_ann_ivf_kmeans(
        k_sql=_sql_ivf_sqrt_k(),
        extra_cols=f""",
               CAST((SELECT count(DISTINCT cell) FROM cent{KMEANS_ITERS})
                    = {_sql_ivf_sqrt_k()} AS INT) AS sized_ok""",
    ),
    # the retained grace generation answers identically to live after a
    # row-preserving compaction — same replay + the claim pinned TRUE
    "ann_ivf_prebuilt_snapshot": _sql_ann_ivf_kmeans(
        extra_cols=""",
               CAST(1 AS INT) AS snapshot_equals_live""",
    ),
    # IVF+PQ composition: exact routing/census spine from the dynamic-K
    # replay; float-ADC claims pinned TRUE (numpy replay pytest carries
    # the exact neighbor-set check, as for the PQ entries)
    "ann_ivfpq_prebuilt": _sql_ann_ivfpq(),
    "ann_ivfpq_prebuilt_nprobe": _sql_ann_ivfpq(nprobe=NPROBE),
    # residual encoding changes what the codes MEAN, not which vectors
    # sit in which cell — routing and the member census are identical,
    # so the same dynamic-K spine oracle replays the residual form
    "ann_ivfpq_residual_prebuilt": _sql_ann_ivfpq(),
    # snapshot reads of the retained generation (r17): row-preserving
    # compaction ⇒ the family oracle + the claim pinned TRUE
    "ann_ivfpq_prebuilt_snapshot": (
        "SELECT *, 1 AS snapshot_equals_live FROM ("
        + _sql_ann_ivfpq()
        + ") ivfpq_snapshot_base"
    ),
    "embedding_near_dup_lsh": _sql_near_dup_lsh(),
    "ann_brute_force": f"""
        WITH long AS ({_SQL_LONG}),
        norms AS (
            SELECT vec_id, sqrt(CAST(sum(CAST(val*val AS DECIMAL(30,10))) AS DOUBLE)) AS nrm
            FROM long GROUP BY 1
        ),
        dots AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   CAST(sum(CAST(q.val * c.val AS DECIMAL(30,10))) AS DOUBLE) AS dot
            FROM long q JOIN long c ON q.dim = c.dim
            WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
            GROUP BY 1, 2
        ),
        scored AS (
            SELECT query_id, neighbor_id,
                   dot / (nq.nrm * nc.nrm) AS cos
            FROM dots
            JOIN norms nq ON query_id = nq.vec_id
            JOIN norms nc ON neighbor_id = nc.vec_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cos,
                   CAST(row_number() OVER (PARTITION BY query_id
                                           ORDER BY cos DESC, neighbor_id) AS INT) AS rank
            FROM scored
        )
        SELECT query_id, rank, neighbor_id,
               floor(cos * 1000000 + 0.5) / 1000000 AS cosine
        FROM ranked WHERE rank <= {TOP_K}
        ORDER BY query_id, rank
    """,
    "ann_ivf_label": f"""
        WITH long AS (
            SELECT l.vec_id, l.dim, l.val, e.label
            FROM ({_SQL_LONG}) l JOIN embeddings e ON l.vec_id = e.vec_id
        ),
        cand AS (SELECT * FROM long WHERE vec_id >= {N_QUERIES}),
        q AS (SELECT * FROM long WHERE vec_id < {N_QUERIES}),
        centroids AS (
            SELECT label, dim,
                   CAST(sum(CAST(val AS DECIMAL(30,10))) AS DOUBLE) / count(val) AS cval
            FROM cand GROUP BY 1, 2
        ),
        cnorm AS (
            SELECT label, sqrt(CAST(sum(CAST(cval*cval AS DECIMAL(30,10))) AS DOUBLE)) AS cnrm
            FROM centroids GROUP BY 1
        ),
        qnorm AS (
            SELECT vec_id, sqrt(CAST(sum(CAST(val*val AS DECIMAL(30,10))) AS DOUBLE)) AS nrm
            FROM q GROUP BY 1
        ),
        qc AS (
            SELECT q.vec_id AS query_id, ce.label,
                   CAST(sum(CAST(q.val * ce.cval AS DECIMAL(30,10))) AS DOUBLE) AS dot
            FROM q JOIN centroids ce ON q.dim = ce.dim
            GROUP BY 1, 2
        ),
        qc_cos AS (
            SELECT query_id, label, dot / (qn.nrm * cn.cnrm) AS ccos
            FROM qc JOIN qnorm qn ON query_id = qn.vec_id
                    JOIN cnorm cn USING (label)
        ),
        best AS (
            SELECT query_id, label AS best_label FROM (
                SELECT query_id, label,
                       row_number() OVER (PARTITION BY query_id ORDER BY ccos DESC, label) AS rk
                FROM qc_cos
            ) WHERE rk = 1
        ),
        dots AS (
            SELECT b.query_id, b.best_label, c.vec_id AS neighbor_id,
                   CAST(sum(CAST(q.val * c.val AS DECIMAL(30,10))) AS DOUBLE) AS dot
            FROM q
            JOIN best b ON q.vec_id = b.query_id
            JOIN cand c ON c.label = b.best_label AND q.dim = c.dim
            GROUP BY 1, 2, 3
        ),
        nall AS (
            SELECT vec_id, sqrt(CAST(sum(CAST(val*val AS DECIMAL(30,10))) AS DOUBLE)) AS nrm
            FROM ({_SQL_LONG}) GROUP BY 1
        ),
        ranked AS (
            SELECT query_id, best_label, neighbor_id,
                   dot / (qn.nrm * nc.nrm) AS cos,
                   CAST(row_number() OVER (PARTITION BY query_id
                                           ORDER BY dot / (qn.nrm * nc.nrm) DESC, neighbor_id) AS INT) AS rank
            FROM dots
            JOIN qnorm qn ON query_id = qn.vec_id
            JOIN nall nc ON neighbor_id = nc.vec_id
        )
        SELECT query_id, best_label, rank, neighbor_id,
               floor(cos * 1000000 + 0.5) / 1000000 AS cosine
        FROM ranked WHERE rank <= 3
        ORDER BY query_id, rank
    """,
}

# ann_bruteforce_pandas computes the SAME exact top-k as ann_brute_force
# — only the arithmetic path differs (numpy float64 matmul vs the decimal
# fold). Two pytest pins make the share an honest hash check rather
# than a bet on this corpus (r8/r9; previously rows-only):
#   1. rank order — MINIMUM SCORE GAP between consecutive ranked
#      neighbors through k+1 (> 2e-6, far above float noise, so both
#      engines order identically);
#   2. value rounding — every EMITTED top-k cosine is ≥1e-11 away from
#      the nearest floor(x·1e6+0.5) boundary, so the ≤~1e-14 float-
#      association gap cannot flip the 6-dp rounding across engines
#      (r9; previously asserted by assumption, not measurement).
ORACLE["ann_bruteforce_pandas"] = ORACLE["ann_brute_force"]

ORACLE["ann_product_quantization"] = f"""
    SELECT vec_id AS query_id,
           CAST({PQ_TOPK} AS INT) AS n_results,
           CAST(1 AS INT) AS adc_err_ok,
           CAST(1 AS INT) AS pq_gain_ok
    FROM embeddings WHERE vec_id < {N_QUERIES}
    ORDER BY query_id
"""
# the stored-index form answers bit-identically (same deterministic
# training on the full candidate sample, pure-function encoding), so the
# same spine+claims oracle replays it
ORACLE["ann_pq_prebuilt"] = ORACLE["ann_product_quantization"]
# snapshot read of the retained generation (r17): row-preserving
# compaction ⇒ the same spine oracle + the claim pinned TRUE
ORACLE["ann_pq_prebuilt_snapshot"] = (
    "SELECT *, 1 AS snapshot_equals_live FROM ("
    + ORACLE["ann_product_quantization"]
    + ") pq_snapshot_base"
)

QUERIES = {
    "ann_brute_force": ann_brute_force,
    "ann_ivf_label": ann_ivf_label,
    "ann_ivf_kmeans": ann_ivf_kmeans,
    "ann_ivf_kmeans_nprobe": ann_ivf_kmeans_nprobe,
    "ann_ivf_prebuilt": ann_ivf_prebuilt,
    "ann_ivf_prebuilt_nprobe": ann_ivf_prebuilt_nprobe,
    "ann_ivf_prebuilt_appended": ann_ivf_prebuilt_appended,
    "ann_ivf_sqrt_prebuilt": ann_ivf_sqrt_prebuilt,
    "ann_ivf_prebuilt_snapshot": ann_ivf_prebuilt_snapshot,
    "ann_ivfpq_prebuilt": ann_ivfpq_prebuilt,
    "ann_ivfpq_prebuilt_nprobe": ann_ivfpq_prebuilt_nprobe,
    "ann_ivfpq_residual_prebuilt": ann_ivfpq_residual_prebuilt,
    # registry surface for the float-ADC path: replayable per-query spine
    # + pinned quantization-error / gain claims; the raw PQ plan stays
    # importable (bench would time it; numpy replay pytest pins it)
    "ann_product_quantization": ann_product_quantization_checked,
    "ann_pq_prebuilt": ann_pq_prebuilt,
    "ann_pq_prebuilt_snapshot": ann_pq_prebuilt_snapshot,
    "ann_ivfpq_prebuilt_snapshot": ann_ivfpq_prebuilt_snapshot,
    "semdedup_prune": semdedup_prune,
    "ann_bruteforce_pandas": ann_bruteforce_pandas,  # oracle shared w/ brute_force
    "ann_lsh_hyperplane": ann_lsh_hyperplane,
    "ann_lsh_fixedpoint": ann_lsh_fixedpoint,
    "embedding_near_dup_lsh": embedding_near_dup_lsh,
}
