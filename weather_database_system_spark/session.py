"""SparkSession bootstrap.

One place to configure the session so tests, bench, and the driver contract
all run with identical semantics:

- ``spark.sql.session.timeZone=UTC``: the DuckDB oracle compares naive
  timestamps; Spark must render in UTC (reference pins a timezone per fetch at
  fetchStocktonWeather.js:35 — we pin UTC engine-wide and treat observation
  timestamps as naive local time).
- AQE on: runtime coalescing + skew-join handling is the 100 TB-scale answer
  to skewed group/join keys; at local[32] it also right-sizes tiny shuffles.
- shuffle.partitions sized to cores for local mode (the 200 default
  over-parallelizes small data and under-parallelizes 100 TB; on a real
  cluster this is set per-job or left to AQE's coalescing).
- Arrow enabled: every pandas interchange (toPandas, pandas_udf,
  applyInPandas) rides vectorized Arrow batches.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "weather_database_system_spark",
              cpus: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Local-mode knobs are chosen so the same logical plans scale to a real
    cluster: nothing here hand-schedules what Catalyst/AQE would do.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.ts is parquet TIMESTAMP(NANOS); the vectorized reader rejects
        # it, so the engine reads raw nanos and converts (sources/star.py).
        # Set at build time so ensure_engine_confs never mutates mid-flight.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # ts written as TIMESTAMP(MICROS, isAdjustedToUTC=false) must read as
        # session-tz TIMESTAMP, not TIMESTAMP_NTZ (watermarks need LTZ).
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# --- persisted-intermediate lifecycle -------------------------------------
#
# Operators that persist() an intermediate (minhash signatures, shingle
# inverted index, LSH signature table) register it here. The persist is load-
# bearing WHILE the returned DataFrame is being consumed — unpersisting
# inside the operator would defeat it — so the contract is: the CALLER that
# owns the terminal action (bench loop, parity test, driver sweep) calls
# release_persisted() between queries. A long-lived session that never calls
# it degrades gracefully (MEMORY_AND_DISK evicts under pressure) but a
# registry-wide sweep should not accumulate dead cached blocks.

def scratch_path(kind: str, sf_dir: str) -> str:
    """Deterministic scratch location for build-once artifacts (posting
    indexes, IVF assignments): keyed by the source dir so repeated runs
    OVERWRITE their own slot instead of accumulating, unique per (kind,
    source) so families never collide. Defaults to the repo-local
    spark-warehouse area; deployments point WDSS_SCRATCH_DIR at a real
    scratch volume."""
    import hashlib

    scratch = os.environ.get(
        "WDSS_SCRATCH_DIR",
        os.path.normpath(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "..",
                "spark-warehouse",
            )
        ),
    )
    tag = hashlib.md5(sf_dir.encode("utf-8")).hexdigest()[:12]
    return os.path.join(scratch, f"{kind}_{tag}")


_TRACKED: list = []


def track_persisted(df):
    """Register a persist()ed DataFrame for later bulk release; returns df."""
    _TRACKED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every tracked intermediate (blocking=False). Returns the
    number released. Safe to call at any time; consuming a DataFrame whose
    input was released just recomputes."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped
    return n


# --- build-once index lifecycle --------------------------------------------
#
# Stored indexes (trigram postings, IVF centroids+assignments) are built
# ONCE per (source, config) and then shared: by the two registry variants
# that probe the same index, by repeated sweeps in one process, and by
# fresh sessions (the cold-read pytest). The marker file records WHAT the
# index was built from; a matching marker means "reuse", anything else
# means "rebuild". This removes the r14 hazard (ADVICE r14 #2) where a
# second build-with-overwrite deleted parquet files under the first
# call's still-lazy plan — a matching marker skips the rewrite entirely.

INDEX_MARKER = "_WDSS_INDEX_META.json"


def source_signature(sf_dir: str, table: str) -> dict:
    """Cheap identity of a source table: per-file (relpath, size, mtime_ns)
    under ``{sf_dir}/{table}.parquet`` (file or directory). Any rewrite of
    the source changes the signature and invalidates dependent indexes —
    a stat walk, never a data scan."""
    root = os.path.join(sf_dir, f"{table}.parquet")
    files = []
    if os.path.isdir(root):
        for dirpath, _, names in os.walk(root):
            for n in sorted(names):
                p = os.path.join(dirpath, n)
                st = os.stat(p)
                files.append([os.path.relpath(p, root), st.st_size, st.st_mtime_ns])
    else:
        st = os.stat(root)
        files.append([table, st.st_size, st.st_mtime_ns])
    return {"table": table, "files": files}


def index_is_current(path: str, meta: dict) -> bool:
    """True iff ``path`` holds an index whose marker equals ``meta``
    exactly (algo version, config constants, source signature)."""
    import json

    marker = os.path.join(path, INDEX_MARKER)
    try:
        with open(marker, encoding="utf-8") as fh:
            return json.load(fh) == meta
    except (OSError, ValueError):
        return False


def write_index_marker(path: str, meta: dict) -> None:
    """Stamp a freshly built index as current (write-temp-then-rename so a
    crash mid-write never leaves a plausible half marker)."""
    import json

    marker = os.path.join(path, INDEX_MARKER)
    tmp = marker + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(meta, fh, sort_keys=True)
    os.replace(tmp, marker)


def swap_dir(live: str, tmp: str) -> None:
    """Replace directory ``live`` with ``tmp`` the recoverable way
    (ADVICE r14 #3): rename the old generation ASIDE first (live →
    live__old), then tmp → live, then delete live__old — a crash between
    the renames leaves a recoverable generation at live__old instead of
    NO index. Requires live and tmp on the same filesystem (os.rename
    semantics) — point WDSS_SCRATCH_DIR at one volume. The swap is not
    atomic for concurrent readers (a reader can observe the brief
    no-live-dir window between the two renames); a 100 TB deployment
    swaps a manifest/metastore pointer instead, same plan shape."""
    import shutil

    old = live.rstrip("/") + "__old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(live, old)
    os.rename(tmp, live)
    shutil.rmtree(old)
