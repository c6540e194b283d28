"""Partitioned-dataset maintenance: small-files compaction.

The station-keyed silver sink (`ingest_feed_stations` →
``partitionBy("station_id")``, pipeline/ingest.py) writes
shards-per-fetch files into each station's partition directory — the r11
station-fleet rehearsal (tools/station_rehearsal.py, NOTES.md) measured
exactly files/station == shards/station per fetch, so file COUNT grows
with fetch frequency, not fleet size. A year of hourly-refreshed appends
still turns each partition into hundreds of KB-scale files, and at 100 TB
the file-listing and footer-read cost of a pruned per-station query comes
to be dominated by file count, not bytes (the classic small-files tax).

``compact_partitioned`` is the standing maintenance pass: read the
dataset, route every row of a partition to ONE task
(``repartition(partition_cols)`` — a single hash shuffle keyed on the
partition values, so tasks never interleave partitions and each writes
exactly one run of files), and rewrite with ``maxRecordsPerFile`` capping
file size. Result: ceil(rows / max_records) files per partition — the
floor the layout allows — while the partition directory structure (and
therefore listing-level pruning) is preserved bit-for-bit.

Compaction writes to a NEW root and returns audit counts; atomically
swapping the live root for the compacted one is the caller's move (object
stores and HDFS differ on what "atomic" means — a rename on HDFS, a
manifest/catalog flip elsewhere), and keeping the old root until the swap
commits is what makes the pass idempotent and crash-safe.

Known trade-off, documented rather than hidden: ``repartition`` on the
partition columns maps each partition to one task, so a single partition
compacts at single-task parallelism — the right call for the
many-partitions / modest-per-partition-volume regime this sink produces
(stations × fetch windows). A skewed mega-partition would instead want a
salted repartition + maxRecordsPerFile, trading file-count floor for
parallel writers.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def compact_partitioned(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    partition_cols: list[str],
    *,
    max_records_per_file: int = 1_000_000,
) -> dict:
    """Compact a partitioned parquet dataset from ``src_path`` into
    ``dst_path`` (see module docstring). Returns an audit dict with row
    and file counts before/after; row-count equality is asserted here —
    a compaction that loses or duplicates rows must never return."""
    import glob
    import os

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    def _file_count(root: str) -> int:
        return len(
            glob.glob(os.path.join(root, *["*"] * len(partition_cols), "*.parquet"))
        )

    src = spark.read.parquet(src_path)
    files_before = _file_count(src_path)

    # The input row count rides an Observation on the write action itself
    # — at 100 TB a separate count() is an entire extra dataset scan spent
    # on bookkeeping. The read-back count below stays a real scan on
    # purpose: it is the crash-safety assert (rows on disk, not rows the
    # job believed it wrote), and the compacted output is the smaller side.
    obs = Observation("compact_input")
    (
        src.observe(obs, F.count(F.lit(1)).alias("n"))
        .repartition(*partition_cols)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(dst_path)
    )
    n_before = obs.get["n"]

    n_after = spark.read.parquet(dst_path).count()
    files_after = _file_count(dst_path)
    assert n_after == n_before, (
        f"compaction row-count drift: {n_before} -> {n_after}"
    )
    return {
        "rows": n_before,
        "files_before": files_before,
        "files_after": files_after,
    }
