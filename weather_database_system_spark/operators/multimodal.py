"""Multimodal (binary) column operators.

BASELINE.json extension: treat image/audio/video payloads as opaque BINARY
columns with typed metadata structs, and run decode / feature-extraction as
Arrow-batched Python over mapInPandas. The container has no image/audio
codecs, so the decode step is a clearly-marked deterministic stub
(_fake_decode) — the Spark-side plumbing (binary schema, metadata struct,
batch iteration, output schema) is real and is what the operator tests.

Scale design: payload bytes ride the same columnar files as the metadata
(parquet BINARY), so pruning/filtering on metadata never reads pixels; the
decode UDF streams Arrow batches, bounded-memory per task; per-file payloads
beyond ~100 MB would instead use the binaryFile source with paths as
pointers.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_database_system_spark.sources.star import load_table


def with_binary_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → multimodal shape: binary payload + metadata struct.

    Stands in for an image/audio table: payload is the utf-8 text bytes
    (deterministic), metadata carries mime/size/digest the way an ingest
    job would record them."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.col("text")).alias("n_bytes"),
            F.md5(F.col("text")).alias("content_md5"),
        ).alias("meta"),
    )


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata projection over the binary table: filter/prune on metadata
    only — the plan must never materialize the payload column (column
    pruning keeps the scan narrow)."""
    mm = with_binary_payload(spark, sf_dir)
    return mm.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.content_md5").alias("content_md5"),
    ).orderBy("doc_id")


def _fake_decode(payload: bytes) -> dict:
    """STUB decoder. A real deployment decodes image/audio here (PIL,
    torchaudio, ...) — not installed in this container. Deterministic fake:
    derive 'features' from the bytes themselves so tests are stable."""
    n = len(payload)
    return {
        "n_bytes": n,
        "first_byte": payload[0] if n else -1,
        "byte_sum_mod": sum(payload[:256]) % 997,
        "width": (n % 64) + 1,   # fake "decoded" dimensions
        "height": (n % 48) + 1,
    }


def decode_features(df: DataFrame) -> DataFrame:
    """Arrow-batched 'decode' over the binary payload via mapInPandas —
    the real multimodal hot path shape: bytes in, feature columns out,
    one vectorized pass per batch, no per-row Python round trips."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = pdf["payload"].map(_fake_decode)
            out = pd.DataFrame(list(feats))
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return df.mapInPandas(
        run,
        schema=(
            "doc_id long, n_bytes int, first_byte int, "
            "byte_sum_mod int, width int, height int"
        ),
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline: binary payload → batched decode stub →
    per-item features. Rows-only correctness (the decode is Python-side),
    but deterministic, so row counts and values are stable run-to-run."""
    mm = with_binary_payload(spark, sf_dir)
    return decode_features(mm.select("doc_id", "payload")).orderBy("doc_id")


ORACLE: dict[str, str] = {
    "multimodal_metadata": """
        SELECT doc_id,
               'text/plain'                    AS mime,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               md5(text)                       AS content_md5
        FROM documents
        ORDER BY doc_id
    """,
}

QUERIES = {
    "multimodal_metadata": multimodal_metadata,
    "multimodal_features": multimodal_features,
}
