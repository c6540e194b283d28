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


def read_binary_dir(spark: SparkSession, src_dir: str, glob: str = "*") -> DataFrame:
    """Large-payload multimodal ingestion via the ``binaryFile`` source —
    the paths-as-pointers route for payloads too big to inline in the same
    parquet row group as their metadata (module docstring's >100 MB case).

    One row per file: (uri, modified_at, payload, meta{mime,n_bytes,
    content_md5}). mime is derived from the extension the way an ingest
    job would stamp it. At scale the directory IS the table: listing is
    distributed, each file is read by the task that owns it, and a
    metadata-only projection (see binary_dir_metadata) never opens file
    contents at all — binaryFile prunes the ``content`` column."""
    raw = spark.read.format("binaryFile").option("pathGlobFilter", glob).load(src_dir)
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    mime = (
        F.when(ext == "png", "image/png")
        .when(ext.isin("jpg", "jpeg"), "image/jpeg")
        .when(ext == "wav", "audio/wav")
        .when(ext == "mp4", "video/mp4")
        .when(ext == "txt", "text/plain")
        .otherwise("application/octet-stream")
    )
    return raw.select(
        F.col("path").alias("uri"),
        F.col("modificationTime").alias("modified_at"),
        F.col("content").alias("payload"),
        F.struct(
            mime.alias("mime"),
            F.col("length").cast("int").alias("n_bytes"),
            F.md5(F.col("content")).alias("content_md5"),
        ).alias("meta"),
    )


def binary_dir_metadata(spark: SparkSession, src_dir: str, glob: str = "*") -> DataFrame:
    """Metadata-only listing over a binary directory: projects file-status
    columns exclusively (no digest — that would force a content read), so
    the binaryFile scan prunes ``content`` and the query costs a directory
    listing plus file stats, not terabytes of payload IO."""
    raw = spark.read.format("binaryFile").option("pathGlobFilter", glob).load(src_dir)
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    mime = (
        F.when(ext == "png", "image/png")
        .when(ext.isin("jpg", "jpeg"), "image/jpeg")
        .when(ext == "wav", "audio/wav")
        .when(ext == "mp4", "video/mp4")
        .when(ext == "txt", "text/plain")
        .otherwise("application/octet-stream")
    )
    return raw.select(
        F.col("path").alias("uri"),
        mime.alias("mime"),
        F.col("length").cast("int").alias("n_bytes"),
        F.col("modificationTime").alias("modified_at"),
    ).orderBy("uri")


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


def _fake_resize(payload: bytes, target_w: int, target_h: int) -> bytes:
    """STUB resize. A real deployment decodes + resamples pixels (PIL/cv2 —
    not in this container). Deterministic fake with the real contract: output
    length scales with target area, content derived from the input bytes."""
    if not payload:
        return b""
    out_len = max(1, target_w * target_h // 8)
    reps = out_len // len(payload) + 1
    return (payload * reps)[:out_len]


def resize_payloads(df: DataFrame, target_w: int = 32, target_h: int = 24) -> DataFrame:
    """Batched 'resize' transform: binary in → binary out via mapInPandas.
    The plumbing under a real image resampler: Arrow binary columns both
    directions, bounded batch memory, output metadata recomputed engine-side."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload_resized": pdf["payload"].map(
                        lambda b: _fake_resize(b, target_w, target_h)
                    ),
                }
            )

    out = df.mapInPandas(run, schema="doc_id long, payload_resized binary")
    return out.select(
        "doc_id",
        "payload_resized",
        F.octet_length("payload_resized").alias("n_bytes_resized"),
    )


def frame_sample(df: DataFrame, frame_size: int = 64, stride: int = 4) -> DataFrame:
    """'Video' frame sampling as pure column ops — NO Python in the path:
    the payload is sliced into fixed-size frames and every stride-th frame
    is emitted as its own row (posexplode). At 100 TB this is the shape that
    turns one fat video row into many scoreable frame rows while metadata
    (doc_id, frame_no) stays columnar."""
    n_frames = F.floor(F.octet_length("payload") / frame_size).cast("int")
    frame_idx = F.filter(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
        lambda i: (i % stride == 0) & (n_frames > 0),
    )
    return (
        df.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    frame_idx,
                    lambda i: F.substring(F.col("payload"), i * frame_size + 1, F.lit(frame_size)),
                )
            ).alias("sample_no", "frame"),
        )
        .select(
            "doc_id",
            "sample_no",
            F.md5(F.col("frame")).alias("frame_digest"),
            F.length("frame").alias("frame_len"),
        )
    )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the binary table, oracle-checked byte-for-byte:
    every 4th 64-byte frame digested. Pure column ops (sequence/transform/
    posexplode/substring-on-binary) — no Python anywhere."""
    mm = with_binary_payload(spark, sf_dir)
    return frame_sample(mm.select("doc_id", "payload")).orderBy("doc_id", "sample_no")


ORACLE: dict[str, str] = {
    # NB: DuckDB's md5/substring only take VARCHAR; the corpus is pure ASCII
    # (asserted in tests), so char-slicing the text here equals the engine's
    # byte-slicing of the binary payload.
    "multimodal_frame_sample": """
        WITH d AS (
            SELECT doc_id, text,
                   CAST(floor(octet_length(encode(text)) / 64) AS INT) AS nf
            FROM documents
        ),
        idx AS (
            SELECT doc_id, text, unnest(range(0, nf)) AS i
            FROM d WHERE nf > 0
        )
        SELECT doc_id,
               CAST(i // 4 AS INT)                      AS sample_no,
               md5(substring(text, i * 64 + 1, 64))     AS frame_digest,
               CAST(length(substring(text, i * 64 + 1, 64)) AS INT) AS frame_len
        FROM idx
        WHERE i % 4 = 0
        ORDER BY doc_id, sample_no
    """,
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
    "multimodal_frame_sample": multimodal_frame_sample,
}
