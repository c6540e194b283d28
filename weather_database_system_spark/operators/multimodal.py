"""Multimodal (binary) column operators.

BASELINE.json extension: treat image/audio/video payloads as opaque BINARY
columns with typed metadata structs, and run decode / feature-extraction as
Arrow-batched Python over mapInPandas.

Decode coverage is format-tiered, honestly:

- REAL decoders, no external codecs needed: PPM/P6 images (netpbm — header
  parse + numpy pixel grid) and WAV/PCM audio (stdlib ``wave`` RIFF parse +
  numpy sample frames). ``image_decode_features`` / ``audio_decode_features``
  run genuine pixel and signal math (channel means, luma deviation,
  block-mean resize, RMS energy, zero-crossing rate) on payloads
  synthesized as real files of those formats.
- REAL compressed decode, still no external codecs: PNG (stdlib zlib
  inflate + full scanline defiltering — all five filter types;
  ``png_decode_features``), cross-checked byte-for-byte against the PPM
  path on the same pixel grids and hypothesis-round-tripped over random
  images.
- Remaining compressed formats (JPEG/MP3/MP4) need PIL/cv2/ffmpeg, which
  this container does not ship; ``_fake_decode`` remains the clearly-marked
  deterministic stand-in on the text-payload pipeline so the Arrow plumbing
  (binary schema, metadata struct, batch iteration, output schema) stays
  exercised end-to-end.

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


# ---------------------------------------------------------------------------
# REAL decoders: PPM/P6 images (numpy) and WAV/PCM audio (stdlib wave).
# ---------------------------------------------------------------------------

IMG_W, IMG_H = 48, 32          # synthesized PPM dimensions
AUDIO_SR = 8000                # synthesized WAV sample rate
AUDIO_N = 2000                 # samples per clip (250 ms)
AUDIO_AMP = 16000              # peak amplitude (int16 domain)


def _synth_ppm(doc_id: int) -> bytes:
    """A real PPM (P6) file: binary netpbm header + RGB24 pixel grid whose
    channels are closed-form functions of (x, y, doc_id) — so tests can
    predict decoded statistics analytically."""
    import numpy as np

    x = np.arange(IMG_W, dtype=np.int64)
    y = np.arange(IMG_H, dtype=np.int64)
    xx, yy = np.meshgrid(x, y)
    r = (xx * 5 + doc_id) % 256
    g = (yy * 7 + 3 * doc_id) % 256
    b = (xx + yy + doc_id) % 256
    img = np.stack([r, g, b], axis=-1).astype(np.uint8)
    return f"P6\n{IMG_W} {IMG_H}\n255\n".encode() + img.tobytes()


def _decode_ppm(payload: bytes):
    """REAL P6 decode: parse the netpbm header tokens (magic, width, height,
    maxval), then view the remaining bytes as an (h, w, 3) uint8 grid."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment line
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return w, h, px.reshape(h, w, 3)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _synth_png(doc_id: int) -> bytes:
    """A REAL PNG file from stdlib zlib alone (8-bit truecolor, no
    interlace): the same closed-form pixel grid as _synth_ppm, with the
    scanline FILTER TYPE CYCLING 0→4 per row (None/Sub/Up/Average/Paeth)
    so a decoder must implement every filter in the spec, not just the
    trivial one."""
    import struct
    import zlib

    import numpy as np

    x = np.arange(IMG_W, dtype=np.int64)
    y = np.arange(IMG_H, dtype=np.int64)
    xx, yy = np.meshgrid(x, y)
    r = (xx * 5 + doc_id) % 256
    g = (yy * 7 + 3 * doc_id) % 256
    b = (xx + yy + doc_id) % 256
    img = np.stack([r, g, b], axis=-1).astype(np.uint8)
    raw = _png_filter_scanlines(img, [row % 5 for row in range(IMG_H)])
    ihdr = struct.pack(">IIBBBBB", IMG_W, IMG_H, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _png_filter_scanlines(img, filters: list[int]) -> bytes:
    """Apply per-row PNG filters (encoder side): Filt = Raw − predictor
    mod 256, predictor per the spec (bpp = 3)."""
    import numpy as np

    h, w, _ = img.shape
    bpp, out = 3, bytearray()
    prior = np.zeros(w * 3, dtype=np.int32)
    for row in range(h):
        raw = img[row].reshape(-1).astype(np.int32)
        ft = filters[row]
        filt = np.empty_like(raw)
        for i in range(len(raw)):
            left = raw[i - bpp] if i >= bpp else 0
            up = prior[i]
            ul = prior[i - bpp] if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) // 2
            else:
                pred = _paeth(left, up, ul)
            filt[i] = (raw[i] - pred) % 256
        out.append(ft)
        out.extend(filt.astype(np.uint8).tobytes())
        prior = raw
    return bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _decode_png(payload: bytes):
    """REAL PNG decode with stdlib zlib only: chunk walk (CRC-verified),
    IHDR parse (8-bit truecolor RGB, non-interlaced), IDAT inflate, and
    full scanline defiltering — all five filter types (None/Sub/Up/
    Average/Paeth) per the PNG spec §6. Returns (w, h, uint8 (h,w,3))."""
    import struct
    import zlib

    import numpy as np

    if not payload.startswith(b"\x89PNG\r\n\x1a\n"):
        raise ValueError("not a PNG payload")
    i, w = 8, None
    idat = bytearray()
    while i < len(payload):
        (length,) = struct.unpack(">I", payload[i : i + 4])
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + length]
        (crc,) = struct.unpack(">I", payload[i + 8 + length : i + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            w, h, depth, ctype_id, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, ctype_id, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG flavor (need 8-bit truecolor, "
                    f"got depth={depth} color={ctype_id} interlace={interlace})"
                )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        i += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    bpp, stride = 3, w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload length mismatch")
    px = np.empty((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    pos = 0
    for row in range(h):
        ft = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).astype(
            np.int32
        )
        pos += stride
        recon = np.empty(stride, dtype=np.int32)
        for i2 in range(stride):
            left = recon[i2 - bpp] if i2 >= bpp else 0
            up = prior[i2]
            ul = prior[i2 - bpp] if i2 >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) // 2
            elif ft == 4:
                pred = _paeth(left, up, ul)
            else:
                raise ValueError(f"bad PNG filter type {ft}")
            recon[i2] = (line[i2] + pred) % 256
        px[row] = recon.astype(np.uint8)
        prior = recon
    return w, h, px.reshape(h, w, 3)


def _synth_wav(doc_id: int) -> bytes:
    """A real RIFF/WAVE file written by the stdlib ``wave`` encoder: 16-bit
    mono PCM sine at a doc-dependent frequency — decoders see a genuine WAV
    container, tests can assert signal physics (RMS, zero crossings)."""
    import io
    import wave

    import numpy as np

    freq = 200 + (doc_id % 20) * 50
    t = np.arange(AUDIO_N, dtype=np.float64) / AUDIO_SR
    samples = (AUDIO_AMP * np.sin(2 * np.pi * freq * t)).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(AUDIO_SR)
        wv.writeframes(samples.tobytes())
    return buf.getvalue()


def _decode_wav(payload: bytes):
    """REAL WAV decode via the stdlib RIFF parser: container params from
    ``wave``, samples via numpy frombuffer."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as wv:
        sr = wv.getframerate()
        n = wv.getnframes()
        ch = wv.getnchannels()
        raw = wv.readframes(n)
    samples = np.frombuffer(raw, dtype="<i2")
    if ch > 1:
        samples = samples.reshape(-1, ch).mean(axis=1)
    return sr, samples


def with_image_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → a REAL image table: one synthesized PPM/P6 file per doc
    (payload is an actual decodable image, not a stand-in blob), metadata
    stamped the way an ingest job would."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["doc_id"].map(lambda d: _synth_ppm(int(d))),
                }
            )

    mm = docs.mapInPandas(gen, schema="doc_id long, payload binary")
    return mm.select(
        "doc_id",
        "payload",
        F.struct(
            F.lit("image/x-portable-pixmap").alias("mime"),
            F.octet_length("payload").alias("n_bytes"),
            F.md5(F.col("payload")).alias("content_md5"),
        ).alias("meta"),
    )


def image_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode + feature extraction over mapInPandas: parse each
    PPM payload into its pixel grid and compute genuine pixel statistics —
    per-channel means, ITU-R 601 luma standard deviation — plus a 2×
    block-mean-pooled thumbnail digest (the resize path, numpy reshape-mean,
    re-encoded as a real PPM). Rows-only for the driver (Python-side by
    nature); the pytest pins the channel means against the closed-form
    expectation of the synthesis pattern, so the decoder is verified against
    math, not against itself."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import numpy as np

        rows = []
        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = _decode_ppm(bytes(payload))
                fl = px.astype(np.float64)
                luma = 0.299 * fl[..., 0] + 0.587 * fl[..., 1] + 0.114 * fl[..., 2]
                pooled = (
                    fl.reshape(h // 2, 2, w // 2, 2, 3).mean(axis=(1, 3)).astype(np.uint8)
                )
                thumb = (
                    f"P6\n{w // 2} {h // 2}\n255\n".encode() + pooled.tobytes()
                )
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "width": w,
                        "height": h,
                        "mean_r": round(float(fl[..., 0].mean()), 4),
                        "mean_g": round(float(fl[..., 1].mean()), 4),
                        "mean_b": round(float(fl[..., 2].mean()), 4),
                        "luma_std": round(float(luma.std()), 4),
                        "thumb_md5": hashlib.md5(thumb).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)
            rows = []

    mm = with_image_payload(spark, sf_dir)
    return mm.select("doc_id", "payload").mapInPandas(
        run,
        schema=(
            "doc_id long, width int, height int, mean_r double, mean_g double, "
            "mean_b double, luma_std double, thumb_md5 string"
        ),
    ).orderBy("doc_id")


def audio_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode + feature extraction over mapInPandas: parse each
    WAV payload with the stdlib RIFF decoder and compute genuine signal
    features — duration, RMS energy, peak, zero-crossing count. Rows-only
    for the driver; the pytest asserts the physics (a sine at frequency f
    crosses zero ≈ 2·f·duration times and has RMS ≈ amp/√2), grounding the
    decoder against signal theory rather than a replay of itself."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        rows = []
        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                sr, s = _decode_wav(bytes(payload))
                fs = s.astype(np.float64)
                zc = int(np.count_nonzero(np.signbit(fs[1:]) != np.signbit(fs[:-1])))
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "sample_rate": int(sr),
                        "n_samples": int(len(s)),
                        "duration_ms": round(1000.0 * len(s) / sr, 3),
                        "rms": round(float(np.sqrt((fs * fs).mean())), 3),
                        "peak": int(np.abs(s).max()),
                        "zero_crossings": zc,
                    }
                )
            yield pd.DataFrame(rows)
            rows = []

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["doc_id"].map(lambda d: _synth_wav(int(d))),
                }
            )

    wavs = docs.mapInPandas(gen, schema="doc_id long, payload binary")
    return wavs.mapInPandas(
        run,
        schema=(
            "doc_id long, sample_rate int, n_samples int, duration_ms double, "
            "rms double, peak int, zero_crossings int"
        ),
    ).orderBy("doc_id")


def with_png_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → a REAL compressed-image table: one synthesized PNG per
    doc (zlib-deflated scanlines, filters cycling through the whole spec),
    metadata stamped like an ingest job."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["doc_id"].map(lambda d: _synth_png(int(d))),
                }
            )

    mm = docs.mapInPandas(gen, schema="doc_id long, payload binary")
    return mm.select(
        "doc_id",
        "payload",
        F.struct(
            F.lit("image/png").alias("mime"),
            F.octet_length("payload").alias("n_bytes"),
            F.md5(F.col("payload")).alias("content_md5"),
        ).alias("meta"),
    )


def png_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode over mapInPandas: inflate + defilter
    each PNG payload (stdlib zlib — no PIL/cv2 needed, closing the r5
    "compressed formats are stubbed" carried limitation for PNG) and
    compute the SAME pixel statistics as image_decode_features. The pixel
    grid is the PPM synthesis pattern, so the pytest pins channel means to
    the identical closed-form expectations — and a cross-format test
    asserts PNG-decoded statistics equal PPM-decoded statistics doc by
    doc (two real containers, one truth). Rows-only for the driver
    (Python-side by nature)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        rows = []
        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = _decode_png(bytes(payload))
                fl = px.astype(np.float64)
                luma = 0.299 * fl[..., 0] + 0.587 * fl[..., 1] + 0.114 * fl[..., 2]
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "width": w,
                        "height": h,
                        "mean_r": round(float(fl[..., 0].mean()), 4),
                        "mean_g": round(float(fl[..., 1].mean()), 4),
                        "mean_b": round(float(fl[..., 2].mean()), 4),
                        "luma_std": round(float(luma.std()), 4),
                    }
                )
            yield pd.DataFrame(rows)
            rows = []

    mm = with_png_payload(spark, sf_dir)
    return mm.select("doc_id", "payload").mapInPandas(
        run,
        schema=(
            "doc_id long, width int, height int, mean_r double, mean_g double, "
            "mean_b double, luma_std double"
        ),
    ).orderBy("doc_id")


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
    "image_decode_features": image_decode_features,    # rows-only: Python decode
    "audio_decode_features": audio_decode_features,    # rows-only: Python decode
    "png_decode_features": png_decode_features,        # rows-only: Python decode
}
