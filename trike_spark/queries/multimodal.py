"""Multimodal-column operators (driver contract "Multimodal columns"):
opaque binary payloads + typed metadata travel together through the plan;
decode/feature-extraction runs as Arrow-batched ``mapInPandas``.

Every codec kernel in this module is REAL as of round 9 (no PIL/ffmpeg —
the formats are implemented in numpy + the standard library): PNG (zlib +
scanline-filter reconstruction) and WAV (RIFF PCM) round-trips certified
byte-exact; baseline JPEG (T.81 sequential DCT + Annex K Huffman,
``trike_spark.functions.jpeg``, 4:4:4 and 4:2:0) certified against a
PROVEN quantization bound because it is lossy; the Y4M video container
(YUV4MPEG2) with byte-exact stride frame sampling; a format-sniffing
decode stage (magic-byte dispatch to the PNG/JPEG decoders); a real
bilinear resize (``trike_spark.functions.imaging``) certified by exact
corner/range/identity properties; and a binaryFile-scanned
decode-or-quarantine e2e routing corrupt containers to per-reason
buckets instead of failing the job.

Scale notes: binary payloads stay columnar (parquet BYTE_ARRAY) end-to-end;
mapInPandas streams Arrow batches so one task never materializes more than
a batch of payloads; no shuffle is introduced by decode (narrow map).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from trike_spark.io import load_table
from trike_spark.registry import register


@register(
    "multimodal_assemble",
    """
    SELECT d.doc_id,
           octet_length(encode(d.text)) AS payload_bytes,
           len(e.embedding) AS dim,
           d.lang, d.source, e.label
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
    doc="Multimodal record assembly: binary payload + embedding + metadata in one row.",
)
def multimodal_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The payload is text re-encoded as binary — standing in for an image/
    audio blob column (same BinaryType plumbing either way)."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    return (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            F.octet_length(F.encode("text", "utf-8")).alias("payload_bytes"),
            F.size("embedding").alias("dim"),
            "lang",
            "source",
            "label",
        )
    )


_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("decode_ok", BooleanType()),
    ]
)

_DECODE_JPEG_Q = 90


def _derive_pixels(key: str, n: int) -> bytes:
    """Deterministic pixel bytes from a row key: chained md5 digests,
    truncated to n — the construction every real-codec face uses so an
    engine with no codec (the DuckDB oracle) can still predict content
    properties."""
    import hashlib

    out = b"".join(
        hashlib.md5(f"{key}{i}".encode()).digest() for i in range(-(-n // 16))
    )
    return out[:n]


def _decode_features_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL decode stage with magic-byte format dispatch: even docs carry a
    PNG (RGB, variable dims), odd docs a baseline JPEG (grayscale, dims
    deliberately non-multiples of 8 so pad/crop is load-bearing). The
    container is built from row bytes, then decoded by FORMAT SNIFFING on
    the payload alone — the same dispatcher shape a mixed image corpus
    needs. decode_ok certifies content: byte-identity for PNG, exact dims
    + the proven quantization bound for lossy JPEG."""
    import numpy as np

    from trike_spark.functions.codecs import decode_png, encode_png
    from trike_spark.functions.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
        roundtrip_error_bound,
    )

    bound = roundtrip_error_bound(_DECODE_JPEG_Q)
    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            doc_id = int(doc_id)
            if doc_id % 2 == 0:
                sw, sh = 3 + doc_id % 6, 2 + (doc_id // 2) % 5
                want = _derive_pixels(f"{text}d", sw * sh * 3)
                payload = encode_png(
                    np.frombuffer(want, dtype=np.uint8).reshape(sh, sw, 3)
                )
            else:
                sw, sh = 9 + doc_id % 8, 10 + (doc_id // 2) % 7
                want = _derive_pixels(f"{text}d", sw * sh)
                payload = encode_jpeg_baseline(
                    np.frombuffer(want, dtype=np.uint8).reshape(sh, sw),
                    quality=_DECODE_JPEG_Q,
                )
            # --- the operator under test starts here: sniff + decode ---
            if payload[:8] == b"\x89PNG\r\n\x1a\n":
                fmt = "png"
                w, h, c, arr = decode_png(payload)
                ok = arr.tobytes() == want
            elif payload[:2] == b"\xff\xd8":
                fmt = "jpeg"
                w, h, c, arr = decode_jpeg_baseline(payload)
                src = np.frombuffer(want, dtype=np.uint8).reshape(sh, sw)
                ok = (
                    arr.shape == src.shape
                    and int(np.abs(arr.astype(int) - src.astype(int)).max()) <= bound
                )
            else:  # unreachable for derived payloads; the honest dispatcher arm
                fmt, w, h, c, ok = "unknown", 0, 0, 0, False
            rows.append((doc_id, fmt, w, h, c, bool(ok)))
        yield pd.DataFrame(rows, columns=[f.name for f in _DECODE_SCHEMA.fields])


@register(
    "multimodal_decode_features",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 3 + doc_id % 6
                     ELSE 9 + doc_id % 8 END AS INT) AS width,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 2 + (doc_id // 2) % 5
                     ELSE 10 + (doc_id // 2) % 7 END AS INT) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS INT) AS channels,
           TRUE AS decode_ok
    FROM documents
    """,
    doc=(
        "REAL mixed-format decode stage: magic-byte sniffing dispatches "
        "each binary payload to the in-repo PNG or baseline-JPEG decoder; "
        "decoded dims/channels are oracle-predicted per row and decode_ok "
        "certifies content (byte-identity for PNG, proven error bound for "
        "JPEG)."
    ),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generic decode stage, REAL as of round 9 (r8 verdict item 2 —
    `_fake_decode_batch` retired): every row builds an actual container
    (PNG or JPEG, alternating) from its own bytes, and the operator under
    test is the format-sniffing decoder a mixed corpus needs — parse the
    magic, route to the right codec, emit typed (width, height, channels)
    plus a content certification. Dims vary per row (and the JPEG dims are
    non-multiples of 8), so a header-parse or pad/crop bug shifts a value
    the driver hash covers.

    Scale: same posture as the other codec faces — Arrow-batched narrow
    map, no shuffle — with the JPEG kernel's compute-width repartition
    (partition by compute, not bytes, for Python-kernel stages;
    BENCH_NOTES r8): a small parquet scan otherwise yields ONE partition
    and serializes the decode on a single core."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        _decode_features_batch, schema=_DECODE_SCHEMA
    )


@register(
    "multimodal_frame_sample",
    """
    SELECT doc_id, frame_idx,
           md5(text || ':' || CAST(frame_idx AS VARCHAR)) AS frame_hash
    FROM documents, (SELECT unnest(generate_series(0, 9)) AS frame_idx)
    WHERE doc_id % 50 = 0
    """,
    doc="Frame sampling: explode N pseudo-frames per video payload (1:N narrow expansion).",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stands in for video frame extraction: each payload row fans out to
    10 frame rows via explode — the same 1:N narrow-expansion shape a real
    frame sampler produces (no shuffle; downstream ops see frame rows)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    return d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.lit(9).cast("bigint"))).alias("frame_idx"),
        "text",
    ).select(
        "doc_id",
        "frame_idx",
        F.md5(F.concat(F.col("text"), F.lit(":"), F.col("frame_idx").cast("string"))).alias(
            "frame_hash"
        ),
    )


_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("src_width", IntegerType()),
        StructField("src_height", IntegerType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("out_bytes", LongType()),
        StructField("resize_ok", BooleanType()),
    ]
)

_RESIZE_TARGET = 224  # longest-edge target, the common vision-model input


def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL decode→resize stage: decode an actual PNG, bilinear-resample
    the pixel array to the 224 longest-edge fit (functions/imaging.py),
    certify the exact corner/range/identity properties of the sampler."""
    import numpy as np

    from trike_spark.functions.codecs import decode_png, encode_png
    from trike_spark.functions.imaging import (
        bilinear_resize,
        certify_resize,
        fit_longest_edge,
    )

    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            doc_id = int(doc_id)
            sw, sh = 3 + doc_id % 11, 2 + (doc_id // 3) % 9
            want = _derive_pixels(f"{text}r", sw * sh * 3)
            payload = encode_png(
                np.frombuffer(want, dtype=np.uint8).reshape(sh, sw, 3)
            )
            # --- the operator under test: decode, fit, resample, certify ---
            w, h, c, src = decode_png(payload)
            ow, oh = fit_longest_edge(w, h, _RESIZE_TARGET)
            out = bilinear_resize(src, oh, ow)
            ok = (
                src.tobytes() == want
                and out.shape == (oh, ow, 3)
                and certify_resize(src, out)
            )
            rows.append((doc_id, w, h, ow, oh, ow * oh * 3, bool(ok)))
        yield pd.DataFrame(rows, columns=[f.name for f in _RESIZE_SCHEMA.fields])


@register(
    "multimodal_resize",
    f"""
    WITH dims AS (
      SELECT doc_id,
             CAST(3 + doc_id % 11 AS INT) AS src_width,
             CAST(2 + (doc_id // 3) % 9 AS INT) AS src_height
      FROM documents)
    SELECT doc_id, src_width, src_height,
           CAST((src_width * {_RESIZE_TARGET}) // greatest(src_width, src_height) AS INT) AS out_width,
           CAST((src_height * {_RESIZE_TARGET}) // greatest(src_width, src_height) AS INT) AS out_height,
           CAST(((src_width * {_RESIZE_TARGET}) // greatest(src_width, src_height))
              * ((src_height * {_RESIZE_TARGET}) // greatest(src_width, src_height))
              * 3 AS BIGINT) AS out_bytes,
           TRUE AS resize_ok
    FROM dims
    """,
    doc=(
        f"REAL image resize stage: decode an actual PNG per row, bilinear-"
        f"resample (numpy, functions/imaging.py) to the {_RESIZE_TARGET} "
        "longest-edge aspect-preserving fit; resize_ok certifies the "
        "sampler's exact corner/range/identity properties and the decoded "
        "source bytes."
    ),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resize stage, REAL as of round 9 (r8 verdict item 2 —
    `_fake_resize_batch` retired): each row decodes a real PNG via the
    in-repo codec and resamples the decoded array with an actual bilinear
    kernel. Bilinear output is float math, so the oracle can't re-derive
    pixels; instead resize_ok hashes the sampler's PROVABLE properties
    (corner exactness, convex-combination range containment, identity
    exactness — functions/imaging.py docstring has the proofs), the same
    certification strategy that gave the lossy JPEG codec an exact oracle.
    Output dims/byte budget are integer math the oracle reproduces
    bit-for-bit; at 100 TB the byte-budget column is what a downstream
    packing/batching stage aggregates, so it's computed here once.

    Scale: Arrow-batched narrow map, no shuffle, with the compute-width
    repartition every Python-kernel stage gets (BENCH_NOTES r8)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        _resize_batch, schema=_RESIZE_SCHEMA
    )


# --- audio-style frame windowing over raw payload bytes ---------------------

FRAME_LEN = 256  # samples per frame (bytes as 8-bit PCM stand-ins)
FRAME_STRIDE = 128


@register(
    "multimodal_audio_frames",
    f"""
    WITH p AS (
      SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
      FROM documents),
    fr AS (
      SELECT doc_id, n, unnest(generate_series(1, n, {FRAME_STRIDE})) AS start
      FROM p),
    win AS (
      SELECT f.doc_id, f.start,
             LEAST({FRAME_LEN}, f.n - f.start + 1) AS n_samples,
             list_transform(
               generate_series(f.start, LEAST(f.start + {FRAME_LEN} - 1, f.n)),
               i -> CAST(('0x' || substr(p.hx, 2 * i - 1, 2)) AS BIGINT)) AS samples
      FROM fr f JOIN p ON f.doc_id = p.doc_id)
    SELECT doc_id, CAST((start - 1) / {FRAME_STRIDE} AS BIGINT) AS frame_idx,
           n_samples,
           CAST(list_aggregate(
             list_transform(samples, s -> (s - 128) * (s - 128)), 'sum')
             AS BIGINT) AS energy
    FROM win
    """,
    doc=(
        f"Audio-style framing: overlapping {FRAME_LEN}-sample windows at "
        f"stride {FRAME_STRIDE} over raw payload bytes, integer energy per "
        "frame — the waveform-windowing stage with byte-exact verification."
    ),
)
def multimodal_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The waveform side of the multimodal set: frame a binary payload
    into overlapping windows (the universal first stage of audio feature
    extraction — VAD, spectrograms, fingerprinting all start here) and
    compute per-frame energy. Bytes stand in for 8-bit PCM samples; the
    per-sample arithmetic runs on hex-pair parsing in BOTH engines, so
    unlike the codec-stubbed decode faces this one is byte-exact
    hash-verified end to end. Everything is row-local array math (frame
    fan-out = an in-row generator, energy = an integer fold) — zero
    shuffles, whole pass in codegen; a real 16-bit/stereo reader only
    changes the sample-parsing expression."""
    d = load_table(spark, sf_dir, "documents")
    p = d.select(
        "doc_id",
        F.hex(F.encode("text", "utf-8")).alias("hx"),
        F.octet_length(F.encode("text", "utf-8")).alias("n"),
    )
    fr = p.select(
        "doc_id",
        "n",
        "hx",
        F.explode(F.expr(f"sequence(1, n, {FRAME_STRIDE})")).alias("start"),
    )
    samples = F.expr(
        f"transform(sequence(start, LEAST(start + {FRAME_LEN} - 1, n)), "
        "i -> CAST(conv(substr(hx, 2 * i - 1, 2), 16, 10) AS BIGINT))"
    )
    return fr.select(
        "doc_id",
        F.expr(f"CAST((start - 1) div {FRAME_STRIDE} AS BIGINT)").alias("frame_idx"),
        F.least(F.lit(FRAME_LEN), F.col("n") - F.col("start") + 1).alias("n_samples"),
        F.aggregate(
            F.transform(samples, lambda s: (s - 128) * (s - 128)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("energy"),
    )


@register(
    "multimodal_frame_dedup",
    """
    WITH frames AS (
      SELECT doc_id, frame_idx,
             md5(text || ':' || CAST(frame_idx % 4 AS VARCHAR)) AS frame_hash
      FROM documents, (SELECT unnest(generate_series(0, 9)) AS frame_idx)
      WHERE doc_id % 50 = 0)
    SELECT frame_hash,
           MIN(doc_id * 100 + frame_idx) AS survivor_key,
           COUNT(*) AS n_copies
    FROM frames GROUP BY frame_hash HAVING COUNT(*) > 1
    """,
    doc=(
        "Frame-level exact dedup: hash sampled pseudo-frames (text-as-"
        "binary stand-in; idx%4 collapses a repeating GOP) and keep one "
        "survivor per duplicate group — the video analog of document "
        "exact-dedup."
    ),
)
def multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-frame collapse, the first compression step of any video
    ingest pipeline (static scenes repeat frames; here the deterministic
    fake decoder emits a repeating 4-frame group-of-pictures so duplicate
    structure exists to find). Survivor = lowest (doc, frame) key, the
    same keep-min rule as document exact-dedup; in production the hash
    would be a real perceptual/content hash of decoded pixels — the
    Spark shape (narrow 1:N frame expansion → 16-byte-key groupBy) is
    identical.

    Scale note: the shuffle carries only (hash, key) pairs, never frame
    bytes — at 100 TB of video the dedup exchange is measured in
    gigabytes."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    frames = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(9))).alias("frame_idx"),
        "text",
    ).select(
        "doc_id",
        "frame_idx",
        F.md5(
            F.concat(F.col("text"), F.lit(":"), (F.col("frame_idx") % 4).cast("string"))
        ).alias("frame_hash"),
    )
    return (
        frames.groupBy("frame_hash")
        .agg(
            F.min(F.col("doc_id") * 100 + F.col("frame_idx")).alias("survivor_key"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


@register(
    "multimodal_corpus_report",
    """
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(octet_length(encode(d.text))) AS BIGINT) AS payload_bytes,
           CAST(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_with_embedding,
           ROUND(CAST(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS embedding_coverage,
           CAST(COUNT(DISTINCT e.label) AS BIGINT) AS n_labels
    FROM documents d LEFT JOIN embeddings e ON e.vec_id = d.doc_id
    GROUP BY d.source
    """,
    doc=(
        "Per-source multimodal inventory: payload volume, embedding "
        "coverage, and label breadth — the join-health report for a "
        "corpus whose modalities arrive on different pipelines."
    ),
)
def multimodal_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modalities arrive on different pipelines (text from the crawler,
    embeddings from a GPU batch job), so the first multimodal question
    is ALIGNMENT: what fraction of each source's documents actually has
    its companion modality? A coverage gap localized to one source means
    that source's embedding backfill is behind — caught here before a
    training run silently drops the uncovered slice (LEFT join, so the
    denominator is the full corpus, not the covered part).

    Scale shape: one doc-keyed LEFT join (the embedding side projects to
    key+label), a |sources|-row rollup; payload bytes sum map-side."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    joined = d.join(e, "doc_id", "left")
    has = F.when(F.col("label").isNotNull(), 1).otherwise(0)
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.octet_length(F.encode("text", "utf-8"))).cast("bigint").alias(
            "payload_bytes"
        ),
        F.sum(has).cast("bigint").alias("n_with_embedding"),
        F.round(F.sum(has).cast("double") / F.count(F.lit(1)), 6).alias(
            "embedding_coverage"
        ),
        F.count_distinct("label").cast("bigint").alias("n_labels"),
    )


# --- container header parse (the ffprobe/EXIF step) -----------------------------

MM_HDR_BYTES = 16
MM_FRAME_BYTES = 256


@register(
    "multimodal_header_parse",
    f"""
    WITH payloads AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS payload_bytes
      FROM documents WHERE doc_id % 25 = 0)
    SELECT doc_id,
           substr(hx, 1, 8) AS magic_hex,
           CAST(('0x' || substr(hx, 9, 2)) AS BIGINT) AS version,
           CAST(('0x' || substr(hx, 11, 4)) AS BIGINT) AS width,
           CAST(('0x' || substr(hx, 15, 4)) AS BIGINT) AS height,
           payload_bytes,
           CAST((payload_bytes - {MM_HDR_BYTES}) // {MM_FRAME_BYTES} AS BIGINT)
             AS n_frames,
           CAST(40 * ((payload_bytes - {MM_HDR_BYTES}) // {MM_FRAME_BYTES})
                AS BIGINT) AS duration_ms
    FROM payloads
    WHERE payload_bytes >= {MM_HDR_BYTES}
    """,
    doc=(
        "Typed-metadata extraction from binary container headers (the "
        "ffprobe/EXIF catalog step): magic, version byte, big-endian u16 "
        "dims, frame count from payload length — byte-exact JVM-side hex "
        "math, no UDF, no decode."
    ),
)
def multimodal_header_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Before any decode, a media pipeline CATALOGS its blobs: parse the
    fixed-layout container header into typed columns (codec magic,
    version, dimensions, frame count) so downstream partitioning,
    quota and decode-routing decisions join on integers instead of
    sniffing bytes. Here the payload is the established text-as-binary
    stand-in and the 'header' is its leading MM_HDR_BYTES=16 bytes under a
    fixed big-endian layout — the byte math (hex-pair slicing, base-16
    integer casts, length-derived frame count) is exactly what a real
    MP4/EXIF fixed-field parse compiles to, byte-exact and
    hash-verified in both engines (same contract as the audio-framing
    face; the codec-stubbed decode faces stay the boundary for actual
    pixel/sample access).

    Scale shape: one narrow projection fused into the scan — parsing
    cost rides the read, no shuffle, no Python; at 100 TB the catalog
    pass is IO-bound by construction."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    p = d.select(
        "doc_id",
        F.hex(F.encode("text", "utf-8")).alias("hx"),
        F.octet_length(F.encode("text", "utf-8")).alias("payload_bytes"),
    ).filter(F.col("payload_bytes") >= MM_HDR_BYTES)
    n_frames = F.expr(
        f"(payload_bytes - {MM_HDR_BYTES}) div {MM_FRAME_BYTES}"
    ).cast("bigint")
    return p.select(
        "doc_id",
        F.substring("hx", 1, 8).alias("magic_hex"),
        F.conv(F.substring("hx", 9, 2), 16, 10).cast("bigint").alias("version"),
        F.conv(F.substring("hx", 11, 4), 16, 10).cast("bigint").alias("width"),
        F.conv(F.substring("hx", 15, 4), 16, 10).cast("bigint").alias("height"),
        "payload_bytes",
        n_frames.alias("n_frames"),
        (40 * n_frames).cast("bigint").alias("duration_ms"),
    )


# --- strided patch extraction (ViT preprocessing shape) -----------------------------

PATCH_GRID = 8  # the stub "image": first 8x8 = 64 payload bytes
PATCH_SIZE = 2  # 2x2 patches, stride 2 -> 16 patches per image


def _sql_byte(r: str, c: str) -> str:
    """Byte value at grid (r, c) from the hex string (1-indexed substr)."""
    return (
        f"CAST(('0x' || substr(hx, 2 * (({r}) * {PATCH_GRID} + ({c})) + 1, 2))"
        " AS BIGINT)"
    )


def _sql_patch_sum() -> str:
    terms = [
        _sql_byte(f"{PATCH_SIZE} * pr + {dr}", f"{PATCH_SIZE} * pc + {dc}")
        for dr in range(PATCH_SIZE)
        for dc in range(PATCH_SIZE)
    ]
    return " + ".join(terms)


@register(
    "multimodal_striding_patches",
    f"""
    WITH imgs AS (
      SELECT doc_id, hex(encode(text)) AS hx
      FROM documents
      WHERE doc_id % 100 = 0
        AND octet_length(encode(text)) >= {PATCH_GRID * PATCH_GRID}),
    grid AS (
      SELECT doc_id, hx, pr.pr, pc.pc
      FROM imgs,
           (SELECT unnest(generate_series(0, {PATCH_GRID // PATCH_SIZE - 1}))
              AS pr) pr,
           (SELECT unnest(generate_series(0, {PATCH_GRID // PATCH_SIZE - 1}))
              AS pc) pc)
    SELECT doc_id, pr AS patch_row, pc AS patch_col,
           CAST({_sql_patch_sum()} AS BIGINT) AS patch_sum,
           CAST(({_sql_patch_sum()}) // {PATCH_SIZE * PATCH_SIZE} AS BIGINT)
             AS patch_mean
    FROM grid
    """,
    doc=(
        f"Strided patch extraction (the ViT preprocessing shape): the "
        f"{PATCH_GRID}×{PATCH_GRID}-byte stand-in image fans out into "
        f"{(PATCH_GRID // PATCH_SIZE) ** 2} non-overlapping "
        f"{PATCH_SIZE}×{PATCH_SIZE} patches with per-patch integer "
        "sums/means — 2-D windowing as closed-form byte math, in-row, "
        "no shuffle."
    ),
)
def multimodal_striding_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Patch extraction is the first op of every vision-transformer
    pipeline: a (H, W) image becomes a sequence of P×P patches. The
    Spark-shaped insight is that for FIXED geometry the patch grid is a
    closed-form projection — each patch's pixels are at computable byte
    offsets, so the whole fan-out is a generator expression fused into
    the scan (same contract as the audio-framing face: byte-exact on the
    text-as-binary stub, hash-verified; a real decoder swaps in behind
    the same geometry).

    Scale shape: in-row fan-out of images × patches rows with pure
    integer hex math — zero exchanges, zero Python; at 100 TB of images
    the patch pass is IO-bound, exactly like the real preprocessing
    job feeding a training run."""
    d = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 100 == 0)
        & (F.octet_length(F.encode("text", "utf-8")) >= PATCH_GRID * PATCH_GRID)
    )
    imgs = d.select("doc_id", F.hex(F.encode("text", "utf-8")).alias("hx"))
    n_p = PATCH_GRID // PATCH_SIZE
    grid = imgs.select(
        "doc_id",
        "hx",
        F.explode(F.sequence(F.lit(0), F.lit(n_p - 1))).alias("pr"),
    ).select(
        "doc_id",
        "hx",
        "pr",
        F.explode(F.sequence(F.lit(0), F.lit(n_p - 1))).alias("pc"),
    )

    def byte(r_expr: str, c_expr: str) -> F.Column:
        return F.conv(
            F.expr(
                f"substr(hx, 2 * (({r_expr}) * {PATCH_GRID} + ({c_expr})) + 1, 2)"
            ),
            16,
            10,
        ).cast("bigint")

    patch_sum = None
    for dr in range(PATCH_SIZE):
        for dc in range(PATCH_SIZE):
            t = byte(f"{PATCH_SIZE} * pr + {dr}", f"{PATCH_SIZE} * pc + {dc}")
            patch_sum = t if patch_sum is None else patch_sum + t
    return grid.select(
        "doc_id",
        F.col("pr").alias("patch_row"),
        F.col("pc").alias("patch_col"),
        patch_sum.cast("bigint").alias("patch_sum"),
        (patch_sum / (PATCH_SIZE * PATCH_SIZE)).cast("bigint").alias("patch_mean"),
    )


# --- REAL codec round-trips (stdlib PNG + WAV) --------------------------------
#
# These two faces remove the "decode is stubbed" boundary for the formats
# the standard library can genuinely handle (functions/codecs.py): pixels/
# samples are derived deterministically from table bytes, ENCODED to a real
# container, DECODED back inside the mapInPandas stage, and hashed. The
# oracle hashes the derived bytes directly — so a driver hash match
# certifies the whole codec loop (struct layout, zlib, filters, Arrow batch
# transfer) is bit-exact, not merely that a decoder ran.

_PNG_RT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pix_sha", StringType()),
    ]
)


def _png_roundtrip_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    import numpy as np

    from trike_spark.functions.codecs import decode_png, encode_png

    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            hx = b"".join(
                hashlib.md5(f"{text}p{i}".encode()).digest() for i in range(3)
            )
            pixels = np.frombuffer(hx, dtype=np.uint8).reshape(4, 4, 3)
            w, h, c, arr = decode_png(encode_png(pixels))
            rows.append(
                (
                    doc_id,
                    w,
                    h,
                    c,
                    hashlib.sha256(arr.tobytes().hex().encode()).hexdigest(),
                )
            )
        yield pd.DataFrame(rows, columns=[f.name for f in _PNG_RT_SCHEMA.fields])


@register(
    "multimodal_png_roundtrip",
    """
    SELECT doc_id, 4 AS width, 4 AS height, 3 AS channels,
           sha256(md5(text || 'p0') || md5(text || 'p1') || md5(text || 'p2')) AS pix_sha
    FROM documents
    """,
    doc=(
        "REAL PNG codec round-trip (stdlib zlib + numpy unfiltering): "
        "derive 4x4 RGB pixels from doc bytes, encode->decode->sha256; "
        "oracle hashes the derived bytes directly, so a match certifies "
        "the codec loop bit-for-bit."
    ),
)
def multimodal_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The codec here is REAL
    (functions/codecs.py): a spec-compliant PNG writer/reader pair runs
    inside the Arrow-batched stage. The derived-pixels construction makes
    encode∘decode = identity checkable by an engine with no codec at all —
    the DuckDB oracle just hashes the same 48 bytes — so the driver's
    value-hash is an end-to-end proof the container format, compression,
    filter reconstruction, and Arrow transfer preserved every byte. The
    stage is a narrow map (no shuffle); per-row codec work is the same
    shape a PIL deployment has."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(_png_roundtrip_batch, schema=_PNG_RT_SCHEMA)


_WAV_RT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("pcm_sha", StringType()),
    ]
)


def _wav_roundtrip_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    import numpy as np

    from trike_spark.functions.codecs import decode_wav, encode_wav

    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            hx = b"".join(
                hashlib.md5(f"{text}w{i}".encode()).digest() for i in range(4)
            )
            samples = np.frombuffer(hx, dtype="<i2")  # 32 little-endian int16
            rate, n_ch, n_fr, pcm = decode_wav(encode_wav(samples, 8_000))
            rows.append(
                (
                    doc_id,
                    rate,
                    n_ch,
                    n_fr,
                    hashlib.sha256(
                        pcm.astype("<i2").tobytes().hex().encode()
                    ).hexdigest(),
                )
            )
        yield pd.DataFrame(rows, columns=[f.name for f in _WAV_RT_SCHEMA.fields])


@register(
    "multimodal_wav_roundtrip",
    """
    SELECT doc_id, 8000 AS sample_rate, 1 AS n_channels, 32 AS n_frames,
           sha256(md5(text || 'w0') || md5(text || 'w1') ||
                  md5(text || 'w2') || md5(text || 'w3')) AS pcm_sha
    FROM documents
    """,
    doc=(
        "REAL WAV codec round-trip (stdlib wave, PCM int16): derive 32 "
        "samples from doc bytes, encode->decode->sha256 of the PCM; "
        "oracle hashes the derived bytes directly."
    ),
)
def multimodal_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio twin of `multimodal_png_roundtrip`: a real RIFF/WAVE
    container written and re-read by the stdlib codec inside the Arrow
    stage, certified byte-exact by the oracle hashing the same derived
    PCM. Narrow map, no shuffle; the sample payload is deliberately tiny
    (32 frames) because the face certifies the CODEC PATH — the
    throughput story for real audio lives in the binaryFile ingest
    (io.read_binary_files) + partition sizing, not here."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(_wav_roundtrip_batch, schema=_WAV_RT_SCHEMA)


# ---------------------------------------------------------------------------
# Quarantine e2e: binaryFile-scanned mixed corpus → decode or quarantine
# ---------------------------------------------------------------------------

# IHDR body byte offsets inside the fixed PNG prelude (sig 8 + len 4 +
# tag 4 + body 13): color type at 25, interlace flag at 28; the IDAT
# chunk body begins at 41 for every image this face derives (IHDR is
# fixed-size), so truncating at byte 45 always leaves a 4-byte zlib
# fragment — a guaranteed "corrupt PNG IDAT stream" regardless of pixel
# content. The decoder skips CRC checks, so single-byte patches need no
# CRC fixup.
_PNG_COLOR_OFF, _PNG_INTERLACE_OFF, _PNG_TRUNCATE_AT = 25, 28, 45


_QUARANTINE_JPEG_Q = 90
_QUARANTINE_JPEG_BASE = (5, 4)  # 2x upsampled -> a 10x8 4:2:0 color JPEG


def _quarantine_jpeg_pixels(doc_id: int, seed: str = "qj"):
    """A JPEG member's expected pixels: RGB constant on each 2×2 block
    (derived from doc_id alone), the input class for which the 4:2:0
    round-trip error bound is PROVEN (functions/jpeg.py
    roundtrip_error_bound_color). ``seed`` separates the baseline (qj)
    and progressive (qp) members so a decode that confuses the two
    cannot verify."""
    import numpy as np

    bh, bw = _QUARANTINE_JPEG_BASE
    base = np.frombuffer(
        _derive_pixels(f"{doc_id}{seed}", bh * bw * 3), dtype=np.uint8
    ).reshape(bh, bw, 3)
    return np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)


def _quarantine_corpus_member(doc_id: int) -> tuple[str, bytes]:
    """Derive the mixed-corpus member for one doc: doc_id % 6 == 0 is
    a valid 4x4 RGB PNG; 1 is a valid 10x8 PROGRESSIVE (SOF2) 4:2:0
    color JPEG (round 10 — the second-most-common web-corpus JPEG layout
    now decodes instead of quarantining; it was a PNG in rounds 8-9);
    2 is truncated mid-IDAT; 3 has the interlace flag set; 4 has the
    color type patched to palette (3); 5 is a valid 10x8 baseline 4:2:0
    color JPEG (round 9). Pixels derive from doc_id alone so the decode
    stage can re-derive the expected bytes from the scanned filename
    without a join."""
    import hashlib

    import numpy as np

    from trike_spark.functions.codecs import encode_png
    from trike_spark.functions.jpeg import encode_jpeg_baseline, encode_jpeg_progressive

    m = doc_id % 6
    if m == 5:
        return f"{doc_id}.jpg", encode_jpeg_baseline(
            _quarantine_jpeg_pixels(doc_id),
            quality=_QUARANTINE_JPEG_Q,
            subsampling="4:2:0",
        )
    if m == 1:
        return f"{doc_id}.jpg", encode_jpeg_progressive(
            _quarantine_jpeg_pixels(doc_id, seed="qp"),
            quality=_QUARANTINE_JPEG_Q,
            subsampling="4:2:0",
        )
    hx = b"".join(hashlib.md5(f"{doc_id}q{i}".encode()).digest() for i in range(3))
    png = encode_png(np.frombuffer(hx, dtype=np.uint8).reshape(4, 4, 3))
    if m == 2:
        png = png[:_PNG_TRUNCATE_AT]
    elif m == 3:
        png = png[:_PNG_INTERLACE_OFF] + b"\x01" + png[_PNG_INTERLACE_OFF + 1 :]
    elif m == 4:
        png = png[:_PNG_COLOR_OFF] + b"\x03" + png[_PNG_COLOR_OFF + 1 :]
    return f"{doc_id}.png", png


_QUARANTINE_SCHEMA = StructType(
    [
        StructField("reason", StringType()),
        StructField("n_docs", LongType()),
        StructField("n_verified", LongType()),
    ]
)


def _decode_or_quarantine_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-file magic-sniffed decode with the quarantine contract: the
    codecs' ValueError (functions/codecs.py, functions/jpeg.py) routes the
    row to a reason bucket instead of killing the task — the batch
    analogue of the reference's bad-bytes passthrough (fake_source.ex:68
    ``--bad``). PNG rows verify byte-exact; JPEG rows (baseline AND
    progressive — the decode entry magic-sniffs the container, the codec
    dispatches on the SOF marker) verify exact dims + the proven color
    error bound, against per-layout expected pixels so a mixed-up decode
    cannot verify."""
    import hashlib
    import os

    import numpy as np

    from trike_spark.functions.codecs import decode_png
    from trike_spark.functions.jpeg import (
        decode_jpeg_baseline,
        roundtrip_error_bound_color,
    )

    jpeg_bound = roundtrip_error_bound_color(_QUARANTINE_JPEG_Q)
    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            doc_id = int(os.path.basename(path).split(".")[0])
            payload = bytes(content)
            try:
                if payload[:2] == b"\xff\xd8":
                    w, h, c, arr = decode_jpeg_baseline(payload)
                    want = _quarantine_jpeg_pixels(
                        doc_id, seed="qp" if doc_id % 6 == 1 else "qj"
                    )
                    ok = (
                        arr.shape == want.shape
                        and int(np.abs(arr.astype(int) - want.astype(int)).max())
                        <= jpeg_bound
                    )
                else:
                    w, h, c, arr = decode_png(payload)
                    want_png = b"".join(
                        hashlib.md5(f"{doc_id}q{i}".encode()).digest()
                        for i in range(3)
                    )
                    ok = (w, h, c) == (4, 4, 3) and arr.tobytes() == want_png
            except ValueError as e:
                msg = str(e)
                if "interlace=1" in msg:
                    reason = "interlace_unsupported"
                elif "color=3" in msg:
                    reason = "palette_unsupported"
                elif "IDAT" in msg or "truncated" in msg.lower():
                    reason = "corrupt_container"
                else:
                    reason = "other"
                rows.append((reason, 0))
                continue
            rows.append(("ok", 1 if ok else 0))
        out = pd.DataFrame(rows, columns=["reason", "n_verified"])
        yield (
            out.groupby("reason", as_index=False)
            .agg(n_docs=("n_verified", "size"), n_verified=("n_verified", "sum"))
            [["reason", "n_docs", "n_verified"]]
        )


def quarantine_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """Write-once mixed-corpus fixture, keyed by (session, sf_dir): each
    scale factor gets its own directory (r8 ADVICE — a lazily-evaluated
    plan from one sf_dir must never scan files written for another), and
    a ``_SUCCESS`` marker makes the write idempotent so repeated calls —
    and the bench's timed runs — scan the existing corpus instead of
    re-paying the fixture write (r8 verdict item 5: the probe was timing
    its own 50k-file fixture, not the operator)."""
    import hashlib
    import os
    import shutil
    import tempfile

    path = os.path.join(
        tempfile.gettempdir(),
        f"trike_scan_{spark.sparkContext.applicationId}",
        f"quarantine_{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}",
    )
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        return path
    shutil.rmtree(path, ignore_errors=True)  # partial dir from a crash
    os.makedirs(path, exist_ok=True)

    def _write_part(rows) -> None:
        for r in rows:
            fname, payload = _quarantine_corpus_member(int(r.doc_id))
            with open(os.path.join(path, fname), "wb") as f:
                f.write(payload)

    load_table(spark, sf_dir, "documents").select("doc_id").foreachPartition(
        _write_part
    )
    with open(marker, "w"):
        pass
    return path


@register(
    "multimodal_decode_quarantine",
    """
    SELECT CASE CAST(doc_id % 6 AS INT)
             WHEN 2 THEN 'corrupt_container'
             WHEN 3 THEN 'interlace_unsupported'
             WHEN 4 THEN 'palette_unsupported'
             ELSE 'ok' END AS reason,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN doc_id % 6 IN (2, 3, 4) THEN 0 ELSE 1 END)
                AS BIGINT) AS n_verified
    FROM documents
    GROUP BY 1
    """,
    doc=(
        "Quarantine e2e: write a mixed corpus of real image files (valid "
        "PNG + truncated + interlaced + palette + valid baseline AND "
        "progressive 4:2:0 color JPEGs), scan with binaryFile, "
        "magic-sniff and decode with ValueError routing to per-reason "
        "quarantine buckets; the oracle predicts every bucket count from "
        "the corruption schedule and n_verified certifies the good rows "
        "decoded correctly (byte-exact for PNG, exact dims + proven "
        "color bound for both JPEG layouts)."
    ),
)
def multimodal_decode_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The e2e for the codec ValueError contract (r7 verdict item 4):
    ``decode_png``/``decode_jpeg_baseline`` promise corrupt/unsupported
    containers raise ``ValueError`` — never struct/zlib/index errors,
    which would kill the Spark task — so a real corpus can route bad
    files to a quarantine sink instead of wedging the job. This face
    proves the whole path on actual FILES: derive one image per document
    (3 of every 6 deliberately damaged in distinct ways; 1 of every 6 a
    baseline 4:2:0 color JPEG — the dominant real-world layout, decoded
    since round 9 — and 1 of every 6 a PROGRESSIVE (SOF2) 4:2:0 JPEG,
    the second-most-common web layout, decoded since round 10 through
    the multi-scan Annex G path), write them once per (session,
    sf_dir) to a marker-guarded scratch dir, scan with the binaryFile
    source (io.read_binary_files — listing-time glob, content as opaque
    binary), magic-sniff + decode inside an Arrow stage with per-reason
    routing, and aggregate (reason, n_docs, n_verified). n_verified
    counts good rows whose decoded pixels match the re-derived
    expectation — a silent mis-decode breaks the driver hash even though
    the row avoided quarantine. Mirrors the reference's bad-bytes
    tolerance (fake_source.ex:68 ``--bad``): corruption is routed and
    counted, never fatal and never silently dropped.

    Scale notes: the file write is the test fixture, not the operator —
    a real corpus already sits in object storage — and it now runs ONCE
    per session per sf_dir outside the repeatable path, so bench/probe
    runs time scan→decode→route, not fixture IO. The decode is a narrow
    map over binaryFile rows (one file = one row; Arrow batches bound
    memory); the only shuffle is the final tiny reason rollup. In local
    mode executors share the driver's filesystem so the scratch write is
    visible to the scan; on a cluster the fixture write would target a
    shared store (the operator path — scan, decode, quarantine — is
    storage-agnostic)."""
    from trike_spark.io import read_binary_files

    path = quarantine_fixture_dir(spark, sf_dir)
    files = read_binary_files(spark, path, glob="*.{png,jpg}")
    # Compute-width repartition before the CPU-bound Python decode — the
    # same shape as every other codec face (BENCH_NOTES r8): the
    # binaryFile split math (openCost-charged tiny files) yields ~5×
    # defaultParallelism near-empty tasks here, and each task pays the
    # Python-boundary fixed cost; one round-robin exchange of the file
    # bytes buys evenly-loaded decode tasks (measured 1.9 → 1.4 s at
    # sf0.1, and it is the §2.5 small-file input-skew fix at scale).
    per_batch = (
        files.select("path", "content")
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(_decode_or_quarantine_batch, schema=_QUARANTINE_SCHEMA)
    )
    return per_batch.groupBy("reason").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_verified").alias("n_verified"),
    )


# ---------------------------------------------------------------------------
# Baseline JPEG round-trip: lossy codec certified against a PROVEN bound
# ---------------------------------------------------------------------------

_JPEG_RT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("components", IntegerType()),
        StructField("within_bound", BooleanType()),
    ]
)

_JPEG_RT_H, _JPEG_RT_W, _JPEG_RT_Q = 20, 12, 90  # 240 px = 15 md5 digests


def _jpeg_roundtrip_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    import numpy as np

    from trike_spark.functions.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
        roundtrip_error_bound,
    )

    bound = roundtrip_error_bound(_JPEG_RT_Q)
    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            hx = b"".join(
                hashlib.md5(f"{text}j{i}".encode()).digest() for i in range(15)
            )
            pixels = np.frombuffer(hx, dtype=np.uint8).reshape(_JPEG_RT_H, _JPEG_RT_W)
            w, h, c, out = decode_jpeg_baseline(
                encode_jpeg_baseline(pixels, quality=_JPEG_RT_Q)
            )
            err = int(np.abs(out.astype(int) - pixels.astype(int)).max())
            rows.append((doc_id, w, h, c, err <= bound))
        yield pd.DataFrame(rows, columns=[f.name for f in _JPEG_RT_SCHEMA.fields])


@register(
    "multimodal_jpeg_roundtrip",
    f"""
    SELECT doc_id, {_JPEG_RT_W} AS width, {_JPEG_RT_H} AS height,
           1 AS components, TRUE AS within_bound
    FROM documents
    """,
    doc=(
        "REAL baseline JPEG codec round-trip (T.81 sequential DCT + Annex K "
        "Huffman, numpy+stdlib): derive 20x12 gray pixels from doc bytes, "
        "encode->decode, certify max pixel error against the PROVEN "
        "quantization bound and the exact (padded-and-cropped) dimensions."
    ),
)
def multimodal_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG was the last image format hiding behind a stub kernel
    ("blocked on environment: PIL absent") — baseline JPEG needs no
    library: functions/jpeg.py implements the full T.81 sequential
    pipeline (level shift, batched 8x8 DCT, libjpeg-convention quality
    scaling, zigzag, DC prediction, Annex K canonical Huffman, byte
    stuffing, JFIF markers) in numpy + struct, both directions.

    JPEG is LOSSY, so the PNG face's byte-identity certification is
    impossible; this face certifies what IS provable: decoded dimensions
    are exact (20x12 — deliberately non-multiples of 8, so the pad-to-
    blocks / crop-back path is load-bearing), and the measured max pixel
    error respects `roundtrip_error_bound(quality)` — a worst-case bound
    DERIVED from the quantization table (each coefficient perturbs by
    <= q/2; IDCT basis magnitudes <= a(u)a(v); sum over 64 coefficients),
    not a tuned constant. Any codec defect — wrong Huffman table, zigzag
    transposition, dequant mismatch — blows the error past the bound or
    shifts a dimension, and the driver hash fails. Same Arrow-batched
    shape as the PNG/WAV faces; at 100 TB the codec kernel is the
    swap-in point for libjpeg via the identical signature.

    One plan difference from the cheap-kernel faces: an explicit
    round-robin repartition BEFORE the Arrow stage. The JPEG kernel is
    ~2 ms/row of pure Python — three orders heavier than the PNG path —
    and a small parquet scan yields ONE input partition
    (maxPartitionBytes ≫ file size), which serializes the whole decode
    on one core (measured: 7.3 s at sf0.1 single-partition vs
    sub-second spread). This is the standard posture for CPU-bound
    decode stages at any scale: the shuffle moves (doc_id, text) rows
    once; the codec then runs at cluster width."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        _jpeg_roundtrip_batch, schema=_JPEG_RT_SCHEMA
    )


_JPEG420_BASE_H, _JPEG420_BASE_W, _JPEG420_Q = 9, 7, 90  # image = 18x14 RGB


def _jpeg420_roundtrip_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from trike_spark.functions.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
        roundtrip_error_bound_color,
    )

    bound = roundtrip_error_bound_color(_JPEG420_Q)
    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            base = np.frombuffer(
                _derive_pixels(f"{text}j4", _JPEG420_BASE_H * _JPEG420_BASE_W * 3),
                dtype=np.uint8,
            ).reshape(_JPEG420_BASE_H, _JPEG420_BASE_W, 3)
            pixels = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
            w, h, c, out = decode_jpeg_baseline(
                encode_jpeg_baseline(pixels, quality=_JPEG420_Q, subsampling="4:2:0")
            )
            err = int(np.abs(out.astype(int) - pixels.astype(int)).max())
            rows.append((int(doc_id), w, h, c, err <= bound))
        yield pd.DataFrame(rows, columns=[f.name for f in _JPEG_RT_SCHEMA.fields])


@register(
    "multimodal_jpeg420_roundtrip",
    f"""
    SELECT doc_id, {2 * _JPEG420_BASE_W} AS width, {2 * _JPEG420_BASE_H} AS height,
           3 AS components, TRUE AS within_bound
    FROM documents
    """,
    doc=(
        "REAL 4:2:0 color JPEG round-trip (T.81 MCU-interleaved, chroma "
        "2x2 box-subsampled): derive 18x14 RGB pixels constant per 2x2 "
        "block from doc bytes — the input class where 4:2:0 subsampling "
        "is provably lossless — encode->decode, certify max pixel error "
        "against the PROVEN color quantization bound and exact dims."
    ),
)
def multimodal_jpeg420_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 4:2:0 leg of the JPEG certification (r8 verdict item 3):
    4:2:0 is the dominant real-world JPEG layout, and chroma subsampling
    is irreversibly lossy for arbitrary input — so the certification
    input is constructed 2×2-block-constant, for which the box-average
    subsample is EXACT (mean of four equal doubles) and the only lossy
    steps are per-plane quantization; `roundtrip_error_bound_color`
    derives the provable RGB bound (luma bound + 1.772× the chroma
    bound; see its docstring). Dims 18×14 are multiples of 2 but not of
    16, so the MCU pad/crop path is load-bearing, and the content rides
    the full MCU-interleaved scan (4 Y blocks + Cb + Cr per MCU) — a
    block-order, upsample-index, or plane-swap defect blows the bound or
    shifts a dim, and the driver hash fails. Same compute-width
    repartition as every Python-codec stage."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        _jpeg420_roundtrip_batch, schema=_JPEG_RT_SCHEMA
    )


_JPEG_CAT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("components", IntegerType()),
        StructField("n_dht", IntegerType()),
        StructField("q00", IntegerType()),
    ]
)

_JPEG_CAT_QUALITIES = (50, 60, 70, 80, 90)  # doc_id % 5 picks one
# the libjpeg scaling law pins the luma DC quant step per quality:
# s = 200 - 2q (q >= 50); q00 = (16*s + 50) // 100
_JPEG_CAT_Q00 = {q: (16 * (200 - 2 * q) + 50) // 100 for q in _JPEG_CAT_QUALITIES}


def _jpeg_catalog_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from trike_spark.functions.jpeg import encode_jpeg_baseline, parse_jpeg_header

    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            doc_id = int(doc_id)
            w, h = 8 + doc_id % 9, 8 + (doc_id // 3) % 9
            q = _JPEG_CAT_QUALITIES[doc_id % 5]
            pixels = np.frombuffer(
                _derive_pixels(f"{text}jc", w * h), dtype=np.uint8
            ).reshape(h, w)
            info = parse_jpeg_header(encode_jpeg_baseline(pixels, quality=q))
            rows.append(
                (doc_id, info["width"], info["height"], info["components"],
                 info["n_dht"], info["q00"])
            )
        yield pd.DataFrame(rows, columns=[f.name for f in _JPEG_CAT_SCHEMA.fields])


@register(
    "multimodal_jpeg_header_catalog",
    f"""
    SELECT doc_id,
           CAST(8 + doc_id % 9 AS INT) AS width,
           CAST(8 + (doc_id // 3) % 9 AS INT) AS height,
           1 AS components,
           2 AS n_dht,
           CAST(CASE CAST(doc_id % 5 AS INT)
                  WHEN 0 THEN {_JPEG_CAT_Q00[50]} WHEN 1 THEN {_JPEG_CAT_Q00[60]}
                  WHEN 2 THEN {_JPEG_CAT_Q00[70]} WHEN 3 THEN {_JPEG_CAT_Q00[80]}
                  ELSE {_JPEG_CAT_Q00[90]} END AS INT) AS q00
    FROM documents
    """,
    doc=(
        "JPEG marker-walk catalog (the ffprobe/EXIF step on REAL JFIF "
        "bytes): per-row encode at a doc-derived quality, then extract "
        "typed metadata — dims, component count, Huffman table count, and "
        "the luma DC quant step — WITHOUT entropy decode; the oracle "
        "predicts q00 from the libjpeg quality-scaling law, so the "
        "catalog certifies the encoder's quantizer too."
    ),
)
def multimodal_jpeg_header_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Before any decode, a media pipeline CATALOGS its blobs (same
    posture as `multimodal_header_parse`, which used a fixed stand-in
    layout — this face does it on genuine JPEG containers): a marker walk
    reads a few dozen bytes per file regardless of image size, emitting
    the typed columns downstream routing joins on. The oracle predicts
    every column from doc_id arithmetic — dims directly, and q00 through
    the libjpeg quality-scaling law (s = 200 − 2q; q00 = (16s + 50)//100)
    — so a driver hash match certifies both the parser AND the encoder's
    quantizer emission at five distinct qualities per corpus.

    Scale: catalog cost is O(header) per file — IO-bound by construction;
    same compute-width repartition as the other Python-kernel stages (the
    encode that builds the fixture rides the same task)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        _jpeg_catalog_batch, schema=_JPEG_CAT_SCHEMA
    )


# ---------------------------------------------------------------------------
# Y4M video container: real frame extraction, byte-exact certification
# ---------------------------------------------------------------------------

_Y4M_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_sha", StringType()),
    ]
)

_Y4M_N_FRAMES, _Y4M_H, _Y4M_W = 4, 4, 4  # 48 B/frame = 3 md5 digests
_Y4M_SAMPLE_STRIDE = 2  # keep frames 0 and 2 — the sampling operator


def _y4m_frame_sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    import numpy as np

    from trike_spark.functions.codecs import decode_y4m, encode_y4m

    for pdf in batches:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            frames = np.stack(
                [
                    np.frombuffer(
                        b"".join(
                            hashlib.md5(f"{text}v{f}_{k}".encode()).digest()
                            for k in range(3)
                        ),
                        dtype=np.uint8,
                    ).reshape(_Y4M_H, _Y4M_W, 3)
                    for f in range(_Y4M_N_FRAMES)
                ]
            )
            w, h, n, out = decode_y4m(encode_y4m(frames))
            for f in range(0, n, _Y4M_SAMPLE_STRIDE):
                rows.append(
                    (
                        doc_id,
                        f,
                        hashlib.sha256(out[f].tobytes().hex().encode()).hexdigest(),
                    )
                )
        yield pd.DataFrame(rows, columns=[f.name for f in _Y4M_SCHEMA.fields])


@register(
    "multimodal_y4m_frame_sample",
    f"""
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           sha256(md5(text || 'v' || CAST(frame_idx AS VARCHAR) || '_0')
               || md5(text || 'v' || CAST(frame_idx AS VARCHAR) || '_1')
               || md5(text || 'v' || CAST(frame_idx AS VARCHAR) || '_2'))
             AS frame_sha
    FROM documents, (SELECT unnest([0, 2]) AS frame_idx)
    """,
    doc=(
        "REAL video container round-trip: derive 4 YUV frames per doc, "
        "write/parse an actual YUV4MPEG2 (Y4M) stream, stride-2 frame "
        "sampling; sampled frame bytes certified byte-exact by the oracle "
        "hashing the same derived planes."
    ),
)
def multimodal_y4m_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video leg of the multimodal model, made REAL: `encode_y4m` /
    `decode_y4m` (functions/codecs.py) implement the actual YUV4MPEG2
    interchange container — header token parsing, FRAME framing, C444
    planar layout — the format compressed codecs decode INTO, so the
    frame-sampling operator downstream of any real decoder is exactly
    this shape. Uncompressed means byte-identity holds: the oracle
    re-derives each sampled frame's 48 bytes and hashes them, so a
    plane-order swap, stride bug, or off-by-one in frame framing
    hash-fails. Unsupported colorspaces (C420 et al) and truncated
    frames raise ValueError into the same quarantine contract as
    decode_png/decode_jpeg_baseline.

    Scale: narrow Arrow map (one task unit per row-batch), 1:2 row
    expansion from frame sampling — no shuffle; real video payloads ride
    binaryFile ingest + this same per-row kernel with libav doing the
    inner decode."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(_y4m_frame_sample_batch, schema=_Y4M_SCHEMA)
