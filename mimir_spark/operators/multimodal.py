"""Multimodal-column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched pandas UDFs via mapInPandas.

The container has no image/audio codecs, so the *decode* step is a
deterministic stub (clearly marked); everything Spark-side — the binary
column, the schema contract, the mapInPandas batch shape, the
partitioning — is real and is what carries over unchanged when a real
decoder (PIL / torchaudio / pyav) is dropped in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimir_spark.sources.tables import load_table

META_SCHEMA = (
    "doc_id long, n_bytes int, fake_width int, fake_height int, modality string"
)


def _decode_stub(payload: bytes) -> tuple[int, int]:
    """STUB decoder: derives a deterministic fake (width, height) from
    the payload instead of parsing a real container format. Replace
    with e.g. PIL.Image.open(io.BytesIO(payload)).size in production.
    """
    n = len(payload)
    return (n % 640) + 1, ((n * 7) % 480) + 1


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # One pandas DataFrame per Arrow batch — the decode loop runs over
    # a batch (thousands of rows), not per-row Python dispatch.
    for pdf in batches:
        sizes = pdf["payload"].map(_decode_stub)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "fake_width": sizes.map(lambda s: s[0]).astype("int32"),
                "fake_height": sizes.map(lambda s: s[1]).astype("int32"),
                "modality": "image",
            }
        )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column (here: utf-8 bytes of the text,
    standing in for image/audio bytes read from object storage)."""
    return docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary payload → typed metadata via mapInPandas. The plan keeps
    the payload column out of every stage except the decode (column
    pruning), and the decode parallelism follows the input partitioning
    — no shuffle at all."""
    docs = load_table(spark, sf_dir, "documents")
    return with_binary_payload(docs).mapInPandas(_decode_batches, META_SCHEMA)


def frame_sample(spark: SparkSession, sf_dir: str, every_n: int = 10) -> DataFrame:
    """Video-frame-sampling plumbing demo: explode a payload into
    'frame' offsets and keep every Nth — the decode itself is stubbed
    (no codecs in container) but the fan-out schema and partition
    behavior are the real thing."""
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    n_frames = (F.length("payload") / 100).cast("int") + 1
    return (
        docs.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("fi"),
        )
        .select("doc_id", F.col("fi").cast("long").alias("frame_idx"))
        .filter(F.col("frame_idx") % every_n == 0)
    )


FEATURES_SCHEMA = "doc_id long, n_bytes int, features array<float>"
N_FEATURES = 16


def _featurize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB feature extractor: a deterministic 16-dim byte-histogram
    'embedding' per payload (replace with a real vision/audio encoder
    forward pass batched over the Arrow batch). The batch loop, output
    array column, and schema contract are the production shape."""
    import numpy as np

    for pdf in batches:
        feats = []
        for payload in pdf["payload"]:
            arr = np.frombuffer(payload, dtype=np.uint8)
            hist = np.bincount(arr % N_FEATURES, minlength=N_FEATURES).astype(
                "float32"
            )
            total = hist.sum()
            feats.append(hist / total if total else hist)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "features": feats,
            }
        )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary payload → dense feature vector via mapInPandas — the
    decode→embed step that feeds the ANN/dedup operators. No shuffle:
    featurization follows input partitioning; downstream similarity
    ops treat `features` exactly like the embeddings table."""
    docs = load_table(spark, sf_dir, "documents")
    return with_binary_payload(docs).mapInPandas(
        _featurize_batches, FEATURES_SCHEMA
    )


def multimodal_features_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable projection of `multimodal_features`: the exact
    integer byte-bucket counts behind the normalized vector.

    count_i = round(f_i * n_bytes) recovers the stub's bincount exactly
    (float32 relative error ~1e-7 × n_bytes ≪ 0.5), turning the
    float-array output — which an external comparator can neither sort
    nor hash portably — into 16 BIGINT columns with a clean SQL oracle
    (per-char code-point-mod-16 histogram). Same plan as the parent op
    plus one stateless projection; still zero shuffles."""
    feats = multimodal_features(spark, sf_dir)
    counts = [
        F.round(F.element_at("features", i + 1).cast("double") * F.col("n_bytes"))
        .cast("long")
        .alias(f"n{i}")
        for i in range(N_FEATURES)
    ]
    return feats.select("doc_id", *counts)


RESIZE_SCHEMA = (
    "doc_id long, n_bytes int, out_width int, out_height int, "
    "resized binary, resized_bytes int"
)
RESIZE_TARGET = (64, 48)


def _resize_stub(payload: bytes, w: int, h: int) -> bytes:
    """STUB resizer: deterministic nearest-neighbour downsample over
    the raw byte stream (every k-th byte, k sized so the output is
    w*h bytes). Replace with PIL's Image.resize in production — the
    signature (payload, target dims) → payload is the real contract.
    """
    target = max(w * h, 1)
    step = max(len(payload) // target, 1)
    return payload[::step][:target]


def _resize_batches(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    w, h = RESIZE_TARGET
    for pdf in batches:
        resized = pdf["payload"].map(lambda p: _resize_stub(p, w, h))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "out_width": w,
                "out_height": h,
                "resized": resized,
                "resized_bytes": resized.map(len).astype("int32"),
            }
        )


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → RESIZED binary payload via mapInPandas — the
    resize leg of the image pipeline (decode → resize → featurize).
    The stub kernel is deterministic byte decimation; the Spark side
    (binary in/out columns, Arrow batch shape, fixed target dims in
    the schema) is the production plumbing. Map-only: no shuffle, the
    payload is read and written exactly once per row."""
    docs = load_table(spark, sf_dir, "documents")
    return with_binary_payload(docs).mapInPandas(
        _resize_batches, RESIZE_SCHEMA
    )


# ---- Real decode path (BMP) --------------------------------------------
# The container ships no codec libraries, but BMP is simple enough to
# encode AND decode in portable pure Python — so this path is a REAL
# image decode working end-to-end (magic check, header field parse,
# row-padding-aware pixel statistics), not a stub. A PIL/torchaudio
# decoder for compressed formats drops into the same mapInPandas
# contract (same schema, same batch loop) when available.

import struct

BMP_HEADER_BYTES = 54
DECODE_SCHEMA = (
    "doc_id long, width int, height int, bpp int, n_pixels long,"
    " sum_pixels long"
)


def encode_bmp(doc_id: int) -> bytes:
    """Deterministic tiny 24-bit BMP per doc: width=(id%16)+1,
    height=(id%8)+1, pixel byte j = (id*31 + j) % 256 (row-padded to
    4-byte boundaries per the BMP spec)."""
    w, h = (doc_id % 16) + 1, (doc_id % 8) + 1
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    body = bytearray()
    j = 0
    for _ in range(h):
        for _ in range(row_bytes):
            body.append((doc_id * 31 + j) % 256)
            j += 1
        body.extend(b"\x00" * pad)
    header = struct.pack(
        "<2sIHHI", b"BM", BMP_HEADER_BYTES + len(body), 0, 0, BMP_HEADER_BYTES
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return bytes(header) + bytes(body)


def decode_bmp(payload: bytes) -> tuple[int, int, int, int, int]:
    """Parse a BMP payload: magic check, little-endian header fields,
    row-padding-aware pixel byte SUM (an exact integer — no float
    rounding to disagree across engines; mean = sum / (3·n_pixels)).
    Raises ValueError on a non-BMP payload — a decode path that
    silently swallows garbage corrupts every statistic downstream."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    w = struct.unpack_from("<i", payload, 18)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    row_bytes = w * (bpp // 8)
    stride = row_bytes + (4 - row_bytes % 4) % 4
    total = 0
    for row in range(h):
        start = offset + row * stride
        total += sum(payload[start : start + row_bytes])
    return w, h, bpp, w * h, total


def with_bmp_payload(docs: DataFrame) -> DataFrame:
    """Attach a real BMP binary column (Arrow-batched generation)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["doc_id"].map(encode_bmp),
                }
            )

    return docs.select("doc_id").mapInPandas(_gen, "doc_id long, payload binary")


def multimodal_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode over a binary column: per doc, parse the BMP
    and emit (width, height, bpp, n_pixels, exact pixel-byte sum).
    Map-only
    — generation and decode fuse into one scan, payload bytes never
    shuffle. Oracle-checked: the oracle recomputes the same fields
    from the generation rule, so a decoder that misparses stride,
    offset, or padding hash-mismatches immediately."""
    docs = load_table(spark, sf_dir, "documents")

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_bmp(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "bpp": [r[2] for r in rows],
                    "n_pixels": [r[3] for r in rows],
                    "sum_pixels": [r[4] for r in rows],
                }
            )

    return with_bmp_payload(docs).mapInPandas(_dec, DECODE_SCHEMA)


DIGEST_MOD = 1_000_000_007
DIGEST_BASE = 131
RESIZE_DIGEST_SCHEMA = (
    "doc_id long, n_bytes int, out_width int, out_height int,"
    " resized_bytes int, digest long"
)


def multimodal_resize_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable projection of `multimodal_resize` (same move
    as multimodal_features_hist): the binary output column itself
    cannot ride the value-hash gate, so this key replaces it with a
    polynomial digest (Horner fold mod 1e9+7 over the RESIZED bytes),
    computed FROM the kernel's actual binary output — it pins the
    byte-decimation kernel, not a reimplementation of it. The oracle
    recomputes the digest from the generation + decimation rule
    (every step-th input byte, first w·h), so any off-by-one in
    step or truncation hash-mismatches."""
    w, h = RESIZE_TARGET

    def _digest_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(lambda p: _resize_stub(p, w, h))

            def dig(p: bytes) -> int:
                acc = 0
                for b in p:
                    acc = (acc * DIGEST_BASE + b) % DIGEST_MOD
                return acc

            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "out_width": w,
                    "out_height": h,
                    "resized_bytes": resized.map(len).astype("int32"),
                    "digest": resized.map(dig),
                }
            )

    docs = load_table(spark, sf_dir, "documents")
    return with_binary_payload(docs).mapInPandas(
        _digest_batches, RESIZE_DIGEST_SCHEMA
    )
