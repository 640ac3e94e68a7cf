"""Multimodal-column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched pandas UDFs via mapInPandas.

The container ships no codec libraries, yet four container formats
decode for REAL in pure Python here — BMP (header/stride parse), PNG
(stdlib zlib + CRC walk + all five row filters), PCM WAV (RIFF chunk
walk), and multi-frame GIF (a complete LZW codec) — each
cross-validated in tests against an independent production decoder
(javax.imageio / stdlib wave). Only the codec-library formats (JPEG
via PIL) and the generic feature/resize kernels remain clearly-marked
stubs; everything Spark-side — the binary column, the schema
contract, the mapInPandas batch shape, the partitioning — is the
production shape either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimir_spark.sources.tables import load_table
from mimir_spark.functions.spread import spread_small_scan

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
    return spread_small_scan(
        docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    )


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
    raw = [(doc_id * 31 + j) % 256 for j in range(h * w * 3)]
    return encode_bmp_rgb(w, h, raw)


def encode_bmp_rgb(w: int, h: int, raw: list) -> bytes:
    """Spec-valid 24-bit BMP from arbitrary row-major pixel bytes —
    the BMP sibling of encode_png_rgb (rows stored in the same
    row-major order `_bmp_pixels` reads them back, padded to 4-byte
    boundaries)."""
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    body = bytearray()
    for r in range(h):
        body.extend(raw[r * row_bytes : (r + 1) * row_bytes])
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

    return spread_small_scan(docs.select("doc_id")).mapInPandas(_gen, "doc_id long, payload binary")


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


# ---- PNG: a REAL compressed-format decode path ------------------------
# The container has no PIL, but PNG's compression is stdlib zlib — so
# unlike JPEG the full decode loop (chunk parse, CRC verify, inflate,
# per-row unfiltering with all five PNG filter types) is implementable
# exactly, and the generator deliberately cycles the filter types so a
# decoder that fakes any of Sub/Up/Average/Paeth hash-mismatches at
# the driver gate. Reference: the public PNG spec (RFC 2083).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(doc_id: int) -> bytes:
    """Deterministic tiny 8-bit RGB PNG per doc: width=(id%16)+1,
    height=(id%8)+1, raw pixel byte j = (id*31 + j) % 256 — the same
    generation rule as encode_bmp, so the two decode keys share one
    oracle shape."""
    w, h = (doc_id % 16) + 1, (doc_id % 8) + 1
    raw = [(doc_id * 31 + j) % 256 for j in range(h * w * 3)]
    return encode_png_rgb(w, h, raw)


def encode_png_rgb(w: int, h: int, raw: list) -> bytes:
    """Spec-valid 8-bit RGB PNG from arbitrary row-major pixel bytes.
    Row r is written with filter type r % 5, exercising every PNG
    filter (a decoder faking any of Sub/Up/Average/Paeth fails)."""
    import zlib

    bpp = 3  # bytes per RGB pixel
    row_bytes = w * bpp
    out = bytearray()
    prior = [0] * row_bytes
    for r in range(h):
        row = raw[r * row_bytes : (r + 1) * row_bytes]
        ftype = r % 5
        out.append(ftype)
        for i, x in enumerate(row):
            a = row[i - bpp] if i >= bpp else 0
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            if ftype == 0:
                enc = x
            elif ftype == 1:
                enc = (x - a) % 256
            elif ftype == 2:
                enc = (x - b) % 256
            elif ftype == 3:
                enc = (x - (a + b) // 2) % 256
            else:
                enc = (x - _paeth(a, b, c)) % 256
            out.append(enc)
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, int, int, int]:
    """REAL PNG decode (pure Python + stdlib zlib): signature check,
    chunk walk with CRC verification, IDAT inflate, and per-row
    unfiltering of all five filter types per the spec — one shared
    kernel with `_png_pixels` (the pixel-level form). Returns
    (width, height, bits-per-pixel, n_pixels, exact pixel-byte sum) —
    the same contract as decode_bmp. Supports 8-bit RGB (color type
    2), the layout the generator emits; anything else raises, because
    a decoder that silently mis-handles a layout corrupts every
    statistic downstream."""
    w, h, px = _png_pixels(payload)
    return w, h, 24, w * h, sum(px)


def with_png_payload(docs: DataFrame) -> DataFrame:
    """Attach a real PNG binary column (Arrow-batched generation)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["doc_id"].map(encode_png),
                }
            )

    return spread_small_scan(docs.select("doc_id")).mapInPandas(_gen, "doc_id long, payload binary")


def multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-format image decode over a binary column: per
    doc, fully parse the PNG (CRC walk, zlib inflate, unfilter) and
    emit (width, height, bpp, n_pixels, exact pixel-byte sum).
    Map-only — generation and decode fuse into one scan, payload
    bytes never shuffle; at scale the only cost model that matters is
    bytes-decoded per core, which is why the kernel sits behind
    mapInPandas on the already-`_spread` corpus scan. Oracle-checked:
    the oracle recomputes the fields from the generation rule, so a
    decoder that mis-unfilters ANY of the five row filters (the
    generator cycles them) hash-mismatches immediately."""
    docs = load_table(spark, sf_dir, "documents")

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_png(p) for p in pdf["payload"]]
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

    return with_png_payload(docs).mapInPandas(_dec, DECODE_SCHEMA)


def decode_image(payload: bytes) -> tuple[int, int, int, int, int]:
    """Format-dispatching decode behind the shared DECODE_SCHEMA
    contract: BMP, PNG and baseline JPEG decode with the real
    pure-Python kernels (operators/jpeg.py for JPEG — huffman +
    dequant + IDCT + YCbCr, javax.imageio-cross-validated like PNG);
    non-baseline JPEG modes (progressive SOF2, arithmetic, 12-bit)
    fall back to PIL when it is importable and raise a clear
    dependency error otherwise — the boundary is now the exotic tail
    of the format, not the format itself."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(payload)
    if payload[:3] == b"\xff\xd8\xff":
        from mimir_spark.operators.jpeg import (  # noqa: PLC0415
            UnsupportedJpeg,
            decode_jpeg_auto,
        )

        try:
            # native-codec dispatch: PIL (libjpeg) handles EVERY JPEG
            # when importable — baseline included, so the pure-Python
            # entropy decode is never the hot path on a cluster image;
            # without PIL the strict baseline decoder runs and the
            # exotic tail raises the dependency boundary below.
            return decode_jpeg_auto(payload)
        except UnsupportedJpeg as exc:
            raise NotImplementedError(
                "non-baseline JPEG (progressive/arithmetic/12-bit) "
                "requires PIL (pip install pillow on the cluster "
                "image); baseline JPEG + BMP/PNG decode pure-Python"
            ) from exc
    raise ValueError("unrecognized image magic bytes")


def with_jpeg_payload(docs: DataFrame) -> DataFrame:
    """Attach a real baseline-JPEG binary column (Arrow-batched
    generation via the pure-Python encoder in operators/jpeg.py)."""
    from mimir_spark.operators.jpeg import encode_jpeg_gray_blocks

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["doc_id"].map(encode_jpeg_gray_blocks),
                }
            )

    return spread_small_scan(docs.select("doc_id")).mapInPandas(_gen, "doc_id long, payload binary")


def multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossy-format image decode over a binary column: per doc,
    fully parse a baseline JFIF (marker walk, Huffman entropy decode,
    dequantize, IDCT, level shift) and emit the shared DECODE_SCHEMA
    stats. Map-only like the PNG/BMP twins — generation and decode
    fuse into one scan, payload bytes never shuffle.

    Exact despite JPEG being lossy: the generator emits block-constant
    grayscale with an all-ones quant table, so every block is DC-only
    and ANY conforming IDCT reproduces it bit-exactly (javax.imageio
    agrees pixel-for-pixel, pytest-pinned in test_jpeg.py); the oracle
    recomputes the stats from the generation rule, so a Huffman/DC-
    prediction/dequant/placement bug hash-mismatches at the driver.
    The AC + chroma-subsampling paths are exercised in pytest against
    javax.imageio-encoded payloads (the lossy tail can't be
    SQL-oracled)."""
    docs = load_table(spark, sf_dir, "documents")

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # decode_jpeg_auto: libjpeg via PIL when importable (the hot
        # path on a real cluster image), pure-Python fallback here —
        # identical output either way on these DC-only payloads.
        from mimir_spark.operators.jpeg import decode_jpeg_auto

        for pdf in batches:
            rows = [decode_jpeg_auto(p) for p in pdf["payload"]]
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

    return with_jpeg_payload(docs).mapInPandas(_dec, DECODE_SCHEMA)


# ---- WAV: a REAL audio decode path ------------------------------------
# PCM WAV is an uncompressed RIFF container — like BMP it is exactly
# parseable in pure Python, which makes the audio leg of the
# multimodal story REAL end-to-end (generate → parse → exact integer
# statistics) instead of a stub. The stdlib `wave` module serves as an
# independent cross-decoder in tests.

WAV_SAMPLE_RATE = 8000
WAV_DECODE_SCHEMA = (
    "doc_id long, sample_rate int, n_channels int, bits int,"
    " n_samples long, energy long, zero_crossings long"
)


def _wav_samples(doc_id: int) -> list:
    """Deterministic PCM16 samples: n = (id % 64) + 16,
    s_j = ((id*37 + j*j) % 4096) - 2048."""
    n = (doc_id % 64) + 16
    return [((doc_id * 37 + j * j) % 4096) - 2048 for j in range(n)]


def encode_wav(doc_id: int) -> bytes:
    """Deterministic tiny mono PCM16 WAV per doc (RIFF/WAVE with a
    spec-complete fmt chunk)."""
    samples = _wav_samples(doc_id)
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack(
        "<HHIIHH", 1, 1, WAV_SAMPLE_RATE, WAV_SAMPLE_RATE * 2, 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _wav_parse(payload: bytes):
    """(rate, n_channels, bits, samples) from a PCM WAV payload —
    the chunk walk + validation + PCM16 sample parse shared by
    decode_wav and the frame-feature kernel."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_len,) = struct.unpack_from("<I", payload, 4)
    if riff_len != len(payload) - 8:
        raise ValueError("RIFF length mismatch")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + length > len(payload):
            raise ValueError("truncated chunk")
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            data = body
        pos += 8 + length + (length & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, n_ch, rate, byte_rate, block, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported WAV layout fmt={audio_fmt} bits={bits}")
    if byte_rate != rate * n_ch * 2 or block != n_ch * 2:
        raise ValueError("inconsistent fmt chunk")
    n = len(data) // (2 * n_ch)
    samples = struct.unpack(f"<{n * n_ch}h", data[: 2 * n * n_ch])
    return rate, n_ch, bits, samples


def decode_wav(payload: bytes) -> tuple[int, int, int, int, int, int]:
    """REAL WAV decode: RIFF/WAVE signature checks, chunk walk, fmt
    validation (PCM only), PCM16 sample parse, and two exact integer
    statistics — energy Σ s² and strict zero crossings
    (s_j · s_{j−1} < 0). Integers, not float means, so both engines
    agree bit for bit. Raises on non-WAV / non-PCM payloads."""
    rate, n_ch, bits, samples = _wav_parse(payload)
    energy = sum(s * s for s in samples)
    # Crossings per channel over the de-interleaved stream (sample j of
    # channel c is samples[j * n_ch + c]), summed — a stereo payload no
    # longer counts spurious cross-channel sign flips.
    crossings = sum(
        1
        for c in range(n_ch)
        for i in range(1, len(samples) // n_ch)
        if samples[i * n_ch + c] * samples[(i - 1) * n_ch + c] < 0
    )
    return rate, n_ch, bits, len(samples) // n_ch, energy, crossings


def with_wav_payload(docs: DataFrame) -> DataFrame:
    """Attach a real WAV binary column (Arrow-batched generation)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["doc_id"].map(encode_wav),
                }
            )

    return spread_small_scan(docs.select("doc_id")).mapInPandas(_gen, "doc_id long, payload binary")


def multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode over a binary column: per doc, parse the PCM
    WAV and emit format fields plus exact integer energy and
    zero-crossing statistics. Map-only — generation and decode fuse
    into one scan, payload bytes never shuffle. Oracle-checked: the
    oracle recomputes every field from the generation rule, so a
    chunk-walk, alignment, or sample-parse bug hash-mismatches."""
    docs = load_table(spark, sf_dir, "documents")

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_wav(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": [r[0] for r in rows],
                    "n_channels": [r[1] for r in rows],
                    "bits": [r[2] for r in rows],
                    "n_samples": [r[3] for r in rows],
                    "energy": [r[4] for r in rows],
                    "zero_crossings": [r[5] for r in rows],
                }
            )

    return with_wav_payload(docs).mapInPandas(_dec, WAV_DECODE_SCHEMA)


# ---- Cross-format image content dedup ---------------------------------


def _bmp_pixels(payload: bytes) -> tuple[int, int, bytes]:
    """(w, h, row-major RGB bytes) from a BMP payload — the pixel-level
    sibling of decode_bmp (strips row padding)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    w = struct.unpack_from("<i", payload, 18)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24:
        raise ValueError(f"unsupported BMP bpp={bpp}")
    row_bytes = w * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    out = bytearray()
    for row in range(h):
        start = offset + row * stride
        out.extend(payload[start : start + row_bytes])
    return w, h, bytes(out)


def _png_pixels(payload: bytes) -> tuple[int, int, bytes]:
    """(w, h, row-major RGB bytes) from a PNG payload — full decode
    (CRC walk, inflate, unfilter), pixel-level sibling of decode_png."""
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    idat = bytearray()
    w = h = depth = ctype = None
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", body, 0)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or depth != 8 or ctype != 2:
        raise ValueError("unsupported PNG layout")
    bpp = 3
    row_bytes = w * bpp
    flat = zlib.decompress(bytes(idat))
    if len(flat) != h * (row_bytes + 1):
        raise ValueError("IDAT length mismatch")
    out = bytearray()
    prior = [0] * row_bytes
    for r in range(h):
        start = r * (row_bytes + 1)
        ftype = flat[start]
        enc = flat[start + 1 : start + 1 + row_bytes]
        row = [0] * row_bytes
        for i, e in enumerate(enc):
            a = row[i - bpp] if i >= bpp else 0
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            if ftype == 0:
                x = e
            elif ftype == 1:
                x = (e + a) % 256
            elif ftype == 2:
                x = (e + b) % 256
            elif ftype == 3:
                x = (e + (a + b) // 2) % 256
            elif ftype == 4:
                x = (e + _paeth(a, b, c)) % 256
            else:
                raise ValueError(f"bad filter type {ftype}")
            row[i] = x
        out.extend(row)
        prior = row
    return w, h, bytes(out)


def decode_pixels(payload: bytes) -> tuple[int, int, bytes]:
    """Format-dispatching pixel decode (BMP / PNG / baseline JPEG) —
    the content NORMALIZATION step: whatever container the bytes
    arrived in, the output is (w, h, row-major RGB), so content
    comparisons are format-independent. JPEG is lossy, so its pixels
    equal another container's only where its math is exact (DC-only
    blocks — pinned in test_jpeg.py: a block-constant JPEG digests
    identically to a BMP of the same picture)."""
    if payload[:2] == b"BM":
        return _bmp_pixels(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return _png_pixels(payload)
    if payload[:3] == b"\xff\xd8\xff":
        from mimir_spark.operators.jpeg import decode_jpeg_pixels

        w, h, rgb = decode_jpeg_pixels(payload)
        return w, h, rgb.tobytes()
    raise ValueError("unrecognized image magic bytes")


def pixel_digest(w: int, h: int, px: bytes) -> int:
    """Canonical content digest: Horner fold (×131 mod 1e9+7) over
    [w, h] ++ pixel bytes — identical for the same picture in any
    container format."""
    acc = 0
    for b in (w, h, *px):
        acc = (acc * DIGEST_BASE + b) % DIGEST_MOD
    return acc


def with_mixed_image_payload(docs: DataFrame) -> DataFrame:
    """Attach a binary image column in MIXED formats: BMP or PNG by
    (doc_id // 256) % 2. The generation rule repeats pixel content
    with period 256 in doc_id, so members of the same content group
    ALTERNATE formats — cross-format duplicates exist by
    construction (an id-parity split would put a whole group in one
    format)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_bmp(int(d))
                        if (int(d) // 256) % 2 == 0
                        else encode_png(int(d))
                        for d in pdf["doc_id"]
                    ],
                }
            )

    return spread_small_scan(docs.select("doc_id")).mapInPandas(_gen, "doc_id long, payload binary")


def multimodal_dedup_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-FORMAT image content dedup: decode every payload to
    normalized (w, h, RGB) pixels — a real BMP parse or a real PNG
    inflate+unfilter per doc — digest the content, and group by
    digest. The same picture stored as a BMP in one document and a PNG
    in another lands in the same group, which is exactly what a
    training-data pipeline needs (byte-level hashing finds only
    same-container copies).

    Output: one row per duplicated content digest —
    (digest, n_copies, n_formats, survivor_id) with the smallest
    doc_id surviving. Scale shape: decode is map-only (payload bytes
    never shuffle); the groupBy key is the 8-byte digest, map-side
    combined; output is digest-group-sized, never pairs (a k-copy
    group would otherwise emit k² pair rows)."""
    docs = load_table(spark, sf_dir, "documents")

    def _dig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digs, fmts = [], []
            for p in pdf["payload"]:
                w, h, px = decode_pixels(p)
                digs.append(pixel_digest(w, h, px))
                fmts.append("bmp" if p[:2] == b"BM" else "png")
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "digest": digs, "fmt": fmts}
            )

    digests = with_mixed_image_payload(docs).mapInPandas(
        _dig, "doc_id long, digest long, fmt string"
    )
    return (
        digests.groupBy("digest")
        .agg(
            F.count("*").cast("long").alias("n_copies"),
            F.countDistinct("fmt").cast("long").alias("n_formats"),
            F.min("doc_id").alias("survivor_id"),
        )
        .filter(F.col("n_copies") > 1)
        .select("digest", "n_copies", "n_formats", "survivor_id")
    )


# ---- GIF: a REAL multi-frame (video-ish) decode path ------------------
# Animated GIF is the one genuinely multi-FRAME format implementable
# without codec libs: LZW is ~60 lines of pure Python. This turns the
# frame-sample leg of the multimodal story real end-to-end — generate
# a spec-valid multi-frame GIF, parse it (header, logical screen
# descriptor, global color table, per-frame descriptors, sub-block
# stream), LZW-decompress every frame with true dictionary growth
# (9→12-bit codes, clear-code resets, the KwKwK case), and sample
# every n-th frame. javax.imageio cross-validates frame count,
# dimensions, and every pixel in tests.

GIF_N_COLORS = 256


def _gif_palette() -> list:
    """Fixed 256-entry RGB palette: palette[i] = ((i*7)%256, (i*11)%256,
    (i*13)%256)."""
    return [
        ((i * 7) % 256, (i * 11) % 256, (i * 13) % 256)
        for i in range(GIF_N_COLORS)
    ]


def _gif_frame_indices(doc_id: int, f: int, w: int, h: int) -> list:
    """Frame f's palette indices: idx_j = (id*31 + f*17 + j) % 256."""
    return [(doc_id * 31 + f * 17 + j) % 256 for j in range(w * h)]


def _lzw_encode(indices: list, min_code_size: int = 8) -> bytes:
    """GIF-variant LZW: LSB-first bit packing, clear/end codes,
    code-width growth 9→12 bits, dictionary reset at 4096."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh() -> tuple:
        return {bytes([i]): i for i in range(clear)}, end + 1, min_code_size + 1

    table, nxt, size = fresh()
    emit(clear, size)
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w], size)
        if nxt < 4096:
            table[wk] = nxt
            nxt += 1
            # The decoder builds its table one entry BEHIND the
            # encoder and widens when ITS next-free hits 2^size, so
            # the encoder widens one entry later: after adding entry
            # 2^size (nxt == 2^size + 1).
            if nxt == (1 << size) + 1 and size < 12:
                size += 1
        else:
            emit(clear, size)
            table, nxt, size = fresh()
        w = bytes([k])
    if w:
        emit(table[w], size)
    emit(end, size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int = 8) -> bytes:
    """Full GIF LZW decoder: dictionary rebuild on clear, KwKwK
    handling, code width growth synchronized with the encoder."""
    clear = 1 << min_code_size
    end = clear + 1
    pos = 0

    def read(size: int):
        nonlocal pos
        if pos + size > len(data) * 8:
            return None
        byte, bit = divmod(pos, 8)
        val = 0
        got = 0
        while got < size:
            val |= (data[byte] >> bit) << got
            got += 8 - bit
            bit = 0
            byte += 1
        pos += size
        return val & ((1 << size) - 1)

    out = bytearray()
    table = [bytes([i]) for i in range(clear)] + [b"", b""]
    size = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = read(size)
        if code is None or code == end:
            break
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            size = min_code_size + 1
            prev = None
            continue
        if prev is None:
            if code >= clear:  # first code must be a literal
                raise ValueError(f"LZW stream starts with code {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:  # table frozen at 12-bit capacity
                table.append(prev + entry[:1])
        else:  # KwKwK: only code == len(table) is decodable
            if code != len(table):
                raise ValueError(f"LZW code {code} beyond table")
            entry = prev + prev[:1]
            table.append(entry)
        out.extend(entry)
        if len(table) == (1 << size) and size < 12:
            size += 1
        prev = entry
    return bytes(out)


def encode_gif(doc_id: int) -> bytes:
    """Deterministic multi-frame GIF89a per doc: n_frames=(id%6)+2,
    frame size w=(id%8)+2 × h=(id%4)+2, fixed global palette, real
    LZW-compressed frame data."""
    w, h = (doc_id % 8) + 2, (doc_id % 4) + 2
    n_frames = (doc_id % 6) + 2
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h) + bytes([0xF7, 0, 0])
    for r, g, b in _gif_palette():
        out += bytes([r, g, b])
    for f in range(n_frames):
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out.append(8)  # LZW min code size
        lzw = _lzw_encode(_gif_frame_indices(doc_id, f, w, h))
        for i in range(0, len(lzw), 255):
            block = lzw[i : i + 255]
            out.append(len(block))
            out += block
        out.append(0)  # block terminator
    out.append(0x3B)
    return bytes(out)


def decode_gif(payload: bytes):
    """REAL multi-frame GIF decode: header + logical screen descriptor
    checks, global color table, per-frame image descriptors, sub-block
    reassembly, full LZW decompression, palette mapping. Returns
    (width, height, [frame RGB-byte lists])."""
    if payload[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF payload")
    w, h = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    if not packed & 0x80:
        raise ValueError("missing global color table")
    gct_size = 2 << (packed & 0x07)
    pos = 13
    palette = [
        tuple(payload[pos + 3 * i : pos + 3 * i + 3]) for i in range(gct_size)
    ]
    pos += 3 * gct_size
    frames = []
    while pos < len(payload):
        marker = payload[pos]
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension: skip sub-blocks
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if marker != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{marker:02x}")
        fl, ft, fw, fh = struct.unpack_from("<HHHH", payload, pos + 1)
        fpacked = payload[pos + 9]
        if fpacked & 0xC0:
            raise ValueError("local color table / interlace unsupported")
        if fl or ft or (fw, fh) != (w, h):
            raise ValueError("offset/partial GIF frames unsupported")
        pos += 10
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos]:
            n = payload[pos]
            data += payload[pos + 1 : pos + 1 + n]
            pos += 1 + n
        pos += 1
        idx = _lzw_decode(bytes(data), min_code)
        if len(idx) < fw * fh:
            raise ValueError("LZW underflow")
        rgb = []
        for i in idx[: fw * fh]:
            rgb.extend(palette[i])
        frames.append(rgb)
    return w, h, frames


GIF_FRAME_SCHEMA = (
    "doc_id long, width int, height int, n_frames long,"
    " n_sampled long, sum_sampled long"
)


def multimodal_frame_sample_gif(
    spark: SparkSession, sf_dir: str, every_n: int = 2
) -> DataFrame:
    """REAL frame sampling over a multi-frame (video-ish) binary
    column: per doc, fully decode the animated GIF and keep every
    `every_n`-th frame, emitting frame counts and the exact RGB byte
    sum over the SAMPLED frames. Map-only — generation, LZW decode,
    and sampling fuse into one scan. Oracle-checked: the oracle
    recomputes the sampled-frame sum from the generation rule +
    palette arithmetic, so an LZW, sub-block, or palette bug
    hash-mismatches immediately. (A real pipeline samples frames
    BEFORE decoding the rest — here every frame must be decoded
    anyway to verify the stream, which is the honest cost of a
    format with inter-frame byte offsets only discoverable by
    walking the stream.)"""
    docs = load_table(spark, sf_dir, "documents")

    def _gen_dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                w, h, frames = decode_gif(encode_gif(int(d)))
                sampled = frames[::every_n]
                rows.append(
                    (
                        int(d),
                        w,
                        h,
                        len(frames),
                        len(sampled),
                        sum(sum(f) for f in sampled),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "n_frames",
                    "n_sampled",
                    "sum_sampled",
                ],
            )

    return spread_small_scan(docs.select("doc_id")).mapInPandas(_gen_dec, GIF_FRAME_SCHEMA)


AUDIO_FRAME = 16
AUDIO_LOUD_THRESHOLD = 16 * 1024 * 1024  # int energy, ~1/4 of a full frame
AUDIO_FEATURES_SCHEMA = (
    "doc_id long, n_samples long, n_frames long, total_energy long,"
    " max_frame_energy long, n_loud_frames long"
)


def multimodal_audio_features(
    spark: SparkSession, sf_dir: str, frame: int = AUDIO_FRAME
) -> DataFrame:
    """Frame-level audio feature extraction over the decoded WAV
    column: split each doc's PCM16 samples into `frame`-sample frames
    (last one partial) and emit exact integer frame statistics —
    total energy, the loudest frame's energy, and the count of frames
    above a fixed loudness threshold (the segmentation signal a
    speech-data pipeline gates on before transcription). Map-only:
    generation, RIFF parse, and framing fuse into one scan; all
    statistics are integers so both engines agree bit for bit."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents")

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                # the frames come from the DECODED stream (one RIFF
                # parse per doc, samples reused) — a sample-parse bug
                # shifts every frame statistic, not just the total
                rate, ch, bits, samples = _wav_parse(encode_wav(int(d)))
                s = np.array(samples, dtype=np.int64)
                pad = (-len(s)) % frame
                sq = np.concatenate([s * s, np.zeros(pad, dtype=np.int64)])
                fe = sq.reshape(-1, frame).sum(axis=1)
                rows.append(
                    (
                        int(d),
                        len(s),
                        len(fe),
                        int(sq.sum()),
                        int(fe.max()),
                        int((fe >= AUDIO_LOUD_THRESHOLD).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_samples",
                    "n_frames",
                    "total_energy",
                    "max_frame_energy",
                    "n_loud_frames",
                ],
            )

    return spread_small_scan(docs.select("doc_id")).mapInPandas(_feat, AUDIO_FEATURES_SCHEMA)


# ---- Decoded-pixel features + real resize ------------------------------
# The feature/resize legs graduated from byte-stub to DECODED-content
# kernels: both run on the mixed BMP/PNG payload and reach the pixels
# through the real format parsers (decode_pixels), so a decode bug in
# either codec shows up as a hash mismatch here too. Mimir's convert/
# map stage analogue for binary columns: map-only, payload bytes never
# shuffle.

PIXEL_FEATURES_SCHEMA = (
    "doc_id long, width int, height int, "
    "sum_r long, sum_g long, sum_b long, "
    + ", ".join(f"lum{k} long" for k in range(8))
)


def pixel_features_transform(docs: DataFrame) -> DataFrame:
    """The pixel-features kernel as a plain DataFrame transform —
    stateless and map-only, so the SAME code path serves the batch
    operator and its streaming twin (streaming.jobs
    .streaming_pixel_features) bit-identically."""
    import numpy as np

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = decode_pixels(p)
                arr = np.frombuffer(px, dtype=np.uint8).reshape(-1, 3)
                sums = arr.sum(axis=0, dtype=np.int64)
                lum = arr.sum(axis=1, dtype=np.int64) // 3
                hist = np.bincount(lum // 32, minlength=8)
                rows.append(
                    (int(d), w, h, *map(int, sums), *map(int, hist[:8]))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "sum_r", "sum_g",
                         "sum_b", *[f"lum{k}" for k in range(8)]],
            )

    return with_mixed_image_payload(docs).mapInPandas(
        _feat, PIXEL_FEATURES_SCHEMA
    )


def multimodal_pixel_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel pixel statistics from a REAL decode: each mixed
    BMP/PNG payload is parsed to row-major RGB, then per-channel sums
    and an 8-bin luminance histogram (lum = (r+g+b)//3, bin = lum//32)
    are computed vectorized over the decoded array. This is the
    decoded-content replacement for the byte-histogram featurizer stub
    (`_featurize_batches`): integer outputs, so the whole row is
    driver-hashable against a closed-form oracle.

    Scale shape: map-only mapInPandas — decode parallelism follows the
    input partitioning, no shuffle, payload read exactly once."""
    return pixel_features_transform(load_table(spark, sf_dir, "documents"))


def resize_pixels_nn(w: int, h: int, px: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbour resize over row-major RGB bytes with the
    integer source mapping src_x = x*w // out_w, src_y = y*h // out_h
    (top-left anchored — deterministic and closed-form, so an external
    comparator can recompute every output byte)."""
    import numpy as np

    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[np.ix_(ys, xs)].tobytes()


def resize_pixels_transform(docs: DataFrame) -> DataFrame:
    """The decoded-resize kernel as a plain DataFrame transform —
    stateless and map-only, shared bit-identically by the batch
    operator and streaming.jobs.streaming_resize_pixels."""
    out_w, out_h = RESIZE_TARGET

    def _rsz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = decode_pixels(p)
                out = resize_pixels_nn(w, h, px, out_w, out_h)
                rows.append(
                    (int(d), w, h, out_w, out_h,
                     pixel_digest(out_w, out_h, out))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "out_width",
                         "out_height", "digest"],
            )

    return with_mixed_image_payload(docs).mapInPandas(
        _rsz,
        "doc_id long, width int, height int, out_width int,"
        " out_height int, digest long",
    )


def multimodal_resize_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize: decode the mixed BMP/PNG payload to pixels,
    nearest-neighbour-resample to RESIZE_TARGET, and emit the Horner
    digest of the resized content ([out_w, out_h] ++ RGB bytes — same
    fold as `pixel_digest`). Replaces the byte-decimation stub resize
    with a decoded-content kernel whose every output byte has a
    closed-form oracle (and a pytest pin against an independent loop
    resize). Map-only; the only bytes that cross stages are the
    12-byte output row, never the payload."""
    return resize_pixels_transform(load_table(spark, sf_dir, "documents"))


# ---- Perceptual near-duplicate image dedup (round 11) -------------------
# multimodal_dedup_images groups EXACT decoded-pixel digests, which a
# resized or re-encoded copy provably escapes (different dims => a
# different digest). The perceptual path hashes image STRUCTURE: a
# 64-level dHash (difference hash) over a 9x8 nearest-neighbor
# grayscale sample grid is invariant to container format, integer
# upscaling, and uniform brightness shifts, so near-copies land within
# a small hamming distance and the existing SimHash pigeonhole
# machinery (dedup.simhash_chunks) finds the pairs with a bounded
# bucket join — never all-pairs.

DHASH_GRID_W, DHASH_GRID_H = 9, 8  # 9x8 samples -> 8 comparisons/row


def dhash63(w: int, h: int, px: bytes) -> int:
    """63-bit difference hash over decoded RGB pixels: sample a 9x8
    grayscale grid with nearest-neighbor coordinates sx = gx*w//9,
    sy = gy*h//8, then bit k = gy*8+gx is 1 iff grid[gy][gx+1] >
    grid[gy][gx] (k = 0..62; the 64th comparison is dropped so the
    value stays non-negative in a signed 64-bit column on both
    engines). NN sampling makes the hash EXACTLY invariant under 2x
    nearest-neighbor upscaling: floor(floor(2a)/2) == floor(a), so an
    upscaled copy samples the identical source pixels."""
    g = [[0] * DHASH_GRID_W for _ in range(DHASH_GRID_H)]
    for gy in range(DHASH_GRID_H):
        sy = gy * h // DHASH_GRID_H
        for gx in range(DHASH_GRID_W):
            sx = gx * w // DHASH_GRID_W
            o = (sy * w + sx) * 3
            g[gy][gx] = (px[o] + px[o + 1] + px[o + 2]) // 3
    fp = 0
    for gy in range(DHASH_GRID_H):
        for gx in range(DHASH_GRID_W - 1):
            k = gy * 8 + gx
            if k > 62:
                break
            if g[gy][gx + 1] > g[gy][gx]:
                fp |= 1 << k
    return fp


def _near_dup_base_byte(seed: int, j: int) -> int:
    """Base pixel byte j for content seed `seed` — quadratic in j so
    the pattern is scattered, not a monotone ramp (a linear ramp makes
    every image's dHash near-constant and collapses all docs into one
    near-dup clique)."""
    return (seed * 97 + j * j * 13 + j * 29) % 256


def encode_near_dup_image(doc_id: int) -> bytes:
    """Near-dup image generator: docs in groups of 4 share one content
    seed s = doc_id // 4; variant v = doc_id % 4 is
      v=0 the original BMP (w0=(s%12)+5, h0=(s%6)+5),
      v=1 the SAME pixels re-encoded as PNG (exact content dup),
      v=2 a 2x nearest-neighbor UPSCALE as PNG (resized copy — the
          exact pixel digest provably differs, dHash is identical),
      v=3 a 2x upscale +2 uniform brightness (mod 256) as BMP
          (re-processed copy — small dHash hamming where bytes wrap).
    """
    s, v = doc_id // 4, doc_id % 4
    w0, h0 = (s % 12) + 5, (s % 6) + 5
    base = [_near_dup_base_byte(s, j) for j in range(w0 * h0 * 3)]
    if v == 0:
        return encode_bmp_rgb(w0, h0, base)
    if v == 1:
        return encode_png_rgb(w0, h0, base)
    up = []
    for y in range(2 * h0):
        for x in range(2 * w0):
            o = ((y // 2) * w0 + (x // 2)) * 3
            up.extend(base[o : o + 3])
    if v == 2:
        return encode_png_rgb(2 * w0, 2 * h0, up)
    return encode_bmp_rgb(2 * w0, 2 * h0, [(b + 2) % 256 for b in up])


def with_near_dup_image_payload(docs: DataFrame) -> DataFrame:
    """Attach the near-dup binary image column (Arrow-batched)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_near_dup_image(int(d)) for d in pdf["doc_id"]
                    ],
                }
            )

    return spread_small_scan(docs.select("doc_id")).mapInPandas(_gen, "doc_id long, payload binary")


def multimodal_dedup_images_near(
    spark: SparkSession, sf_dir: str, max_hamming: int = 3
) -> DataFrame:
    """PERCEPTUAL near-duplicate image pairs — the LAION-scale
    complement to multimodal_dedup_images' exact-digest groups: decode
    every payload (real BMP/PNG parse), compute the 63-bit dHash and
    the exact pixel digest in ONE kernel pass, then find hamming <= 3
    pairs via the 4x16-bit pigeonhole bucket join shared with
    dedup_simhash (dedup.simhash_chunks carrying the digest column).

    Output one row per near-dup pair: (doc_a, doc_b, hamming,
    same_content) — same_content = 1 iff the exact pixel digests also
    match, so same_content = 0 rows are precisely the copies the exact
    path at multimodal_dedup_images MISSES (resized / re-processed).

    Scale shape: decode is map-only (payload bytes never shuffle; only
    the 16-byte (fp, digest) row leaves the kernel); candidates come
    from a bounded (chunk, key) bucket equi-join, never an all-pairs
    product; hamming verification is one bit_count per candidate."""
    from mimir_spark.operators.dedup import simhash_chunks

    docs = load_table(spark, sf_dir, "documents")

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps, digs = [], []
            for p in pdf["payload"]:
                w, h, px = decode_pixels(p)
                fps.append(dhash63(w, h, px))
                digs.append(pixel_digest(w, h, px))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "fp": fps, "digest": digs}
            )

    fp = with_near_dup_image_payload(docs).mapInPandas(
        _fp, "doc_id long, fp long, digest long"
    )
    chunks = simhash_chunks(fp, carry=("digest",))
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.fp").alias("fa"),
            F.col("b.fp").alias("fb"),
            F.col("a.digest").alias("dig_a"),
            F.col("b.digest").alias("dig_b"),
        )
        .distinct()
    )
    return (
        pairs.withColumn(
            "hamming",
            F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(
            "doc_a",
            "doc_b",
            "hamming",
            (F.col("dig_a") == F.col("dig_b")).cast("long").alias(
                "same_content"
            ),
        )
    )


def multimodal_near_dup_survivors(
    spark: SparkSession, sf_dir: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup image CLUSTERS + survivors — the keep-list completion
    of multimodal_dedup_images_near (pairs alone don't dedup a corpus):
    connected components over the hamming <= 3 dHash pair graph via the
    shared min-label finisher (dedup.min_label_components — the same
    finisher every text dedup family uses), keeping per cluster the
    HIGHEST-RESOLUTION copy (max pixel count, ties -> lowest doc_id) —
    the image survivor rule a LAION-scale pipeline wants (the 2x
    upscale beats its original; a text pipeline keeps the longest doc
    for the same reason).

    Output one row per cluster: (cluster_id, survivor_doc_id,
    n_members, survivor_pixels). Scale shape: pairs come from the
    bounded pigeonhole join (min_label_components materializes them
    once via its eager localCheckpoint); the member-metadata join
    decodes dimensions in one extra map-only pass — at production
    scale the fingerprint table (doc_id, fp, digest, w*h) is persisted
    once and every consumer reads it instead."""
    from mimir_spark.operators.dedup import min_label_components

    pairs = multimodal_dedup_images_near(spark, sf_dir, max_hamming).select(
        "doc_a", "doc_b"
    )
    clusters = min_label_components(pairs)

    docs = load_table(spark, sf_dir, "documents")

    def _npix(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            npix = []
            for p in pdf["payload"]:
                w, h, _ = decode_pixels(p)
                npix.append(w * h)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "npix": npix})

    meta = with_near_dup_image_payload(docs).mapInPandas(
        _npix, "doc_id long, npix long"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.col("npix").desc(), F.col("doc_id")
    )
    return (
        clusters.join(meta, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_members",
            F.count("*").over(Window.partitionBy("cluster_id")).cast("long"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("survivor_doc_id"),
            "n_members",
            F.col("npix").alias("survivor_pixels"),
        )
    )


# ---- MJPEG-in-AVI frame sampling (round 14) ----------------------------------
# Real VIDEO container decode without a new codec: AVI is a RIFF form
# (the WAV recipe's chunk walk applied one level deeper — LIST chunks
# nest) and MJPEG stores one ordinary baseline JPEG per '00dc' chunk,
# so the existing decode_jpeg_auto kernel handles every frame. The
# generator emits a minimal spec-shaped file: RIFF('AVI ') →
# LIST(hdrl){avih} → LIST(movi){00dc...}, word-aligned chunks, frame
# count and dimensions declared in avih and verified against the movi
# walk — exactly the validation a real ingest does.

MJPEG_FRAME_SCHEMA = (
    "doc_id long, width int, height int, n_frames long,"
    " n_sampled long, sum_sampled long"
)


def _mjpeg_frame_pixels(doc_id: int, frame: int):
    """Block-constant grayscale frame: the encode_jpeg_gray_blocks
    rule with the frame index mixed in (v_b = (id·31 + 17·f + 7·b) %
    256) — DC-only blocks, so any conforming JPEG decoder is
    bit-exact and the oracle recomputes the sum in closed form."""
    import numpy as np

    nbx, nby = (doc_id % 4) + 1, (doc_id % 2) + 1
    px = np.zeros((nby * 8, nbx * 8), dtype=np.uint8)
    for by in range(nby):
        for bx in range(nbx):
            v = (doc_id * 31 + 17 * frame + 7 * (by * nbx + bx)) % 256
            px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
    return px


def encode_mjpeg_avi(doc_id: int) -> bytes:
    """Deterministic MJPEG AVI per doc: n_frames=(id%5)+2 baseline
    JPEGs (one per '00dc' chunk) of fixed size 8·((id%4)+1) ×
    8·((id%2)+1), declared in a real avih header."""
    from mimir_spark.operators.jpeg import encode_jpeg

    n_frames = (doc_id % 5) + 2
    w, h = 8 * ((doc_id % 4) + 1), 8 * ((doc_id % 2) + 1)
    frames = [
        encode_jpeg(_mjpeg_frame_pixels(doc_id, f)) for f in range(n_frames)
    ]
    avih = struct.pack(
        "<14I", 40000, 0, 0, 0, n_frames, 0, 1, 0, w, h, 0, 0, 0, 0
    )
    hdrl_body = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    movi_body = bytearray(b"movi")
    for fpay in frames:
        movi_body += b"00dc" + struct.pack("<I", len(fpay)) + fpay
        if len(fpay) & 1:
            movi_body += b"\x00"  # RIFF chunks are word-aligned
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + bytes(movi_body)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_mjpeg_avi(payload: bytes) -> tuple[int, int, list[bytes]]:
    """REAL AVI container walk: RIFF signature + total-length check,
    top-level LIST iteration, avih parse (frame count + dimensions),
    movi '00dc' chunk collection with word-aligned advance, and a
    declared-vs-found frame-count cross-check. Returns
    (width, height, [per-frame JPEG payloads])."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    (total,) = struct.unpack_from("<I", payload, 4)
    if total != len(payload) - 8:
        raise ValueError("RIFF length mismatch")
    pos = 12
    declared = w = h = None
    frames: list[bytes] = []
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        if tag == b"LIST":
            form = body[:4]
            sub, subend = 8 + 4, 8 + length
            if form == b"hdrl":
                p2 = pos + sub
                while p2 + 8 <= pos + subend:
                    t2 = payload[p2 : p2 + 4]
                    (l2,) = struct.unpack_from("<I", payload, p2 + 4)
                    if t2 == b"avih":
                        if l2 < 40:
                            raise ValueError("short avih")
                        vals = struct.unpack_from("<10I", payload, p2 + 8)
                        declared, w, h = vals[4], vals[8], vals[9]
                    p2 += 8 + l2 + (l2 & 1)
            elif form == b"movi":
                p2 = pos + sub
                while p2 + 8 <= pos + subend:
                    t2 = payload[p2 : p2 + 4]
                    (l2,) = struct.unpack_from("<I", payload, p2 + 4)
                    if t2[2:4] in (b"dc", b"db"):
                        frames.append(payload[p2 + 8 : p2 + 8 + l2])
                    p2 += 8 + l2 + (l2 & 1)
        pos += 8 + length + (length & 1)
    if declared is None:
        raise ValueError("missing avih header")
    if len(frames) != declared:
        raise ValueError(
            f"frame count mismatch: avih={declared} movi={len(frames)}"
        )
    return int(w), int(h), frames


def multimodal_frame_sample_mjpeg(
    spark: SparkSession, sf_dir: str, every_n: int = 2
) -> DataFrame:
    """Frame sampling over a REAL video container: per doc, walk the
    MJPEG AVI, keep every `every_n`-th frame WITHOUT decoding the
    skipped ones (unlike GIF, RIFF chunk lengths make frame payloads
    addressable without decompression — the actual reason MJPEG
    ingest is cheap), decode the sampled frames through the shared
    JPEG kernel (decode_jpeg_auto: libjpeg when importable, strict
    pure-Python otherwise), and cross-check frame dimensions against
    the avih declaration. Map-only, one fused Arrow pass.

    Oracle: generation rule in closed form — sum_sampled =
    Σ_{f ≡ 0 (mod every_n)} 3·64·Σ_b (id·31+17·f+7·b) % 256."""
    docs = load_table(spark, sf_dir, "documents")

    def _gen_dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mimir_spark.operators.jpeg import decode_jpeg_auto

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                w, h, frames = decode_mjpeg_avi(encode_mjpeg_avi(int(d)))
                sampled = frames[::every_n]
                total = 0
                for fpay in sampled:
                    fw, fh, _bpp, _npx, s = decode_jpeg_auto(fpay)
                    if (fw, fh) != (w, h):
                        raise ValueError(
                            "frame dims disagree with avih declaration"
                        )
                    total += s
                rows.append(
                    (int(d), w, h, len(frames), len(sampled), total)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_frames",
                    "n_sampled", "sum_sampled",
                ],
            )

    return spread_small_scan(docs.select("doc_id")).mapInPandas(_gen_dec, MJPEG_FRAME_SCHEMA)
