"""Baseline-JPEG codec pins (operators/jpeg.py).

Validation strategy mirrors PNG's: round trips alone would hide
symmetric encoder/decoder bugs, so every path is cross-checked against
javax.imageio (an independent production codec in the Spark JVM) —
exactly where the math is exact (DC-only blocks), within the ±small
tolerance conforming IDCTs/upsamplers actually differ by elsewhere.
NOTE: java's getRGB() on grayscale images applies a gray→sRGB
colorspace transform; raster samples are the raw decoded values.
"""

from __future__ import annotations

import numpy as np
import pytest

from mimir_spark.operators.jpeg import (
    UnsupportedJpeg,
    decode_jpeg,
    decode_jpeg_pixels,
    encode_jpeg,
    encode_jpeg_gray_blocks,
)


def _expected_stats(d: int):
    nbx, nby = (d % 4) + 1, (d % 2) + 1
    s = 3 * 64 * sum((d * 31 + 7 * b) % 256 for b in range(nbx * nby))
    return nbx * 8, nby * 8, 24, nbx * nby * 64, s


def _java_raster(jvm, payload: bytes, bands: int) -> np.ndarray:
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(payload))
    )
    assert img is not None, "javax.imageio could not parse the payload"
    r = img.getRaster()
    w, h = img.getWidth(), img.getHeight()
    out = np.zeros((h, w, bands), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            for b in range(bands):
                out[y, x, b] = r.getSample(x, y, b)
    return out


def test_jpeg_dc_only_roundtrip_exact_and_dispatch():
    """The generator's block-constant grays decode EXACTLY to the
    closed form (all 8 size combinations × many DC wraparounds), and
    decode_image dispatches JPEG magic to the same kernel."""
    from mimir_spark.operators.multimodal import decode_image

    for d in range(80):
        p = encode_jpeg_gray_blocks(d)
        assert p[:3] == b"\xff\xd8\xff" and p[-2:] == b"\xff\xd9"
        got = decode_jpeg(p)
        assert got == _expected_stats(d), d
        assert decode_image(p) == got


def test_jpeg_dc_only_cross_decoded_by_java(spark):
    """javax.imageio agrees pixel-for-pixel on DC-only payloads — any
    conforming IDCT is exact there, so a mismatch is a real Huffman /
    DC-prediction / dequant / placement bug on one side."""
    jvm = spark._jvm
    for d in (0, 7, 13, 42, 99, 254):
        p = encode_jpeg_gray_blocks(d)
        w, h, rgb = decode_jpeg_pixels(p)
        j = _java_raster(jvm, p, 1)[:, :, 0]
        assert j.shape == (h, w)
        assert np.array_equal(j, rgb[:, :, 0].astype(np.int64)), d


def test_jpeg_ac_gray_vs_java_encoder(spark):
    """Decode a JAVA-ENCODED grayscale JPEG (production encoder, full
    AC path, its own table choices): per-pixel agreement within ±1 —
    the documented slack between conforming float/integer IDCTs."""
    jvm = spark._jvm
    yy, xx = np.mgrid[0:16, 0:24]
    g = np.clip(xx * 7 + yy * 5, 0, 255).astype(np.uint8)
    bi = jvm.java.awt.image.BufferedImage(24, 16, 10)  # TYPE_BYTE_GRAY
    for y in range(16):
        for x in range(24):
            v = int(g[y, x])
            bi.setRGB(x, y, (v << 16) | (v << 8) | v)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bi, "jpg", baos)
    jp = bytes(baos.toByteArray())
    w, h, rgb = decode_jpeg_pixels(jp)
    assert (w, h) == (24, 16)
    j = _java_raster(jvm, jp, 1)[:, :, 0]
    assert np.abs(j - rgb[:, :, 0].astype(np.int64)).max() <= 1


def test_jpeg_420_color_vs_java_encoder(spark):
    """Java's encoder writes 4:2:0 — decoding it exercises the MCU
    interleave + chroma upsampling path. Replication upsampling vs
    java's triangular filter differ most at block edges, so the pin is
    a mean bound plus a loose max, on a smooth (non-wrapping) ramp."""
    jvm = spark._jvm
    yy, xx = np.mgrid[0:16, 0:24]
    px = np.stack(
        [
            np.clip(20 + xx * 6, 0, 255),
            np.clip(30 + yy * 9, 0, 255),
            np.clip(240 - xx * 4 - yy * 3, 0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    bi = jvm.java.awt.image.BufferedImage(24, 16, 1)  # TYPE_INT_RGB
    for y in range(16):
        for x in range(24):
            bi.setRGB(
                x, y,
                (int(px[y, x, 0]) << 16)
                | (int(px[y, x, 1]) << 8)
                | int(px[y, x, 2]),
            )
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bi, "jpg", baos)
    jp = bytes(baos.toByteArray())
    w, h, rgb = decode_jpeg_pixels(jp)
    assert (w, h) == (24, 16)
    j = _java_raster(jvm, jp, 3)
    diff = np.abs(j - rgb.astype(np.int64))
    assert diff.mean() <= 3.0, diff.mean()
    assert diff.max() <= 32, diff.max()


def test_jpeg_my_color_444_vs_java(spark):
    """Java decodes MY 4:4:4 color stream (no upsampling ambiguity):
    per-pixel within ±2 (IDCT + YCbCr rounding)."""
    jvm = spark._jvm
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, (24, 40, 3)).astype(np.uint8)
    p = encode_jpeg(px)
    w, h, rgb = decode_jpeg_pixels(p)
    assert (w, h) == (40, 24)
    j = _java_raster(jvm, p, 3)
    assert np.abs(j - rgb.astype(np.int64)).max() <= 2


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn: encoder emits restart markers every 2 MCUs, decoder
    byte-aligns, consumes them and resets DC predictors — identical
    pixels to the marker-free stream."""
    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, (16, 32, 3)).astype(np.uint8)
    plain = decode_jpeg_pixels(encode_jpeg(px))[2]
    rst = decode_jpeg_pixels(encode_jpeg(px, restart_interval=2))[2]
    assert np.array_equal(plain, rst)
    g = rng.randint(0, 256, (24, 24)).astype(np.uint8)
    plain = decode_jpeg_pixels(encode_jpeg(g))[2]
    rst = decode_jpeg_pixels(encode_jpeg(g, restart_interval=3))[2]
    assert np.array_equal(plain, rst)


def test_jpeg_coarse_quant_roundtrip_behaves():
    """A 16s quant table exercises long zero runs / ZRL / larger DC
    categories; reconstruction must stay within normal lossy error."""
    rng = np.random.RandomState(2)
    px = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    qt = np.full((8, 8), 16, dtype=np.int64)
    w, h, rgb = decode_jpeg_pixels(encode_jpeg(px, quant=qt))
    assert (w, h) == (16, 16)
    err = np.abs(rgb.astype(int) - px.astype(int)).mean()
    assert err < 30, err


def test_jpeg_rejects_corruption():
    p = encode_jpeg_gray_blocks(7)
    with pytest.raises(ValueError):
        decode_jpeg(p[: len(p) // 2])  # truncated entropy segment
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01garbage")
    with pytest.raises(UnsupportedJpeg):
        decode_jpeg(b"\xff\xd8\xff\xc2\x00\x0bprogressive")
    # stray marker inside the entropy stream
    bad = bytearray(p)
    bad[-20] = 0xFF
    bad[-19] = 0xC4
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))


def test_jpeg_joins_cross_format_pixel_normalization():
    """decode_pixels dispatches JPEG into the same (w, h, RGB)
    normalization as BMP/PNG: a block-constant picture stored as a
    JPEG digests IDENTICALLY to the same picture packed as a BMP —
    the exactness window where a lossy container can participate in
    cross-format content dedup."""
    import struct as _struct

    from mimir_spark.operators.multimodal import (
        BMP_HEADER_BYTES,
        decode_pixels,
        pixel_digest,
    )

    d = 13
    jp = encode_jpeg_gray_blocks(d)
    wj, hj, pxj = decode_pixels(jp)

    # pack the same block-constant picture as a bottom-up 24-bit BMP
    nbx, nby = (d % 4) + 1, (d % 2) + 1
    w, h = nbx * 8, nby * 8
    rows = []
    for y in range(h):
        row = bytearray()
        for x in range(w):
            v = (d * 31 + 7 * ((y // 8) * nbx + (x // 8))) % 256
            row += bytes([v, v, v])
        rows.append(bytes(row))
    # _bmp_pixels normalizes in FILE order (the BMP/PNG generation rule
    # is defined that way), so write rows top-down; w%4==0 → no pad
    body = b"".join(rows)
    header = _struct.pack(
        "<2sIHHI", b"BM", BMP_HEADER_BYTES + len(body), 0, 0,
        BMP_HEADER_BYTES,
    ) + _struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    wb, hb, pxb = decode_pixels(header + body)
    assert (wj, hj) == (wb, hb) == (w, h)
    assert pixel_digest(wj, hj, pxj) == pixel_digest(wb, hb, pxb)


def test_multimodal_decode_jpeg_operator(spark, sf_smoke):
    """The Spark operator end-to-end at sf0.001: every row matches the
    closed-form generation rule (the driver oracle's arithmetic)."""
    from mimir_spark.operators.multimodal import multimodal_decode_jpeg

    rows = multimodal_decode_jpeg(spark, sf_smoke).collect()
    assert len(rows) > 0
    for r in rows:
        assert (
            r.width, r.height, r.bpp, r.n_pixels, r.sum_pixels
        ) == _expected_stats(r.doc_id)
