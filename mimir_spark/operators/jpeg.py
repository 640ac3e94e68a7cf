"""Pure-Python baseline JPEG codec (ITU-T T.81 baseline sequential
DCT, Annex F; JFIF container) — the last multimodal input format that
previously required PIL.

Scope is the honest production baseline: 8-bit samples, Huffman
entropy coding, sequential DCT, grayscale or YCbCr with per-component
sampling factors up to 2 (so 4:4:4, 4:2:2 and 4:2:0 all decode),
restart markers. Progressive (SOF2), arithmetic coding, hierarchical
and 12-bit modes raise UnsupportedJpeg — decode_image falls back to
PIL for those when it is importable, keeping the declared dependency
boundary visible instead of silently mis-decoding.

Exactness model (mirrors the PNG/BMP keys): JPEG is lossy and the
spec does not pin one IDCT, so cross-decoder agreement is exact ONLY
where the math is exact — DC-only blocks (every 8×8 block a constant),
where any conforming IDCT reproduces the constant exactly. The
generator therefore emits block-constant grayscale JPEGs with an
all-ones quant table: encode → decode is bit-exact, javax.imageio
agrees pixel-for-pixel (pytest-pinned), and the driver oracle
recomputes the decoded statistics from the generation rule in SQL.
The full AC/chroma path is exercised separately against javax.imageio
with the ±2/pixel tolerance conforming IDCTs actually differ by.

The encoder exists to make the decoder falsifiable (same move as
encode_png): real Huffman streams, real byte stuffing, real Annex K
code tables — not a fixture file.
"""

from __future__ import annotations

import struct

import numpy as np

# ---- Annex K standard Huffman table specs (BITS, HUFFVAL) -------------

_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHR_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis A: S = A s Aᵀ, s = Aᵀ S A."""
    a = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return a


_A = _dct_basis()


class UnsupportedJpeg(ValueError):
    """Valid-looking JPEG using a mode outside the baseline scope
    (progressive, arithmetic, 12-bit, hierarchical)."""


def _canonical_codes(bits: list, vals: list) -> dict:
    """BITS/HUFFVAL → {symbol: (code, length)} per Annex C."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# ---- encoder ----------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def align(self) -> None:
        """Pad the current partial byte with 1-bits (marker boundary)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def marker(self, byte: int) -> None:
        """Emit a raw FF xx marker (not subject to byte stuffing)."""
        self.align()
        self.buf += bytes([0xFF, byte])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, raw bits) encoding of a DC diff / AC value."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(
    writer: _BitWriter, coef: np.ndarray, pred: int, dc_codes: dict,
    ac_codes: dict,
) -> int:
    """Huffman-encode one quantized 8×8 block (natural order input);
    returns the new DC predictor."""
    zz = [int(coef.flat[_ZIGZAG[i]]) for i in range(64)]
    size, bits = _magnitude(zz[0] - pred)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(bits, size)
    run = 0
    for v in zz[1:]:
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(bits, size)
        run = 0
    if run:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return zz[0]


def _dht_segment(tc: int, th: int, bits: list, vals: list) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    zz = bytes(int(table.flat[_ZIGZAG[i]]) for i in range(64))
    body = bytes([tq]) + zz
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    pixels: np.ndarray,
    quant: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Spec-valid baseline JFIF from an HxW (grayscale) or HxWx3 (RGB)
    uint8 array, 4:4:4, Annex K Huffman tables. Lossy like any JPEG —
    the round trip is exact only for inputs whose quantized AC
    coefficients vanish (e.g. block-constant images with an all-ones
    quant table), which is precisely what the oracle-checked generator
    emits."""
    px = np.asarray(pixels, dtype=np.float64)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if quant is None:
        quant = np.ones((8, 8), dtype=np.int64)
    if gray:
        planes = [px]
    else:  # JFIF YCbCr, full resolution
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        planes = [y, cb, cr]

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _dqt_segment(0, quant)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_LUM_BITS, _DC_LUM_VALS)
    out += _dht_segment(1, 0, _AC_LUM_BITS, _AC_LUM_VALS)
    if not gray:
        out += _dht_segment(0, 1, _DC_CHR_BITS, _DC_CHR_VALS)
        out += _dht_segment(1, 1, _AC_CHR_BITS, _AC_CHR_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        tbl = 0 if cid == 1 else 1
        sos += bytes([cid, (tbl << 4) | tbl])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_l = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_l = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_c = _canonical_codes(_DC_CHR_BITS, _DC_CHR_VALS)
    ac_c = _canonical_codes(_AC_CHR_BITS, _AC_CHR_VALS)
    bw = max(1, (w + 7) // 8)
    bh = max(1, (h + 7) // 8)
    writer = _BitWriter()
    preds = [0] * len(planes)
    nmcu = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and nmcu and nmcu % restart_interval == 0:
                writer.marker(0xD0 + (nmcu // restart_interval - 1) % 8)
                preds = [0] * len(planes)
            nmcu += 1
            for ci, plane in enumerate(planes):
                # edge-replicated 8×8 block (standard edge extension)
                ys = np.minimum(np.arange(by * 8, by * 8 + 8), h - 1)
                xs = np.minimum(np.arange(bx * 8, bx * 8 + 8), w - 1)
                blk = plane[np.ix_(ys, xs)] - 128.0
                coef = _A @ blk @ _A.T
                q = np.round(coef / quant).astype(np.int64)
                dc, ac = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                preds[ci] = _encode_block(
                    writer, q.reshape(8, 8), preds[ci], dc, ac
                )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---- decoder ----------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; restart
    markers are consumed by `restart()`, any other marker mid-scan is
    an error."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy segment")
        byte = self.data[self.pos]
        if byte == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(
                self.data
            ) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                # restart marker reached by over-read: treat as EOS for
                # the current interval; restart() consumes it.
                raise ValueError("hit restart marker mid-block")
            else:
                raise ValueError("unexpected marker in entropy segment")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.nbits = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
        ):
            raise ValueError("expected restart marker")
        self.pos += 2


def _build_decode_table(bits: list, vals: list) -> dict:
    """{(length, code): symbol} — decode by extending one bit at a
    time (max 16 steps, fine at these payload sizes)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_symbol(reader: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg_pixels(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Full baseline decode → (w, h, HxWx3 uint8 RGB). Raises
    ValueError on corrupt input and UnsupportedJpeg on non-baseline
    modes (decode_image's PIL-fallback trigger)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    w = h = 0
    dri = 0
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG (no SOS)")
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before
        # the marker id — skip them all.
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG (no SOS)")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise ValueError("EOI before scan data")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / RSTn are standalone (length-less) markers.
            continue
        if marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            raise UnsupportedJpeg(
                f"non-baseline JPEG (SOF marker 0x{marker:02x})"
            )
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise UnsupportedJpeg("16-bit quant table")
                tbl = np.zeros(64, dtype=np.int64)
                for i in range(64):
                    tbl[_ZIGZAG[i]] = seg[p + 1 + i]
                qtables[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                htables[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise UnsupportedJpeg("12-bit precision")
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            if any(c["h"] > 2 or c["v"] > 2 for c in comps):
                raise UnsupportedJpeg("sampling factor > 2")
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            if ns != len(comps):
                # Baseline-sequential files MAY split components over
                # several scans (non-interleaved); this decoder handles
                # a single interleaved scan only — route to fallback
                # instead of silently returning zeroed chroma planes.
                raise UnsupportedJpeg(
                    f"non-interleaved multi-scan baseline "
                    f"(SOS covers {ns} of {len(comps)} components)"
                )
            order = []
            for i in range(ns):
                cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cid)
                comp["dc"] = htables[(0, tt >> 4)]
                comp["ac"] = htables[(1, tt & 0xF)]
                order.append(comp)
            pos += seglen
            break
        pos += seglen
    if not comps or w == 0:
        raise ValueError("JPEG scan before SOF")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["plane"] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )
        c["pred"] = 0

    reader = _BitReader(payload, pos)
    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and nmcu and nmcu % dri == 0:
                reader.restart()
                for c in order:
                    c["pred"] = 0
            for c in order:
                quant = qtables[c["tq"]]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        sym = _decode_symbol(reader, c["dc"])
                        diff = _extend(reader.read_bits(sym), sym)
                        c["pred"] += diff
                        zz[0] = c["pred"]
                        kk = 1
                        while kk < 64:
                            rs = _decode_symbol(reader, c["ac"])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    kk += 16
                                    continue
                                break  # EOB
                            kk += r
                            if kk > 63:
                                raise ValueError("AC index overflow")
                            zz[kk] = _extend(reader.read_bits(s), s)
                            kk += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_ZIGZAG] = zz * quant.flat[_ZIGZAG]
                        blk = _A.T @ coef.reshape(8, 8) @ _A + 128.0
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + hh) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = blk
            nmcu += 1

    # upsample to full resolution, crop, color-convert
    full = []
    for c in comps:
        p = np.repeat(
            np.repeat(c["plane"], vmax // c["v"], axis=0),
            hmax // c["h"],
            axis=1,
        )[:h, :w]
        full.append(p)
    if len(full) == 1:
        yy = np.clip(np.round(full[0]), 0, 255)
        rgb = np.stack([yy, yy, yy], axis=-1)
    elif len(full) == 3:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255)
    else:
        raise UnsupportedJpeg(f"{len(full)}-component JPEG")
    return w, h, rgb.astype(np.uint8)


def decode_jpeg(payload: bytes) -> tuple[int, int, int, int, int]:
    """DECODE_SCHEMA contract twin of decode_bmp/decode_png:
    (width, height, 24, n_pixels, exact RGB byte sum)."""
    w, h, rgb = decode_jpeg_pixels(payload)
    return w, h, 24, w * h, int(rgb.astype(np.int64).sum())


# ---- deterministic generator (the oracle-checked key's payload) -------


def encode_jpeg_gray_blocks(doc_id: int) -> bytes:
    """Block-constant grayscale JPEG per doc: width 8·((id%4)+1),
    height 8·((id%2)+1), 8×8 block b (row-major) uniformly
    v_b = (id·31 + 7·b) % 256, all-ones quant table. Every block is
    DC-only, so decode is EXACT on any conforming decoder and the
    driver oracle recomputes sum_pixels = 3·64·Σv_b in closed form."""
    nbx, nby = (doc_id % 4) + 1, (doc_id % 2) + 1
    px = np.zeros((nby * 8, nbx * 8), dtype=np.uint8)
    for by in range(nby):
        for bx in range(nbx):
            v = (doc_id * 31 + 7 * (by * nbx + bx)) % 256
            px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
    return encode_jpeg(px)


# ---- native-codec dispatch (round 13) ----------------------------------------

_HAVE_PIL: bool | None = None


def _pil_available() -> bool:
    global _HAVE_PIL
    if _HAVE_PIL is None:
        try:
            import PIL.Image  # noqa: F401, PLC0415

            _HAVE_PIL = True
        except ImportError:
            _HAVE_PIL = False
    return _HAVE_PIL


def _pil_decode(payload: bytes) -> tuple[int, int, int, int, int]:
    import io  # noqa: PLC0415

    from PIL import Image  # noqa: PLC0415

    img = Image.open(io.BytesIO(payload)).convert("RGB")
    px = np.asarray(img, dtype=np.int64)
    return img.width, img.height, 24, img.width * img.height, int(px.sum())


def decode_jpeg_auto(payload: bytes) -> tuple[int, int, int, int, int]:
    """DECODE_SCHEMA decode with NATIVE-CODEC dispatch: when PIL is
    importable (a real cluster image ships pillow/libjpeg-turbo), use
    it for EVERY JPEG — the pure-Python entropy decode was the one
    deliberate Python-bound hot path in the multimodal family; when it
    isn't (this hermetic container), fall back to the strict
    pure-Python baseline decoder.

    Output equality across branches is GUARANTEED only for the
    DC-only generated payloads the oracle checks (DC-only blocks,
    all-ones quant table — any conforming decoder is bit-exact there;
    javax.imageio agreement is pytest-pinned), and the dispatch order
    itself is pinned by a monkeypatched pytest, so the gate key's hash
    is identical whichever branch runs. For ARBITRARY baseline JPEGs
    with nonzero AC coefficients the two branches can legitimately
    differ by ±1/pixel in IDCT rounding (JPEG permits it; ISO/IEC
    10918-1 Annex A accuracy bounds) — callers needing bit-stable
    output across environments should pin one branch. The
    native-equality pytest (test_decode_jpeg_auto_native_equality_
    when_pil_present) runs wherever pillow is installed; this hermetic
    container has no PIL, so it importorskips here and first runs for
    real on a pillow-equipped image."""
    if _pil_available():
        try:
            return _pil_decode(payload)
        except Exception as pil_exc:
            # PIL refused; the strict parser may still accept (or will
            # reject with a precise error). Never LOSE the PIL error:
            # if the strict parser's only complaint is "non-baseline"
            # then PIL was the right decoder and ITS error is the real
            # diagnostic (decode_image would otherwise tell the user
            # to install the pillow that is already installed).
            try:
                return decode_jpeg(payload)
            except UnsupportedJpeg:
                raise pil_exc
            except Exception as strict_exc:
                raise strict_exc from pil_exc
    return decode_jpeg(payload)
