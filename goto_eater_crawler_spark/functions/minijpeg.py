"""Pure-python baseline JPEG (JFIF) codec — the miniimg-style
decoder that closes the round-3 multimodal stub (VERDICT r3 ask #5):
real Huffman entropy decoding + dequantization + inverse zigzag +
IDCT, no native codec.

Scope (documented, like miniimg's): baseline sequential DCT (SOF0)
AND progressive (SOF2 — spectral selection, EOBn end-of-band runs,
successive-approximation DC/AC refinement scans), 8-bit, grayscale or
interleaved color (JFIF YCbCr) at arbitrary sampling factors 1..4 —
4:4:4 and 4:2:0 (2x2 luma + box-downsampled chroma, the camera-JPEG
layout) both emitted by the encoders below, 4:2:2/4:4:0 decode-side —
plus restart intervals — exactly the class the encoders below emit
and the class a training-data pipeline can verify in closed form. The
encoder uses a quantization table of all ones, so an image whose
every 8x8 block is CONSTANT round-trips bit-exactly (a flat block has
only a DC coefficient, 8*(v-128), integral — quantize/dequantize and
the IDCT reproduce v exactly), which is what makes a DuckDB
closed-form oracle over real decodes possible for a LOSSY format.
Non-flat blocks exercise the full AC path in tests (zigzag,
run-length, receive/extend) with the standard |error| <= 1 bound.

Everything here derives from the public JPEG standard (ITU-T T.81 /
ISO 10918-1): the Annex K.3 typical Huffman tables, the Annex F
encode/decode procedures, and the JFIF container (ECMA TR/98). The
reference crawler has no JPEG analogue (its binaries are PDFs/XLSX);
this is build-spec frontier surface for the multimodal column family
(operators/multimodal.py).
"""

from __future__ import annotations

import math

from .miniimg import ImageFormatError

SOI = b"\xff\xd8"
EOI = b"\xff\xd9"

# ---------------------------------------------------------------------------
# Standard "typical" luminance Huffman tables (ITU-T T.81 Annex K.3,
# Tables K.3/K.5): BITS (count of codes per length 1..16) + HUFFVAL.
# ---------------------------------------------------------------------------

DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))

AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _zigzag_order() -> list[tuple[int, int]]:
    """(row, col) pairs in JPEG zigzag order — generated, not typed
    (T.81 Figure 5): even diagonals walk up-right, odd down-left."""
    out = []
    for s in range(15):
        rng = range(min(s, 7), max(s - 7, 0) - 1, -1)  # r decreasing
        if s % 2 == 1:
            rng = reversed(list(rng))  # r increasing
        for r in rng:
            out.append((r, s - r))
    return out


ZIGZAG = _zigzag_order()

# Orthonormal 8-point DCT basis: A[u][x]; 2-D DCT is A.s.A^T, IDCT is
# A^T.S.A — identical scaling to T.81 A.3.3's 1/4*C(u)*C(v) form.
_A = [
    [
        (math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8))
        * math.cos((2 * x + 1) * u * math.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
]


def _dct2(block: list[list[float]]) -> list[list[float]]:
    tmp = [
        [sum(_A[u][x] * block[x][y] for x in range(8)) for y in range(8)]
        for u in range(8)
    ]
    return [
        [sum(tmp[u][y] * _A[v][y] for y in range(8)) for v in range(8)]
        for u in range(8)
    ]


def _idct2(coef: list[list[float]]) -> list[list[float]]:
    tmp = [
        [sum(_A[u][x] * coef[u][v] for u in range(8)) for v in range(8)]
        for x in range(8)
    ]
    return [
        [sum(tmp[x][v] * _A[v][y] for v in range(8)) for y in range(8)]
        for x in range(8)
    ]


# ---------------------------------------------------------------------------
# Huffman code construction (T.81 Annex C) — shared by both sides.
# ---------------------------------------------------------------------------


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, for MSB-first sequential decode."""
    return {
        (length, code): v for v, (code, length) in _huff_codes(bits, vals).items()
    }


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.out)

    def restart(self, n: int) -> None:
        """Byte-align (1-padding) and emit RSTn — markers are written
        raw, never byte-stuffed (T.81 F.1.2.3: stuffing applies to
        entropy-coded bytes only)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out.append(0xFF)
        self.out.append(0xD0 + (n % 8))


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    de-stuffing; raises on an unexpected marker (RSTn is consumed
    explicitly via :meth:`sync_restart` at interval boundaries)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ImageFormatError("jpeg: entropy data exhausted")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2  # stuffed literal 0xFF
            else:
                raise ImageFormatError(
                    f"jpeg: unexpected marker 0xFF{nxt:02X} inside scan"
                    if nxt is not None
                    else "jpeg: truncated scan"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            if (length, code) in table:
                return table[(length, code)]
        raise ImageFormatError("jpeg: invalid huffman code in scan")

    def sync_restart(self, n: int) -> None:
        """Consume an RSTn at an interval boundary (T.81 F.2.1.3.1):
        discard the pad bits to the byte boundary, then the marker —
        the caller resets the DC predictor."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + (n % 8)
        ):
            got = self.data[self.pos : self.pos + 2].hex()
            raise ImageFormatError(
                f"jpeg: expected RST{n % 8} at restart boundary, got 0x{got}"
            )
        self.pos += 2


def _bit_length(v: int) -> int:
    return v.bit_length()


def _extend(v: int, size: int) -> int:
    """RECEIVE/EXTEND (T.81 F.2.2.1): map `size` raw bits to the
    signed coefficient value."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


# ---------------------------------------------------------------------------
# Encoder (grayscale baseline, quant table = all ones by default)
# ---------------------------------------------------------------------------


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _encode_block(
    coefs: list[list[int]],
    prev_dc: int,
    w: _BitWriter,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """Entropy-encode one quantized 8x8 coefficient block; returns its
    DC value (the next block's predictor)."""
    dc = coefs[0][0]
    diff = dc - prev_dc
    size = _bit_length(abs(diff))
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        w.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    zz = [coefs[r][c] for (r, c) in ZIGZAG[1:]]
    run = 0
    for v in zz:
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL: 16 zeros
            w.write(c, ln)
            run -= 16
        size = _bit_length(abs(v))
        c, ln = ac_codes[(run << 4) | size]
        w.write(c, ln)
        w.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        c, ln = ac_codes[0x00]  # EOB
        w.write(c, ln)
    return dc


def _quantized_block(plane, width, height, bx, by, qmat):
    """Level-shift + forward DCT + quantize one 8x8 block of a pixel
    plane; edge blocks replicate the last row/column. block[y][x]
    (row-major): the first DCT index is then the VERTICAL frequency v,
    so ZIGZAG's (r, c) = (v, u) walks coefficients exactly as T.81
    Figure A.6 orders Svu."""
    block = [
        [
            plane[min(by + y, height - 1)][min(bx + x, width - 1)] - 128.0
            for x in range(8)
        ]
        for y in range(8)
    ]
    cf = _dct2(block)
    return [
        [int(round(cf[u][v] / qmat[u][v])) for v in range(8)] for u in range(8)
    ]


def _clamp(v: float) -> int:
    # half-UP, not Python's banker's round: the closed-form DuckDB
    # oracles replicate the color transforms with SQL round()
    # (half-away-from-zero), and tone combinations exist whose IEEE
    # transform lands exactly on .5 (doc 2945's (45,135,200) at
    # sf0.1 caught the divergence) — same rounding rule on both
    # sides removes the whole boundary class. Negative inputs only
    # occur below the 0-clamp, where the two rules agree.
    i = math.floor(v + 0.5)
    return 0 if i < 0 else (255 if i > 255 else i)


def rgb_to_ycbcr(r: int, g: int, b: int) -> tuple[int, int, int]:
    """JFIF (ECMA TR/98) full-range color transform, rounded+clamped."""
    return (
        _clamp(0.299 * r + 0.587 * g + 0.114 * b),
        _clamp(128 - 0.168736 * r - 0.331264 * g + 0.5 * b),
        _clamp(128 + 0.5 * r - 0.418688 * g - 0.081312 * b),
    )


def ycbcr_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    return (
        _clamp(y + 1.402 * (cr - 128)),
        _clamp(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
        _clamp(y + 1.772 * (cb - 128)),
    )


def jpeg_encode_grey(
    width: int,
    height: int,
    rows: list[bytes],
    quant: list[int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Encode a grayscale image as baseline JFIF. ``quant`` is the
    64-entry quantization table in ZIGZAG order (default: all ones —
    lossless for block-constant images, see module docstring). Edge
    blocks replicate the last row/column (the standard padding that
    keeps boundary DC values exact for flat regions).
    ``restart_interval`` > 0 emits a DRI segment and RST0..RST7
    markers every that-many MCUs (DC predictor reset + byte
    alignment, T.81 F.1.2.3) — the resync structure real camera
    JPEGs carry."""
    if quant is None:
        quant = [1] * 64
    if len(quant) != 64 or not all(1 <= q <= 255 for q in quant):
        raise ValueError("quant must be 64 bytes in zigzag order")
    dc_codes = _huff_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_codes = _huff_codes(AC_LUM_BITS, AC_LUM_VALS)
    qmat = [[0] * 8 for _ in range(8)]
    for i, (r, c) in enumerate(ZIGZAG):
        qmat[r][c] = quant[i]

    w = _BitWriter()
    prev_dc = 0
    mcu = 0
    rst = 0
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                w.restart(rst)
                rst = (rst + 1) % 8
                prev_dc = 0
            mcu += 1
            coefs = _quantized_block(rows, width, height, bx, by, qmat)
            prev_dc = _encode_block(coefs, prev_dc, w, dc_codes, ac_codes)
    scan = w.flush()

    app0 = _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = _seg(0xDB, bytes([0x00]) + bytes(quant))  # Pq=0 (8-bit), Tq=0
    sof0 = _seg(
        0xC0,
        bytes([8])  # precision
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),  # 1 component, id=1, 1x1 sampling, Tq=0
    )
    dht = _seg(
        0xC4,
        bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS)  # Tc=0,Th=0
        + bytes([0x10]) + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS),  # Tc=1,Th=0
    )
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # 1 comp, DC0/AC0, full scan
    dri = (
        _seg(0xDD, restart_interval.to_bytes(2, "big"))
        if restart_interval
        else b""
    )
    return SOI + app0 + dqt + dri + sof0 + dht + sos + scan + EOI


def _box_downsample(plane: list[list[int]], w: int, h: int) -> list[list[int]]:
    """2x2 box-average downsample with edge replication for odd dims
    (the standard chroma decimation for 4:2:0); averages of a constant
    region are exact, which is what keeps flat-tile test images
    lossless through the subsampled path."""
    cw, ch = -(-w // 2), -(-h // 2)
    out = []
    for cy in range(ch):
        y0, y1 = 2 * cy, min(2 * cy + 1, h - 1)
        row = []
        for cx in range(cw):
            x0, x1 = 2 * cx, min(2 * cx + 1, w - 1)
            s = plane[y0][x0] + plane[y0][x1] + plane[y1][x0] + plane[y1][x1]
            row.append(int(round(s / 4.0)))
        out.append(row)
    return out


def jpeg_encode_color(
    width: int,
    height: int,
    rgb_rows: list[bytes],
    quant: list[int] | None = None,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """Encode an interleaved-RGB image (rows of 3*width bytes) as a
    baseline color JFIF: JFIF RGB->YCbCr, interleaved MCUs
    (T.81 A.2.3), shared quant/Huffman tables (ids are read from the
    stream by any conforming decoder, so one table set is legal and
    keeps the module free of a second 162-entry table to mistype).
    ``subsampling`` '444' emits 1x1 factors for all three components
    (one block each per MCU); '420' emits 2x2 luma / 1x1 chroma
    factors — a 16x16-pixel MCU of 4 Y blocks + 1 box-downsampled Cb
    + 1 Cr, the layout virtually every camera JPEG uses."""
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if quant is None:
        quant = [1] * 64
    dc_codes = _huff_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_codes = _huff_codes(AC_LUM_BITS, AC_LUM_VALS)
    qmat = [[0] * 8 for _ in range(8)]
    for i, (r, c) in enumerate(ZIGZAG):
        qmat[r][c] = quant[i]

    planes = [[], [], []]  # Y, Cb, Cr
    for row in rgb_rows:
        ys, cbs, crs = [], [], []
        for x in range(width):
            y, cb, cr = rgb_to_ycbcr(row[3 * x], row[3 * x + 1], row[3 * x + 2])
            ys.append(y)
            cbs.append(cb)
            crs.append(cr)
        planes[0].append(ys)
        planes[1].append(cbs)
        planes[2].append(crs)

    w = _BitWriter()
    prev_dc = [0, 0, 0]
    mcu = 0
    rst = 0
    if subsampling == "420":
        cw, ch = -(-width // 2), -(-height // 2)
        chroma = [_box_downsample(planes[i], width, height) for i in (1, 2)]
        # (plane, plane w, plane h, blocks per MCU as (dx, dy) in
        # 8-px units) per component: Y contributes a 2x2 block quad
        samp = [
            (planes[0], width, height, [(0, 0), (1, 0), (0, 1), (1, 1)]),
            (chroma[0], cw, ch, [(0, 0)]),
            (chroma[1], cw, ch, [(0, 0)]),
        ]
        for my in range(0, height, 16):
            for mx in range(0, width, 16):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    w.restart(rst)
                    rst = (rst + 1) % 8
                    prev_dc = [0, 0, 0]
                mcu += 1
                for ci, (plane, pw, ph, units) in enumerate(samp):
                    scale = 1 if ci == 0 else 2
                    for dx, dy in units:
                        coefs = _quantized_block(
                            plane, pw, ph,
                            mx // scale + 8 * dx, my // scale + 8 * dy, qmat,
                        )
                        prev_dc[ci] = _encode_block(
                            coefs, prev_dc[ci], w, dc_codes, ac_codes
                        )
        sof_samp = bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
    else:
        for by in range(0, height, 8):
            for bx in range(0, width, 8):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    w.restart(rst)
                    rst = (rst + 1) % 8
                    prev_dc = [0, 0, 0]
                mcu += 1
                for ci in range(3):
                    coefs = _quantized_block(
                        planes[ci], width, height, bx, by, qmat
                    )
                    prev_dc[ci] = _encode_block(
                        coefs, prev_dc[ci], w, dc_codes, ac_codes
                    )
        sof_samp = bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
    scan = w.flush()

    app0 = _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = _seg(0xDB, bytes([0x00]) + bytes(quant))
    sof0 = _seg(
        0xC0,
        bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([3])
        + sof_samp,
    )
    dht = _seg(
        0xC4,
        bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS)
        + bytes([0x10]) + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS),
    )
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    dri = (
        _seg(0xDD, restart_interval.to_bytes(2, "big"))
        if restart_interval
        else b""
    )
    return SOI + app0 + dqt + dri + sof0 + dht + sos + scan + EOI




# ---------------------------------------------------------------------------
# Progressive encoder (SOF2): spectral selection + one successive-
# approximation level, per-scan balanced Huffman tables.
# ---------------------------------------------------------------------------


def _balanced_table(syms: set[int]) -> tuple[list[int], list[int]]:
    """BITS/HUFFVAL for a fixed-length canonical code over exactly the
    symbols a scan uses: all at length L = ceil(log2(n + 1)), which
    leaves the all-ones code of that length unassigned (the T.81 C.2
    convention) and trivially satisfies Kraft. Optimal-length coding
    is a compression concern, not a correctness one — the gate's
    decoder resolves whatever DHT the stream carries."""
    vals = sorted(syms) if syms else [0]
    length = 1
    while (1 << length) - 1 < len(vals):
        length += 1
    bits = [0] * 16
    bits[length - 1] = len(vals)
    return bits, vals


class _SymCollector:
    """Pass-1 emitter: records which Huffman symbols a scan needs."""

    def __init__(self):
        self.syms: set[int] = set()

    def sym(self, s: int) -> None:
        self.syms.add(s)

    def raw(self, v: int, n: int) -> None:
        pass


class _ScanEmitter:
    """Pass-2 emitter: writes Huffman codes + raw bits to a writer."""

    def __init__(self, w: _BitWriter, codes: dict[int, tuple[int, int]]):
        self.w = w
        self.codes = codes

    def sym(self, s: int) -> None:
        code, length = self.codes[s]
        self.w.write(code, length)

    def raw(self, v: int, n: int) -> None:
        if n:
            self.w.write(v, n)


def _emit_dc_first(comp_blocks: list[list[list[int]]], al: int, out) -> None:
    """DC first scan body (T.81 G.1.2.1), components interleaved in
    the given order (all 1x1 sampling here, so one unit each per MCU);
    the point transform on DC is an arithmetic shift right."""
    preds = [0] * len(comp_blocks)
    for unit in range(len(comp_blocks[0])):
        for ci, blocks in enumerate(comp_blocks):
            v = blocks[unit][0] >> al
            diff = v - preds[ci]
            preds[ci] = v
            size = _bit_length(abs(diff))
            out.sym(size)
            out.raw(diff if diff > 0 else diff + (1 << size) - 1, size)


def _emit_dc_refine(comp_blocks: list[list[list[int]]], al: int, w) -> None:
    """DC refinement scan body: one raw magnitude bit per unit —
    no Huffman coding at all (T.81 G.1.2.1)."""
    for unit in range(len(comp_blocks[0])):
        for blocks in comp_blocks:
            w.write((blocks[unit][0] >> al) & 1, 1)


def _emit_ac_first(blocks: list[list[int]], ss: int, se: int, al: int, out):
    """AC first scan body for one component (T.81 G.1.2.2): run/size
    over the point-transformed band, EOBn runs accumulated across
    fully/trailing-zero bands and flushed at the next coded unit or
    scan end. AC point transform truncates toward zero."""
    eobrun = 0

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            out.sym(r << 4)
            out.raw(eobrun - (1 << r), r)
            eobrun = 0

    for zz in blocks:
        band = []
        for k in range(ss, se + 1):
            m = abs(zz[k]) >> al
            band.append(m if zz[k] >= 0 else -m)
        last = -1
        for i, v in enumerate(band):
            if v:
                last = i
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        run = 0
        for v in band[: last + 1]:
            if v == 0:
                run += 1
                continue
            while run > 15:
                out.sym(0xF0)  # ZRL
                run -= 16
            size = _bit_length(abs(v))
            out.sym((run << 4) | size)
            out.raw(v if v > 0 else v + (1 << size) - 1, size)
            run = 0
        if last < se - ss:
            eobrun += 1  # the band's zero tail starts an EOB run
    flush()


def _emit_ac_refine(blocks: list[list[int]], ss: int, se: int, al: int, out):
    """AC refinement scan body for one component (T.81 G.1.2.3, the
    jcphuff-shaped control flow): newly-significant coefficients
    (scaled magnitude exactly 1) are coded as size-1 run/size pairs,
    already-nonzero history coefficients append buffered correction
    bits that ride behind the next coded symbol, and EOB runs cover
    band tails with their correction bits queued after the EOBn."""
    eobrun = 0
    pending: list[int] = []  # correction bits owed after the next sym

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            out.sym(r << 4)
            out.raw(eobrun - (1 << r), r)
            eobrun = 0
        for b in pending:
            out.raw(b, 1)
        pending.clear()

    for zz in blocks:
        scaled = [abs(zz[k]) >> al for k in range(ss, se + 1)]
        eob = 0  # band index AFTER the last newly-significant coef
        for i, m in enumerate(scaled):
            if m == 1:
                eob = i + 1
        if eob == 0:
            # nothing newly significant: the whole band joins the EOB
            # run; history coefficients still owe correction bits
            eobrun += 1
            pending.extend(m & 1 for m in scaled if m > 1)
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        run = 0
        cbits: list[int] = []
        for i in range(eob):
            m = scaled[i]
            if m == 0:
                run += 1
                continue
            # ZRLs must flush on reaching ANY nonzero position — the
            # decoder's ZRL walk consumes correction bits only among
            # the 16 zeros it skips, so a history bit buffered while
            # run > 15 would land in the wrong span
            while run > 15:
                out.sym(0xF0)
                for b in cbits:
                    out.raw(b, 1)
                cbits.clear()
                run -= 16
            if m > 1:  # history: correction bit, run unbroken
                cbits.append(m & 1)
                continue
            out.sym((run << 4) | 1)
            out.raw(1 if zz[ss + i] > 0 else 0, 1)
            for b in cbits:
                out.raw(b, 1)
            cbits.clear()
            run = 0
        if eob <= se - ss:
            eobrun += 1
            pending.extend(m & 1 for m in scaled[eob:] if m > 1)
    flush()


def jpeg_encode_progressive(
    width: int,
    height: int,
    rows: list[bytes],
    quant: list[int] | None = None,
) -> bytes:
    """Encode as PROGRESSIVE JFIF (SOF2): grayscale if rows carry
    width bytes, 4:4:4 color (JFIF RGB->YCbCr) if 3*width. Scan
    script — the representative shape with one successive-
    approximation level, exercising every progressive decode path:

    1. DC first, all components interleaved, Ah=0 Al=1
    2. per component: AC first, Ss=1 Se=63, Ah=0 Al=1 (EOBn runs)
    3. DC refinement, interleaved, Ah=1 Al=0 (raw bits)
    4. per component: AC refinement, Ss=1 Se=63, Ah=1 Al=0
       (correction bits + newly-significant +-1s)

    DC scans use the Annex K.3 DC table; each AC scan carries its own
    DHT built over exactly the symbols it emits (EOBn symbols are not
    in the K.3 AC table). Same closed-form property as the baseline
    encoders: all-ones quant + block-constant image round-trips
    exactly (AC scans are then pure EOB runs and DC carries
    everything)."""
    if quant is None:
        quant = [1] * 64
    color = len(rows[0]) == 3 * width
    qmat = [[0] * 8 for _ in range(8)]
    for i, (r, c) in enumerate(ZIGZAG):
        qmat[r][c] = quant[i]

    if color:
        planes = [[], [], []]
        for row in rows:
            ys, cbs, crs = [], [], []
            for x in range(width):
                y, cb, cr = rgb_to_ycbcr(
                    row[3 * x], row[3 * x + 1], row[3 * x + 2]
                )
                ys.append(y)
                cbs.append(cb)
                crs.append(cr)
            planes[0].append(ys)
            planes[1].append(cbs)
            planes[2].append(crs)
    else:
        planes = [[list(r) for r in rows]]

    # quantized blocks in zigzag order, component-grid raster order
    comp_blocks: list[list[list[int]]] = []
    for plane in planes:
        blocks = []
        for by in range(0, height, 8):
            for bx in range(0, width, 8):
                cf = _quantized_block(plane, width, height, bx, by, qmat)
                blocks.append([cf[r][c] for (r, c) in ZIGZAG])
        comp_blocks.append(blocks)
    ncomp = len(comp_blocks)

    dc_codes = _huff_codes(DC_LUM_BITS, DC_LUM_VALS)
    w_scans: list[bytes] = []

    # scan 1: DC first (K.3 DC table is sufficient: sizes 0..11)
    wtr = _BitWriter()
    _emit_dc_first(comp_blocks, 1, _ScanEmitter(wtr, dc_codes))
    sos1 = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos1 += bytes([cid, 0x00])
    w_scans.append(_seg(0xDA, sos1 + bytes([0, 0, 0x01])) + wtr.flush())

    # scans 2..: AC first per component, custom DHT (table id 1)
    for ci in range(ncomp):
        col = _SymCollector()
        _emit_ac_first(comp_blocks[ci], 1, 63, 1, col)
        bits, vals = _balanced_table(col.syms)
        wtr = _BitWriter()
        _emit_ac_first(
            comp_blocks[ci], 1, 63, 1,
            _ScanEmitter(wtr, _huff_codes(bits, vals)),
        )
        dht = _seg(0xC4, bytes([0x11]) + bytes(bits) + bytes(vals))
        sos = bytes([1, ci + 1, 0x01, 1, 63, 0x01])
        w_scans.append(dht + _seg(0xDA, sos) + wtr.flush())

    # scan: DC refinement (raw bits, no tables)
    wtr = _BitWriter()
    _emit_dc_refine(comp_blocks, 0, wtr)
    sosr = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sosr += bytes([cid, 0x00])
    w_scans.append(_seg(0xDA, sosr + bytes([0, 0, 0x10])) + wtr.flush())

    # scans: AC refinement per component, custom DHT
    for ci in range(ncomp):
        col = _SymCollector()
        _emit_ac_refine(comp_blocks[ci], 1, 63, 0, col)
        bits, vals = _balanced_table(col.syms)
        wtr = _BitWriter()
        _emit_ac_refine(
            comp_blocks[ci], 1, 63, 0,
            _ScanEmitter(wtr, _huff_codes(bits, vals)),
        )
        dht = _seg(0xC4, bytes([0x11]) + bytes(bits) + bytes(vals))
        sos = bytes([1, ci + 1, 0x01, 1, 63, 0x10])
        w_scans.append(dht + _seg(0xDA, sos) + wtr.flush())

    app0 = _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = _seg(0xDB, bytes([0x00]) + bytes(quant))
    sof_comps = b""
    for cid in range(1, ncomp + 1):
        sof_comps += bytes([cid, 0x11, 0])
    sof2 = _seg(
        0xC2,
        bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([ncomp])
        + sof_comps,
    )
    dht_dc = _seg(0xC4, bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
    return SOI + app0 + dqt + sof2 + dht_dc + b"".join(w_scans) + EOI


# ---------------------------------------------------------------------------
# Decoder (baseline sequential + progressive; grayscale or interleaved
# color at arbitrary sampling factors)
# ---------------------------------------------------------------------------


def _decode_dc_first(reader, dc_tab, blk, pred, al):
    """DC coefficient, first (or only) scan: Huffman size class +
    receive/extend difference coding (T.81 F.2.2.1), point transform
    by Al (G.2: the progressive DC first scan stores coef << Al;
    baseline is the Al=0 case). Returns the new predictor."""
    size = reader.read_huff(dc_tab)
    pred += _extend(reader.read(size), size)
    blk[0] = pred << al
    return pred


def _decode_ac_first(reader, ac_tab, blk, ss, se, al, eobrun):
    """AC band [ss, se] of one data unit, first scan (T.81 F.2.2.2 /
    G.2.1): run/size pairs with ZRL and — in progressive scans — EOBn
    end-of-band runs (2^r - 1 + r appended bits of FURTHER all-zero
    band units). Returns the updated end-of-band run; baseline AC is
    the ss=1, se=63, al=0, eobrun-always-0 special case (EOB0)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.read_huff(ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << run) - 1
            if run:
                eobrun += reader.read(run)
            break
        k += run
        if k > se:
            raise ImageFormatError("jpeg: AC index overflow")
        blk[k] = _extend(reader.read(size), size) << al
        k += 1
    return eobrun


def _decode_ac_refine(reader, ac_tab, blk, ss, se, al, eobrun):
    """Successive-approximation refinement of the AC band (T.81
    G.2.2, the jdphuff-shaped control flow): already-nonzero history
    coefficients receive one correction bit each (applied only when
    the bit at position Al is still 0); zero-history positions carry
    the run counts; newly-significant coefficients arrive as size-1
    values +-(1 << Al). Band units inside an EOB run — including the
    tail of the unit that started it — still carry correction bits
    for their nonzero coefficients. Returns the updated EOB run."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.read_huff(ac_tab)
            run, size = rs >> 4, rs & 0x0F
            newval = 0
            if size == 0:
                if run != 15:  # EOBn: this unit + (eobrun - 1) more
                    eobrun = 1 << run
                    if run:
                        eobrun += reader.read(run)
                    break
                # ZRL: skip 16 zero-history positions
            else:
                if size != 1:
                    raise ImageFormatError(
                        "jpeg: refinement scan with size != 1"
                    )
                newval = p1 if reader.read(1) else m1
            while k <= se:
                if blk[k] != 0:
                    if reader.read(1) and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if k > se and newval:
                raise ImageFormatError("jpeg: refinement run past band")
            if newval:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                if reader.read(1) and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(
    data, pos, body, comps, grids, coefs, htables,
    progressive, restart_interval, mcols, mrows,
):
    """Entropy-decode one scan into the frame's coefficient buffers;
    returns the stream position just past the scan's entropy data.
    Interleaved scans (ns > 1) walk MCUs over the padded block grids;
    single-component scans are non-interleaved and walk exactly the
    component's own ceil(cw/8) x ceil(ch/8) grid (T.81 A.2.2)."""
    ns = body[0]
    cid_index = {c[0]: i for i, c in enumerate(comps)}
    scomps = []
    for i in range(ns):
        cid, dcac = body[1 + 2 * i : 3 + 2 * i]
        if cid not in cid_index:
            raise ImageFormatError(f"jpeg: scan component {cid} not in frame")
        scomps.append((cid_index[cid], dcac >> 4, dcac & 0x0F))
    ss, se, a = body[1 + 2 * ns : 4 + 2 * ns]
    ah, al = a >> 4, a & 0x0F
    if progressive:
        if ss == 0 and se != 0:
            raise ImageFormatError(
                "jpeg: progressive scan with Ss=0 must have Se=0"
            )
        if ss > 0 and ns != 1:
            raise ImageFormatError(
                "jpeg: progressive AC scan must be single-component"
            )
        if se > 63 or ss > se:
            raise ImageFormatError("jpeg: bad spectral selection")
    else:
        if ns != len(comps):
            raise ImageFormatError(
                "jpeg: partial-scan SOS unsupported (progressive class)"
            )
        if (ss, se, ah, al) != (0, 63, 0, 0):
            raise ImageFormatError("jpeg: bad baseline scan parameters")

    resolved = []
    for ci, dci, aci in scomps:
        dc_tab = htables.get((0, dci))
        ac_tab = htables.get((1, aci))
        if (ss == 0 and ah == 0 and dc_tab is None) or (
            se > 0 and ac_tab is None
        ):
            raise ImageFormatError(
                "jpeg: scan references undefined huffman table"
            )
        resolved.append((ci, dc_tab, ac_tab))

    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    eobrun = 0
    rst = 0
    nunit = 0
    if ns > 1:
        units = (
            (myi, mxi) for myi in range(mrows) for mxi in range(mcols)
        )
        for myi, mxi in units:
            if restart_interval and nunit and nunit % restart_interval == 0:
                reader.sync_restart(rst)
                rst = (rst + 1) % 8
                preds = [0] * len(comps)
                eobrun = 0
            nunit += 1
            for ci, dc_tab, ac_tab in resolved:
                _, hs, vs, _ = comps[ci]
                pw = grids[ci][2]
                for byi in range(vs):
                    for bxi in range(hs):
                        blk = coefs[ci][
                            (myi * vs + byi) * pw + (mxi * hs + bxi)
                        ]
                        if ah == 0:
                            preds[ci] = _decode_dc_first(
                                reader, dc_tab, blk, preds[ci], al
                            )
                        else:
                            blk[0] |= reader.read(1) << al
                        if se > 0:  # baseline: AC follows DC in-unit
                            eobrun = _decode_ac_first(
                                reader, ac_tab, blk, 1, se, al, eobrun
                            )
    else:
        ci, dc_tab, ac_tab = resolved[0]
        bw, bh, pw = grids[ci][0], grids[ci][1], grids[ci][2]
        for byi in range(bh):
            for bxi in range(bw):
                if restart_interval and nunit and nunit % restart_interval == 0:
                    reader.sync_restart(rst)
                    rst = (rst + 1) % 8
                    preds = [0] * len(comps)
                    eobrun = 0
                nunit += 1
                blk = coefs[ci][byi * pw + bxi]
                if ss == 0:
                    if ah == 0:
                        preds[ci] = _decode_dc_first(
                            reader, dc_tab, blk, preds[ci], al
                        )
                    else:
                        blk[0] |= reader.read(1) << al
                    if se > 0:  # sequential single-component frame
                        eobrun = _decode_ac_first(
                            reader, ac_tab, blk, 1, se, al, eobrun
                        )
                elif ah == 0:
                    eobrun = _decode_ac_first(
                        reader, ac_tab, blk, ss, se, al, eobrun
                    )
                else:
                    eobrun = _decode_ac_refine(
                        reader, ac_tab, blk, ss, se, al, eobrun
                    )
    return reader.pos


def jpeg_decode(data: bytes) -> tuple[int, int, str, list[bytes]]:
    """Decode a JFIF stream -> (width, height, mode, rows): mode 'L'
    (rows of width bytes) for single-component frames, 'RGB' (rows of
    3*width bytes, JFIF YCbCr->RGB) for 3-component frames.
    General within its documented scope:

    - baseline sequential (SOF0) AND progressive (SOF2) frames — the
      progressive path drives spectral selection (DC scans + per-
      component AC band scans with EOBn end-of-band runs) and
      successive approximation (point-transformed first scans + DC/AC
      refinement scans) into per-component coefficient buffers, with
      one dequant + inverse zigzag + IDCT pass after EOI;
    - arbitrary DQT/DHT tables (any Tq/Th ids, per component, emitted
      in any segment order, redefinable between scans);
    - any dimensions (edge blocks cropped) and ARBITRARY sampling
      factors 1..4 per component (4:4:4, 4:2:0, 4:2:2, 4:4:0 —
      interleaved MCUs per T.81 A.2.3 over MCU-padded block grids,
      non-interleaved scans over the component's own grid, chroma
      planes upsampled by sample replication, the JFIF "simple"
      upsample);
    - restart intervals (DRI + RST0..7 resync with per-component
      DC-predictor and EOB-run reset).

    Raises ImageFormatError for non-DCT / hierarchical SOFs, 16-bit
    quant tables, and malformed scans. The remaining format frontier
    is WebP / H.264 (VP8 boolean arithmetic coding, inter-frame
    prediction — the class a production cluster hands to native
    codecs)."""
    if data[:2] != SOI:
        raise ImageFormatError("jpeg: missing SOI")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict] = {}
    width = height = None
    progressive = False
    comps: list[tuple[int, int, int, int]] = []  # (cid, h, v, quant id)
    grids: list[tuple[int, int, int, int, int, int]] = []
    coefs: list[list[list[int]]] = []
    hmax = vmax = 1
    mcols = mrows = 0
    restart_interval = 0
    saw_scan = False
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise ImageFormatError("jpeg: expected marker")
        while data[pos + 1] == 0xFF:  # 0xFF fill bytes before a marker
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if not saw_scan:
                raise ImageFormatError("jpeg: EOI before scan data")
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        ln = int.from_bytes(data[pos : pos + 2], "big")
        body = data[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ImageFormatError("jpeg: 16-bit quant tables unsupported")
                qtables[tq] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htables[(tc, th)] = _huff_decoder(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            if body[0] != 8:
                raise ImageFormatError("jpeg: only 8-bit precision supported")
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise ImageFormatError(
                    f"jpeg: {ncomp}-component streams unsupported"
                )
            comps = []
            for i in range(ncomp):
                cid, sampling, tq = body[6 + 3 * i : 9 + 3 * i]
                hs, vs = sampling >> 4, sampling & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ImageFormatError(
                        f"jpeg: sampling factor {hs}x{vs} out of range"
                    )
                comps.append((cid, hs, vs, tq))
            if ncomp == 1:
                # single-component scans are non-interleaved (T.81
                # A.2.2): the MCU is one data unit and the declared
                # sampling factors don't apply to the scan layout
                comps = [(comps[0][0], 1, 1, comps[0][3])]
            hmax = max(h for _, h, _, _ in comps)
            vmax = max(v for _, _, v, _ in comps)
            mcols = -(-width // (8 * hmax))
            mrows = -(-height // (8 * vmax))
            grids, coefs = [], []
            for _, hs, vs, _ in comps:
                # component plane dims per T.81 A.1.1 (ceil scaling);
                # buffers sized to the MCU-PADDED grid so interleaved
                # scans can decode the dummy edge units in place
                cw = -(-width * hs // hmax)
                ch = -(-height * vs // vmax)
                bw, bh = -(-cw // 8), -(-ch // 8)
                pw, ph = mcols * hs, mrows * vs
                grids.append((bw, bh, pw, ph, cw, ch))
                coefs.append([[0] * 64 for _ in range(pw * ph)])
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ImageFormatError(
                f"jpeg: SOF{marker - 0xC0} (non-baseline) unsupported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            if width is None or any(tq not in qtables for *_, tq in comps):
                raise ImageFormatError("jpeg: SOS before SOF0/DQT")
            pos = _decode_scan(
                data, pos + ln, body, comps, grids, coefs, htables,
                progressive, restart_interval, mcols, mrows,
            )
            saw_scan = True
            continue
        pos += ln
    if not saw_scan:
        raise ImageFormatError("jpeg: no scan found")

    # one dequant + inverse zigzag + IDCT + level-shift pass over the
    # REAL blocks of every component (padded dummy units discarded)
    planes = []
    for idx, (_, hs, vs, tq) in enumerate(comps):
        quant = qtables[tq]
        qmat = [[0] * 8 for _ in range(8)]
        for i, (r, c) in enumerate(ZIGZAG):
            qmat[r][c] = quant[i]
        bw, bh, pw, _, cw, ch = grids[idx]
        plane = [[0] * cw for _ in range(ch)]
        for byi in range(bh):
            for bxi in range(bw):
                zz = coefs[idx][byi * pw + bxi]
                coefm = [[0.0] * 8 for _ in range(8)]
                for i, (r, c) in enumerate(ZIGZAG):
                    coefm[r][c] = zz[i] * qmat[r][c]
                block = _idct2(coefm)  # block[y][x], mirroring the encoder
                for y in range(8):
                    py = byi * 8 + y
                    if py >= ch:
                        break
                    for x in range(8):
                        px = bxi * 8 + x
                        if px >= cw:
                            continue
                        plane[py][px] = _clamp(block[y][x] + 128.0)
        planes.append(plane)

    if len(comps) == 1:
        return width, height, "L", [bytes(r) for r in planes[0]]
    rows = []
    ys, cbp, crp = planes
    (_, h0, v0, _), (_, h1, v1, _), (_, h2, v2, _) = comps
    for py in range(height):
        row = bytearray()
        for px in range(width):
            row.extend(
                ycbcr_to_rgb(
                    ys[py * v0 // vmax][px * h0 // hmax],
                    cbp[py * v1 // vmax][px * h1 // hmax],
                    crp[py * v2 // vmax][px * h2 // hmax],
                )
            )
        rows.append(bytes(row))
    return width, height, "RGB", rows
