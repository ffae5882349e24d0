"""Pure-python GIF (87a/89a) codec in the miniimg style: real
variable-code-width LZW both ways, palettes, interlace, and
multi-frame animations — no native codec, stdlib only.

Scope (documented): global and local color tables, interlaced and
sequential images, Graphic Control Extensions (frame delay,
transparency index), multi-frame streams composited over the logical
screen with ALL disposal methods — 0/1 (none / do not dispose), 2
(restore patch rect to the background color), 3 (restore to the
pre-frame canvas) — and LZW with dictionary growth to 4096 and
mid-stream CLEAR resets. Plain-text/application extensions are
skipped per spec as sub-block chains.

Everything here derives from the public GIF89a specification
(CompuServe 1990, also W3C-hosted) and the classic LZW construction
(Welch 1984). GIF's LZW packs codes LSB-FIRST (unlike JPEG/DEFLATE's
entropy layers), starts at min-code-size + 1 bits, and reserves
2^mcs as CLEAR and 2^mcs + 1 as end-of-information. The reference
crawler has no GIF analogue; this is build-spec frontier surface for
the multimodal column family (operators/multimodal.py), giving
binary_metadata / image_decode another REAL decode arm.
"""

from __future__ import annotations

from .miniimg import ImageFormatError

GIF89A = b"GIF89a"
GIF87A = b"GIF87a"

# row order of the 4 interlace passes (GIF89a spec appendix E):
# start offsets 0,4,2,1 with strides 8,8,4,2
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> list[int]:
    out = []
    for start, step in _INTERLACE:
        out.extend(range(start, height, step))
    return out


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first packing, variable width 3..12 bits)
# ---------------------------------------------------------------------------


class _LsbBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def lzw_encode(mcs: int, indices: bytes) -> bytes:
    """GIF-LZW compress a pixel-index stream with min code size
    ``mcs``: emit CLEAR, build the string table greedily, grow the
    code width when the next code crosses a power of two, reset via
    CLEAR at 4096 entries, and close with EOI."""
    clear = 1 << mcs
    eoi = clear + 1
    w = _LsbBitWriter()

    def fresh() -> tuple[dict[bytes, int], int, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
            mcs + 1,
        )

    table, next_code, width = fresh()
    w.write(clear, width)
    prefix = b""
    for b in indices:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        w.write(table[prefix], width)
        table[cand] = next_code
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:
            w.write(clear, width)
            table, next_code, width = fresh()
        prefix = bytes([b])
    if prefix:
        w.write(table[prefix], width)
    w.write(eoi, width)
    return w.flush()


def lzw_decode(mcs: int, data: bytes, expected: int) -> bytes:
    """Inverse of :func:`lzw_encode` (Welch 1984 with the GIF
    conventions): handles the KwKwK just-defined-code case, CLEAR
    resets, and stops at EOI or after ``expected`` pixels."""
    clear = 1 << mcs
    eoi = clear + 1
    pos = 0  # bit position
    nbits = len(data) * 8

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > nbits:
            raise ImageFormatError("gif: LZW data exhausted")
        v = 0
        for i in range(width):
            byte = data[(pos + i) >> 3]
            if byte >> ((pos + i) & 7) & 1:
                v |= 1 << i
        pos += width
        return v

    def roots() -> list[bytes]:
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    out = bytearray()
    table = roots()
    width = mcs + 1
    prev: bytes | None = None
    while len(out) < expected:
        code = read(width)
        if code == clear:
            table = roots()
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ImageFormatError("gif: first code not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK: the just-about-defined code
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ImageFormatError("gif: LZW code out of range")
        out.extend(entry)
        # width growth mirrors the encoder exactly: both sides cross
        # the power of two after defining the same entry index (the
        # decoder trails the encoder by one definition, the encoder's
        # check fires on the value pre-increment — same condition)
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    return bytes(out[:expected])


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def _subblocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ImageFormatError("gif: truncated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out.extend(data[pos : pos + n])
        pos += n


def _palette_bits(n_colors: int) -> int:
    bits = 1
    while (1 << bits) < n_colors:
        bits += 1
    return bits


def gif_encode(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    frames: list[bytes],
    delays_cs: list[int] | None = None,
    interlace: bool = False,
) -> bytes:
    """Encode index ``frames`` (each height rows x width index bytes,
    concatenated) against one global ``palette`` (2..256 entries) as
    GIF89a; multi-frame streams carry a Graphic Control Extension per
    frame with centisecond ``delays_cs``. ``interlace`` stores rows in
    the 4-pass interlaced order."""
    if not 2 <= len(palette) <= 256:
        raise ValueError("palette must have 2..256 colors")
    bits = _palette_bits(len(palette))
    mcs = max(bits, 2)  # LZW min code size >= 2 per spec
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes([r, g, b])
    pal += b"\x00" * (3 * ((1 << bits) - len(palette)))

    out = bytearray(GIF89A)
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0x80 | ((bits - 1) << 4) | (bits - 1))  # GCT present
    out += b"\x00\x00"  # bg color, aspect
    out += pal
    for fi, frame in enumerate(frames):
        if len(frame) != width * height:
            raise ValueError("frame size mismatch")
        if len(frames) > 1:
            delay = (delays_cs or [10] * len(frames))[fi]
            out += bytes([0x21, 0xF9, 4, 0x04, delay & 0xFF, delay >> 8, 0, 0])
        out.append(0x2C)
        out += (0).to_bytes(2, "little") * 2
        out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
        out.append(0x40 if interlace else 0x00)
        if interlace:
            rows = [
                frame[y * width : (y + 1) * width]
                for y in _interlace_order(height)
            ]
            frame = b"".join(rows)
        out.append(mcs)
        out += _subblocks(lzw_encode(mcs, frame))
    out.append(0x3B)
    return bytes(out)


def gif_decode(
    data: bytes,
) -> tuple[int, int, list[tuple[int, bytes]]]:
    """Decode a GIF stream -> (width, height, frames) where each frame
    is (delay_cs, RGB rows concatenated: height * 3*width bytes),
    composited over the logical screen with full disposal-method
    semantics: 0/1 (none / do not dispose — the patch stays), 2
    (restore the patch RECT to the background color after the frame
    shows), 3 (restore the canvas to its pre-frame state). Transparent
    pixels leave the canvas unchanged."""
    if data[:6] not in (GIF87A, GIF89A):
        raise ImageFormatError("gif: bad signature")
    if len(data) < 14:
        raise ImageFormatError("gif: truncated header")
    width = int.from_bytes(data[6:8], "little")
    height = int.from_bytes(data[8:10], "little")
    packed = data[10]
    pos = 13
    gct: list[tuple[int, int, int]] = []
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise ImageFormatError("gif: truncated color table")
        gct = [
            (data[pos + 3 * i], data[pos + 3 * i + 1], data[pos + 3 * i + 2])
            for i in range(n)
        ]
        pos += 3 * n
    canvas = bytearray(3 * width * height)  # black logical screen
    bg_rgb = bytes(gct[data[11]]) if gct and data[11] < len(gct) else b"\x00\x00\x00"
    frames: list[tuple[int, bytes]] = []
    delay = 0
    transparent: int | None = None
    disposal = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            body, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                delay = int.from_bytes(body[1:3], "little")
                transparent = body[3] if body[0] & 0x01 else None
                disposal = (body[0] >> 2) & 0x07
            continue
        if b != 0x2C:
            raise ImageFormatError(f"gif: unexpected block 0x{b:02X}")
        if pos + 9 > len(data):
            raise ImageFormatError("gif: truncated image descriptor")
        left = int.from_bytes(data[pos : pos + 2], "little")
        top = int.from_bytes(data[pos + 2 : pos + 4], "little")
        iw = int.from_bytes(data[pos + 4 : pos + 6], "little")
        ih = int.from_bytes(data[pos + 6 : pos + 8], "little")
        ipacked = data[pos + 8]
        pos += 9
        pal = gct
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n + 1 > len(data):
                raise ImageFormatError("gif: truncated color table")
            pal = [
                (data[pos + 3 * i], data[pos + 3 * i + 1], data[pos + 3 * i + 2])
                for i in range(n)
            ]
            pos += 3 * n
        if not pal:
            raise ImageFormatError("gif: image with no color table")
        if pos >= len(data):
            raise ImageFormatError("gif: truncated before LZW data")
        mcs = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = lzw_decode(mcs, lzw, iw * ih)
        if len(idx) < iw * ih:
            raise ImageFormatError("gif: short pixel data")
        if ipacked & 0x40:  # interlaced: undo the 4-pass row order
            rows = [b""] * ih
            for src, y in enumerate(_interlace_order(ih)):
                rows[y] = idx[src * iw : (src + 1) * iw]
            idx = b"".join(rows)
        before = bytes(canvas) if disposal == 3 else None
        for y in range(ih):
            cy = top + y
            if cy >= height:
                break
            for x in range(iw):
                cx = left + x
                if cx >= width:
                    continue
                ci = idx[y * iw + x]
                if transparent is not None and ci == transparent:
                    continue
                if ci >= len(pal):
                    raise ImageFormatError("gif: index outside palette")
                off = 3 * (cy * width + cx)
                canvas[off : off + 3] = bytes(pal[ci])
        frames.append((delay, bytes(canvas)))
        if disposal == 2:  # restore the patch rect to background
            for y in range(ih):
                cy = top + y
                if cy >= height:
                    break
                for x in range(iw):
                    cx = left + x
                    if cx >= width:
                        continue
                    off = 3 * (cy * width + cx)
                    canvas[off : off + 3] = bg_rgb
        elif disposal == 3 and before is not None:  # restore previous
            canvas = bytearray(before)
        delay = 0
        transparent = None
        disposal = 0
    if not frames:
        raise ImageFormatError("gif: no image data")
    return width, height, frames
