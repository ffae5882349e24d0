"""Pure-python ISO Base Media File Format (MP4) box walk — the
container metadata pass a multimodal corpus pipeline runs before any
codec work (duration/timescale for frame-sampling budgets, track
layout for modality routing, dimensions for resize planning), reading
only the ``moov`` tree, never ``mdat`` payload bytes.

Implements the ISO/IEC 14496-12 (public spec; also MPEG-4 Part 12 /
QuickTime atoms) box structure: ``[size u32][type 4cc][payload]``,
``size == 1`` -> 64-bit ``largesize`` follows the type, ``size == 0``
-> box extends to end of file. Container boxes (``moov``, ``trak``,
``mdia``) hold child boxes; full boxes carry ``version(1) flags(3)``
and switch 32/64-bit fields on version — both ``mvhd``/``tkhd``
version paths and the largesize path are first-class (gate blobs
alternate them so each branch carries corpus).

No mp4 library exists in this sandbox; the encoder is the producer
for tests/gates, the decoder is the engine path — both pinned by the
spec's layout rules (version field widths, 16.16 fixed-point track
dimensions, big-endian throughout) and hostile structural tests.

Reference analogue: the reference crawler sniffs/parses its binary
fetches (PDF via ``pdfplumber``, XLSX via ``openpyxl`` — e.g.
`gunma.py:20`, `nagano.py:18`); this is the same pre-decode
metadata-contract step for the video modality of a web corpus.
"""

from __future__ import annotations

import struct

CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"udta"}


class Mp4Error(ValueError):
    pass


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from(">I", b, off)[0]


def _u64(b: bytes, off: int) -> int:
    return struct.unpack_from(">Q", b, off)[0]


def walk(blob: bytes, start: int = 0, end: int | None = None):
    """Yield (type4cc, payload_start, payload_end) for each top-level
    box in blob[start:end], applying the size==1 (largesize) and
    size==0 (to-end) rules. Raises Mp4Error on truncation or a box
    overrunning its parent."""
    end = len(blob) if end is None else end
    off = start
    while off < end:
        if off + 8 > end:
            raise Mp4Error(f"truncated box header at {off}")
        size = _u32(blob, off)
        typ = blob[off + 4 : off + 8]
        body = off + 8
        if size == 1:
            if off + 16 > end:
                raise Mp4Error("truncated largesize")
            size = _u64(blob, off + 8)
            body = off + 16
            if size < 16:
                raise Mp4Error("largesize smaller than header")
        elif size == 0:
            size = end - off
        elif size < 8:
            raise Mp4Error(f"box size {size} < header")
        if off + size > end:
            raise Mp4Error(f"box {typ!r} overruns parent")
        yield typ, body, off + size
        off += size


def _full_box(blob: bytes, start: int) -> tuple[int, int]:
    """(version, first-field offset) of a full box payload."""
    return blob[start], start + 4


def parse_mp4(blob: bytes) -> dict:
    """Extract the container metadata contract: major brand, movie
    timescale/duration (mvhd v0/v1), per-track handler 4ccs in file
    order, and the first video track's 16.16 track dimensions."""
    brand = None
    out: dict = {
        "brand": None,
        "mvhd_version": None,
        "timescale": None,
        "duration": None,
        "handlers": [],
        "width": None,
        "height": None,
    }
    for typ, a, b in walk(blob):
        if typ == b"ftyp":
            if b - a < 8:
                raise Mp4Error("short ftyp")
            brand = blob[a : a + 4].decode("ascii")
            out["brand"] = brand
        elif typ == b"moov":
            _parse_moov(blob, a, b, out)
    if out["brand"] is None or out["timescale"] is None:
        raise Mp4Error("missing ftyp or mvhd")
    return out


def _parse_moov(blob: bytes, start: int, end: int, out: dict) -> None:
    for typ, a, b in walk(blob, start, end):
        if typ == b"mvhd":
            ver, p = _full_box(blob, a)
            out["mvhd_version"] = ver
            if ver == 1:
                out["timescale"] = _u32(blob, p + 16)
                out["duration"] = _u64(blob, p + 20)
            else:
                out["timescale"] = _u32(blob, p + 8)
                out["duration"] = _u32(blob, p + 12)
        elif typ == b"trak":
            _parse_trak(blob, a, b, out)


def _parse_trak(blob: bytes, start: int, end: int, out: dict) -> None:
    width = height = None
    handler = None
    for typ, a, b in walk(blob, start, end):
        if typ == b"tkhd":
            ver, p = _full_box(blob, a)
            # v0: created(4) modified(4) id(4) rsvd(4) dur(4);
            # v1: created(8) modified(8) id(4) rsvd(4) dur(8)
            fixed = p + (32 if ver == 1 else 20)
            # layer(2) alternate(2) volume(2) rsvd(2) matrix(36)
            dim = fixed + 8 + 2 + 2 + 2 + 2 + 36
            width = _u32(blob, dim) / 65536.0
            height = _u32(blob, dim + 4) / 65536.0
        elif typ == b"mdia":
            for t2, a2, b2 in walk(blob, a, b):
                if t2 == b"hdlr":
                    _, p2 = _full_box(blob, a2)
                    handler = blob[p2 + 4 : p2 + 8].decode("ascii")
    if handler is None:
        raise Mp4Error("trak without hdlr")
    out["handlers"].append(handler)
    if handler == "vide" and out["width"] is None:
        out["width"] = width
        out["height"] = height


# ---------------------------------------------------------------------------
# encoder (gate/test producer)
# ---------------------------------------------------------------------------


def _box(typ: bytes, payload: bytes, largesize: bool = False) -> bytes:
    if largesize:
        return struct.pack(">I", 1) + typ + struct.pack(
            ">Q", 16 + len(payload)
        ) + payload
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _mvhd(version: int, timescale: int, duration: int) -> bytes:
    if version == 1:
        body = struct.pack(">B3x", 1) + struct.pack(
            ">QQIQ", 0, 0, timescale, duration
        )
    else:
        body = struct.pack(">B3x", 0) + struct.pack(
            ">IIII", 0, 0, timescale, duration
        )
    # rate, volume, reserved, matrix, predefined, next_track_id
    body += struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100)
    body += b"\x00" * 10 + b"\x00" * 36 + b"\x00" * 24 + struct.pack(">I", 2)
    return _box(b"mvhd", body)


def _tkhd(version: int, track_id: int, dur: int, w: int, h: int) -> bytes:
    if version == 1:
        body = struct.pack(">B3x", 1) + struct.pack(
            ">QQI4xQ", 0, 0, track_id, dur
        )
    else:
        body = struct.pack(">B3x", 0) + struct.pack(
            ">III4xI", 0, 0, track_id, dur
        )
    body += b"\x00" * 8  # reserved
    body += struct.pack(">hhhh", 0, 0, 0x0100, 0)  # layer alt volume rsvd
    body += b"\x00" * 36  # matrix
    body += struct.pack(">II", w << 16, h << 16)
    return _box(b"tkhd", body)


def _hdlr(handler: str) -> bytes:
    return _box(
        b"hdlr",
        struct.pack(">B3x", 0)
        + b"\x00" * 4
        + handler.encode("ascii")
        + b"\x00" * 12
        + b"nm\x00",
    )


def write_mp4(
    timescale: int,
    duration: int,
    tracks: list[tuple[str, int, int]],
    version: int = 0,
    largesize_mdat: bool = False,
    brand: str = "isom",
    payload: bytes = b"",
) -> bytes:
    """tracks: [(handler4cc, width, height), ...]. ``version`` drives
    BOTH mvhd and tkhd field widths; ``largesize_mdat`` exercises the
    size==1 path on the mdat box."""
    traks = b""
    for i, (handler, w, h) in enumerate(tracks):
        traks += _box(
            b"trak",
            _tkhd(version, i + 1, duration, w, h)
            + _box(b"mdia", _hdlr(handler)),
        )
    moov = _box(b"moov", _mvhd(version, timescale, duration) + traks)
    ftyp = _box(
        b"ftyp", brand.encode("ascii") + struct.pack(">I", 0x200) + b"iso2mp41"
    )
    free = _box(b"free", b"\xde\xad")
    mdat = _box(b"mdat", payload, largesize=largesize_mdat)
    return ftyp + free + moov + mdat
