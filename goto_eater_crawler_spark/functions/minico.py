"""Pure-python ICO favicon container walk (the Windows ICO format,
publicly documented; served as ``image/x-icon`` at /favicon.ico) —
the favicon pass of a host-metadata crawl: favicon bytes fingerprint
a site template (shared favicon across hosts => mirror/parked-domain
signal), and the container's entry table routes each embedded image
to the right decoder.

Layout: ICONDIR ``(reserved u16 = 0, type u16 = 1 for ICO, count
u16)`` then ``count`` ICONDIRENTRYs ``(width u8 — 0 MEANS 256,
height u8 — 0 means 256, colors u8, reserved u8, planes u16,
bitcount u16, bytes u32, offset u32)``, all little-endian, then the
image payloads. Each payload is EITHER an embedded PNG (sniffed by
the 8-byte PNG signature; dimensions from the IHDR chunk,
big-endian) or a BMP fragment (BITMAPINFOHEADER with DOUBLED height
— the AND mask rule — and no BITMAPFILEHEADER). Both payload kinds
and the 0-means-256 rule are load-bearing in the gate.
"""

from __future__ import annotations

import struct


class IcoError(ValueError):
    pass


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_payload(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II", w, h) + bytes([8, 6, 0, 0, 0])
    return (
        _PNG_SIG
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", 0)  # stand-in CRC; the walk reads dims only
    )


def _bmp_payload(w: int, h: int) -> bytes:
    # BITMAPINFOHEADER with doubled height (XOR + AND mask rule)
    return struct.pack(
        "<IiiHHIIiiII", 40, w, h * 2, 1, 32, 0, w * h * 4, 0, 0, 0, 0
    ) + bytes((w * h) % 251 for _ in range(4))


def write_ico(entries: list[tuple[int, int, str]]) -> bytes:
    """entries: [(width, height, 'png'|'bmp')] — width/height up to
    256 (encoded as 0 per the spec)."""
    payloads = []
    for w, h, kind in entries:
        payloads.append(
            _png_payload(w, h) if kind == "png" else _bmp_payload(w, h)
        )
    hdr = struct.pack("<HHH", 0, 1, len(entries))
    dir_size = 6 + 16 * len(entries)
    out_dir = b""
    off = dir_size
    for (w, h, _), p in zip(entries, payloads):
        if not 1 <= w <= 256 or not 1 <= h <= 256:
            raise IcoError("ICO dims are 1..256")
        out_dir += struct.pack(
            "<BBBBHHII",
            w % 256,  # 256 -> 0 per spec
            h % 256,
            0, 0, 1, 32, len(p), off,
        )
        off += len(p)
    return hdr + out_dir + b"".join(payloads)


def parse_ico(blob: bytes) -> list[dict]:
    """-> one dict per entry: declared dims (0-rule applied), payload
    kind sniffed from bytes, and the EMBEDDED dims re-read from the
    payload header (PNG IHDR big-endian / BMP header little-endian
    with halved height)."""
    if len(blob) < 6:
        raise IcoError("truncated ICONDIR")
    reserved, typ, count = struct.unpack_from("<HHH", blob, 0)
    if reserved != 0 or typ != 1:
        raise IcoError("not an ICO container")
    out = []
    for i in range(count):
        base = 6 + 16 * i
        if base + 16 > len(blob):
            raise IcoError("truncated ICONDIRENTRY")
        w, h, _c, _r, _planes, bitcount, nbytes, off = struct.unpack_from(
            "<BBBBHHII", blob, base
        )
        if off + nbytes > len(blob):
            raise IcoError("payload overruns file")
        payload = blob[off : off + nbytes]
        decl_w, decl_h = w or 256, h or 256
        if payload[:8] == _PNG_SIG:
            kind = "png"
            ew, eh = struct.unpack_from(">II", payload, 16)
        else:
            size, ew, eh2 = struct.unpack_from("<Iii", payload, 0)
            if size != 40:
                raise IcoError("unknown payload header")
            kind = "bmp"
            eh = eh2 // 2  # undo the AND-mask doubling
        if (ew, eh) != (decl_w, decl_h):
            raise IcoError(
                f"entry {i}: declared {decl_w}x{decl_h} vs embedded {ew}x{eh}"
            )
        out.append(
            {
                "width": decl_w,
                "height": decl_h,
                "kind": kind,
                "bytes": nbytes,
                "bitcount": bitcount,
            }
        )
    return out
