"""WOFF 1.0 font-container walk (W3C WOFF File Format 1.0) — own
encoder/decoder.

Fonts are one of the largest non-image byte classes in a web crawl;
the corpus op inventories them (flavor, tables, true sizes) without
a font engine.  Spec surface carried:

* 44-byte header: magic 'wOFF', FLAVOR (the wrapped sfnt version:
  0x00010000 TrueType glyphs / 'OTTO' CFF), total length, numTables,
  totalSfntSize (the size the UNPACKED sfnt would have — recomputed
  and VERIFIED, §3: header 12 + 16*numTables + 4-aligned table
  lengths);
* table directory entries (tag / offset / compLength / origLength /
  origChecksum): a table is zlib-compressed iff compLength <
  origLength (equal means stored raw — compressing a table that
  doesn't shrink is a spec violation the walk rejects);
* the sfnt CHECKSUM rule (sum of big-endian uint32s of the 4-padded
  table data, mod 2^32) — verified per table on decode.
"""

from __future__ import annotations

import struct
import zlib

MAGIC = b"wOFF"
FLAVOR_TTF = 0x00010000
FLAVOR_CFF = 0x4F54544F  # 'OTTO'


def _checksum(data: bytes) -> int:
    pad = (-len(data)) % 4
    data = data + b"\x00" * pad
    total = 0
    for i in range(0, len(data), 4):
        total = (total + struct.unpack_from(">I", data, i)[0]) & 0xFFFFFFFF
    return total


def build_woff(tables: list[tuple[bytes, bytes]], flavor: int) -> bytes:
    """tables: [(4-byte tag, data), ...] in directory order."""
    n = len(tables)
    header_len = 44
    dir_len = 20 * n
    entries = []
    blobs = []
    offset = header_len + dir_len
    sfnt_size = 12 + 16 * n
    for tag, data in tables:
        if len(tag) != 4:
            raise ValueError("tag must be 4 bytes")
        comp = zlib.compress(data, 6)
        stored = comp if len(comp) < len(data) else data
        entries.append(
            (tag, offset, len(stored), len(data), _checksum(data))
        )
        pad = (-len(stored)) % 4
        blobs.append(stored + b"\x00" * pad)
        offset += len(stored) + pad
        sfnt_size += len(data) + ((-len(data)) % 4)
    out = bytearray()
    out += MAGIC
    out += struct.pack(">I", flavor)
    out += struct.pack(">I", offset)
    out += struct.pack(">HH", n, 0)
    out += struct.pack(">I", sfnt_size)
    out += struct.pack(">HH", 1, 0)  # woff major/minor version
    # metaOffset / metaLength / metaOrigLength / privOffset / privLength
    out += struct.pack(">IIIII", 0, 0, 0, 0, 0)
    assert len(out) == header_len
    for tag, off, clen, olen, csum in entries:
        out += tag + struct.pack(">IIII", off, clen, olen, csum)
    for blob in blobs:
        out += blob
    return bytes(out)


def read_woff(buf: bytes) -> dict:
    """Walk + verify: returns {flavor, n_tables, sfnt_size, tables:
    [{tag, comp_len, orig_len, compressed, data}]}. Verifies total
    length, the recomputed totalSfntSize, per-table checksums, and
    the never-expand compression rule."""
    if buf[:4] != MAGIC:
        raise ValueError("bad magic")
    flavor, total_len = struct.unpack_from(">II", buf, 4)
    n, reserved = struct.unpack_from(">HH", buf, 12)
    sfnt_size = struct.unpack_from(">I", buf, 16)[0]
    if reserved:
        raise ValueError("reserved field must be 0")
    if total_len != len(buf):
        raise ValueError("header length != file length")
    tables = []
    expect_sfnt = 12 + 16 * n
    for i in range(n):
        off0 = 44 + 20 * i
        tag = buf[off0 : off0 + 4]
        off, clen, olen, csum = struct.unpack_from(">IIII", buf, off0 + 4)
        if off + clen > len(buf):
            raise ValueError("table overruns file")
        if clen > olen:
            raise ValueError("compLength exceeds origLength")
        raw = buf[off : off + clen]
        if clen < olen:
            data = zlib.decompress(raw)
            if len(data) != olen:
                raise ValueError("decompressed length != origLength")
            compressed = True
        else:
            data = raw
            compressed = False
        if _checksum(data) != csum:
            raise ValueError(f"checksum mismatch for {tag!r}")
        expect_sfnt += olen + ((-olen) % 4)
        tables.append(
            {
                "tag": tag.decode("latin-1"),
                "comp_len": clen,
                "orig_len": olen,
                "compressed": compressed,
                "data": data,
            }
        )
    if sfnt_size != expect_sfnt:
        raise ValueError("totalSfntSize mismatch")
    return {
        "flavor": "ttf" if flavor == FLAVOR_TTF else (
            "cff" if flavor == FLAVOR_CFF else f"{flavor:#x}"
        ),
        "n_tables": n,
        "sfnt_size": sfnt_size,
        "tables": tables,
    }
