"""Pure-python TIFF/EXIF IFD walk — the metadata pass a multimodal
corpus pipeline runs BEFORE any pixel decode (orientation for the
resize path, capture time for dedup/provenance, camera make/model for
stratified sampling), reading only the first KBs of each blob.

Implements the TIFF 6.0 specification (Adobe, 1992 — public) IFD
structure that EXIF (JEITA CP-3451, public) reuses: a 8-byte header
(``II``/``MM`` byte order + magic 42 + first-IFD offset), then linked
IFDs of 12-byte entries ``(tag u16, type u16, count u32,
value-or-offset u32)`` — values ≤ 4 bytes inline LEFT-JUSTIFIED in
the offset field, larger values out-of-line. Both byte orders are
first-class (the endian dispatch is load-bearing in the gate: files
alternate II/MM). Types: BYTE(1) ASCII(2) SHORT(3) LONG(4)
RATIONAL(5).

No imaging library exists in this sandbox; the encoder here is the
producer for tests/gates and the decoder is the engine path — both
pinned by the spec's layout rules (inline vs out-of-line, NUL-
terminated ASCII, rational = two u32s) and by hostile structural
tests.
"""

from __future__ import annotations

import io
import struct

# tag names per TIFF 6.0 / EXIF CP-3451 (public constants)
TAGS = {
    270: "description",   # ImageDescription, ASCII
    271: "make",          # ASCII
    272: "model",         # ASCII
    274: "orientation",   # SHORT
    282: "x_resolution",  # RATIONAL
    306: "datetime",      # ASCII "YYYY:MM:DD HH:MM:SS"
}

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def write_tiff(fields: dict[int, object], big_endian: bool = False) -> bytes:
    """Encode one IFD with the given {tag: value} dict. Values:
    str -> ASCII, int -> SHORT (<=0xFFFF) else LONG, (num, den) ->
    RATIONAL. Deterministic: entries sorted by tag (the spec REQUIRES
    ascending tag order), out-of-line data in the same order."""
    bo = ">" if big_endian else "<"
    entries = []
    overflow = io.BytesIO()
    # header(8) + count(2) + 12*n + next(4)
    data_base = 8 + 2 + 12 * len(fields) + 4
    for tag in sorted(fields):
        v = fields[tag]
        if isinstance(v, str):
            raw = v.encode("ascii") + b"\x00"
            typ, cnt = 2, len(raw)
        elif isinstance(v, tuple):
            raw = struct.pack(bo + "II", v[0], v[1])
            typ, cnt = 5, 1
        elif isinstance(v, int):
            if v <= 0xFFFF:
                raw = struct.pack(bo + "H", v)
                typ, cnt = 3, 1
            else:
                raw = struct.pack(bo + "I", v)
                typ, cnt = 4, 1
        else:
            raise ValueError(f"unsupported value {v!r}")
        if len(raw) <= 4:
            valfield = raw + b"\x00" * (4 - len(raw))  # left-justified
        else:
            off = data_base + overflow.tell()
            valfield = struct.pack(bo + "I", off)
            overflow.write(raw)
        entries.append(struct.pack(bo + "HHI", tag, typ, cnt) + valfield)
    out = io.BytesIO()
    out.write((b"MM" if big_endian else b"II") + struct.pack(bo + "H", 42))
    out.write(struct.pack(bo + "I", 8))  # first IFD right after header
    out.write(struct.pack(bo + "H", len(entries)))
    for e in entries:
        out.write(e)
    out.write(struct.pack(bo + "I", 0))  # no next IFD
    out.write(overflow.getvalue())
    return out.getvalue()


def read_tiff(blob: bytes) -> dict[str, object]:
    """Walk the first IFD; return {tag_name: value} for known tags
    (unknown tags are skipped per the spec's reader contract).
    Raises on bad magic / truncated structures — a corrupt blob
    fails loudly, never yields fields."""
    if blob[:2] == b"II":
        bo = "<"
    elif blob[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("bad TIFF byte-order mark")
    (magic,) = struct.unpack_from(bo + "H", blob, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (ifd_off,) = struct.unpack_from(bo + "I", blob, 4)
    (n,) = struct.unpack_from(bo + "H", blob, ifd_off)
    out: dict[str, object] = {}
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(bo + "HHI", blob, base)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue  # unknown type: skip entry (spec reader rule)
        nbytes = size * cnt
        if nbytes <= 4:
            pos = base + 8  # inline, left-justified
        else:
            (pos,) = struct.unpack_from(bo + "I", blob, base + 8)
        if pos + nbytes > len(blob):
            raise ValueError("truncated TIFF value")
        name = TAGS.get(tag)
        if name is None:
            continue
        if typ == 2:
            raw = blob[pos : pos + cnt]
            out[name] = raw.split(b"\x00", 1)[0].decode("ascii")
        elif typ == 3:
            out[name] = struct.unpack_from(bo + "H", blob, pos)[0]
        elif typ == 4:
            out[name] = struct.unpack_from(bo + "I", blob, pos)[0]
        elif typ == 5:
            num, den = struct.unpack_from(bo + "II", blob, pos)
            out[name] = (num, den)
        elif typ == 1:
            out[name] = blob[pos]
    return out
