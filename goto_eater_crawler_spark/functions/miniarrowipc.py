"""Arrow IPC stream walk (Apache Arrow columnar format spec,
arrow.apache.org/docs/format/Columnar.html) — own decoder.

Arrow IPC is THE interchange format of this engine's own hot path:
every mapInPandas stage ships record batches in exactly this layout.
The walk decodes it from first principles — including a generic
FLATBUFFERS table reader (vtables, unions, vectors; flatbuffers.dev
binary format) — against real files written by pyarrow, the
reference producer. No pyarrow call appears anywhere in the decode
path; the tests compare the walk's values against pyarrow's own
reader, so every constant below is pinned by a third-party encoder.

Spec surface carried (each load-bearing):
* encapsulated messages: 0xFFFFFFFF continuation marker + int32 LE
  metadata length (8-byte-aligned), flatbuffer ``Message``, then
  ``bodyLength`` bytes of buffers; end-of-stream = marker + zero;
* flatbuffers: root uoffset, SIGNED vtable soffset (the sign is the
  part a casual reader gets wrong), per-field uint16 vtable slots
  (0 = absent -> default), strings/vectors as uoffsets from their
  own location, unions as a (type-byte, value-offset) slot PAIR —
  message header ordinals Schema=1, RecordBatch=3;
* Schema/Field trees with union Type ordinals Int=2,
  FloatingPoint=3, Utf8=5, Bool=6; Int carries (bitWidth,
  is_signed), FloatingPoint carries precision (DOUBLE=2);
* RecordBatch: FieldNode STRUCT vector (16-byte inline elements —
  not offset vectors) + Buffer struct vector; per-column buffer
  layout validity[, offsets], data; validity is an LSB bitmap that
  may be a ZERO-LENGTH buffer when null_count == 0;
* Utf8 int32 offset arrays; Bool as LSB bitmaps (not bytes).

Unsupported-but-detected: dictionary batches, body compression,
non-little endianness, and union Type ordinals outside the carried
set all raise rather than mis-decode.
"""

from __future__ import annotations

import struct

CONTINUATION = 0xFFFFFFFF

# MessageHeader union ordinals (format/Message.fbs declaration order)
H_SCHEMA = 1
H_DICTIONARY_BATCH = 2
H_RECORD_BATCH = 3

# Type union ordinals (format/Schema.fbs declaration order)
T_INT = 2
T_FLOAT = 3
T_UTF8 = 5
T_BOOL = 6


class ArrowError(ValueError):
    pass


# ---------------------------------------------------------------------------
# generic flatbuffers reader
# ---------------------------------------------------------------------------


class _FB:
    """Minimal flatbuffers accessor over one metadata blob."""

    def __init__(self, buf: bytes):
        self.buf = buf

    def _u16(self, pos: int) -> int:
        return struct.unpack_from("<H", self.buf, pos)[0]

    def _i32(self, pos: int) -> int:
        return struct.unpack_from("<i", self.buf, pos)[0]

    def _u32(self, pos: int) -> int:
        return struct.unpack_from("<I", self.buf, pos)[0]

    def root(self) -> int:
        return self._u32(0)  # uoffset to root table

    def field_pos(self, table: int, index: int) -> int | None:
        """Absolute position of field ``index`` in ``table``, or
        None when the slot is absent (default applies)."""
        vtable = table - self._i32(table)  # SIGNED soffset
        vbytes = self._u16(vtable)
        slot = 4 + 2 * index
        if slot + 2 > vbytes:
            return None
        off = self._u16(vtable + slot)
        return table + off if off else None

    def scalar(self, table: int, index: int, fmt: str, default):
        pos = self.field_pos(table, index)
        if pos is None:
            return default
        return struct.unpack_from(fmt, self.buf, pos)[0]

    def indirect(self, table: int, index: int) -> int | None:
        """Follow a uoffset field (string/table/vector target)."""
        pos = self.field_pos(table, index)
        if pos is None:
            return None
        return pos + self._u32(pos)

    def string(self, table: int, index: int) -> str | None:
        tgt = self.indirect(table, index)
        if tgt is None:
            return None
        n = self._u32(tgt)
        return self.buf[tgt + 4 : tgt + 4 + n].decode("utf-8")

    def vector(self, table: int, index: int) -> tuple[int, int]:
        """-> (element-0 position, length); (0, 0) when absent."""
        tgt = self.indirect(table, index)
        if tgt is None:
            return 0, 0
        return tgt + 4, self._u32(tgt)

    def vector_tables(self, table: int, index: int) -> list[int]:
        pos, n = self.vector(table, index)
        return [pos + 4 * i + self._u32(pos + 4 * i) for i in range(n)]


# ---------------------------------------------------------------------------
# schema / batch metadata
# ---------------------------------------------------------------------------


def _parse_field(fb: _FB, fpos: int) -> dict:
    name = fb.string(fpos, 0)
    nullable = bool(fb.scalar(fpos, 1, "<b", 0))
    ttype = fb.scalar(fpos, 2, "<B", 0)
    tpos = fb.indirect(fpos, 3)
    if fb.indirect(fpos, 4) is not None:
        raise ArrowError("dictionary-encoded fields unsupported")
    if ttype == T_INT:
        bits = fb.scalar(tpos, 0, "<i", 0)
        signed = bool(fb.scalar(tpos, 1, "<b", 0))
        typ = ("int", bits, signed)
    elif ttype == T_FLOAT:
        typ = ("float", fb.scalar(tpos, 0, "<h", 0))
    elif ttype == T_UTF8:
        typ = ("utf8",)
    elif ttype == T_BOOL:
        typ = ("bool",)
    else:
        raise ArrowError(f"Type union ordinal {ttype} unsupported")
    return {"name": name, "nullable": nullable, "type": typ}


def _parse_schema(fb: _FB, spos: int) -> list[dict]:
    endianness = fb.scalar(spos, 0, "<h", 0)
    if endianness != 0:
        raise ArrowError("big-endian buffers unsupported")
    return [_parse_field(fb, f) for f in fb.vector_tables(spos, 1)]


def _bit(buf: bytes, i: int) -> int:
    return (buf[i >> 3] >> (i & 7)) & 1


def _decode_column(field: dict, nrows: int, null_count: int,
                   bufs: list[bytes]) -> list:
    validity = bufs[0]
    def valid(i):
        if null_count == 0 or len(validity) == 0:
            return True
        return bool(_bit(validity, i))

    t = field["type"]
    if t[0] == "int":
        _, bits, signed = t
        fmt = {8: "b", 16: "h", 32: "i", 64: "q"}[bits]
        data = bufs[1]
        vals = struct.unpack_from(
            f"<{nrows}{fmt if signed else fmt.upper()}", data, 0
        )
        return [v if valid(i) else None for i, v in enumerate(vals)]
    if t[0] == "float":
        fmt = {1: "f", 2: "d"}[t[1]]
        vals = struct.unpack_from(f"<{nrows}{fmt}", bufs[1], 0)
        return [v if valid(i) else None for i, v in enumerate(vals)]
    if t[0] == "bool":
        data = bufs[1]
        return [
            bool(_bit(data, i)) if valid(i) else None
            for i in range(nrows)
        ]
    if t[0] == "utf8":
        offs = struct.unpack_from(f"<{nrows + 1}i", bufs[1], 0)
        data = bufs[2]
        return [
            data[offs[i] : offs[i + 1]].decode("utf-8")
            if valid(i) else None
            for i in range(nrows)
        ]
    raise ArrowError(f"column type {t} unsupported")


_NBUFS = {"int": 2, "float": 2, "bool": 2, "utf8": 3}


def _decode_batch(fb: _FB, bpos: int, body: bytes,
                  fields: list[dict]) -> dict:
    nrows = fb.scalar(bpos, 0, "<q", 0)
    if fb.field_pos(bpos, 3) is not None:
        raise ArrowError("compressed bodies unsupported")
    npos, nlen = fb.vector(bpos, 1)  # FieldNode struct vector (16 B)
    if nlen != len(fields):
        raise ArrowError("node count != field count")
    nodes = [
        struct.unpack_from("<qq", fb.buf, npos + 16 * i)
        for i in range(nlen)
    ]
    bpos2, blen = fb.vector(bpos, 2)  # Buffer struct vector (16 B)
    handles = [
        struct.unpack_from("<qq", fb.buf, bpos2 + 16 * i)
        for i in range(blen)
    ]
    if sum(_NBUFS[f["type"][0]] for f in fields) != blen:
        raise ArrowError("buffer count mismatch")
    cols = {}
    bi = 0
    for f, (length, null_count) in zip(fields, nodes):
        if length != nrows:
            raise ArrowError("ragged field node")
        nb = _NBUFS[f["type"][0]]
        raw = []
        for off, ln in handles[bi : bi + nb]:
            if off + ln > len(body):
                raise ArrowError("buffer overruns body")
            raw.append(body[off : off + ln])
        bi += nb
        cols[f["name"]] = _decode_column(f, nrows, null_count, raw)
    return {"n_rows": nrows, "columns": cols}


# ---------------------------------------------------------------------------
# stream walk
# ---------------------------------------------------------------------------


def read_stream(buf: bytes) -> dict:
    """-> {fields, batches: [{n_rows, columns}], n_messages}."""
    pos = 0
    fields: list[dict] | None = None
    batches = []
    n_messages = 0
    while True:
        if pos == len(buf):
            break  # EOF without explicit EOS marker is tolerated
        if pos + 8 > len(buf):
            raise ArrowError("truncated message prefix")
        marker = struct.unpack_from("<I", buf, pos)[0]
        if marker != CONTINUATION:
            raise ArrowError("missing continuation marker")
        mlen = struct.unpack_from("<i", buf, pos + 4)[0]
        pos += 8
        if mlen == 0:
            break  # end-of-stream
        if pos + mlen > len(buf):
            raise ArrowError("truncated message metadata")
        fb = _FB(buf[pos : pos + mlen])
        pos += mlen
        n_messages += 1
        msg = fb.root()
        htype = fb.scalar(msg, 1, "<B", 0)
        hpos = fb.indirect(msg, 2)
        body_len = fb.scalar(msg, 3, "<q", 0)
        if pos + body_len > len(buf):
            raise ArrowError("truncated message body")
        body = buf[pos : pos + body_len]
        pos += body_len
        if htype == H_SCHEMA:
            fields = _parse_schema(fb, hpos)
        elif htype == H_RECORD_BATCH:
            if fields is None:
                raise ArrowError("record batch before schema")
            batches.append(_decode_batch(fb, hpos, body, fields))
        elif htype == H_DICTIONARY_BATCH:
            raise ArrowError("dictionary batches unsupported")
        else:
            raise ArrowError(f"header ordinal {htype} unsupported")
    if fields is None:
        raise ArrowError("no schema message")
    return {
        "fields": fields,
        "batches": batches,
        "n_messages": n_messages,
    }
