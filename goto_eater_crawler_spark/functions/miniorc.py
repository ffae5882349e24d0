"""miniorc — the engine's OWN ORC file-tail walk (Apache ORC v1
specification, orc.apache.org/specification/ORCv1; orc_proto.proto
field numbers are part of that public spec).

The ORC sibling of ``miniparquet``: at 100 TB the planning layer
sweeps file FOOTERS (one ranged tail-GET per file) for row counts,
stripe boundaries and per-column min/max — never row data. Parquet
footers are Thrift compact protocol; ORC footers are PROTOBUF wire
format, so this module carries its own protobuf walk (varints,
zigzag sint64, length-delimited submessages, packed repeated u32).

Layers decoded here, all cross-checked against real files written by
pyarrow's ORC writer (the real Apache ORC C++ library):

- tail: ``[footer][postscript][1-byte postscript length]``; the
  postscript is never compressed and ends with magic "ORC".
- PostScript message: footerLength(1), compression(2: 0 NONE, 1 ZLIB,
  2 SNAPPY, 3 LZO, 4 LZ4, 5 ZSTD), compressionBlockSize(3),
  version(4), metadataLength(5), writerVersion(6), magic(8000).
- ORC compression chunk framing: 3-byte little-endian header
  ``(chunkLength << 1) | isOriginal`` before each chunk — decoded
  with the engine's OWN codecs: raw-deflate chunks via
  ``minideflate.inflate``, snappy blocks via
  ``minisnappy.uncompress``, lz4 blocks via
  ``minilz4.block_decompress``, zstd frames via
  ``minizstd.zstd_decompress``.
- Footer message: headerLength(1), contentLength(2), stripes(3),
  types(4), metadata(5), numberOfRows(6), statistics(7),
  rowIndexStride(8), writer(9), softwareVersion(12).
- StripeInformation: offset(1), indexLength(2), dataLength(3),
  footerLength(4), numberOfRows(5).
- Type: kind(1), subtypes(2, packed u32), fieldNames(3).
- ColumnStatistics: numberOfValues(1), intStatistics(2),
  doubleStatistics(3), stringStatistics(4), dateStatistics(7),
  timestampStatistics(9), hasNull(10).
- IntegerStatistics min/max/sum are ``sint64`` — ZIGZAG varints;
  DoubleStatistics are fixed64 IEEE; StringStatistics min/max are
  UTF-8 strings.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from .minideflate import inflate
from .minilz4 import block_decompress as _lz4_block
from .minisnappy import uncompress as _snappy_block
from .minizstd import zstd_decompress as _zstd_frame


class OrcError(ValueError):
    """Malformed or unsupported ORC file tail."""


TYPE_KINDS = {
    0: "BOOLEAN", 1: "BYTE", 2: "SHORT", 3: "INT", 4: "LONG",
    5: "FLOAT", 6: "DOUBLE", 7: "STRING", 8: "BINARY", 9: "TIMESTAMP",
    10: "LIST", 11: "MAP", 12: "STRUCT", 13: "UNION", 14: "DECIMAL",
    15: "DATE", 16: "VARCHAR", 17: "CHAR",
    18: "TIMESTAMP_INSTANT",
}

COMPRESSION_KINDS = {0: "NONE", 1: "ZLIB", 2: "SNAPPY", 3: "LZO",
                     4: "LZ4", 5: "ZSTD"}


# ------------------------------------------------------------ protobuf


def _uvarint(data: bytes, pos: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        if pos >= len(data):
            raise OrcError("truncated varint")
        b = data[pos]
        n |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return n, pos
        shift += 7
        if shift > 70:
            raise OrcError("varint too long")


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def parse_message(data: bytes) -> dict[int, list[tuple[int, object]]]:
    """One-level protobuf wire walk: field id -> [(wire_type, raw)].
    wire 0 -> int, wire 1 -> 8 raw bytes, wire 2 -> bytes,
    wire 5 -> 4 raw bytes. Submessages stay bytes for the caller."""
    fields: dict[int, list[tuple[int, object]]] = {}
    pos = 0
    while pos < len(data):
        key, pos = _uvarint(data, pos)
        fid, wire = key >> 3, key & 0x07
        if wire == 0:
            val, pos = _uvarint(data, pos)
        elif wire == 1:
            val, pos = data[pos : pos + 8], pos + 8
        elif wire == 2:
            ln, pos = _uvarint(data, pos)
            val, pos = data[pos : pos + ln], pos + ln
            if len(val) != ln:
                raise OrcError("truncated length-delimited field")
        elif wire == 5:
            val, pos = data[pos : pos + 4], pos + 4
        else:
            raise OrcError(f"unsupported wire type {wire}")
        fields.setdefault(fid, []).append((wire, val))
    return fields


def _first_int(fields, fid, default=None):
    for wire, v in fields.get(fid, []):
        if wire == 0:
            return v
    return default


def _packed_u32s(fields, fid) -> list[int]:
    """Repeated uint32: packed (wire 2) or unpacked (wire 0)."""
    out: list[int] = []
    for wire, v in fields.get(fid, []):
        if wire == 0:
            out.append(v)
        elif wire == 2:
            pos = 0
            while pos < len(v):
                n, pos = _uvarint(v, pos)
                out.append(n)
    return out


# ------------------------------------------------------------ messages


@dataclass
class StripeInfo:
    offset: int
    index_length: int
    data_length: int
    footer_length: int
    num_rows: int


@dataclass
class ColumnStats:
    num_values: int | None
    has_null: bool | None
    kind: str | None = None  # int / double / string stats present
    minimum: object = None
    maximum: object = None
    total: object = None  # sum where the spec carries one


@dataclass
class OrcFooter:
    num_rows: int
    compression: str
    compression_block_size: int | None
    software_version: str | None
    column_names: list[str]  # root struct field names, "" for root
    column_kinds: list[str]  # TYPE_KINDS per flattened column id
    stripes: list[StripeInfo] = field(default_factory=list)
    statistics: list[ColumnStats] = field(default_factory=list)


def _decompress(buf: bytes, codec: int) -> bytes:
    """ORC chunk framing: 3-byte LE header (len << 1) | isOriginal."""
    if codec == 0:
        return buf
    out = bytearray()
    pos = 0
    while pos < len(buf):
        if pos + 3 > len(buf):
            raise OrcError("truncated chunk header")
        h = buf[pos] | (buf[pos + 1] << 8) | (buf[pos + 2] << 16)
        ln, original = h >> 1, h & 1
        chunk = buf[pos + 3 : pos + 3 + ln]
        if len(chunk) != ln:
            raise OrcError("truncated chunk payload")
        pos += 3 + ln
        if original:
            out += chunk
        elif codec == 1:
            body, _ = inflate(chunk)
            out += body
        elif codec == 2:
            out += _snappy_block(chunk)
        elif codec == 4:
            out += _lz4_block(chunk)
        elif codec == 5:
            out += _zstd_frame(chunk)
        else:
            raise OrcError(
                f"unsupported compression {COMPRESSION_KINDS.get(codec, codec)}"
            )
    return bytes(out)


def _parse_stats(raw: bytes) -> ColumnStats:
    f = parse_message(raw)
    cs = ColumnStats(
        num_values=_first_int(f, 1),
        has_null=None if _first_int(f, 10) is None else bool(_first_int(f, 10)),
    )
    if 2 in f:  # IntegerStatistics: sint64 zigzag min/max/sum
        sub = parse_message(f[2][0][1])
        cs.kind = "int"
        if _first_int(sub, 1) is not None:
            cs.minimum = _zigzag(_first_int(sub, 1))
        if _first_int(sub, 2) is not None:
            cs.maximum = _zigzag(_first_int(sub, 2))
        if _first_int(sub, 3) is not None:
            cs.total = _zigzag(_first_int(sub, 3))
    elif 3 in f:  # DoubleStatistics: fixed64 IEEE
        sub = parse_message(f[3][0][1])
        cs.kind = "double"
        for fid, attr in ((1, "minimum"), (2, "maximum"), (3, "total")):
            for wire, v in sub.get(fid, []):
                if wire == 1:
                    setattr(cs, attr, struct.unpack("<d", v)[0])
    elif 4 in f:  # StringStatistics: utf-8 min/max, sint64 sum
        sub = parse_message(f[4][0][1])
        cs.kind = "string"
        for fid, attr in ((1, "minimum"), (2, "maximum")):
            for wire, v in sub.get(fid, []):
                if wire == 2:
                    setattr(cs, attr, v.decode("utf-8"))
        if _first_int(sub, 3) is not None:
            cs.total = _zigzag(_first_int(sub, 3))
    return cs


def parse_orc_tail(data: bytes) -> OrcFooter:
    """Walk the postscript + footer of a complete ORC file (or of its
    tail slice — only the last postscript+footer bytes are touched,
    the ranged-GET contract)."""
    if len(data) < 4:
        raise OrcError("too short for an ORC tail")
    ps_len = data[-1]
    ps_raw = data[-1 - ps_len : -1]
    ps = parse_message(ps_raw)
    magic = ps.get(8000, [(2, b"")])[0][1]
    if magic != b"ORC":
        raise OrcError(f"bad postscript magic {magic!r}")
    footer_len = _first_int(ps, 1)
    codec = _first_int(ps, 2, 0)
    if footer_len is None or footer_len > len(data) - 1 - ps_len:
        raise OrcError("bad footerLength")
    footer_raw = _decompress(
        data[len(data) - 1 - ps_len - footer_len : len(data) - 1 - ps_len],
        codec,
    )
    f = parse_message(footer_raw)

    # type tree: entry 0 is the root STRUCT; its fieldNames name the
    # top-level columns and its subtypes give their flattened ids
    kinds: list[str] = []
    root_names: list[str] = []
    for i, (wire, raw) in enumerate(f.get(4, [])):
        t = parse_message(raw)
        kinds.append(TYPE_KINDS.get(_first_int(t, 1, -1), "UNKNOWN"))
        if i == 0:
            root_names = [
                v.decode("utf-8") for wire2, v in t.get(3, []) if wire2 == 2
            ]

    stripes = [
        StripeInfo(
            offset=_first_int(s, 1, 0),
            index_length=_first_int(s, 2, 0),
            data_length=_first_int(s, 3, 0),
            footer_length=_first_int(s, 4, 0),
            num_rows=_first_int(s, 5, 0),
        )
        for s in (parse_message(raw) for _w, raw in f.get(3, []))
    ]
    stats = [_parse_stats(raw) for _w, raw in f.get(7, [])]

    sw = None
    for wire, v in f.get(12, []):
        if wire == 2:
            sw = v.decode("utf-8")
    return OrcFooter(
        num_rows=_first_int(f, 6, 0),
        compression=COMPRESSION_KINDS.get(codec, str(codec)),
        compression_block_size=_first_int(ps, 3),
        software_version=sw,
        column_names=root_names,
        column_kinds=kinds,
        stripes=stripes,
        statistics=stats,
    )
