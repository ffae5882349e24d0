"""SQLite database-file walk (sqlite.org/fileformat2.html) — own
encoder/decoder for the single most widely deployed container format
on earth.  Crawl relevance: browser/site data exports, WebSQL dumps
and app sidecars surface as .sqlite/.db binaries in a web corpus; a
pipeline inventories them without linking libsqlite.

Spec surface deliberately carried (all load-bearing):
* 100-byte database header: magic, big-endian page size at offset
  16, page count at 28, text encoding at 56;
* page 1 DUALITY: the sqlite_schema b-tree page header starts at
  offset 100, but its cell-pointer offsets are from the PAGE start
  (= file start) — off-by-100 desyncs the walk;
* b-tree page headers (8-byte leaf 0x0D / 12-byte interior 0x05
  with the right-most child pointer OUTSIDE the cell array);
* interior table cells = (u32 left-child page, rowid-key varint);
  leaf table cells = (payload-length varint, rowid varint, record);
* SQLite varints: BIG-endian 7-bit groups, 1-9 bytes, the 9th byte
  carrying a full 8 bits (the opposite byte order of protobuf's
  LEB128 — a copy-pasted LEB128 reader fails immediately);
* record format: header-length varint + serial-type varints +
  values; integers stored at MINIMAL width (types 1/2/3/4/5/6),
  constants 0/1 as the zero-payload types 8/9, TEXT as 13+2n.

Reference parity: none — build-spec surface extending the storage
walks (parquet/ORC/avro/delta/CBOR/protobuf) with the row-store
everyone actually ships.
"""

from __future__ import annotations

import struct

MAGIC = b"SQLite format 3\x00"
PAGE_SIZE = 512

LEAF_TABLE = 0x0D
INTERIOR_TABLE = 0x05


# ------------------------------------------------------------- varint


def write_varint(n: int) -> bytes:
    if n < 0:
        n += 1 << 64
    if n < 0x80:
        return bytes([n])
    groups = []
    if n >= 1 << 56:
        groups.append(n & 0xFF)  # 9th byte: full 8 bits
        n >>= 8
        for _ in range(8):
            groups.append((n & 0x7F) | 0x80)
            n >>= 7
        return bytes(reversed(groups))
    while n:
        groups.append(n & 0x7F)
        n >>= 7
    out = bytes(
        (g | 0x80) for g in reversed(groups[1:])
    ) + bytes([groups[0]])
    return out


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    n = 0
    for i in range(9):
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        if i == 8:
            n = (n << 8) | b
            break
        n = (n << 7) | (b & 0x7F)
        if not b & 0x80:
            break
    if n >= 1 << 63:
        n -= 1 << 64
    return n, pos


# ------------------------------------------------------------- record


def _int_serial(v: int) -> tuple[int, bytes]:
    if v == 0:
        return 8, b""
    if v == 1:
        return 9, b""
    for stype, width in ((1, 1), (2, 2), (3, 3), (4, 4), (5, 6), (6, 8)):
        lo, hi = -(1 << (8 * width - 1)), (1 << (8 * width - 1)) - 1
        if lo <= v <= hi:
            return stype, v.to_bytes(width, "big", signed=True)
    raise ValueError("integer out of 64-bit range")


def encode_record(values: list) -> bytes:
    stypes, bodies = [], []
    for v in values:
        if v is None:
            stypes.append(0)
            bodies.append(b"")
        elif isinstance(v, int):
            st, body = _int_serial(v)
            stypes.append(st)
            bodies.append(body)
        elif isinstance(v, str):
            raw = v.encode("utf-8")
            stypes.append(13 + 2 * len(raw))
            bodies.append(raw)
        elif isinstance(v, bytes):
            stypes.append(12 + 2 * len(v))
            bodies.append(v)
        else:
            raise ValueError(f"unsupported value {v!r}")
    st_bytes = b"".join(write_varint(s) for s in stypes)
    # header length varint counts ITSELF; sizes here keep it 1 byte
    hlen = len(st_bytes) + 1
    if hlen >= 0x80:
        raise ValueError("record header too long for this builder")
    return bytes([hlen]) + st_bytes + b"".join(bodies)


_SERIAL_WIDTH = {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 6, 6: 8, 8: 0, 9: 0}


def decode_record(buf: bytes) -> list:
    hlen, pos = read_varint(buf, 0)
    stypes = []
    while pos < hlen:
        st, pos = read_varint(buf, pos)
        stypes.append(st)
    if pos != hlen:
        raise ValueError("record header length mismatch")
    out = []
    for st in stypes:
        if st in _SERIAL_WIDTH:
            w = _SERIAL_WIDTH[st]
            if pos + w > len(buf):
                raise ValueError("truncated record body")
            if st == 0:
                out.append(None)
            elif st == 8:
                out.append(0)
            elif st == 9:
                out.append(1)
            else:
                out.append(
                    int.from_bytes(buf[pos : pos + w], "big", signed=True)
                )
            pos += w
        elif st >= 13 and st % 2 == 1:
            n = (st - 13) // 2
            if pos + n > len(buf):
                raise ValueError("truncated text value")
            out.append(buf[pos : pos + n].decode("utf-8"))
            pos += n
        elif st >= 12 and st % 2 == 0:
            n = (st - 12) // 2
            out.append(bytes(buf[pos : pos + n]))
            pos += n
        else:
            raise ValueError(f"unsupported serial type {st}")
    if pos != len(buf):
        raise ValueError("trailing record bytes")
    return out


# ------------------------------------------------------------- pages


def _leaf_page(cells: list[bytes], *, header_at: int = 0) -> bytes:
    """Build one page containing a leaf table b-tree. header_at=100
    for page 1 (the database header precedes the b-tree header but
    cell offsets stay page-relative)."""
    page = bytearray(PAGE_SIZE)
    content = PAGE_SIZE
    offsets = []
    for cell in cells:
        content -= len(cell)
        page[content : content + len(cell)] = cell
        offsets.append(content)
    hdr = header_at
    page[hdr] = LEAF_TABLE
    struct.pack_into(">H", page, hdr + 1, 0)
    struct.pack_into(">H", page, hdr + 3, len(cells))
    struct.pack_into(">H", page, hdr + 5, content % 65536)
    page[hdr + 7] = 0
    ptr = hdr + 8
    for off in offsets:
        struct.pack_into(">H", page, ptr, off)
        ptr += 2
    if ptr > content:
        raise ValueError("page overflow")
    return bytes(page)


def _interior_page(
    children: list[tuple[int, int]], rightmost: int
) -> bytes:
    """children: [(page_no, max_rowid_key), ...] left-to-right."""
    page = bytearray(PAGE_SIZE)
    content = PAGE_SIZE
    offsets = []
    for child_page, key in children:
        cell = struct.pack(">I", child_page) + write_varint(key)
        content -= len(cell)
        page[content : content + len(cell)] = cell
        offsets.append(content)
    page[0] = INTERIOR_TABLE
    struct.pack_into(">H", page, 1, 0)
    struct.pack_into(">H", page, 3, len(children))
    struct.pack_into(">H", page, 5, content % 65536)
    page[7] = 0
    struct.pack_into(">I", page, 8, rightmost)
    ptr = 12
    for off in offsets:
        struct.pack_into(">H", page, ptr, off)
        ptr += 2
    return bytes(page)


def leaf_cell(rowid: int, record: bytes) -> bytes:
    return write_varint(len(record)) + write_varint(rowid) + record


def build_db(
    table_name: str,
    rows: list[tuple[int, list]],
    *,
    rows_per_leaf: int = 4,
) -> bytes:
    """Assemble a .sqlite blob: page 1 = db header + sqlite_schema
    leaf, page 2 = table root (interior if >1 leaf), pages 3.. =
    leaves holding `rows` as (rowid, values)."""
    leaves = [
        rows[i : i + rows_per_leaf]
        for i in range(0, len(rows), rows_per_leaf)
    ] or [[]]
    first_leaf_page = 3
    leaf_pages = []
    children = []
    for i, chunk in enumerate(leaves):
        cells = [
            leaf_cell(rowid, encode_record(vals)) for rowid, vals in chunk
        ]
        leaf_pages.append(_leaf_page(cells))
        if chunk:
            children.append((first_leaf_page + i, chunk[-1][0]))
    root = _interior_page(children[:-1], rightmost=children[-1][0])
    n_pages = 2 + len(leaf_pages)
    schema_rec = encode_record(
        [
            "table",
            table_name,
            table_name,
            2,
            f"CREATE TABLE {table_name}(id INTEGER, label TEXT, "
            "flag INTEGER, val INTEGER, note TEXT)",
        ]
    )
    page1 = bytearray(_leaf_page([leaf_cell(1, schema_rec)], header_at=100))
    page1[0:16] = MAGIC
    struct.pack_into(">H", page1, 16, PAGE_SIZE)
    page1[18] = page1[19] = 1  # file format versions
    struct.pack_into(">I", page1, 28, n_pages)
    struct.pack_into(">I", page1, 56, 1)  # UTF-8
    return bytes(page1) + root + b"".join(leaf_pages)


def read_db(blob: bytes) -> dict:
    """Walk the file: header -> schema -> root -> leaves.  Returns
    {page_size, n_pages, tables: [{name, rootpage, sql}], rows:
    [(rowid, values), ...] for the first table}."""
    if blob[:16] != MAGIC:
        raise ValueError("bad magic")
    page_size = struct.unpack_from(">H", blob, 16)[0]
    if page_size == 1:
        page_size = 65536
    n_pages = struct.unpack_from(">I", blob, 28)[0]
    if len(blob) != page_size * n_pages:
        raise ValueError("file length != page_size * page_count")
    enc = struct.unpack_from(">I", blob, 56)[0]
    if enc != 1:
        raise ValueError(f"unsupported text encoding {enc}")

    def page(n: int) -> bytes:
        return blob[(n - 1) * page_size : n * page_size]

    def walk_table(page_no: int, hdr_off: int = 0):
        pg = page(page_no)
        ptype = pg[hdr_off]
        ncells = struct.unpack_from(">H", pg, hdr_off + 3)[0]
        if ptype == LEAF_TABLE:
            ptr = hdr_off + 8
            out = []
            for _ in range(ncells):
                off = struct.unpack_from(">H", pg, ptr)[0]
                ptr += 2
                plen, p = read_varint(pg, off)
                rowid, p = read_varint(pg, p)
                out.append((rowid, decode_record(pg[p : p + plen])))
            return out
        if ptype == INTERIOR_TABLE:
            rightmost = struct.unpack_from(">I", pg, hdr_off + 8)[0]
            ptr = hdr_off + 12
            out = []
            last_key = None
            for _ in range(ncells):
                off = struct.unpack_from(">H", pg, ptr)[0]
                ptr += 2
                child = struct.unpack_from(">I", pg, off)[0]
                key, _ = read_varint(pg, off + 4)
                sub = walk_table(child)
                if sub and sub[-1][0] != key:
                    raise ValueError(
                        "interior key != child's max rowid"
                    )
                if last_key is not None and sub and sub[0][0] <= last_key:
                    raise ValueError("rowids not ascending across leaves")
                if sub:
                    last_key = sub[-1][0]
                out.extend(sub)
            out.extend(walk_table(rightmost))
            return out
        raise ValueError(f"unsupported page type {ptype:#x}")

    schema_rows = walk_table(1, hdr_off=100)
    tables = [
        {"name": vals[1], "rootpage": vals[3], "sql": vals[4]}
        for _, vals in schema_rows
        if vals[0] == "table"
    ]
    if not tables:
        raise ValueError("no tables in schema")
    rows = walk_table(tables[0]["rootpage"])
    return {
        "page_size": page_size,
        "n_pages": n_pages,
        "tables": tables,
        "rows": rows,
    }
