"""Pure-python HPACK walk (RFC 7541, public) — HTTP/2 header
decompression, the transport-metadata decode of an h2 crawl capture:
headers arrive as index references against a STATIC table plus a
connection-scoped DYNAMIC table that every block mutates, so blocks
can only be decoded in order with carried state — which is exactly
what makes it a per-connection sessionful decode operator rather
than a per-record map.

Implements:

* §5.1 prefix integers — an N-bit prefix holds values < 2^N - 1;
  larger values spill to continuation bytes of 7 bits each (the
  HPACK varint; load-bearing for indices > 62 and long strings);
* §6.1/6.2 representations — indexed (1-bit pattern), literal with
  incremental indexing (01), literal without indexing (0000) and
  never-indexed (0001) — plus §6.3 dynamic-table-size updates (001);
* §4 dynamic table semantics — insert at index 62, entry size =
  len(name) + len(value) + 32, EVICTION from the oldest end while
  the table exceeds its max size (size updates can evict mid-block);
* §5.2 string literals with the H bit CLEAR (raw octets — legal
  HPACK; the Appendix-B Huffman alternative is an encoder CHOICE,
  documented out of scope so no hand-typed 257-entry table can
  silently diverge from the spec).

Static table: RFC 7541 Appendix A (61 entries).
"""

from __future__ import annotations

STATIC_TABLE: list[tuple[str, str]] = [
    (":authority", ""),
    (":method", "GET"),
    (":method", "POST"),
    (":path", "/"),
    (":path", "/index.html"),
    (":scheme", "http"),
    (":scheme", "https"),
    (":status", "200"),
    (":status", "204"),
    (":status", "206"),
    (":status", "304"),
    (":status", "400"),
    (":status", "404"),
    (":status", "500"),
    ("accept-charset", ""),
    ("accept-encoding", "gzip, deflate"),
    ("accept-language", ""),
    ("accept-ranges", ""),
    ("accept", ""),
    ("access-control-allow-origin", ""),
    ("age", ""),
    ("allow", ""),
    ("authorization", ""),
    ("cache-control", ""),
    ("content-disposition", ""),
    ("content-encoding", ""),
    ("content-language", ""),
    ("content-length", ""),
    ("content-location", ""),
    ("content-range", ""),
    ("content-type", ""),
    ("cookie", ""),
    ("date", ""),
    ("etag", ""),
    ("expect", ""),
    ("expires", ""),
    ("from", ""),
    ("host", ""),
    ("if-match", ""),
    ("if-modified-since", ""),
    ("if-none-match", ""),
    ("if-range", ""),
    ("if-unmodified-since", ""),
    ("last-modified", ""),
    ("link", ""),
    ("location", ""),
    ("max-forwards", ""),
    ("proxy-authenticate", ""),
    ("proxy-authorization", ""),
    ("range", ""),
    ("referer", ""),
    ("refresh", ""),
    ("retry-after", ""),
    ("server", ""),
    ("set-cookie", ""),
    ("strict-transport-security", ""),
    ("transfer-encoding", ""),
    ("user-agent", ""),
    ("vary", ""),
    ("via", ""),
    ("www-authenticate", ""),
]


class HpackError(ValueError):
    pass


def encode_int(value: int, prefix_bits: int, flags: int = 0) -> bytes:
    limit = (1 << prefix_bits) - 1
    if value < limit:
        return bytes([flags | value])
    out = [flags | limit]
    value -= limit
    while value >= 128:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    out.append(value)
    return bytes(out)


def decode_int(b: bytes, off: int, prefix_bits: int) -> tuple[int, int]:
    limit = (1 << prefix_bits) - 1
    if off >= len(b):
        raise HpackError("truncated integer")
    v = b[off] & limit
    off += 1
    if v < limit:
        return v, off
    shift = 0
    while True:
        if off >= len(b):
            raise HpackError("truncated integer continuation")
        byte = b[off]
        off += 1
        v += (byte & 0x7F) << shift
        if not byte & 0x80:
            return v, off
        shift += 7
        if shift > 35:
            raise HpackError("integer too large")


def _encode_str(s: str) -> bytes:
    raw = s.encode("utf-8")
    return encode_int(len(raw), 7, 0x00) + raw  # H bit clear


def _decode_str(b: bytes, off: int) -> tuple[str, int]:
    if off >= len(b):
        raise HpackError("truncated string header")
    if b[off] & 0x80:
        raise HpackError("huffman strings out of scope (H bit set)")
    n, off = decode_int(b, off, 7)
    if off + n > len(b):
        raise HpackError("string overruns block")
    return b[off : off + n].decode("utf-8"), off + n


class DynamicTable:
    def __init__(self, max_size: int = 4096) -> None:
        self.entries: list[tuple[str, str]] = []  # newest first
        self.max_size = max_size
        self.evictions = 0

    @property
    def size(self) -> int:
        return sum(len(n) + len(v) + 32 for n, v in self.entries)

    def _evict(self) -> None:
        while self.entries and self.size > self.max_size:
            self.entries.pop()
            self.evictions += 1

    def insert(self, name: str, value: str) -> None:
        self.entries.insert(0, (name, value))
        self._evict()

    def resize(self, new_max: int) -> None:
        self.max_size = new_max
        self._evict()

    def lookup(self, index: int) -> tuple[str, str]:
        if index < 1:
            raise HpackError("index 0 is invalid")
        if index <= len(STATIC_TABLE):
            return STATIC_TABLE[index - 1]
        di = index - len(STATIC_TABLE) - 1
        if di >= len(self.entries):
            raise HpackError(f"dynamic index {index} out of range")
        return self.entries[di]


class Encoder:
    """Deterministic test/gate producer sharing the decoder's table
    model (always emits raw string literals, H bit clear)."""

    def __init__(self, max_size: int = 4096) -> None:
        self.table = DynamicTable(max_size)

    def indexed(self, index: int) -> bytes:
        return encode_int(index, 7, 0x80)

    def literal_indexing(self, name: str, value: str) -> bytes:
        out = encode_int(0, 6, 0x40) + _encode_str(name) + _encode_str(value)
        self.table.insert(name, value)
        return out

    def literal_indexing_nameidx(self, idx: int, value: str) -> bytes:
        name = self.table.lookup(idx)[0]
        out = encode_int(idx, 6, 0x40) + _encode_str(value)
        self.table.insert(name, value)
        return out

    def literal_no_indexing(self, name: str, value: str) -> bytes:
        return encode_int(0, 4, 0x00) + _encode_str(name) + _encode_str(value)

    def size_update(self, new_max: int) -> bytes:
        self.table.resize(new_max)
        return encode_int(new_max, 5, 0x20)


def decode_block(
    b: bytes, table: DynamicTable
) -> list[tuple[str, str]]:
    """One header block against the carried connection table."""
    off = 0
    out: list[tuple[str, str]] = []
    while off < len(b):
        byte = b[off]
        if byte & 0x80:  # indexed
            idx, off = decode_int(b, off, 7)
            out.append(table.lookup(idx))
        elif byte & 0x40:  # literal, incremental indexing
            idx, off = decode_int(b, off, 6)
            if idx:
                name = table.lookup(idx)[0]
            else:
                name, off = _decode_str(b, off)
            value, off = _decode_str(b, off)
            out.append((name, value))
            table.insert(name, value)
        elif byte & 0x20:  # dynamic table size update
            new_max, off = decode_int(b, off, 5)
            table.resize(new_max)
        else:  # literal without indexing / never indexed (0000/0001)
            idx, off = decode_int(b, off, 4)
            if idx:
                name = table.lookup(idx)[0]
            else:
                name, off = _decode_str(b, off)
            value, off = _decode_str(b, off)
            out.append((name, value))
    return out
