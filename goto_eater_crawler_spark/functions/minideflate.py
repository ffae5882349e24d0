"""Pure-python DEFLATE (RFC 1951) + gzip member (RFC 1952) decoder.

Why the engine carries its own inflater: a web-scale crawl receives
most HTTP bodies with ``Content-Encoding: gzip`` (the reference's
scrapy stack decompresses transparently — scrapy
``downloadermiddlewares/httpcompression.py``), and Common-Crawl-style
WARC archives are per-record gzip members.  The decode itself is the
canonical RFC 1951 walk (public spec; decode loop follows the classic
public-domain *puff* contract: canonical-Huffman symbol resolution by
per-length counts): BFINAL/BTYPE block loop, stored blocks with
LEN/NLEN integrity, fixed and dynamic Huffman tables, the
code-length meta-alphabet with 16/17/18 run codes, and LZ77
back-references over a 32 KiB window.  The gzip layer parses the full
RFC 1952 header (FEXTRA/FNAME/FCOMMENT/FHCRC) and verifies both
trailer fields — CRC32 (table-driven, computed here, not delegated)
and ISIZE — per member, with concatenated-member support.

Tested against the *real* encoder: every unit test round-trips
``zlib``/``gzip`` output (stored, fixed and dynamic blocks at
levels 0/1/6/9) through this decoder, so the tables cannot be
self-consistently wrong.
"""

from __future__ import annotations


class DeflateError(ValueError):
    pass


_GZIP_MAGIC = b"\x1f\x8b"

# RFC 1951 §3.2.5 — length codes 257..285 and distance codes 0..29
_LEN_BASE = (3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31,
             35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)
_LEN_EXTRA = (0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
              3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)
_DIST_BASE = (1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129,
              193, 257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097,
              6145, 8193, 12289, 16385, 24577)
_DIST_EXTRA = (0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6,
               7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13)
# RFC 1951 §3.2.7 — code-length alphabet transmission order
_CLC_ORDER = (16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2,
              14, 1, 15)


class _BitReader:
    """LSB-first bit reader over bytes (DEFLATE bit order)."""

    __slots__ = ("data", "pos", "buf", "cnt")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.cnt = 0

    def bits(self, n: int) -> int:
        while self.cnt < n:
            if self.pos >= len(self.data):
                raise DeflateError("truncated deflate stream")
            self.buf |= self.data[self.pos] << self.cnt
            self.pos += 1
            self.cnt += 8
        v = self.buf & ((1 << n) - 1)
        self.buf >>= n
        self.cnt -= n
        return v

    def align(self) -> None:
        """Drop to the next byte boundary (stored-block prefix and
        end-of-stream trailer are byte-aligned)."""
        self.buf = 0
        self.cnt = 0


class _Huffman:
    """Canonical Huffman table as per-length symbol counts + the
    symbol list sorted by (length, symbol) — RFC 1951 §3.2.2."""

    __slots__ = ("counts", "symbols")

    def __init__(self, lengths):
        self.counts = [0] * 16
        for ln in lengths:
            self.counts[ln] += 1
        self.counts[0] = 0
        # over-subscribed table = corrupt stream
        left = 1
        for ln in range(1, 16):
            left = (left << 1) - self.counts[ln]
            if left < 0:
                raise DeflateError("over-subscribed huffman code")
        offs = [0] * 16
        for ln in range(1, 15):
            offs[ln + 1] = offs[ln] + self.counts[ln]
        self.symbols = [0] * (offs[15] + self.counts[15])
        for sym, ln in enumerate(lengths):
            if ln:
                self.symbols[offs[ln]] = sym
                offs[ln] += 1

    def decode(self, br: _BitReader) -> int:
        code = first = index = 0
        for ln in range(1, 16):
            code |= br.bits(1)
            count = self.counts[ln]
            if code - first < count:
                return self.symbols[index + code - first]
            index += count
            first = (first + count) << 1
            code <<= 1
        raise DeflateError("invalid huffman code")


_FIXED_LIT = _Huffman([8] * 144 + [9] * 112 + [7] * 24 + [8] * 8)
_FIXED_DIST = _Huffman([5] * 30)


def _dynamic_tables(br: _BitReader) -> tuple[_Huffman, _Huffman]:
    hlit = br.bits(5) + 257
    hdist = br.bits(5) + 1
    hclen = br.bits(4) + 4
    cl_lengths = [0] * 19
    for i in range(hclen):
        cl_lengths[_CLC_ORDER[i]] = br.bits(3)
    cl_table = _Huffman(cl_lengths)
    lengths: list[int] = []
    while len(lengths) < hlit + hdist:
        sym = cl_table.decode(br)
        if sym < 16:
            lengths.append(sym)
        elif sym == 16:
            if not lengths:
                raise DeflateError("repeat with no previous length")
            lengths.extend([lengths[-1]] * (3 + br.bits(2)))
        elif sym == 17:
            lengths.extend([0] * (3 + br.bits(3)))
        else:
            lengths.extend([0] * (11 + br.bits(7)))
    if len(lengths) != hlit + hdist:
        raise DeflateError("code-length overrun")
    return _Huffman(lengths[:hlit]), _Huffman(lengths[hlit:])


def inflate(data: bytes, pos: int = 0) -> tuple[bytes, int]:
    """Decode one raw DEFLATE stream starting at byte ``pos``.
    Returns (plaintext, end_pos) where end_pos is the first byte
    after the stream (the bit cursor is realigned), so callers can
    read gzip/zlib trailers or the next concatenated member."""
    br = _BitReader(data, pos)
    out = bytearray()
    while True:
        bfinal = br.bits(1)
        btype = br.bits(2)
        if btype == 0:  # stored
            br.align()
            if br.pos + 4 > len(data):
                raise DeflateError("truncated stored header")
            length = data[br.pos] | (data[br.pos + 1] << 8)
            nlen = data[br.pos + 2] | (data[br.pos + 3] << 8)
            if length != (~nlen & 0xFFFF):
                raise DeflateError("stored LEN/NLEN mismatch")
            br.pos += 4
            if br.pos + length > len(data):
                raise DeflateError("truncated stored block")
            out += data[br.pos : br.pos + length]
            br.pos += length
        elif btype in (1, 2):
            if btype == 1:
                lit, dist = _FIXED_LIT, _FIXED_DIST
            else:
                lit, dist = _dynamic_tables(br)
            while True:
                sym = lit.decode(br)
                if sym < 256:
                    out.append(sym)
                elif sym == 256:
                    break
                else:
                    if sym > 285:
                        raise DeflateError("invalid length code")
                    i = sym - 257
                    length = _LEN_BASE[i] + br.bits(_LEN_EXTRA[i])
                    d = dist.decode(br)
                    if d > 29:
                        raise DeflateError("invalid distance code")
                    distance = _DIST_BASE[d] + br.bits(_DIST_EXTRA[d])
                    if distance > len(out):
                        raise DeflateError("distance beyond window")
                    start = len(out) - distance
                    # overlapping copy (RLE-style refs) must go
                    # byte-by-byte when length > distance
                    if length <= distance:
                        out += out[start : start + length]
                    else:
                        for _ in range(length):
                            out.append(out[start])
                            start += 1
        else:
            raise DeflateError("reserved block type 3")
        if bfinal:
            break
    br.align()
    return bytes(out), br.pos


# -- CRC32 (RFC 1952 §8; reflected poly 0xEDB88320), table-driven ----
def _crc_table() -> list[int]:
    tbl = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ 0xEDB88320 if c & 1 else c >> 1
        tbl.append(c)
    return tbl


_CRC_TABLE = _crc_table()


def crc32(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFF
    tbl = _CRC_TABLE
    for b in data:
        crc = tbl[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


_FHCRC, _FEXTRA, _FNAME, _FCOMMENT = 2, 4, 8, 16


def gunzip_member(data: bytes, pos: int = 0) -> tuple[bytes, dict, int]:
    """Decode one RFC 1952 member at ``pos``. Returns (plaintext,
    meta, end_pos); meta carries crc_ok / isize_ok / fname / mtime /
    os and the member's compressed extent."""
    start = pos
    if data[pos : pos + 2] != _GZIP_MAGIC:
        raise DeflateError("bad gzip magic")
    if data[pos + 2] != 8:
        raise DeflateError("unsupported compression method")
    flg = data[pos + 3]
    mtime = int.from_bytes(data[pos + 4 : pos + 8], "little")
    os_byte = data[pos + 9]
    pos += 10
    if flg & _FEXTRA:
        xlen = int.from_bytes(data[pos : pos + 2], "little")
        pos += 2 + xlen
    fname = None
    if flg & _FNAME:
        end = data.index(b"\x00", pos)
        fname = data[pos:end].decode("latin-1")
        pos = end + 1
    if flg & _FCOMMENT:
        pos = data.index(b"\x00", pos) + 1
    if flg & _FHCRC:
        hcrc = int.from_bytes(data[pos : pos + 2], "little")
        if hcrc != (crc32(data[start:pos]) & 0xFFFF):
            raise DeflateError("header crc mismatch")
        pos += 2
    plain, pos = inflate(data, pos)
    if pos + 8 > len(data):
        raise DeflateError("truncated gzip trailer")
    want_crc = int.from_bytes(data[pos : pos + 4], "little")
    want_isize = int.from_bytes(data[pos + 4 : pos + 8], "little")
    pos += 8
    meta = {
        "crc_ok": crc32(plain) == want_crc,
        "isize_ok": (len(plain) & 0xFFFFFFFF) == want_isize,
        "fname": fname,
        "mtime": mtime,
        "os": os_byte,
        "compressed_len": pos - start,
    }
    return plain, meta, pos


def gunzip_members(data: bytes) -> list[tuple[bytes, dict]]:
    """Walk every concatenated member (the Common Crawl WARC layout:
    one member per record)."""
    out = []
    pos = 0
    while pos < len(data):
        plain, meta, pos = gunzip_member(data, pos)
        out.append((plain, meta))
    return out


def gunzip(data: bytes) -> bytes:
    """All members' plaintext, concatenated; raises on any CRC or
    ISIZE mismatch (a silent torn decode must not reach the corpus)."""
    parts = []
    for plain, meta in gunzip_members(data):
        if not (meta["crc_ok"] and meta["isize_ok"]):
            raise DeflateError("gzip trailer mismatch")
        parts.append(plain)
    return b"".join(parts)
