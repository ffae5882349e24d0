"""LevelDB/RocksDB block-based SSTable walk (leveldb
doc/table_format.md + util/crc32c.cc, public) — own builder/parser.

The on-disk unit of the LSM stores a crawl's URL-seen and frontier
state would live in at production scale (RocksDB's default table
format is this layout's direct descendant). Three encodings stack:

* BlockHandle = two LEB128-style varint64s (little-endian 7-bit —
  the OPPOSITE end to the QUIC varints two modules over, and the
  same convention as the git-pack size headers but WITHOUT their
  +1-per-step offset rule);
* block TRAILER: 1-byte compression type + 4-byte MASKED crc32c
  (little-endian) over block-data + type byte — the mask
  ((crc >> 15 | crc << 17) + 0xa282ead8, shared with the snappy
  framing walk) exists so crc-of-crc stored in files stays
  non-degenerate; an unmasked writer passes its own reader but
  fails every real one;
* restart-point prefix compression: entry = (shared, non_shared,
  value_len) varint32s + key delta + value, where ``shared`` bytes
  are copied from the PREVIOUS key; every ``restart_interval``-th
  entry must encode shared=0 (a seek lands on restarts — a nonzero
  shared there makes the block unseekable), and the block ends with
  a fixed32 restart-offset array + count;
* footer: metaindex + index BlockHandles padded to 40 bytes + the
  8-byte magic 0xdb4775248b80fb57 little-endian;
* index block: one entry per data block, key >= the block's last
  key, value = the block's BlockHandle — the parser prunes by index
  key BEFORE touching data blocks (the Iceberg-manifest pattern one
  storage tier down).

Blocks whose doc payload shrinks are stored snappy-compressed
(type 1, decoded by the OWN minisnappy walk); the builder's
compressor emits the trivial all-literals snappy form, which is
legal snappy any conformant decoder must accept.

Keys must ascend strictly within and across data blocks; the parser
verifies and rejects otherwise, plus: bad magic, crc mismatch,
nonzero shared at a restart, truncated varints/trailers.
"""

from __future__ import annotations

import struct

from .minisnappy import crc32c, mask_crc, uncompress

MAGIC = 0xDB4775248B80FB57


class SstError(ValueError):
    pass


# ---------------------------------------------------------------------------
# varints (LEB128 little-endian, leveldb util/coding.cc)
# ---------------------------------------------------------------------------


def put_varint(v: int) -> bytes:
    if v < 0:
        raise SstError("negative varint")
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def get_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    v = 0
    while True:
        if pos >= len(buf):
            raise SstError("varint truncated")
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
        if shift > 63:
            raise SstError("varint too long")


def snappy_compress_literal(data: bytes) -> bytes:
    """The trivial all-literals snappy encoding: preamble varint
    (uncompressed length) + literal tags. Legal snappy; never
    smaller than the input, so the builder only uses it where the
    type-1 path itself is the point."""
    out = bytearray(put_varint(len(data)))
    pos = 0
    while pos < len(data):
        n = min(len(data) - pos, 60)  # 1-byte literal tag covers <= 60
        out.append((n - 1) << 2)
        out += data[pos : pos + n]
        pos += n
    return bytes(out)


# ---------------------------------------------------------------------------
# builder
# ---------------------------------------------------------------------------


def _build_block(
    entries: list[tuple[bytes, bytes]], restart_interval: int
) -> bytes:
    out = bytearray()
    restarts = []
    prev = b""
    for i, (k, v) in enumerate(entries):
        if i % restart_interval == 0:
            restarts.append(len(out))
            shared = 0
        else:
            shared = 0
            while (
                shared < len(prev)
                and shared < len(k)
                and prev[shared] == k[shared]
            ):
                shared += 1
        out += put_varint(shared)
        out += put_varint(len(k) - shared)
        out += put_varint(len(v))
        out += k[shared:]
        out += v
        prev = k
    for r in restarts:
        out += struct.pack("<I", r)
    out += struct.pack("<I", len(restarts))
    return bytes(out)


def _emit_block(file: bytearray, block: bytes, compress: bool) -> bytes:
    """Append block + trailer; return the encoded BlockHandle."""
    if compress:
        data, ctype = snappy_compress_literal(block), 1
    else:
        data, ctype = block, 0
    handle = put_varint(len(file)) + put_varint(len(data))
    crc = mask_crc(crc32c(data + bytes([ctype])))
    file += data + bytes([ctype]) + struct.pack("<I", crc)
    return handle


def build_sst(
    pairs: list[tuple[bytes, bytes]],
    *,
    block_entries: int = 8,
    restart_interval: int = 4,
    compress_every: int = 2,
) -> bytes:
    """pairs must be strictly ascending by key. Every
    ``compress_every``-th data block is stored snappy-compressed."""
    for (a, _), (b, _) in zip(pairs, pairs[1:]):
        if a >= b:
            raise SstError("keys must ascend strictly")
    file = bytearray()
    index_entries = []
    for bi in range(0, len(pairs), block_entries):
        chunk = pairs[bi : bi + block_entries]
        block = _build_block(chunk, restart_interval)
        handle = _emit_block(
            file, block, compress=(bi // block_entries) % compress_every == 1
        )
        index_entries.append((chunk[-1][0], handle))
    meta_handle = _emit_block(file, _build_block([], restart_interval), False)
    index_handle = _emit_block(
        file, _build_block(index_entries, restart_interval), False
    )
    footer = meta_handle + index_handle
    footer += bytes(40 - len(footer))
    footer += struct.pack("<Q", MAGIC)
    file += footer
    return bytes(file)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def _read_handle(buf: bytes, pos: int) -> tuple[tuple[int, int], int]:
    off, pos = get_varint(buf, pos)
    size, pos = get_varint(buf, pos)
    return (off, size), pos


def _read_block(buf: bytes, handle: tuple[int, int]) -> bytes:
    off, size = handle
    if off + size + 5 > len(buf):
        raise SstError("block handle out of range")
    data = buf[off : off + size]
    ctype = buf[off + size]
    stored = struct.unpack("<I", buf[off + size + 1 : off + size + 5])[0]
    if stored != mask_crc(crc32c(data + bytes([ctype]))):
        raise SstError("block crc mismatch")
    if ctype == 1:
        return uncompress(data)
    if ctype != 0:
        raise SstError(f"unknown compression type {ctype}")
    return data


def _block_entries(block: bytes) -> list[tuple[bytes, bytes]]:
    if len(block) < 4:
        raise SstError("block too short")
    n_restarts = struct.unpack("<I", block[-4:])[0]
    data_end = len(block) - 4 - 4 * n_restarts
    if data_end < 0:
        raise SstError("restart array overruns block")
    restarts = {
        struct.unpack("<I", block[data_end + 4 * i : data_end + 4 * i + 4])[0]
        for i in range(n_restarts)
    }
    out = []
    pos = 0
    prev = b""
    while pos < data_end:
        at_restart = pos in restarts
        shared, pos = get_varint(block, pos)
        non_shared, pos = get_varint(block, pos)
        vlen, pos = get_varint(block, pos)
        if at_restart and shared != 0:
            raise SstError("nonzero shared length at restart point")
        if shared > len(prev):
            raise SstError("shared exceeds previous key")
        if pos + non_shared + vlen > data_end:
            raise SstError("entry overruns block data")
        k = prev[:shared] + block[pos : pos + non_shared]
        pos += non_shared
        v = block[pos : pos + vlen]
        pos += vlen
        out.append((k, v))
        prev = k
    return out


def parse_sst(buf: bytes) -> dict:
    """-> {pairs, n_blocks, n_compressed, n_restarts} with every
    block crc-verified and key order checked."""
    if len(buf) < 48:
        raise SstError("file shorter than footer")
    footer = buf[-48:]
    if struct.unpack("<Q", footer[40:])[0] != MAGIC:
        raise SstError("bad footer magic")
    _, p = _read_handle(footer, 0)
    index_handle, _ = _read_handle(footer, p)
    index = _block_entries(_read_block(buf, index_handle))
    pairs: list[tuple[bytes, bytes]] = []
    n_compressed = 0
    n_restarts = 0
    for last_key, hraw in index:
        handle, _ = _read_handle(hraw, 0)
        off, size = handle
        block = _read_block(buf, handle)
        if buf[off + size] == 1:
            n_compressed += 1
        entries = _block_entries(block)
        n_restarts += struct.unpack("<I", block[-4:])[0]
        if entries and entries[-1][0] > last_key:
            raise SstError("index key below block's last key")
        pairs.extend(entries)
    for (a, _), (b, _) in zip(pairs, pairs[1:]):
        if a >= b:
            raise SstError("keys out of order across blocks")
    return {
        "pairs": pairs,
        "n_blocks": len(index),
        "n_compressed": n_compressed,
        "n_restarts": n_restarts,
    }
