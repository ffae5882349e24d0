"""Git packfile walk (Documentation/gitformat-pack.txt in git.git;
public) — own encoder/decoder.

Code corpora enter LLM pipelines as crawled git repositories, and
the wire/on-disk unit is the packfile.  The format stacks THREE
distinct integer encodings in one container — which is exactly why
it makes a good own-walk:

* object-entry size header: 4 size bits in the FIRST byte beside a
  3-bit type, then little-endian 7-bit continuation groups;
* OFS_DELTA base offsets: BIG-endian 7-bit groups with the format's
  infamous "+1 per continuation step" rule
  (offset = ((offset + 1) << 7) | bits) — a plain varint reader
  yields wrong bases for every 2+-byte offset;
* delta instruction streams: copy ops whose offset/size bytes are
  PRESENT-BY-BITMASK (bits 0-3 offset, 4-6 size, size 0 meaning
  0x10000), insert ops as literal runs.

Object payloads are zlib (real), and the 20-byte trailer is the
SHA-1 of everything before it (verified; hashlib is stdlib).
"""

from __future__ import annotations

import hashlib
import struct
import zlib

OBJ_COMMIT = 1
OBJ_TREE = 2
OBJ_BLOB = 3
OBJ_OFS_DELTA = 6


def _entry_header(obj_type: int, size: int) -> bytes:
    first = (obj_type << 4) | (size & 0x0F)
    size >>= 4
    out = bytearray()
    while size:
        out.append(first | 0x80)
        first = size & 0x7F
        size >>= 7
    out.append(first)
    return bytes(out)


def _read_entry_header(buf: bytes, pos: int) -> tuple[int, int, int]:
    b = buf[pos]
    pos += 1
    obj_type = (b >> 4) & 0x7
    size = b & 0x0F
    shift = 4
    while b & 0x80:
        b = buf[pos]
        pos += 1
        size |= (b & 0x7F) << shift
        shift += 7
    return obj_type, size, pos


def _ofs_encode(offset: int) -> bytes:
    """The +1-per-step big-endian negative-offset encoding."""
    if offset <= 0:
        raise ValueError("offset must be positive")
    groups = [offset & 0x7F]
    offset >>= 7
    while offset:
        offset -= 1  # the rule
        groups.append(offset & 0x7F)
        offset >>= 7
    return bytes(
        (g | 0x80) for g in reversed(groups[1:])
    ) + bytes([groups[0]])


def _ofs_decode(buf: bytes, pos: int) -> tuple[int, int]:
    b = buf[pos]
    pos += 1
    offset = b & 0x7F
    while b & 0x80:
        b = buf[pos]
        pos += 1
        offset = ((offset + 1) << 7) | (b & 0x7F)
    return offset, pos


def _size_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_size_varint(buf: bytes, pos: int) -> tuple[int, int]:
    n = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return n, pos


def make_delta(base: bytes, target: bytes, ops: list) -> bytes:
    """ops: ('copy', off, size) | ('insert', bytes). Caller promises
    the ops reproduce `target` from `base` (verified)."""
    out = bytearray()
    out += _size_varint(len(base))
    out += _size_varint(len(target))
    rebuilt = bytearray()
    for op in ops:
        if op[0] == "copy":
            _, off, size = op
            cmd = 0x80
            tail = bytearray()
            for i in range(4):
                byte = (off >> (8 * i)) & 0xFF
                if byte:
                    cmd |= 1 << i
                    tail.append(byte)
            for i in range(3):
                byte = (size >> (8 * i)) & 0xFF
                if byte:
                    cmd |= 1 << (4 + i)
                    tail.append(byte)
            out.append(cmd)
            out += tail
            rebuilt += base[off : off + size]
        else:
            data = op[1]
            if not 0 < len(data) < 0x80:
                raise ValueError("insert run must be 1..127 bytes")
            out.append(len(data))
            out += data
            rebuilt += data
    if bytes(rebuilt) != target:
        raise ValueError("ops do not reproduce target")
    return bytes(out)


def apply_delta(base: bytes, delta: bytes) -> bytes:
    src_size, pos = _read_size_varint(delta, 0)
    tgt_size, pos = _read_size_varint(delta, pos)
    if src_size != len(base):
        raise ValueError("delta source size != base length")
    out = bytearray()
    while pos < len(delta):
        cmd = delta[pos]
        pos += 1
        if cmd & 0x80:
            off = 0
            for i in range(4):
                if cmd & (1 << i):
                    off |= delta[pos] << (8 * i)
                    pos += 1
            size = 0
            for i in range(3):
                if cmd & (1 << (4 + i)):
                    size |= delta[pos] << (8 * i)
                    pos += 1
            if size == 0:
                size = 0x10000
            if off + size > len(base):
                raise ValueError("copy overruns base")
            out += base[off : off + size]
        elif cmd:
            out += delta[pos : pos + cmd]
            pos += cmd
        else:
            raise ValueError("delta opcode 0 is reserved")
    if len(out) != tgt_size:
        raise ValueError("delta output size mismatch")
    return bytes(out)


def build_pack(objects: list[tuple[int, bytes, int | None]]) -> bytes:
    """objects: (type, payload, base_index_or_None). A base_index
    turns the entry into an OFS_DELTA whose payload is the delta
    bytes and whose base is the ALREADY-WRITTEN entry at that list
    index."""
    out = bytearray(b"PACK" + struct.pack(">II", 2, len(objects)))
    offsets: list[int] = []
    for obj_type, payload, base_idx in objects:
        offsets.append(len(out))
        if base_idx is None:
            out += _entry_header(obj_type, len(payload))
        else:
            out += _entry_header(OBJ_OFS_DELTA, len(payload))
            out += _ofs_encode(offsets[-1] - offsets[base_idx])
        out += zlib.compress(payload, 6)
    out += hashlib.sha1(bytes(out)).digest()
    return bytes(out)


def read_pack(buf: bytes) -> dict:
    """Walk + verify: trailer SHA-1, per-entry inflate, OFS_DELTA
    resolution against earlier entries.  Returns {n_objects,
    objects: [{type, size, offset, data, from_delta}]}."""
    if buf[:4] != b"PACK":
        raise ValueError("bad magic")
    version, count = struct.unpack_from(">II", buf, 4)
    if version != 2:
        raise ValueError(f"unsupported pack version {version}")
    if hashlib.sha1(buf[:-20]).digest() != buf[-20:]:
        raise ValueError("trailer SHA-1 mismatch")
    pos = 12
    by_offset: dict[int, tuple[int, bytes]] = {}
    objects = []
    for _ in range(count):
        entry_off = pos
        obj_type, size, pos = _read_entry_header(buf, pos)
        from_delta = False
        if obj_type == OBJ_OFS_DELTA:
            rel, pos = _ofs_decode(buf, pos)
            base_off = entry_off - rel
            if base_off not in by_offset:
                raise ValueError("OFS_DELTA base not at a prior entry")
            d = zlib.decompressobj()
            delta = d.decompress(buf[pos:])
            pos = len(buf) - len(d.unused_data)
            if len(delta) != size:
                raise ValueError("entry size != inflated length")
            base_type, base_data = by_offset[base_off]
            data = apply_delta(base_data, delta)
            obj_type = base_type
            from_delta = True
        else:
            d = zlib.decompressobj()
            data = d.decompress(buf[pos:])
            pos = len(buf) - len(d.unused_data)
            if len(data) != size:
                raise ValueError("entry size != inflated length")
        by_offset[entry_off] = (obj_type, data)
        objects.append(
            {
                "type": obj_type,
                "size": len(data),
                "offset": entry_off,
                "data": data,
                "from_delta": from_delta,
            }
        )
    if pos != len(buf) - 20:
        raise ValueError("trailing bytes before trailer")
    return {"n_objects": count, "objects": objects}
