"""Pure-python Protocol Buffers wire-format walk (protobuf encoding
spec, developers.google.com/protocol-buffers/docs/encoding — public)
— the sidecar-record decode pass of a crawl pipeline: fetch metadata
(WARC sidecars, API exports, feed state) commonly rides as length-
delimited protobuf records.

Wire format: each field = key varint ``(field_number << 3) | wire_
type`` then a payload per type — 0 varint (with ZIGZAG for sint*),
1 fixed64 (little-endian; doubles), 2 length-delimited (strings,
nested messages, PACKED repeated scalars), 5 fixed32. Decoders MUST
skip unknown fields by wire type (the spec's forward-compatibility
rule) — the gate plants an unknown field mid-message so the skip
path is load-bearing.

No protobuf library exists in this sandbox; encoder = gate/test
producer, decoder = engine path, pinned to the published wire rules
(zigzag vectors from the spec table) and hostile structural tests.
"""

from __future__ import annotations

import struct


class ProtoError(ValueError):
    pass


def write_varint(n: int) -> bytes:
    if n < 0:
        raise ProtoError("negative varint needs zigzag first")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_varint(b: bytes, off: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        if off >= len(b):
            raise ProtoError("truncated varint")
        byte = b[off]
        off += 1
        n |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return n, off
        shift += 7
        if shift > 63:
            raise ProtoError("varint over 64 bits")


def zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _key(field: int, wire: int) -> bytes:
    return write_varint((field << 3) | wire)


def encode_fetch(
    rec_id: int,
    url: str,
    status: int,
    delta: int,
    content_type: str,
    size: int,
    tags: list[int],
    score: float,
    crc: int,
    plant_unknown: bool = True,
) -> bytes:
    """The Fetch record message; field 99 (unknown to the reader's
    schema) is planted mid-message when plant_unknown."""
    nested = (
        _key(1, 2)
        + write_varint(len(content_type.encode()))
        + content_type.encode()
        + _key(2, 0)
        + write_varint(size)
    )
    packed = b"".join(write_varint(t) for t in tags)
    out = (
        _key(1, 0) + write_varint(rec_id)
        + _key(2, 2) + write_varint(len(url.encode())) + url.encode()
    )
    if plant_unknown:
        out += _key(99, 2) + write_varint(3) + b"???"
        out += _key(98, 0) + write_varint(12345)
        out += _key(97, 5) + struct.pack("<I", 7)
    out += (
        _key(3, 0) + write_varint(status)
        + _key(4, 0) + write_varint(zigzag(delta))
        + _key(5, 2) + write_varint(len(nested)) + nested
        + _key(6, 2) + write_varint(len(packed)) + packed
        + _key(7, 1) + struct.pack("<d", score)
        + _key(8, 5) + struct.pack("<I", crc)
    )
    return out


def _skip(b: bytes, off: int, wire: int) -> int:
    if wire == 0:
        _, off = read_varint(b, off)
        return off
    if wire == 1:
        return off + 8
    if wire == 2:
        ln, off = read_varint(b, off)
        return off + ln
    if wire == 5:
        return off + 4
    raise ProtoError(f"unknown wire type {wire}")


def decode_fetch(b: bytes) -> dict:
    out: dict = {}
    off = 0
    while off < len(b):
        key, off = read_varint(b, off)
        field, wire = key >> 3, key & 7
        if field == 1 and wire == 0:
            out["rec_id"], off = read_varint(b, off)
        elif field == 2 and wire == 2:
            ln, off = read_varint(b, off)
            out["url"] = b[off : off + ln].decode()
            off += ln
        elif field == 3 and wire == 0:
            out["status"], off = read_varint(b, off)
        elif field == 4 and wire == 0:
            z, off = read_varint(b, off)
            out["delta"] = unzigzag(z)
        elif field == 5 and wire == 2:
            ln, off = read_varint(b, off)
            sub, send = b[off : off + ln], off + ln
            soff = 0
            while soff < len(sub):
                skey, soff = read_varint(sub, soff)
                sf, sw = skey >> 3, skey & 7
                if sf == 1 and sw == 2:
                    sl, soff = read_varint(sub, soff)
                    out["content_type"] = sub[soff : soff + sl].decode()
                    soff += sl
                elif sf == 2 and sw == 0:
                    out["size"], soff = read_varint(sub, soff)
                else:
                    soff = _skip(sub, soff, sw)
            off = send
        elif field == 6 and wire == 2:
            ln, off = read_varint(b, off)
            end = off + ln
            tags = []
            while off < end:
                t, off = read_varint(b, off)
                tags.append(t)
            if off != end:
                raise ProtoError("packed field overran its length")
            out["tags"] = tags
        elif field == 7 and wire == 1:
            out["score"] = struct.unpack_from("<d", b, off)[0]
            off += 8
        elif field == 8 and wire == 5:
            out["crc"] = struct.unpack_from("<I", b, off)[0]
            off += 4
        else:
            off = _skip(b, off, wire)
        if off > len(b):
            raise ProtoError("field overruns buffer")
    required = {"rec_id", "url", "status", "delta",
                "content_type", "size", "tags", "score", "crc"}
    missing = required - out.keys()
    if missing:
        raise ProtoError(f"missing fields: {sorted(missing)}")
    return out
