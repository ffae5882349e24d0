"""MessagePack walk (msgpack spec, github.com/msgpack/msgpack) —
own encoder/decoder.

The compact binary sidecar format of crawl infrastructure (scrapy
queues, Redis payloads, Fluentd event streams all speak it). One
byte family table drives everything — the walk carries the parts
that differ from the repo's other serialization walks:

* single-byte immediates: positive fixint 0x00-0x7f, NEGATIVE
  fixint 0xe0-0xff (a two's-complement tail — CBOR encodes small
  negatives with a separate major type instead);
* fix containers with length IN the tag nibble/bits: fixmap
  0x80-0x8f, fixarray 0x90-0x9f, fixstr 0xa0-0xbf;
* sized families with BIG-endian lengths (bin8/16/32, str8/16/32,
  array16/32, map16/32) — opposite byte order to protobuf/LEB128;
* uint8/16/32/64 AND int8/16/32/64 as distinct tags: a decoder
  must sign-extend exactly the int family and never the uint one;
* float32/float64 (IEEE 754 big-endian).

The ENCODER is canonical (shortest family that fits, str vs bin by
type); the DECODER accepts any legal width — mirroring the QUIC
varint stance — and rejects trailing garbage, truncation, and
unknown tags (0xc1 is the spec's single never-used byte).

Reference parity: none (the reference serializes CSV/JSON); this is
build-spec surface beside minicbor/minibencode/miniproto.
"""

from __future__ import annotations

import struct


class MsgpackError(ValueError):
    pass


# ---------------------------------------------------------------------------
# encode (canonical)
# ---------------------------------------------------------------------------


def encode(obj) -> bytes:
    if obj is None:
        return b"\xc0"
    if obj is True:
        return b"\xc3"
    if obj is False:
        return b"\xc2"
    if isinstance(obj, int):
        return _encode_int(obj)
    if isinstance(obj, float):
        return b"\xcb" + struct.pack(">d", obj)
    if isinstance(obj, str):
        raw = obj.encode("utf-8")
        n = len(raw)
        if n < 32:
            return bytes([0xA0 | n]) + raw
        if n < 256:
            return b"\xd9" + bytes([n]) + raw
        if n < 65536:
            return b"\xda" + struct.pack(">H", n) + raw
        return b"\xdb" + struct.pack(">I", n) + raw
    if isinstance(obj, (bytes, bytearray)):
        n = len(obj)
        if n < 256:
            return b"\xc4" + bytes([n]) + bytes(obj)
        if n < 65536:
            return b"\xc5" + struct.pack(">H", n) + bytes(obj)
        return b"\xc6" + struct.pack(">I", n) + bytes(obj)
    if isinstance(obj, (list, tuple)):
        n = len(obj)
        if n < 16:
            head = bytes([0x90 | n])
        elif n < 65536:
            head = b"\xdc" + struct.pack(">H", n)
        else:
            head = b"\xdd" + struct.pack(">I", n)
        return head + b"".join(encode(x) for x in obj)
    if isinstance(obj, dict):
        n = len(obj)
        if n < 16:
            head = bytes([0x80 | n])
        elif n < 65536:
            head = b"\xde" + struct.pack(">H", n)
        else:
            head = b"\xdf" + struct.pack(">I", n)
        return head + b"".join(encode(k) + encode(v) for k, v in obj.items())
    raise MsgpackError(f"unencodable type {type(obj).__name__}")


def _encode_int(v: int) -> bytes:
    if 0 <= v < 128:
        return bytes([v])
    if -32 <= v < 0:
        return bytes([v & 0xFF])  # negative fixint 0xe0-0xff
    if v >= 0:
        if v < 256:
            return b"\xcc" + bytes([v])
        if v < 65536:
            return b"\xcd" + struct.pack(">H", v)
        if v < (1 << 32):
            return b"\xce" + struct.pack(">I", v)
        if v < (1 << 64):
            return b"\xcf" + struct.pack(">Q", v)
        raise MsgpackError("int too large")
    if v >= -128:
        return b"\xd0" + struct.pack(">b", v)
    if v >= -32768:
        return b"\xd1" + struct.pack(">h", v)
    if v >= -(1 << 31):
        return b"\xd2" + struct.pack(">i", v)
    if v >= -(1 << 63):
        return b"\xd3" + struct.pack(">q", v)
    raise MsgpackError("int too small")


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode(buf: bytes):
    """One complete object; trailing bytes are an error."""
    obj, pos = _decode(buf, 0)
    if pos != len(buf):
        raise MsgpackError(f"{len(buf) - pos} trailing bytes")
    return obj


def _take(buf: bytes, pos: int, n: int) -> int:
    if pos + n > len(buf):
        raise MsgpackError("truncated")
    return pos + n


def _decode(buf: bytes, pos: int):
    if pos >= len(buf):
        raise MsgpackError("truncated")
    t = buf[pos]
    pos += 1
    if t < 0x80:
        return t, pos
    if t >= 0xE0:
        return t - 256, pos  # negative fixint
    if 0x80 <= t <= 0x8F:
        return _decode_map(buf, pos, t & 0x0F)
    if 0x90 <= t <= 0x9F:
        return _decode_array(buf, pos, t & 0x0F)
    if 0xA0 <= t <= 0xBF:
        end = _take(buf, pos, t & 0x1F)
        return buf[pos:end].decode("utf-8"), end
    if t == 0xC0:
        return None, pos
    if t == 0xC1:
        raise MsgpackError("0xc1 is never used")
    if t == 0xC2:
        return False, pos
    if t == 0xC3:
        return True, pos
    if t in (0xC4, 0xC5, 0xC6):  # bin
        w = (1, 2, 4)[t - 0xC4]
        pos2 = _take(buf, pos, w)
        n = int.from_bytes(buf[pos:pos2], "big")
        end = _take(buf, pos2, n)
        return buf[pos2:end], end
    if t == 0xCA:
        end = _take(buf, pos, 4)
        return struct.unpack(">f", buf[pos:end])[0], end
    if t == 0xCB:
        end = _take(buf, pos, 8)
        return struct.unpack(">d", buf[pos:end])[0], end
    if t in (0xCC, 0xCD, 0xCE, 0xCF):  # uint: never sign-extended
        w = 1 << (t - 0xCC)
        end = _take(buf, pos, w)
        return int.from_bytes(buf[pos:end], "big"), end
    if t in (0xD0, 0xD1, 0xD2, 0xD3):  # int: always sign-extended
        w = 1 << (t - 0xD0)
        end = _take(buf, pos, w)
        return int.from_bytes(buf[pos:end], "big", signed=True), end
    if t in (0xD9, 0xDA, 0xDB):  # str
        w = (1, 2, 4)[t - 0xD9]
        pos2 = _take(buf, pos, w)
        n = int.from_bytes(buf[pos:pos2], "big")
        end = _take(buf, pos2, n)
        return buf[pos2:end].decode("utf-8"), end
    if t in (0xDC, 0xDD):  # array16/32
        w = (2, 4)[t - 0xDC]
        pos2 = _take(buf, pos, w)
        return _decode_array(buf, pos2, int.from_bytes(buf[pos:pos2], "big"))
    if t in (0xDE, 0xDF):  # map16/32
        w = (2, 4)[t - 0xDE]
        pos2 = _take(buf, pos, w)
        return _decode_map(buf, pos2, int.from_bytes(buf[pos:pos2], "big"))
    raise MsgpackError(f"unsupported tag 0x{t:02x}")  # ext/fixext


def _decode_array(buf: bytes, pos: int, n: int):
    out = []
    for _ in range(n):
        v, pos = _decode(buf, pos)
        out.append(v)
    return out, pos


def _decode_map(buf: bytes, pos: int, n: int):
    out = {}
    for _ in range(n):
        k, pos = _decode(buf, pos)
        if isinstance(k, (dict, list)):
            raise MsgpackError("unhashable map key")
        if k in out:
            raise MsgpackError(f"duplicate map key {k!r}")
        v, pos = _decode(buf, pos)
        out[k] = v
    return out, pos
