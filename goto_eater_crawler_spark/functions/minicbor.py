"""Pure-python CBOR walk (RFC 8949, public) — the third structured
sidecar codec beside protobuf and Avro: CBOR is the IETF's canonical
binary JSON (COSE, WebAuthn, CoAP payloads a crawler meets on API
endpoints).

Item model: one initial byte = major type (3 bits) + additional info
(5 bits); info < 24 is the immediate value, 24/25/26/27 pull a
1/2/4/8-byte big-endian argument, 31 opens an INDEFINITE-length
container closed by the 0xff break byte. Major types: 0 uint,
1 negint (-1 - n), 2 byte string, 3 text string, 4 array, 5 map,
7 simple values (20 false / 21 true / 22 null) and float64
(info 27).

No cbor library exists in this sandbox; encoder = gate/test
producer, decoder = engine path, pinned by RFC 8949 Appendix A
vectors and hostile structural tests.
"""

from __future__ import annotations

import struct


class CborError(ValueError):
    pass


_BREAK = object()


def _head(major: int, arg: int) -> bytes:
    if arg < 24:
        return bytes([(major << 5) | arg])
    if arg < 1 << 8:
        return bytes([(major << 5) | 24, arg])
    if arg < 1 << 16:
        return bytes([(major << 5) | 25]) + struct.pack(">H", arg)
    if arg < 1 << 32:
        return bytes([(major << 5) | 26]) + struct.pack(">I", arg)
    return bytes([(major << 5) | 27]) + struct.pack(">Q", arg)


def encode(obj, indefinite_arrays: bool = False) -> bytes:
    if obj is False:
        return b"\xf4"
    if obj is True:
        return b"\xf5"
    if obj is None:
        return b"\xf6"
    if isinstance(obj, int):
        return _head(0, obj) if obj >= 0 else _head(1, -1 - obj)
    if isinstance(obj, float):
        return b"\xfb" + struct.pack(">d", obj)
    if isinstance(obj, bytes):
        return _head(2, len(obj)) + obj
    if isinstance(obj, str):
        raw = obj.encode("utf-8")
        return _head(3, len(raw)) + raw
    if isinstance(obj, list):
        items = b"".join(encode(x, indefinite_arrays) for x in obj)
        if indefinite_arrays:
            return b"\x9f" + items + b"\xff"
        return _head(4, len(obj)) + items
    if isinstance(obj, dict):
        items = b"".join(
            encode(k, indefinite_arrays) + encode(v, indefinite_arrays)
            for k, v in obj.items()
        )
        return _head(5, len(obj)) + items
    raise CborError(f"unencodable type {type(obj)}")


def _read_arg(b: bytes, off: int, info: int) -> tuple[int, int]:
    if info < 24:
        return info, off
    if info == 24:
        if off + 1 > len(b):
            raise CborError("truncated 1-byte arg")
        return b[off], off + 1
    if info == 25:
        return struct.unpack_from(">H", b, off)[0], off + 2
    if info == 26:
        return struct.unpack_from(">I", b, off)[0], off + 4
    if info == 27:
        return struct.unpack_from(">Q", b, off)[0], off + 8
    raise CborError(f"reserved additional info {info}")


def _decode(b: bytes, off: int):
    if off >= len(b):
        raise CborError("truncated item")
    ib = b[off]
    off += 1
    major, info = ib >> 5, ib & 0x1F
    if ib == 0xFF:
        return _BREAK, off
    if major == 0:
        return _read_arg(b, off, info)
    if major == 1:
        n, off = _read_arg(b, off, info)
        return -1 - n, off
    if major in (2, 3):
        if info == 31:
            raise CborError("indefinite strings out of scope")
        n, off = _read_arg(b, off, info)
        if off + n > len(b):
            raise CborError("string overruns buffer")
        raw = b[off : off + n]
        return (raw if major == 2 else raw.decode("utf-8")), off + n
    if major == 4:
        out = []
        if info == 31:
            while True:
                v, off = _decode(b, off)
                if v is _BREAK:
                    return out, off
                out.append(v)
        n, off = _read_arg(b, off, info)
        for _ in range(n):
            v, off = _decode(b, off)
            if v is _BREAK:
                raise CborError("break inside definite array")
            out.append(v)
        return out, off
    if major == 5:
        out = {}
        n, off = _read_arg(b, off, info)
        for _ in range(n):
            k, off = _decode(b, off)
            v, off = _decode(b, off)
            out[k] = v
        return out, off
    if major == 7:
        if info == 20:
            return False, off
        if info == 21:
            return True, off
        if info == 22:
            return None, off
        if info == 27:
            if off + 8 > len(b):
                raise CborError("truncated float64")
            return struct.unpack_from(">d", b, off)[0], off + 8
        raise CborError(f"simple value {info} out of scope")
    raise CborError(f"major type {major} (tags) out of scope")


def decode(b: bytes):
    v, off = _decode(b, 0)
    if v is _BREAK:
        raise CborError("unexpected break")
    if off != len(b):
        raise CborError(f"{len(b) - off} trailing bytes")
    return v
