"""Pure-python Snappy decoder — raw block format + the framing format.

Why the engine carries its own snappy: snappy is the default codec of
the Hadoop/Spark storage world (parquet pages, ORC stripes, Avro
container blocks, SequenceFiles) and of the snappy framing format
(``Content-Encoding: x-snappy-framed``, Kafka message sets) — a
100 TB replay/re-compression pipeline decodes snappy on the *reader*
side exactly like gzip (functions/minideflate.py) and zstd
(functions/minizstd.py are the siblings). The reference's scrapy
stack has no snappy arm, so this is a build-spec frontier operator,
not reference parity.

Everything here is the public format description
(google/snappy: format_description.txt and framing_format.txt):

* raw block format — varint preamble with the uncompressed length,
  then tagged elements: literals (1/2/3/4/5-byte length encodings)
  and copies with 1-, 2- or 4-byte offsets, overlap-safe;
* framing format — chunk stream of [type byte | 3-byte LE length |
  payload]: stream identifier (0xff, "sNaPpY"), compressed (0x00)
  and uncompressed (0x01) data chunks each carrying a masked CRC-32C
  of the UNCOMPRESSED data, padding (0xfe) and reserved-skippable
  (0x80..0xfd) chunks;
* integrity — CRC-32C (Castagnoli, reflected 0x82F63B78, implemented
  here table-driven, not delegated) with the framing format's mask
  ``((crc >> 15) | (crc << 17)) + 0xa282ead8 mod 2^32``.

The raw-block decoder is tested exclusively against a REAL producer
(libsnappy via ``pyarrow.compress``) so the tag walk cannot be
self-consistently wrong; CRC-32C is pinned by the public check value
(crc32c("123456789") = 0xE3069283). Honesty note: the framing-format
*writer* in operators/transfer.py is this module's own (pyarrow
exposes only raw blocks), so the chunk walk is cross-checked by
construction while the inner blocks stay real-producer-gated.
"""

from __future__ import annotations


class SnappyError(ValueError):
    pass


_M32 = (1 << 32) - 1

# ------------------------------------------------------------ CRC-32C
# reflected Castagnoli polynomial; table-driven like minideflate's
# CRC-32, only the polynomial differs.
_CRC32C_POLY = 0x82F63B78
_CRC32C_TABLE: list[int] = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ _CRC32C_POLY if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes, crc: int = 0) -> int:
    crc ^= _M32
    for b in data:
        crc = (crc >> 8) ^ _CRC32C_TABLE[(crc ^ b) & 0xFF]
    return crc ^ _M32


def mask_crc(crc: int) -> int:
    """framing_format.txt §3: rotate right by 15, add the constant."""
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & _M32


# ------------------------------------------------------- raw blocks
def uncompress(buf: bytes) -> bytes:
    """Decode one raw-format snappy block (the parquet/ORC payload
    shape). Raises SnappyError on any structural violation."""
    n, shift, i = 0, 0, 0
    while True:
        if i >= len(buf) or shift > 31:
            raise SnappyError("bad length preamble")
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    out = bytearray()
    L = len(buf)
    while i < L:
        tag = buf[i]
        i += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:  # 1-4 extra length bytes
                nb = ln - 59
                if i + nb > L:
                    raise SnappyError("truncated literal length")
                ln = int.from_bytes(buf[i : i + nb], "little")
                i += nb
            ln += 1
            if i + ln > L:
                raise SnappyError("truncated literal")
            out += buf[i : i + ln]
            i += ln
            continue
        if kind == 1:  # copy, 1-byte offset, 3-bit length
            if i >= L:
                raise SnappyError("truncated copy-1")
            ln = ((tag >> 2) & 7) + 4
            off = ((tag >> 5) << 8) | buf[i]
            i += 1
        elif kind == 2:  # copy, 2-byte offset
            if i + 2 > L:
                raise SnappyError("truncated copy-2")
            ln = (tag >> 2) + 1
            off = int.from_bytes(buf[i : i + 2], "little")
            i += 2
        else:  # copy, 4-byte offset
            if i + 4 > L:
                raise SnappyError("truncated copy-4")
            ln = (tag >> 2) + 1
            off = int.from_bytes(buf[i : i + 4], "little")
            i += 4
        if off == 0 or off > len(out):
            raise SnappyError("copy offset outside window")
        start = len(out) - off
        if off >= ln:  # disjoint: one slice
            out += out[start : start + ln]
        else:  # overlapping: RLE-style byte walk
            for k in range(ln):
                out.append(out[start + k])
    if len(out) != n:
        raise SnappyError(f"length mismatch: {len(out)} != {n}")
    return bytes(out)


# --------------------------------------------------- framing format
_STREAM_ID = b"sNaPpY"


def framed_chunks(buf: bytes) -> list[tuple[bytes, dict]]:
    """Walk one snappy framing-format stream → [(uncompressed_chunk,
    meta)] for the DATA chunks; stream-id / padding / skippable
    chunks are validated and skipped. meta: {"compressed": bool,
    "crc_ok": bool}."""
    if not buf[:1] == b"\xff":
        raise SnappyError("missing stream identifier chunk")
    out: list[tuple[bytes, dict]] = []
    i = 0
    L = len(buf)
    first = True
    while i < L:
        if i + 4 > L:
            raise SnappyError("truncated chunk header")
        ctype = buf[i]
        ln = int.from_bytes(buf[i + 1 : i + 4], "little")
        i += 4
        if i + ln > L:
            raise SnappyError("truncated chunk payload")
        payload = buf[i : i + ln]
        i += ln
        if ctype == 0xFF:  # stream identifier
            if payload != _STREAM_ID:
                raise SnappyError("bad stream identifier")
            first = False
            continue
        if first:
            raise SnappyError("data before stream identifier")
        if ctype == 0xFE or 0x80 <= ctype <= 0xFD:  # padding/skippable
            continue
        if ctype in (0x00, 0x01):
            if ln < 4:
                raise SnappyError("data chunk without checksum")
            want = int.from_bytes(payload[:4], "little")
            data = payload[4:]
            if ctype == 0x00:
                data = uncompress(data)
            out.append(
                (
                    data,
                    {
                        "compressed": ctype == 0x00,
                        "crc_ok": mask_crc(crc32c(data)) == want,
                    },
                )
            )
            continue
        raise SnappyError(f"reserved unskippable chunk 0x{ctype:02x}")
    return out


def frame(chunks: list[bytes], pad: int = 0) -> bytes:
    """Framing-format writer (test-synth producer — the inner blocks
    come from libsnappy via pyarrow; see module honesty note)."""
    import pyarrow as pa

    def chunk(ctype: int, payload: bytes) -> bytes:
        return bytes([ctype]) + len(payload).to_bytes(3, "little") + payload

    body = chunk(0xFF, _STREAM_ID)
    if pad:
        body += chunk(0xFE, b"\x00" * pad)
    for c in chunks:
        crc = mask_crc(crc32c(c)).to_bytes(4, "little")
        comp = pa.compress(c, codec="snappy", asbytes=True)
        if len(comp) < len(c):  # framing spec: emit whichever is smaller
            body += chunk(0x00, crc + comp)
        else:
            body += chunk(0x01, crc + c)
    return body
