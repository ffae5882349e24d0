"""Pure-python LZ4 decoder — block format + frame format (with XXH32).

Why the engine carries its own LZ4: LZ4 frame is the other default
codec of the Spark/Hadoop storage world (parquet ``LZ4_RAW`` pages,
Kafka message sets, ``Content-Encoding`` on internal CDNs) — a 100 TB
replay/re-compression pipeline decodes LZ4 on the *reader* side
exactly like gzip/zstd/snappy (functions/minideflate.py, minizstd.py,
minisnappy.py are the siblings). The reference's scrapy stack has no
LZ4 arm, so this is a build-spec frontier operator, not parity.

Everything here is the public format spec (lz4/lz4:
lz4_Block_format.md and lz4_Frame_format.md):

* block format — token byte (literal-length high nibble, match-length
  low nibble), 255-continuation length extensions, 2-byte LE match
  offsets, minmatch 4, overlap-safe copies, last-sequence
  literals-only rule;
* frame format — magic 0x184D2204, FLG/BD descriptor (version,
  block-independence, block-checksum, content-size, content-checksum,
  DictID flags), per-block [31-bit size | uncompressed bit] headers,
  EndMark, skippable frames (0x184D2A50..5F); linked blocks decode
  over the shared frame history, so both independence modes work;
* integrity — XXH32 (implemented here, not delegated; the 64-bit
  sibling lives in minizstd.py) verifies the frame descriptor's
  header checksum byte ``(xxh32(descriptor) >> 8) & 0xFF`` and, when
  the flags carry them, block checksums, the content checksum, and
  the declared content size.

The decoder is tested exclusively against a REAL producer (liblz4 via
``pyarrow`` codecs "lz4" for frames and "lz4_raw" for bare blocks),
so the token walk and descriptor parse cannot be self-consistently
wrong; XXH32 is additionally pinned by public vectors
(xxh32(b"") = 0x02CC5D05) and by liblz4's own header-checksum bytes.
"""

from __future__ import annotations


class Lz4Error(ValueError):
    pass


_M32 = (1 << 32) - 1
_MAGIC = 0x184D2204
_SKIP_LO, _SKIP_HI = 0x184D2A50, 0x184D2A5F

# ------------------------------------------------------------- XXH32
_P1 = 0x9E3779B1
_P2 = 0x85EBCA77
_P3 = 0xC2B2AE3D
_P4 = 0x27D4EB2F
_P5 = 0x165667B1


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while i + 16 <= n:
            lane = int.from_bytes(data[i : i + 4], "little")
            v1 = (_rotl32((v1 + lane * _P2) & _M32, 13) * _P1) & _M32
            lane = int.from_bytes(data[i + 4 : i + 8], "little")
            v2 = (_rotl32((v2 + lane * _P2) & _M32, 13) * _P1) & _M32
            lane = int.from_bytes(data[i + 8 : i + 12], "little")
            v3 = (_rotl32((v3 + lane * _P2) & _M32, 13) * _P1) & _M32
            lane = int.from_bytes(data[i + 12 : i + 16], "little")
            v4 = (_rotl32((v4 + lane * _P2) & _M32, 13) * _P1) & _M32
            i += 16
        h = (
            _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)
        ) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        lane = int.from_bytes(data[i : i + 4], "little")
        h = (_rotl32((h + lane * _P3) & _M32, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (_rotl32((h + data[i] * _P5) & _M32, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# -------------------------------------------------------- block walk
def block_decompress(src: bytes, out: bytearray | None = None) -> bytes:
    """Decode one LZ4 block into (and returning the tail of) ``out``
    — passing the frame's accumulated history makes linked-block
    frames decode correctly; independent blocks never look back past
    their own start, so the same walk serves both modes."""
    if out is None:
        out = bytearray()
    base = len(out)
    i = 0
    L = len(src)
    while i < L:
        token = src[i]
        i += 1
        ll = token >> 4
        if ll == 15:
            while True:
                if i >= L:
                    raise Lz4Error("truncated literal length")
                b = src[i]
                i += 1
                ll += b
                if b != 255:
                    break
        if i + ll > L:
            raise Lz4Error("truncated literals")
        out += src[i : i + ll]
        i += ll
        if i >= L:  # last sequence is literals-only
            break
        if i + 2 > L:
            raise Lz4Error("truncated match offset")
        off = int.from_bytes(src[i : i + 2], "little")
        i += 2
        ml = token & 15
        if ml == 15:
            while True:
                if i >= L:
                    raise Lz4Error("truncated match length")
                b = src[i]
                i += 1
                ml += b
                if b != 255:
                    break
        ml += 4  # minmatch
        if off == 0 or off > len(out):
            raise Lz4Error("match offset outside window")
        start = len(out) - off
        if off >= ml:  # disjoint: one slice
            out += out[start : start + ml]
        else:  # overlapping: RLE-style byte walk
            for k in range(ml):
                out.append(out[start + k])
    return bytes(out[base:])


# -------------------------------------------------------- frame walk
def lz4_frames(buf: bytes) -> list[tuple[bytes, dict]]:
    """Walk concatenated LZ4 frames → [(content, meta)]. meta keys:
    skippable, n_blocks, header_ok, checksum_ok (header byte AND
    every optional integrity field present in the flags)."""
    frames: list[tuple[bytes, dict]] = []
    i = 0
    L = len(buf)
    while i < L:
        if i + 4 > L:
            raise Lz4Error("truncated magic")
        magic = int.from_bytes(buf[i : i + 4], "little")
        i += 4
        if _SKIP_LO <= magic <= _SKIP_HI:
            if i + 4 > L:
                raise Lz4Error("truncated skippable size")
            sz = int.from_bytes(buf[i : i + 4], "little")
            i += 4
            if i + sz > L:
                raise Lz4Error("truncated skippable frame")
            i += sz
            frames.append(
                (
                    b"",
                    {
                        "skippable": True,
                        "n_blocks": 0,
                        "header_ok": True,
                        "checksum_ok": True,
                    },
                )
            )
            continue
        if magic != _MAGIC:
            raise Lz4Error(f"bad magic 0x{magic:08x}")
        desc_start = i
        if i + 2 > L:
            raise Lz4Error("truncated descriptor")
        flg, bd = buf[i], buf[i + 1]
        i += 2
        if flg >> 6 != 0b01:
            raise Lz4Error("unsupported frame version")
        has_bsum = bool(flg & 0x10)
        has_csize = bool(flg & 0x08)
        has_csum = bool(flg & 0x04)
        has_dict = bool(flg & 0x01)
        if (bd >> 4) & 7 not in (4, 5, 6, 7):
            raise Lz4Error("reserved block max-size code")
        content_size = None
        if has_csize:
            content_size = int.from_bytes(buf[i : i + 8], "little")
            i += 8
        if has_dict:
            raise Lz4Error("dictionaries unsupported (DictID set)")
        if i >= L:
            raise Lz4Error("truncated header checksum")
        header_ok = (xxh32(buf[desc_start:i]) >> 8) & 0xFF == buf[i]
        i += 1
        history = bytearray()
        n_blocks = 0
        ok = header_ok
        while True:
            if i + 4 > L:
                raise Lz4Error("truncated block header")
            bsz = int.from_bytes(buf[i : i + 4], "little")
            i += 4
            if bsz == 0:  # EndMark
                break
            stored = bool(bsz >> 31)
            bsz &= 0x7FFFFFFF
            if i + bsz > L:
                raise Lz4Error("truncated block")
            data = buf[i : i + bsz]
            i += bsz
            if has_bsum:
                want = int.from_bytes(buf[i : i + 4], "little")
                i += 4
                ok = ok and xxh32(data) == want
            if stored:
                history += data
            else:
                block_decompress(data, history)
            n_blocks += 1
        content = bytes(history)
        if has_csum:
            if i + 4 > L:
                raise Lz4Error("truncated content checksum")
            want = int.from_bytes(buf[i : i + 4], "little")
            i += 4
            ok = ok and xxh32(content) == want
        if content_size is not None:
            ok = ok and len(content) == content_size
        frames.append(
            (
                content,
                {
                    "skippable": False,
                    "n_blocks": n_blocks,
                    "header_ok": header_ok,
                    "checksum_ok": ok,
                },
            )
        )
    return frames
