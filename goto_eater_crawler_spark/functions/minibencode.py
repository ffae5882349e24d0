"""Bencode walk (the BitTorrent metainfo encoding, BEP 3) — own
encoder/decoder.

Crawl relevance: .torrent files and magnet sidecars surface in a web
corpus (webseeds are plain HTTP URLs); the metainfo dictionary is
the inventory unit.  Spec rules carried:

* integers as i<decimal>e with NO leading zeros (i03e invalid) and
  no negative zero;
* strings length-prefixed <len>:<bytes> (byte-exact, no escaping);
* lists l...e, dicts d...e whose keys MUST be byte-sorted — the
  canonical-form rule that makes infohashes well-defined; the
  decoder REJECTS out-of-order keys rather than silently accepting.
"""

from __future__ import annotations


def encode(v) -> bytes:
    if isinstance(v, bool):
        raise ValueError("bencode has no booleans")
    if isinstance(v, int):
        return b"i%de" % v
    if isinstance(v, bytes):
        return b"%d:%s" % (len(v), v)
    if isinstance(v, str):
        return encode(v.encode("utf-8"))
    if isinstance(v, list):
        return b"l" + b"".join(encode(x) for x in v) + b"e"
    if isinstance(v, dict):
        items = sorted(
            (k.encode("utf-8") if isinstance(k, str) else k, val)
            for k, val in v.items()
        )
        return (
            b"d"
            + b"".join(encode(k) + encode(val) for k, val in items)
            + b"e"
        )
    raise ValueError(f"unsupported type {type(v)}")


def decode(buf: bytes):
    v, pos = _decode(buf, 0)
    if pos != len(buf):
        raise ValueError("trailing bytes")
    return v


def _decode(buf: bytes, pos: int):
    if pos >= len(buf):
        raise ValueError("truncated")
    c = buf[pos]
    if c == ord(b"i"):
        end = buf.index(b"e", pos)
        raw = buf[pos + 1 : end]
        if not raw or raw in (b"-",):
            raise ValueError("empty integer")
        if raw != b"0" and (
            raw.lstrip(b"-").startswith(b"0") or raw == b"-0"
        ):
            raise ValueError(f"leading zero / negative zero: {raw!r}")
        return int(raw), end + 1
    if ord(b"0") <= c <= ord(b"9"):
        colon = buf.index(b":", pos)
        n = int(buf[pos:colon])
        if buf[pos] == ord(b"0") and colon != pos + 1:
            raise ValueError("string length has leading zero")
        end = colon + 1 + n
        if end > len(buf):
            raise ValueError("truncated string")
        return buf[colon + 1 : end], end
    if c == ord(b"l"):
        pos += 1
        out = []
        while pos < len(buf) and buf[pos] != ord(b"e"):
            v, pos = _decode(buf, pos)
            out.append(v)
        if pos >= len(buf):
            raise ValueError("unterminated list")
        return out, pos + 1
    if c == ord(b"d"):
        pos += 1
        out = {}
        prev_key = None
        while pos < len(buf) and buf[pos] != ord(b"e"):
            k, pos = _decode(buf, pos)
            if not isinstance(k, bytes):
                raise ValueError("dict key must be a string")
            if prev_key is not None and k <= prev_key:
                raise ValueError(
                    f"dict keys not strictly byte-sorted: {k!r}"
                )
            prev_key = k
            v, pos = _decode(buf, pos)
            out[k.decode("utf-8")] = v
        if pos >= len(buf):
            raise ValueError("unterminated dict")
        return out, pos + 1
    raise ValueError(f"bad type byte {chr(c)!r} at {pos}")
