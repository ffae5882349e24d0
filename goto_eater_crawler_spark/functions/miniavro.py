"""Pure-python Avro Object Container File codec — the ROW-format
sibling of the parquet/ORC (columnar) footer walks and the zip/tar/
warc container walks: Kafka pipelines and older Hadoop corpora ship
exactly this shape, so a crawl/training-data engine needs the ingest
path.

Implements the Avro 1.11 specification (apache.org/avro/docs — public
spec): the object container file layout (magic ``Obj\\x01``, file
metadata map carrying ``avro.schema`` JSON + ``avro.codec``, 16-byte
sync marker, then blocks of ``<count long><size long><data><sync>``)
and the binary encoding for a record-of-primitives schema subset
(null, boolean, int, long — zigzag ULEB128 varints —, double —
little-endian IEEE 754 —, string and bytes — length-prefixed).
Codecs: ``null`` and ``deflate`` (raw RFC 1951, inflated by the
engine's OWN ``minideflate``; the compressor side uses REAL zlib, so
the inflate is pinned against a real producer even though no Avro
library exists in this sandbox — the encoder here is spec-vector
pinned instead: the spec's own zigzag examples in tests).

No external Avro package is imported anywhere (none is available);
encoder and decoder are both this module, cross-checked by the
spec's published vectors plus structural round-trips.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

from . import minideflate

MAGIC = b"Obj\x01"


# ------------------------------------------------------------ varints


def zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def zigzag_decode(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def write_long(n: int, out: io.BytesIO) -> None:
    u = zigzag_encode(n) & ((1 << 64) - 1)
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def read_long(data: bytes, pos: int) -> tuple[int, int]:
    u = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return zigzag_decode(u), pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


# ----------------------------------------------------------- records


def _write_value(v, typ: str, out: io.BytesIO) -> None:
    if typ == "null":
        return
    if typ == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif typ in ("int", "long"):
        write_long(int(v), out)
    elif typ == "double":
        out.write(struct.pack("<d", float(v)))
    elif typ == "string":
        b = v.encode("utf-8")
        write_long(len(b), out)
        out.write(b)
    elif typ == "bytes":
        write_long(len(v), out)
        out.write(v)
    else:
        raise ValueError(f"unsupported avro type {typ!r}")


def _read_value(data: bytes, pos: int, typ: str):
    if typ == "null":
        return None, pos
    if typ == "boolean":
        return data[pos] == 1, pos + 1
    if typ in ("int", "long"):
        return read_long(data, pos)
    if typ == "double":
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if typ == "string":
        n, pos = read_long(data, pos)
        return data[pos : pos + n].decode("utf-8"), pos + n
    if typ == "bytes":
        n, pos = read_long(data, pos)
        return bytes(data[pos : pos + n]), pos + n
    raise ValueError(f"unsupported avro type {typ!r}")


def _fields(schema: dict) -> list[tuple[str, str]]:
    if schema.get("type") != "record":
        raise ValueError("only record schemas supported")
    out = []
    for f in schema["fields"]:
        t = f["type"]
        if not isinstance(t, str):
            raise ValueError("only primitive field types supported")
        out.append((f["name"], t))
    return out


# --------------------------------------------------------- container


def write_ocf(
    records: list[dict],
    schema: dict,
    codec: str = "null",
    sync: bytes = b"\x00" * 16,
    records_per_block: int = 64,
) -> bytes:
    """Serialize an object container file. ``sync`` is caller-fixed
    so output is a pure function of the inputs (the determinism rule
    every synth builder follows)."""
    assert len(sync) == 16
    fields = _fields(schema)
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    write_long(len(meta), out)
    for k in sorted(meta):
        _write_value(k, "string", out)
        _write_value(meta[k], "bytes", out)
    write_long(0, out)  # end of map
    out.write(sync)
    for i in range(0, len(records), records_per_block):
        chunk = records[i : i + records_per_block]
        body = io.BytesIO()
        for rec in chunk:
            for name, typ in fields:
                _write_value(rec[name], typ, body)
        payload = body.getvalue()
        if codec == "deflate":
            # REAL zlib as the compressor (raw stream per the spec)
            payload = zlib.compress(payload, 6)[2:-4]
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        write_long(len(chunk), out)
        write_long(len(payload), out)
        out.write(payload)
        out.write(sync)
    return out.getvalue()


def read_ocf(blob: bytes) -> tuple[dict, list[dict]]:
    """Parse an object container file with the OWN walk: returns
    (schema, records). The per-block sync marker is verified (a
    corrupted/misframed block fails loudly, never yields rows)."""
    if blob[:4] != MAGIC:
        raise ValueError("bad avro magic")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = read_long(blob, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count prefixes a byte size
            _, pos = read_long(blob, pos)
            n = -n
        for _ in range(n):
            k, pos = _read_value(blob, pos, "string")
            v, pos = _read_value(blob, pos, "bytes")
            meta[k] = v
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    fields = _fields(schema)
    sync = blob[pos : pos + 16]
    pos += 16
    records: list[dict] = []
    while pos < len(blob):
        count, pos = read_long(blob, pos)
        size, pos = read_long(blob, pos)
        payload = blob[pos : pos + size]
        pos += size
        if blob[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch")
        pos += 16
        if codec == "deflate":
            payload, _ = minideflate.inflate(payload)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        p = 0
        for _ in range(count):
            rec = {}
            for name, typ in fields:
                rec[name], p = _read_value(payload, p, typ)
            records.append(rec)
        if p != len(payload):
            raise ValueError("trailing bytes in block")
    return schema, records


# ------------------------------------------------ schema resolution
# (Avro 1.11 spec "Schema Resolution") — the reader/writer contract
# that lets a corpus written under last year's schema be read under
# this year's: fields match by name THEN by reader aliases,
# writer-only fields are skipped, reader-only fields take their
# declared default (an error if none), and primitive PROMOTIONS are
# exactly the spec's lattice (int -> long/float/double, long ->
# float/double, float -> double, string <-> bytes) — anything else
# is a resolution error, not a coercion.

_PROMOTIONS = {
    ("int", "long"), ("int", "float"), ("int", "double"),
    ("long", "float"), ("long", "double"), ("float", "double"),
    ("string", "bytes"), ("bytes", "string"),
}


def _promote(v, wt: str, rt: str):
    if wt == rt:
        return v
    if (wt, rt) not in _PROMOTIONS:
        raise ValueError(f"cannot resolve writer {wt} as reader {rt}")
    if rt in ("float", "double"):
        return float(v)
    if rt == "long":
        return int(v)
    if rt == "bytes":
        return v.encode("utf-8") if isinstance(v, str) else v
    if rt == "string":
        return v.decode("utf-8") if isinstance(v, bytes) else v
    raise ValueError(f"unsupported promotion {wt} -> {rt}")


def resolve_record(
    record: dict, writer_schema: dict, reader_schema: dict
) -> dict:
    """One decoded writer record viewed through the reader schema."""
    wtypes = dict(_fields(writer_schema))
    out = {}
    for f in reader_schema["fields"]:
        rt = f["type"]
        if not isinstance(rt, str):
            raise ValueError("only primitive reader field types")
        src = None
        if f["name"] in wtypes:
            src = f["name"]
        else:
            for alias in f.get("aliases", []):
                if alias in wtypes:
                    src = alias
                    break
        if src is not None:
            out[f["name"]] = _promote(record[src], wtypes[src], rt)
        elif "default" in f:
            out[f["name"]] = f["default"]
        else:
            raise ValueError(
                f"reader field {f['name']!r} absent and has no default"
            )
    return out


def read_ocf_resolved(
    blob: bytes, reader_schema: dict
) -> tuple[dict, list[dict]]:
    """read_ocf + per-record resolution against ``reader_schema``."""
    writer_schema, records = read_ocf(blob)
    return writer_schema, [
        resolve_record(r, writer_schema, reader_schema) for r in records
    ]
