"""Pure-python WARC reader/writer (WARC 1.0/1.1, ISO 28500 — the
public IIPC spec; the container Common Crawl ships crawl data in).

The reference crawler fetches live HTML over HTTP; a 100 TB
Common-Crawl-style corpus arrives instead as WARC files — billions of
length-prefixed records, each a version line (``WARC/1.0``),
CRLF-terminated named headers, an empty line, ``Content-Length``
payload bytes, and a blank-line record separator. ``response``
records carry a full HTTP response (status line + headers + body) as
payload. Real Common Crawl WARCs are per-record gzip members
concatenated into one file; python's gzip module decompresses
concatenated members natively.

No external libs (warcio is not in the sandbox); like minipdf /
miniwav, the container walk is implemented from the public spec and
tested by round-trip plus hostile-input cases.
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass, field

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"


@dataclass
class WarcRecord:
    rec_type: str
    target_uri: str | None
    date: str | None
    content_type: str | None
    payload: bytes
    headers: dict[str, str] = field(default_factory=dict)
    # filled for rec_type == "response" with an HTTP payload:
    http_status: int | None = None
    http_content_type: str | None = None
    http_body: bytes | None = None


def write_record(
    rec_type: str,
    payload: bytes,
    target_uri: str | None = None,
    date: str = "2021-01-01T00:00:00Z",
    record_id: str = "<urn:uuid:00000000-0000-0000-0000-000000000000>",
    content_type: str = "application/http; msgtype=response",
) -> bytes:
    """Serialize one WARC/1.0 record (deterministic byte layout)."""
    lines = [b"WARC/1.0"]
    hdrs = [("WARC-Type", rec_type), ("WARC-Record-ID", record_id), ("WARC-Date", date)]
    if target_uri is not None:
        hdrs.append(("WARC-Target-URI", target_uri))
    hdrs.append(("Content-Type", content_type))
    hdrs.append(("Content-Length", str(len(payload))))
    for k, v in hdrs:
        lines.append(f"{k}: {v}".encode())
    return _CRLF.join(lines) + _CRLF + _CRLF + payload + _CRLF + _CRLF


def http_response_payload(
    body: bytes, status: int = 200, content_type: str = "text/html; charset=utf-8"
) -> bytes:
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found"}.get(status, "")
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body


def write_warc(
    pages: list[tuple[str, str, bytes]],
    gzipped: bool = False,
    compression: str | None = None,
) -> bytes:
    """(url, iso_date, html_body) pages -> a WARC file with one
    ``response`` record per page. ``gzipped=True`` (or
    ``compression='gzip'``) emits one gzip member per record — the
    classic Common Crawl layout; ``compression='zstd'`` emits one
    zstd frame per record — the ``.warc.zst`` profile (real libzstd
    frames via minizstd.libzstd_compress, decoded back by the
    engine's OWN RFC 8878 decoder)."""
    if gzipped and compression is None:
        compression = "gzip"
    if compression not in (None, "gzip", "zstd"):
        raise ValueError(f"unknown compression {compression!r}")
    out = []
    for url, date, body in pages:
        rec = write_record(
            "response",
            http_response_payload(body),
            target_uri=url,
            date=date,
        )
        if compression == "gzip":
            rec = gzip.compress(rec, mtime=0)
        elif compression == "zstd":
            from .minizstd import libzstd_compress

            rec = libzstd_compress(rec, level=3, checksum=True)
        out.append(rec)
    return b"".join(out)


def _parse_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    sep = payload.find(b"\r\n\r\n")
    if sep < 0 or not payload.startswith(b"HTTP/"):
        return None, None, payload
    head, body = payload[:sep], payload[sep + 4 :]
    lines = head.split(_CRLF)
    try:
        status = int(lines[0].split(b" ", 2)[1])
    except (IndexError, ValueError):
        return None, None, payload
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1")
    return status, ctype, body


def parse_warc(blob: bytes) -> list[WarcRecord]:
    """Walk every record in a (possibly gzipped, possibly multi-member)
    WARC blob. Malformed trailing garbage ends the walk; a record with
    an unparseable header block or missing Content-Length is skipped
    by resyncing to the next ``WARC/`` marker (robustness over raising
    — at 10^10 records a torn record must not kill the task)."""
    if blob[:2] == _GZIP_MAGIC:
        blob = gzip.decompress(blob)  # handles concatenated members
    elif blob[:4] == b"\x28\xb5\x2f\xfd":
        # .warc.zst profile: concatenated per-record zstd frames,
        # decoded by the engine's own RFC 8878 walk (checksums
        # verified inside)
        from .minizstd import zstd_decompress

        blob = zstd_decompress(blob)
    out: list[WarcRecord] = []
    pos = 0
    n = len(blob)
    while pos < n:
        if blob[pos : pos + 5] != b"WARC/":
            nxt = blob.find(b"WARC/", pos)
            if nxt < 0:
                break
            pos = nxt
        head_end = blob.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        head_lines = blob[pos:head_end].split(_CRLF)
        headers: dict[str, str] = {}
        for ln in head_lines[1:]:
            k, sep, v = ln.partition(b":")
            if sep:
                headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                    "latin-1"
                )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            pos = head_end + 4
            continue
        payload = blob[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        # tolerate the spec's 2-CRLF separator and any drift
        rec = WarcRecord(
            rec_type=headers.get("warc-type", ""),
            target_uri=_strip_angle(headers.get("warc-target-uri")),
            date=headers.get("warc-date"),
            content_type=headers.get("content-type"),
            payload=payload,
            headers=headers,
        )
        if rec.rec_type == "response":
            rec.http_status, rec.http_content_type, rec.http_body = _parse_http(
                payload
            )
        out.append(rec)
    return out


def _strip_angle(v: str | None) -> str | None:
    # WARC 1.1 writes <uri>; 1.0 writes bare uri — accept both
    if v and v.startswith("<") and v.endswith(">"):
        return v[1:-1]
    return v
