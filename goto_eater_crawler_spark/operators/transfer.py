"""HTTP transfer-codec operators: Content-Encoding gzip decode and
chunked transfer-encoding decode over binary body columns.

The reference crawler receives most live bodies gzip-compressed and
lets scrapy's HttpCompressionMiddleware decompress them
(scrapy downloadermiddlewares/httpcompression.py — enabled by the
project's default settings); chunked framing is handled by twisted
below it. In a 100 TB WARC-replay pipeline both codecs move into the
engine: raw fetched bytes land in the corpus store and the *reader*
decodes. Both ops follow the multimodal codec pattern — a synth that
builds REAL encoded payloads deterministically from doc_id with the
stdlib encoder (so the decoder is tested against a real producer, not
itself), a mapInPandas decode, and a closed-form DuckDB oracle over
``documents``.

Scale note: decode is the one Python stage (Arrow-batched); everything
before (scan, filter — pushed to parquet) and after (md5, aggregation)
is WholeStageCodegen. Payloads never shuffle: the decode is a narrow
map over the scan partitioning.
"""

from __future__ import annotations

import gzip as _gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GZ_SCHEMA = (
    "doc_id long, n_members long, n_bytes long, crc_ok boolean, "
    "isize_ok boolean, fname string, text string"
)


def synth_gzip_bodies(docs: DataFrame, mod: int = 3) -> DataFrame:
    """(doc_id, payload) — each selected doc's text utf-8 bytes as a
    REAL gzip body written by the stdlib encoder (zlib deflate):

    - compression level [0, 1, 6, 9][doc_id % 4] — level 0 emits
      STORED blocks, 1 favors fixed-Huffman, 6/9 dynamic tables, so
      the decoder's three block types all appear in-corpus;
    - doc_id % 2 == 1 → the bytes are split at the midpoint into TWO
      concatenated members (the Common Crawl per-record layout);
    - doc_id % 2 == 0 → single member carrying an FNAME header
      ``doc<id>.html`` (exercises the RFC 1952 optional-field walk).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                raw = str(text).encode("utf-8")
                lvl = (0, 1, 6, 9)[d % 4]
                if d % 2:
                    mid = len(raw) // 2
                    body = _gzip.compress(
                        raw[:mid], compresslevel=lvl, mtime=0
                    ) + _gzip.compress(raw[mid:], compresslevel=lvl, mtime=0)
                else:
                    buf = io.BytesIO()
                    with _gzip.GzipFile(
                        filename=f"doc{d}.html", mode="wb", fileobj=buf,
                        compresslevel=lvl, mtime=0,
                    ) as f:
                        f.write(raw)
                    body = buf.getvalue()
                ids.append(d)
                payloads.append(body)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id", "text")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def gzip_decode_metadata(bodies: DataFrame) -> DataFrame:
    """REAL RFC 1952 decode of a binary column via minideflate (own
    Huffman walk + own CRC32): (doc_id, n_members, n_bytes, crc_ok,
    isize_ok, fname, text). Undecodable payloads yield a null row —
    at 10^10 bodies a torn member must not kill the task."""
    from ..functions import minideflate

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "n_members", "n_bytes", "crc_ok", "isize_ok",
                "fname", "text")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                try:
                    members = minideflate.gunzip_members(bytes(payload))
                except (minideflate.DeflateError, IndexError, ValueError):
                    for k in ("n_members", "n_bytes", "crc_ok",
                              "isize_ok", "fname", "text"):
                        out[k].append(None)
                    continue
                plain = b"".join(p for p, _ in members)
                out["n_members"].append(len(members))
                out["n_bytes"].append(len(plain))
                out["crc_ok"].append(all(m["crc_ok"] for _, m in members))
                out["isize_ok"].append(
                    all(m["isize_ok"] for _, m in members))
                out["fname"].append(members[0][1]["fname"]
                                    if members else None)
                out["text"].append(plain.decode("utf-8", "replace"))
            yield pd.DataFrame(out)

    return bodies.select("doc_id", "payload").mapInPandas(
        batches, schema=_GZ_SCHEMA)


def gzip_decode_sql(mod: int = 3) -> str:
    """Closed-form oracle for gzip_decode_metadata(synth_gzip_bodies):
    gzip is lossless and the member layout is a function of doc_id, so
    every output column is computable straight off ``documents``."""
    return f"""
    SELECT doc_id,
           CAST(1 + doc_id % 2 AS BIGINT) AS n_members,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           TRUE AS crc_ok,
           TRUE AS isize_ok,
           CASE WHEN doc_id % 2 = 0
                THEN 'doc' || CAST(doc_id AS VARCHAR) || '.html' END
             AS fname,
           md5(text) AS text_md5
    FROM documents WHERE doc_id % {mod} = 0
    ORDER BY doc_id
    """


_ZSTD_SCHEMA = (
    "doc_id long, n_frames long, n_skippable long, n_bytes long, "
    "checksum_ok boolean, text string"
)


def _libzstd():
    """ctypes binding to the system libzstd (test-synth producer only
    — the DECODE path is functions/minizstd.py, never this)."""
    import ctypes

    lib = ctypes.CDLL("libzstd.so.1")
    lib.ZSTD_compressBound.restype = ctypes.c_size_t
    lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
    lib.ZSTD_createCCtx.restype = ctypes.c_void_p
    lib.ZSTD_CCtx_setParameter.restype = ctypes.c_size_t
    lib.ZSTD_CCtx_setParameter.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.ZSTD_compress2.restype = ctypes.c_size_t
    lib.ZSTD_compress2.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t,
    ]
    return lib, ctypes


def synth_zstd_bodies(docs: DataFrame, mod: int = 3) -> DataFrame:
    """(doc_id, payload) — each selected doc's text as REAL zstd
    frames written by libzstd (the reference producer):

    - compression level [1, 3, 9, 19][doc_id % 4] (fast → max paths
      pick different block/table shapes);
    - doc_id % 2 == 1 → TWO concatenated frames split at the text
      midpoint (the .warc.zst per-record layout);
    - doc_id % 4 == 0 → a skippable frame (0x184D2A50-family) is
      prepended, which the decoder must walk over;
    - content checksum always on, so every decode verifies the
      engine's own XXH64 against libzstd's.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lib, ctypes_mod = _libzstd()
        cctx = lib.ZSTD_createCCtx()

        def compress(raw: bytes, level: int) -> bytes:
            lib.ZSTD_CCtx_setParameter(cctx, 100, level)  # level
            lib.ZSTD_CCtx_setParameter(cctx, 201, 1)  # checksum
            bound = lib.ZSTD_compressBound(len(raw))
            dst = ctypes_mod.create_string_buffer(bound)
            n = lib.ZSTD_compress2(cctx, dst, bound, raw, len(raw))
            return dst.raw[:n]

        for pdf in it:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                raw = str(text).encode("utf-8")
                lvl = (1, 3, 9, 19)[d % 4]
                if d % 2:
                    mid = len(raw) // 2
                    body = compress(raw[:mid], lvl) + compress(
                        raw[mid:], lvl
                    )
                else:
                    body = compress(raw, lvl)
                if d % 4 == 0:
                    body = (
                        (0x184D2A50).to_bytes(4, "little")
                        + (4).to_bytes(4, "little")
                        + b"meta"
                        + body
                    )
                ids.append(d)
                payloads.append(body)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id", "text")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def zstd_decode_metadata(bodies: DataFrame) -> DataFrame:
    """REAL RFC 8878 decode via minizstd (own FSE/huffman/sequence
    walk + own XXH64): (doc_id, n_frames, n_skippable, n_bytes,
    checksum_ok, text). Undecodable payloads yield a null row."""
    from ..functions import minizstd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "n_frames", "n_skippable", "n_bytes",
                "checksum_ok", "text")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                try:
                    frames = minizstd.zstd_frames(bytes(payload))
                except (minizstd.ZstdError, IndexError, ValueError):
                    for k in ("n_frames", "n_skippable", "n_bytes",
                              "checksum_ok", "text"):
                        out[k].append(None)
                    continue
                data = [(c, m) for c, m in frames if not m["skippable"]]
                plain = b"".join(c for c, _ in data)
                out["n_frames"].append(len(data))
                out["n_skippable"].append(len(frames) - len(data))
                out["n_bytes"].append(len(plain))
                out["checksum_ok"].append(
                    all(m["checksum_ok"] for _, m in data))
                out["text"].append(plain.decode("utf-8", "replace"))
            yield pd.DataFrame(out)

    return bodies.select("doc_id", "payload").mapInPandas(
        batches, schema=_ZSTD_SCHEMA)


def zstd_decode_sql(mod: int = 3) -> str:
    """Closed-form oracle: zstd is lossless and the frame layout is a
    pure function of doc_id."""
    return f"""
    SELECT doc_id,
           CAST(1 + doc_id % 2 AS BIGINT) AS n_frames,
           CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS BIGINT)
             AS n_skippable,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           TRUE AS checksum_ok,
           md5(text) AS text_md5
    FROM documents WHERE doc_id % {mod} = 0
    ORDER BY doc_id
    """


_BZ2_SCHEMA = (
    "doc_id long, n_streams long, n_blocks long, n_bytes long, "
    "crc_ok boolean, text string"
)


def synth_bz2_bodies(docs: DataFrame, mod: int = 3) -> DataFrame:
    """(doc_id, payload) — each selected doc's text as REAL bzip2
    streams written by the stdlib encoder (the reference producer):

    - compression level [1, 5, 9][doc_id % 3 within selection]
      (level 1 = 100 KB blocks, so long docs split into multiple
      BWT blocks);
    - doc_id % 2 == 1 → TWO concatenated streams split at the text
      midpoint (the multistream dump layout, e.g. Wikipedia's
      pages-articles-multistream).
    """
    import bz2 as _bz2

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                raw = str(text).encode("utf-8")
                lvl = (1, 5, 9)[(d // mod) % 3]
                if d % 2:
                    mid = len(raw) // 2
                    body = _bz2.compress(raw[:mid], lvl) + _bz2.compress(
                        raw[mid:], lvl
                    )
                else:
                    body = _bz2.compress(raw, lvl)
                ids.append(d)
                payloads.append(body)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id", "text")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def bz2_decode_metadata(bodies: DataFrame) -> DataFrame:
    """REAL bzip2 decode via minibz2 (own Huffman/MTF/BWT walk + own
    bzip2-variant CRC32): (doc_id, n_streams, n_blocks, n_bytes,
    crc_ok, text). Undecodable payloads yield a null row."""
    from ..functions import minibz2

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "n_streams", "n_blocks", "n_bytes", "crc_ok",
                "text")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                try:
                    streams = minibz2.bz2_streams(bytes(payload))
                except (minibz2.Bz2Error, IndexError, ValueError):
                    for k in ("n_streams", "n_blocks", "n_bytes",
                              "crc_ok", "text"):
                        out[k].append(None)
                    continue
                plain = b"".join(p for p, _ in streams)
                out["n_streams"].append(len(streams))
                out["n_blocks"].append(
                    sum(m["n_blocks"] for _, m in streams))
                out["n_bytes"].append(len(plain))
                out["crc_ok"].append(all(m["crc_ok"] for _, m in streams))
                out["text"].append(plain.decode("utf-8", "replace"))
            yield pd.DataFrame(out)

    return bodies.select("doc_id", "payload").mapInPandas(
        batches, schema=_BZ2_SCHEMA)


def bz2_decode_sql(mod: int = 3) -> str:
    """Closed-form oracle: bzip2 is lossless, stream count is a pure
    function of doc_id, and at gate scale every non-empty stream is
    exactly one BWT block (docs ≪ 100 KB), so n_blocks is the number
    of non-empty stream halves."""
    nb = "octet_length(encode(text))"
    return f"""
    SELECT doc_id,
           CAST(1 + doc_id % 2 AS BIGINT) AS n_streams,
           CAST(CASE
                  WHEN doc_id % 2 = 0 THEN CASE WHEN {nb} > 0 THEN 1 ELSE 0 END
                  ELSE (CASE WHEN {nb} // 2 > 0 THEN 1 ELSE 0 END
                        + CASE WHEN {nb} - {nb} // 2 > 0 THEN 1 ELSE 0 END)
                END AS BIGINT) AS n_blocks,
           CAST({nb} AS BIGINT) AS n_bytes,
           TRUE AS crc_ok,
           md5(text) AS text_md5
    FROM documents WHERE doc_id % {mod} = 0
    ORDER BY doc_id
    """


_XZ_SCHEMA = (
    "doc_id long, n_streams long, n_blocks long, check_type string, "
    "n_bytes long, checks_ok boolean, text string"
)


def synth_xz_bodies(docs: DataFrame, mod: int = 3) -> DataFrame:
    """(doc_id, payload) — each selected doc's text as REAL .xz
    streams written by stdlib lzma (liblzma, the reference producer):

    - integrity check cycles [CRC64, CRC32, SHA-256, none] by
      doc_id % 4, so all four verification arms run in-corpus;
    - preset 0 (fast) for even doc_id, 6 for odd;
    - doc_id % 2 == 1 → TWO concatenated streams split at the text
      midpoint, with 4 bytes of stream padding between them.
    """
    import lzma as _lzma

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        checks = (
            _lzma.CHECK_CRC64, _lzma.CHECK_CRC32,
            _lzma.CHECK_SHA256, _lzma.CHECK_NONE,
        )
        for pdf in it:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                raw = str(text).encode("utf-8")
                check = checks[d % 4]
                preset = 0 if d % 2 == 0 else 6
                if d % 2:
                    mid = len(raw) // 2
                    body = (
                        _lzma.compress(raw[:mid], preset=preset,
                                       check=check)
                        + b"\x00" * 4
                        + _lzma.compress(raw[mid:], preset=preset,
                                         check=check)
                    )
                else:
                    body = _lzma.compress(raw, preset=preset, check=check)
                ids.append(d)
                payloads.append(body)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id", "text")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def xz_decode_metadata(bodies: DataFrame) -> DataFrame:
    """REAL xz decode via minilzma (own range coder / LZMA2 walk /
    CRC32 / CRC64): (doc_id, n_streams, n_blocks, check_type,
    n_bytes, checks_ok, text). Undecodable payloads yield a null
    row."""
    from ..functions import minilzma

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "n_streams", "n_blocks", "check_type",
                "n_bytes", "checks_ok", "text")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                try:
                    streams = minilzma.xz_streams(bytes(payload))
                except (minilzma.LzmaError, IndexError, ValueError):
                    for k in ("n_streams", "n_blocks", "check_type",
                              "n_bytes", "checks_ok", "text"):
                        out[k].append(None)
                    continue
                plain = b"".join(p for p, _ in streams)
                out["n_streams"].append(len(streams))
                out["n_blocks"].append(
                    sum(m["n_blocks"] for _, m in streams))
                out["check_type"].append(
                    streams[0][1]["check"] if streams else None)
                out["n_bytes"].append(len(plain))
                out["checks_ok"].append(
                    all(m["checks_ok"] for _, m in streams))
                out["text"].append(plain.decode("utf-8", "replace"))
            yield pd.DataFrame(out)

    return bodies.select("doc_id", "payload").mapInPandas(
        batches, schema=_XZ_SCHEMA)


def xz_decode_sql(mod: int = 3) -> str:
    """Closed-form oracle: xz is lossless; stream/block layout and
    check type are pure functions of doc_id (stdlib one-shot writes
    one block per non-empty stream, zero for empty)."""
    nb = "octet_length(encode(text))"
    return f"""
    SELECT doc_id,
           CAST(1 + doc_id % 2 AS BIGINT) AS n_streams,
           CAST(CASE
                  WHEN doc_id % 2 = 0 THEN CASE WHEN {nb} > 0 THEN 1 ELSE 0 END
                  ELSE (CASE WHEN {nb} // 2 > 0 THEN 1 ELSE 0 END
                        + CASE WHEN {nb} - {nb} // 2 > 0 THEN 1 ELSE 0 END)
                END AS BIGINT) AS n_blocks,
           CASE doc_id % 4 WHEN 0 THEN 'crc64' WHEN 1 THEN 'crc32'
                           WHEN 2 THEN 'sha256' ELSE 'none' END
             AS check_type,
           CAST({nb} AS BIGINT) AS n_bytes,
           TRUE AS checks_ok,
           md5(text) AS text_md5
    FROM documents WHERE doc_id % {mod} = 0
    ORDER BY doc_id
    """


_CHUNK_SCHEMA = (
    "doc_id long, n_chunks long, n_bytes long, has_trailer boolean, "
    "text string"
)


def synth_chunked_bodies(docs: DataFrame, mod: int = 3) -> DataFrame:
    """(doc_id, payload) — each selected doc's text framed with HTTP/1.1
    chunked transfer-encoding (RFC 9112 §7.1): hex size line + CRLF +
    chunk + CRLF per chunk, ``0`` last-chunk, optional trailer field.

    - chunk size = 256 + 64 * (doc_id % 5) bytes (final chunk short);
    - doc_id % 4 == 0 → a chunk extension ``;ext=v`` on every size
      line (must be ignored per spec);
    - doc_id % 2 == 1 → a trailer field ``X-Doc-Id: <id>`` between the
      last-chunk and the final CRLF.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                raw = str(text).encode("utf-8")
                size = 256 + 64 * (d % 5)
                ext = b";ext=v" if d % 4 == 0 else b""
                parts = []
                for off in range(0, len(raw), size):
                    chunk = raw[off : off + size]
                    parts.append(b"%x" % len(chunk) + ext + b"\r\n"
                                 + chunk + b"\r\n")
                parts.append(b"0" + ext + b"\r\n")
                if d % 2:
                    parts.append(b"X-Doc-Id: %d\r\n" % d)
                parts.append(b"\r\n")
                ids.append(d)
                payloads.append(b"".join(parts))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id", "text")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def chunked_decode_metadata(bodies: DataFrame) -> DataFrame:
    """Chunked-framing decode: walks size lines (hex, extensions
    stripped), concatenates chunk payloads, parses trailer fields.
    Malformed framing yields a null row."""

    def _decode(payload: bytes):
        pos = 0
        n_chunks = 0
        body = bytearray()
        while True:
            eol = payload.index(b"\r\n", pos)
            size_tok = payload[pos:eol].split(b";", 1)[0].strip()
            size = int(size_tok, 16)
            pos = eol + 2
            if size == 0:
                break
            body += payload[pos : pos + size]
            if payload[pos + size : pos + size + 2] != b"\r\n":
                raise ValueError("missing chunk-data CRLF")
            pos += size + 2
            n_chunks += 1
        # trailer section: zero or more field lines, then CRLF
        has_trailer = payload[pos : pos + 2] != b"\r\n"
        return n_chunks, bytes(body), has_trailer

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "n_chunks", "n_bytes", "has_trailer", "text")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                try:
                    n_chunks, body, has_trailer = _decode(bytes(payload))
                except (ValueError, IndexError):
                    for k in ("n_chunks", "n_bytes", "has_trailer",
                              "text"):
                        out[k].append(None)
                    continue
                out["n_chunks"].append(n_chunks)
                out["n_bytes"].append(len(body))
                out["has_trailer"].append(has_trailer)
                out["text"].append(body.decode("utf-8", "replace"))
            yield pd.DataFrame(out)

    return bodies.select("doc_id", "payload").mapInPandas(
        batches, schema=_CHUNK_SCHEMA)


def chunked_decode_sql(mod: int = 3) -> str:
    """Closed-form oracle: chunk count is ceil(n_bytes / chunk_size)
    in doc_id, framing is lossless."""
    nb = "octet_length(encode(text))"
    cs = "(256 + 64 * (doc_id % 5))"
    return f"""
    SELECT doc_id,
           CAST(({nb} + {cs} - 1) // {cs} AS BIGINT) AS n_chunks,
           CAST({nb} AS BIGINT) AS n_bytes,
           doc_id % 2 = 1 AS has_trailer,
           md5(text) AS text_md5
    FROM documents WHERE doc_id % {mod} = 0
    ORDER BY doc_id
    """


_SNAPPY_SCHEMA = (
    "doc_id long, framed boolean, n_chunks long, n_bytes long, "
    "crc_ok boolean, text string"
)


def synth_snappy_bodies(docs: DataFrame, mod: int = 3) -> DataFrame:
    """(doc_id, payload) — each selected doc's text as REAL snappy
    written by libsnappy via pyarrow (the reference producer for the
    compressed blocks):

    - doc_id % 2 == 0 → one bare raw-format block (the parquet/ORC
      page payload shape);
    - doc_id % 2 == 1 → a framing-format stream (Kafka /
      ``x-snappy-framed`` shape) with the text split into TWO data
      chunks at the midpoint (one when the text is shorter than 2
      bytes), each carrying a masked CRC-32C, with a padding chunk
      prepended when doc_id % 4 == 1 (the decoder must skip it).
    """
    from ..functions import minisnappy

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa

        for pdf in it:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                raw = str(text).encode("utf-8")
                if d % 2 == 0:
                    body = pa.compress(raw, codec="snappy", asbytes=True)
                else:
                    mid = len(raw) // 2
                    chunks = [raw[:mid], raw[mid:]] if len(raw) >= 2 else [raw]
                    body = minisnappy.frame(
                        chunks, pad=5 if d % 4 == 1 else 0
                    )
                ids.append(d)
                payloads.append(body)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id", "text")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def snappy_decode_metadata(bodies: DataFrame) -> DataFrame:
    """REAL snappy decode via minisnappy (own tag walk + own CRC-32C):
    (doc_id, framed, n_chunks, n_bytes, crc_ok, text). Bare raw
    blocks carry no checksum, so crc_ok is vacuously true there (the
    length preamble is still verified). Undecodable payloads yield a
    null row."""
    from ..functions import minisnappy

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "framed", "n_chunks", "n_bytes", "crc_ok",
                "text")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                body = bytes(payload)
                try:
                    # dispatch on the FULL 10-byte stream-identifier
                    # chunk — a raw block legitimately starts with
                    # 0xff whenever the uncompressed length is
                    # 127 mod 128 (varint continuation byte)
                    if body[:10] == b"\xff\x06\x00\x00sNaPpY":
                        chunks = minisnappy.framed_chunks(body)
                        plain = b"".join(c for c, _ in chunks)
                        out["framed"].append(True)
                        out["n_chunks"].append(len(chunks))
                        out["crc_ok"].append(
                            all(m["crc_ok"] for _, m in chunks))
                    else:
                        plain = minisnappy.uncompress(body)
                        out["framed"].append(False)
                        out["n_chunks"].append(1)
                        out["crc_ok"].append(True)
                except (minisnappy.SnappyError, IndexError, ValueError):
                    for k in ("framed", "n_chunks", "n_bytes", "crc_ok",
                              "text"):
                        out[k].append(None)
                    continue
                out["n_bytes"].append(len(plain))
                out["text"].append(plain.decode("utf-8", "replace"))
            yield pd.DataFrame(out)

    return bodies.select("doc_id", "payload").mapInPandas(
        batches, schema=_SNAPPY_SCHEMA)


def snappy_decode_sql(mod: int = 3) -> str:
    """Closed-form oracle: snappy is lossless and the framing layout
    is a pure function of doc_id."""
    nb = "octet_length(encode(text))"
    return f"""
    SELECT doc_id,
           doc_id % 2 = 1 AS framed,
           CAST(CASE WHEN doc_id % 2 = 1 AND {nb} >= 2 THEN 2 ELSE 1 END
                AS BIGINT) AS n_chunks,
           CAST({nb} AS BIGINT) AS n_bytes,
           TRUE AS crc_ok,
           md5(text) AS text_md5
    FROM documents WHERE doc_id % {mod} = 0
    ORDER BY doc_id
    """


_LZ4_SCHEMA = (
    "doc_id long, n_frames long, n_skippable long, n_blocks long, "
    "header_ok boolean, checksum_ok boolean, text string"
)


def synth_lz4_bodies(docs: DataFrame, mod: int = 3) -> DataFrame:
    """(doc_id, payload) — each selected doc's text as REAL LZ4
    frames written by liblz4 via pyarrow (the reference producer):

    - compression level [1, 4, 9, 12][doc_id % 4] (fast → HC paths
      pick different match-search strategies over the same format);
    - doc_id % 2 == 1 → TWO concatenated frames split at the text
      midpoint (one when shorter than 2 bytes);
    - doc_id % 4 == 3 → a skippable frame (0x184D2A50-family) is
      prepended, which the decoder must walk over;
    - every frame descriptor carries liblz4's real XXH32 header
      checksum byte, which the decoder re-derives with its OWN XXH32.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa

        codecs = {lvl: pa.Codec("lz4", compression_level=lvl)
                  for lvl in (1, 4, 9, 12)}
        for pdf in it:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                raw = str(text).encode("utf-8")
                codec = codecs[(1, 4, 9, 12)[d % 4]]
                if d % 2 and len(raw) >= 2:
                    mid = len(raw) // 2
                    body = codec.compress(
                        raw[:mid], asbytes=True
                    ) + codec.compress(raw[mid:], asbytes=True)
                else:
                    body = codec.compress(raw, asbytes=True)
                if d % 4 == 3:
                    body = (
                        (0x184D2A50).to_bytes(4, "little")
                        + (4).to_bytes(4, "little")
                        + b"meta"
                        + body
                    )
                ids.append(d)
                payloads.append(body)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id", "text")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def lz4_decode_metadata(bodies: DataFrame) -> DataFrame:
    """REAL LZ4-frame decode via minilz4 (own token walk + own
    XXH32): (doc_id, n_frames, n_skippable, n_blocks, header_ok,
    checksum_ok, text). Undecodable payloads yield a null row."""
    from ..functions import minilz4

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "n_frames", "n_skippable", "n_blocks",
                "header_ok", "checksum_ok", "text")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                try:
                    frames = minilz4.lz4_frames(bytes(payload))
                except (minilz4.Lz4Error, IndexError, ValueError):
                    for k in ("n_frames", "n_skippable", "n_blocks",
                              "header_ok", "checksum_ok", "text"):
                        out[k].append(None)
                    continue
                data = [(c, m) for c, m in frames if not m["skippable"]]
                plain = b"".join(c for c, _ in data)
                out["n_frames"].append(len(data))
                out["n_skippable"].append(len(frames) - len(data))
                out["n_blocks"].append(
                    sum(m["n_blocks"] for _, m in data))
                out["header_ok"].append(
                    all(m["header_ok"] for _, m in data))
                out["checksum_ok"].append(
                    all(m["checksum_ok"] for _, m in data))
                out["text"].append(plain.decode("utf-8", "replace"))
            yield pd.DataFrame(out)

    return bodies.select("doc_id", "payload").mapInPandas(
        batches, schema=_LZ4_SCHEMA)


def lz4_decode_sql(mod: int = 3) -> str:
    """Closed-form oracle: LZ4 is lossless; the frame layout is a
    pure function of doc_id, and block count is ceil(bytes / 64 KiB)
    per frame (liblz4's default block max size, BD code 4)."""
    nb = "octet_length(encode(text))"
    return f"""
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 2 = 1 AND {nb} >= 2 THEN 2 ELSE 1 END
                AS BIGINT) AS n_frames,
           CAST(CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 0 END AS BIGINT)
             AS n_skippable,
           CAST(CASE WHEN doc_id % 2 = 1 AND {nb} >= 2
                     THEN ({nb} // 2 + 65535) // 65536
                          + ({nb} - {nb} // 2 + 65535) // 65536
                     ELSE ({nb} + 65535) // 65536
                END AS BIGINT) AS n_blocks,
           TRUE AS header_ok,
           TRUE AS checksum_ok,
           md5(text) AS text_md5
    FROM documents WHERE doc_id % {mod} = 0
    ORDER BY doc_id
    """


def synth_ws_streams(docs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) — one captured WebSocket stream per doc: a
    masked text message fragmented into 1+doc%3 frames with a ping
    control frame interleaved after the first fragment (§5.4's
    interleave allowance is load-bearing when fragments >= 2), then
    a masked binary frame. Text length >= 126 so the 16-bit extended
    length path always carries corpus; the mask key varies per doc
    so the XOR unmask is too."""
    import pandas as pd

    from ..functions import miniws

    def batches(it):
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                text = (f"w{d % 10} " * ((d % 5 + 1) * 20)).encode()
                key = bytes(
                    [d % 251, (d * 7) % 251, (d * 13) % 251, (d * 29) % 251]
                )
                ping = miniws.write_frame(
                    0x9, f"ping{d % 4}".encode(), mask_key=key
                )
                stream = miniws.write_fragmented(
                    0x1, text, 1 + d % 3, key, interleave=[ping]
                )
                stream += miniws.write_frame(
                    0x2,
                    bytes((d + j) % 256 for j in range(d % 40 + 10)),
                    mask_key=key,
                )
                ids.append(d)
                payloads.append(stream)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


def ws_decode(blobs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) captured streams -> reassembled message
    metadata through the OWN RFC 6455 walk (functions/miniws).
    One Arrow-batched map stage, no shuffle."""
    import pandas as pd

    from ..functions import miniws

    def parse(it):
        for pdf in it:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                m = miniws.parse_stream(bytes(blob))
                text = next(
                    p.decode() for op, p in m["messages"] if op == 0x1
                )
                bin_len = next(
                    len(p) for op, p in m["messages"] if op == 0x2
                )
                rows.append(
                    (
                        int(d), len(m["messages"]), int(m["n_frames"]),
                        int(m["n_masked"]), text, len(text),
                        m["pings"][0].decode(), bin_len,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_messages", "n_frames", "n_masked",
                    "text", "text_len", "ping", "bin_len",
                ],
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, n_messages int, n_frames int, n_masked int, "
            "text string, text_len int, ping string, bin_len int"
        ),
    )


def synth_hpack_captures(docs: "DataFrame") -> "DataFrame":
    """(doc_id, b1, b2, b3) — a 3-block HTTP/2 header capture per doc
    sharing ONE connection dynamic table: block 1 inserts entries,
    block 2 references them by DYNAMIC index (only decodable with
    carried state), block 3 shrinks the table (size update -> 2
    evictions), reads the survivor by index, then inserts one more
    entry (a 3rd eviction). The eviction arithmetic is size-stable
    across docs, so eviction/final-size closed forms hold for all."""
    import pandas as pd

    from ..functions import minihpack as hp

    def batches(it):
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                enc = hp.Encoder()
                b1 = (
                    enc.indexed(2)
                    + enc.indexed(7)
                    + enc.literal_indexing(":path", f"/p/{d}")
                    + enc.literal_indexing("x-trace", f"t{d % 100}")
                    + enc.literal_indexing_nameidx(58, f"bot{d % 5}")
                )
                b2 = (
                    enc.indexed(2)
                    + enc.indexed(63)
                    + enc.indexed(64)
                    + enc.literal_no_indexing("x-req", f"r{d % 7}")
                )
                b3 = (
                    enc.size_update(70)
                    + enc.indexed(62)
                    + enc.literal_indexing("x-new", f"n{d % 3}")
                )
                rows.append((d, b1, b2, b3))
            yield pd.DataFrame(
                rows, columns=["doc_id", "b1", "b2", "b3"]
            )

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, b1 binary, b2 binary, b3 binary"
    )


def hpack_decode(caps: "DataFrame") -> "DataFrame":
    """Decode each capture's blocks IN ORDER against one carried
    DynamicTable (functions/minihpack) — the per-connection
    sessionful decode; connections are independent so the stage is
    embarrassingly parallel across rows, state never crosses the
    Arrow batch boundary."""
    import pandas as pd

    from ..functions import minihpack as hp

    def parse(it):
        for pdf in it:
            rows = []
            for d, b1, b2, b3 in zip(
                pdf["doc_id"], pdf["b1"], pdf["b2"], pdf["b3"]
            ):
                table = hp.DynamicTable()
                h1 = hp.decode_block(bytes(b1), table)
                h2 = hp.decode_block(bytes(b2), table)
                h3 = hp.decode_block(bytes(b3), table)
                rows.append(
                    (
                        int(d),
                        len(h1) + len(h2) + len(h3),
                        table.evictions,
                        table.size,
                        ";".join(f"{n}={v}" for n, v in h2),
                        ";".join(f"{n}={v}" for n, v in h3),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_headers", "evictions",
                    "final_size", "block2", "block3",
                ],
            )

    return caps.mapInPandas(
        parse,
        schema=(
            "doc_id long, n_headers int, evictions int, "
            "final_size int, block2 string, block3 string"
        ),
    )


# ---------------------------------------------------------------------------
# DNS resolver-cache decode (RFC 1035) — every fetch starts with a
# lookup; at 10^10-URL scale the resolver cache is itself a corpus
# table of wire-format responses keyed by host.
# ---------------------------------------------------------------------------


def synth_dns_blobs(docs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) — one resolver response per doc through the
    OWN RFC 1035 encoder (functions/minidns).  Every message carries
    suffix compression (the shared '.example.org' tail plus, on the
    CNAME arm, A-record owner names as pointers INTO the CNAME
    RDATA); d % 17 == 0 docs are NXDOMAIN with an SOA authority
    (negative caching, RFC 2308)."""

    from ..functions import minidns

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                qname = f"www.h{d % 50}.example.org"
                if d % 17 == 0:
                    payload = minidns.encode_response(
                        txn_id=d % 65536,
                        qname=qname,
                        rcode=3,
                        authority=[
                            (
                                "example.org",
                                minidns.TYPE_SOA,
                                3600,
                                (
                                    "ns1.example.org",
                                    "hostmaster.example.org",
                                    2026080000 + d % 100,
                                    7200,
                                    900,
                                    86400,
                                    60 + (d % 5) * 30,
                                ),
                            )
                        ],
                    )
                else:
                    a_ttl = 300 + (d % 7) * 60
                    n_a = 1 + d % 3
                    answers: list = []
                    owner = qname
                    if d % 3 == 0:
                        target = f"edge{d % 4}.cdn.example.net"
                        answers.append(
                            (qname, minidns.TYPE_CNAME, 3600, target)
                        )
                        owner = target
                    for i in range(n_a):
                        answers.append(
                            (
                                owner,
                                minidns.TYPE_A,
                                a_ttl,
                                f"10.{d % 200}.{(d * 7) % 250}.{i + 1}",
                            )
                        )
                    payload = minidns.encode_response(
                        txn_id=d % 65536, qname=qname, answers=answers
                    )
                ids.append(d)
                payloads.append(payload)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


def dns_decode(blobs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) -> resolver-cache row: qname, rcode,
    answer count, CNAME target ('-' sentinel when absent), ordered
    A-record IPs, and the cache TTL (min answer TTL; for NXDOMAIN
    the SOA MINIMUM per RFC 2308 negative caching).  One
    Arrow-batched map stage, no shuffle."""

    from ..functions import minidns

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                m = minidns.decode_message(bytes(blob))
                cname = "-"
                ips, ttls = [], []
                for rr in m["answers"]:
                    if rr["type"] == "CNAME":
                        cname = rr["rdata"]
                    elif rr["type"] == "A":
                        ips.append(rr["rdata"])
                    ttls.append(rr["ttl"])
                if m["rcode"] == 3 and not m["answers"]:
                    ttl = min(
                        rr["rdata"][6]
                        for rr in m["authority"]
                        if rr["type"] == "SOA"
                    )
                else:
                    ttl = min(ttls)
                rows.append(
                    (
                        int(d),
                        m["qname"],
                        int(m["rcode"]),
                        len(m["answers"]),
                        cname,
                        ",".join(ips) if ips else "-",
                        int(ttl),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "qname", "rcode", "ancount",
                    "cname", "ips", "cache_ttl",
                ],
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, qname string, rcode int, ancount int, "
            "cname string, ips string, cache_ttl bigint"
        ),
    )


# ---------------------------------------------------------------------------
# HTTP/2 session decode (RFC 9113) — the multiplexed session layer
# under the HPACK gate: one captured connection blob carries
# interleaved frames of several fetch streams.
# ---------------------------------------------------------------------------


def synth_h2_sessions(docs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) — one captured h2 client session per doc
    through the OWN RFC 9113 encoder (functions/minih2): SETTINGS +
    ack, a split header block (HEADERS w/o END_HEADERS followed by
    its CONTINUATION — the adjacency rule is live on every doc),
    stream-1 DATA split across two frames INTERLEAVED with a padded
    stream-3 DATA frame, optional PING, WINDOW_UPDATE, GOAWAY."""

    from ..functions import minih2 as h2

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                s1 = (f"body1-{d}-" * (1 + d % 3)).encode()
                s3 = f"b3-{d % 7}".encode()
                pad = d % 8
                frames = [
                    h2.settings_frame(
                        [
                            (h2.SETTINGS_MAX_CONCURRENT_STREAMS,
                             100 + d % 50),
                            (h2.SETTINGS_INITIAL_WINDOW_SIZE, 65535),
                            (h2.SETTINGS_MAX_FRAME_SIZE,
                             16384 + (d % 3) * 4096),
                        ]
                    ),
                    h2.settings_frame([], ack=True),
                    h2.frame(h2.T_HEADERS, h2.F_END_HEADERS, 1, b"hb1"),
                    h2.frame(h2.T_HEADERS, 0, 3, b"hb3a"),
                    h2.frame(h2.T_CONTINUATION, h2.F_END_HEADERS, 3,
                             b"hb3b"),
                    h2.data_frame(1, s1[:4]),
                    h2.data_frame(3, s3, end_stream=True, pad_len=pad),
                    h2.data_frame(1, s1[4:], end_stream=True),
                ]
                if d % 2:
                    frames.append(
                        h2.frame(h2.T_PING, 0, 0, bytes(8))
                    )
                frames.append(
                    h2.frame(
                        h2.T_WINDOW_UPDATE, 0, 0,
                        (1000 + d % 100).to_bytes(4, "big"),
                    )
                )
                frames.append(
                    h2.frame(h2.T_GOAWAY, 0, 0, (3).to_bytes(4, "big")
                             + bytes(4))
                )
                ids.append(d)
                payloads.append(h2.PREFACE + b"".join(frames))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


def h2_decode(blobs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) -> session summary: reassembled per-stream
    bodies (padding stripped), flow-control consumption (padding
    COUNTED), negotiated MAX_FRAME_SIZE, GOAWAY last-stream-id.
    One Arrow-batched map stage, no shuffle."""

    from ..functions import minih2 as h2

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                m = h2.decode_session(bytes(blob))
                rows.append(
                    (
                        int(d),
                        int(m["n_frames"]),
                        len(m["bodies"]),
                        m["bodies"][1].decode(),
                        m["bodies"][3].decode(),
                        int(m["flow_consumed"]),
                        int(m["settings"][h2.SETTINGS_MAX_FRAME_SIZE]),
                        int(m["goaway_last"]),
                        int(m["pings"]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "n_streams", "s1_body",
                    "s3_body", "flow_consumed", "max_frame_size",
                    "goaway_last", "pings",
                ],
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, n_frames int, n_streams int, s1_body string, "
            "s3_body string, flow_consumed bigint, max_frame_size bigint, "
            "goaway_last int, pings int"
        ),
    )


# ---------------------------------------------------------------------------
# HTTP range reassembly (RFC 9110 §14 / RFC 7233 multipart/
# byteranges) — resumable fetches arrive as 206 parts; the corpus
# op rebuilds full bodies, verifies overlaps, and flags gaps.
# ---------------------------------------------------------------------------

_RANGE_BOUNDARY = b"RANGE_SEP_3d6f"


def synth_range_parts(docs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) — one multipart/byteranges body per doc:
    the full body split at the thirds; odd docs deliver parts OUT OF
    ORDER, d%5==0 docs LOSE the middle part (gap), d%4==1 (non-gap)
    docs overlap part 2 backwards by 2 bytes (the reassembler must
    verify overlapping bytes agree)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                body = (f"PAYLOAD-{d}-" * (2 + d % 3)).encode()
                total = len(body)
                p1, p2 = total // 3, 2 * total // 3
                ranges = [(0, p1 - 1), (p1, p2 - 1), (p2, total - 1)]
                if d % 5 == 0:
                    ranges = [ranges[0], ranges[2]]
                elif d % 4 == 1:
                    ranges[1] = (p1 - 2, p2 - 1)
                if d % 2:
                    ranges = ranges[::-1]
                parts = []
                for a, b in ranges:
                    parts.append(
                        b"--" + _RANGE_BOUNDARY + b"\r\n"
                        b"Content-Type: text/plain\r\n"
                        + f"Content-Range: bytes {a}-{b}/{total}\r\n"
                        .encode()
                        + b"\r\n" + body[a : b + 1] + b"\r\n"
                    )
                payload = b"".join(parts) + b"--" + _RANGE_BOUNDARY + b"--\r\n"
                ids.append(d)
                payloads.append(payload)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


def range_reassemble(blobs: "DataFrame") -> "DataFrame":
    """(doc_id, payload) -> reassembled body ('-' when byte coverage
    is incomplete), received-byte count, overlap-consistency
    enforced (overlapping ranges must carry identical bytes — a
    mismatch raises). One Arrow map stage, no shuffle."""

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(blob)
                sep = b"--" + _RANGE_BOUNDARY
                chunks = raw.split(sep)
                if not chunks[-1].startswith(b"--"):
                    raise ValueError("missing closing boundary")
                buf: dict[int, int] = {}
                total = None
                n_parts = 0
                for part in chunks[1:-1]:
                    if not part.startswith(b"\r\n"):
                        raise ValueError("malformed part prologue")
                    head, _, body = part[2:].partition(b"\r\n\r\n")
                    if not body.endswith(b"\r\n"):
                        raise ValueError("part body missing CRLF")
                    body = body[:-2]
                    cr = None
                    for line in head.split(b"\r\n"):
                        if line.lower().startswith(b"content-range:"):
                            cr = line.split(b":", 1)[1].strip()
                    if cr is None or not cr.startswith(b"bytes "):
                        raise ValueError("missing Content-Range")
                    rng, tot = cr[6:].split(b"/")
                    a, b = (int(x) for x in rng.split(b"-"))
                    tot = int(tot)
                    if total is None:
                        total = tot
                    elif total != tot:
                        raise ValueError("inconsistent complete-length")
                    if b - a + 1 != len(body):
                        raise ValueError("range width != part length")
                    for i, byte in enumerate(body):
                        pos = a + i
                        if pos in buf and buf[pos] != byte:
                            raise ValueError(
                                f"overlap mismatch at byte {pos}"
                            )
                        buf[pos] = byte
                    n_parts += 1
                complete = total is not None and len(buf) == total
                rows.append(
                    (
                        int(d),
                        int(total),
                        n_parts,
                        complete,
                        len(buf),
                        bytes(
                            buf[i] for i in range(total)
                        ).decode() if complete else "-",
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "total", "n_parts", "complete",
                    "received", "body",
                ],
            )

    return blobs.mapInPandas(
        parse,
        schema=(
            "doc_id long, total bigint, n_parts int, complete boolean, "
            "received bigint, body string"
        ),
    )


# ---------------------------------------------------------------------------
# HTTP-date parsing (RFC 9110 §5.6.7) — Last-Modified / Expires /
# Retry-After arrive in THREE legal formats; recrawl scheduling
# depends on reading all of them.
# ---------------------------------------------------------------------------

_MONTHS = [
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
]
_WDAYS = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]
_WDAYS_LONG = [
    "Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
    "Saturday", "Sunday",
]


def _days_from_civil(y: int, m: int, d: int) -> int:
    """Days since 1970-01-01, pure integer (the civil-calendar
    algorithm; no datetime/locale involvement)."""
    y -= m <= 2
    era = (y if y >= 0 else y - 399) // 400
    yoe = y - era * 400
    doy = (153 * (m + (-3 if m > 2 else 9)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def format_http_date(
    y: int, mo: int, d: int, hh: int, mm: int, ss: int, fmt: str
) -> str:
    wd = (_days_from_civil(y, mo, d) + 3) % 7  # 1970-01-01 = Thursday
    if fmt == "imf":
        return (
            f"{_WDAYS[wd]}, {d:02d} {_MONTHS[mo - 1]} {y} "
            f"{hh:02d}:{mm:02d}:{ss:02d} GMT"
        )
    if fmt == "rfc850":
        return (
            f"{_WDAYS_LONG[wd]}, {d:02d}-{_MONTHS[mo - 1]}-{y % 100:02d} "
            f"{hh:02d}:{mm:02d}:{ss:02d} GMT"
        )
    if fmt == "asctime":
        return (
            f"{_WDAYS[wd]} {_MONTHS[mo - 1]} {d:2d} "
            f"{hh:02d}:{mm:02d}:{ss:02d} {y}"
        )
    raise ValueError(fmt)


def parse_http_date(s: str) -> int:
    """Epoch seconds from any of the three RFC 9110 formats; the
    rfc850 two-digit year maps 70-99 -> 19xx, 00-69 -> 20xx."""
    parts = s.split()
    if len(parts) == 6 and parts[0].endswith(","):  # IMF-fixdate
        _, dd, mon, yyyy, hms, tz = parts
        if tz != "GMT":
            raise ValueError(f"bad timezone {tz!r}")
        y, mo, d = int(yyyy), _MONTHS.index(mon) + 1, int(dd)
    elif len(parts) == 4 and parts[0].endswith(","):  # rfc850
        _, dmy, hms, tz = parts
        if tz != "GMT":
            raise ValueError(f"bad timezone {tz!r}")
        dd, mon, yy = dmy.split("-")
        y2 = int(yy)
        y = 1900 + y2 if y2 >= 70 else 2000 + y2
        mo, d = _MONTHS.index(mon) + 1, int(dd)
    elif len(parts) == 5:  # asctime
        _, mon, dd, hms, yyyy = parts
        y, mo, d = int(yyyy), _MONTHS.index(mon) + 1, int(dd)
    else:
        raise ValueError(f"unrecognized HTTP-date {s!r}")
    hh, mm, ss = (int(x) for x in hms.split(":"))
    if not (0 <= hh < 24 and 0 <= mm < 60 and 0 <= ss < 61):
        raise ValueError("time out of range")
    return _days_from_civil(y, mo, d) * 86400 + hh * 3600 + mm * 60 + ss


def synth_http_dates(docs: "DataFrame") -> "DataFrame":
    """(doc_id, header) — one Last-Modified value per doc cycling
    through the three formats."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, headers, fmts = [], [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                fmt = ("imf", "rfc850", "asctime")[d % 3]
                headers.append(
                    format_http_date(
                        1994 + d % 30, 1 + d % 12, 1 + d % 28,
                        d % 24, d % 60, (d * 7) % 60, fmt,
                    )
                )
                ids.append(d)
                fmts.append(fmt)
            yield pd.DataFrame(
                {"doc_id": ids, "fmt": fmts, "header": headers}
            )

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, fmt string, header string"
    )


def http_date_decode(headers: "DataFrame") -> "DataFrame":
    """(doc_id, fmt, header) -> epoch seconds via the OWN walk (no
    strptime/locale). One Arrow map stage, no shuffle."""

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "fmt": pdf["fmt"],
                    "epoch": [
                        parse_http_date(h) for h in pdf["header"]
                    ],
                }
            )

    return headers.mapInPandas(
        parse, schema="doc_id long, fmt string, epoch bigint"
    )


# ---------------------------------------------------------------------------
# QUIC frame layer (RFC 9000) — the h3 transport arm beside h2_decode
# ---------------------------------------------------------------------------

_QUIC_SCHEMA = (
    "doc_id long, n_frames int, padding int, pings int, "
    "largest_acked bigint, n_acked bigint, ecn boolean, "
    "crypto string, s0_body string, s0_complete boolean, "
    "tail_body string, max_data bigint, close_reason string"
)


def synth_quic_payloads(docs: DataFrame) -> DataFrame:
    """(doc_id, payload) — one decrypted QUIC packet payload per doc,
    frames synthesized through the OWN miniquic encoders:

    - stream 0 carries the doc's text split into TWO STREAM frames
      emitted OUT OF ORDER (second half first); docs with
      doc_id % 3 == 0 overlap the split by one byte, so §2.2's
      overlap-equality verification is live, and the second-half
      frame of docs with doc_id % 2 == 1 uses a FORCED non-canonical
      varint width for its offset (the §16 legal-long-encoding rule);
    - a CRYPTO handshake blob split into two out-of-order segments;
    - one ACK frame with a second ack-range (the -2 arithmetic) and
      ECN counts on odd docs;
    - doc_id % 2 pings, MAX_DATA, doc_id % 8 PADDING bytes;
    - docs with doc_id % 7 == 0 add CONNECTION_CLOSE;
    - docs with doc_id % 5 == 0 end with an implicit-length STREAM
      frame on stream 4 (LEN bit clear — must be last, and is).
    """
    from ..functions import miniquic as mq

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                raw = str(text).encode("utf-8")
                mid = len(raw) // 2
                out = b""
                # CRYPTO out of order
                ch = f"ch-{d}-hello".encode()
                out += mq.crypto_frame(4, ch[4:])
                out += mq.crypto_frame(0, ch[:4])
                # ACK (+ECN on odd docs)
                out += mq.ack_frame(
                    100 + d % 50, d % 8,
                    [(0, d % 5), (d % 3, d % 4)],
                    ecn=(d, d + 1, d + 2) if d % 2 else None,
                )
                out += bytes(d % 8)  # PADDING run
                for _ in range(d % 2):
                    out += bytes([mq.FT_PING])
                # stream 0: second half FIRST (overlap 1 byte when
                # d % 3 == 0 and the split point allows it)
                ov = 1 if (d % 3 == 0 and mid >= 1) else 0
                second = mq.stream_frame(
                    0, raw[mid - ov:], offset=mid - ov, fin=True
                )
                if d % 2 and mid - ov > 0:
                    # legal non-canonical offset width: rebuild with
                    # a forced 4-byte varint
                    second = (
                        bytes([mq.FT_STREAM_BASE | 0x04 | 0x02 | 0x01])
                        + mq.encode_varint(0)
                        + mq.encode_varint(mid - ov, width=4)
                        + mq.encode_varint(len(raw) - (mid - ov))
                        + raw[mid - ov:]
                    )
                out += second
                out += mq.stream_frame(0, raw[:mid], offset=0)
                out += bytes([mq.FT_MAX_DATA]) + mq.encode_varint(
                    (1 << 20) + d
                )
                if d % 7 == 0:
                    out += mq.connection_close_frame(
                        0x0A, 0x06, f"bye-{d}".encode()
                    )
                if d % 5 == 0:
                    out += mq.stream_frame(
                        4, f"tail-{d}".encode(),
                        fin=True, explicit_len=False,
                    )
                ids.append(d)
                payloads.append(out)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


def quic_decode(payloads: DataFrame) -> DataFrame:
    """REAL RFC 9000 frame walk via miniquic: per-stream reassembly
    (overlaps verified byte-equal), ACK range arithmetic, implicit-
    length position rule. One Arrow map stage, no shuffle."""
    from ..functions import miniquic as mq

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                m = mq.decode_payload(bytes(payload))
                s0 = m["streams"].get(0)
                s4 = m["streams"].get(4)
                ack = m["acks"][0]
                rows.append((
                    int(doc_id),
                    m["n_frames"],
                    m["padding"],
                    m["pings"],
                    ack["largest"],
                    ack["n_acked"],
                    ack["ecn"] is not None,
                    m["crypto"].decode("utf-8"),
                    s0["body"].decode("utf-8") if s0 else None,
                    bool(s0 and s0["complete"]),
                    s4["body"].decode("utf-8") if s4 else "-",
                    m["max_data"],
                    m["close"]["reason"] if m["close"] else "-",
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "padding", "pings",
                    "largest_acked", "n_acked", "ecn", "crypto",
                    "s0_body", "s0_complete", "tail_body", "max_data",
                    "close_reason",
                ],
            )

    return payloads.mapInPandas(batches, schema=_QUIC_SCHEMA)


def quic_decode_sql() -> str:
    """Closed-form oracle: every emitted field is a pure function of
    doc_id (+ the lossless text round-trip)."""
    return """
    SELECT doc_id,
           CAST(2 + 2 + 1 + doc_id % 2 + 1
                + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END
                + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
                AS INT) AS n_frames,
           CAST(doc_id % 8 AS INT) AS padding,
           CAST(doc_id % 2 AS INT) AS pings,
           CAST(100 + doc_id % 50 AS BIGINT) AS largest_acked,
           CAST(doc_id % 5 + doc_id % 4 + 2 AS BIGINT) AS n_acked,
           doc_id % 2 = 1 AS ecn,
           'ch-' || CAST(doc_id AS VARCHAR) || '-hello' AS crypto,
           text AS s0_body,
           TRUE AS s0_complete,
           CASE WHEN doc_id % 5 = 0
                THEN 'tail-' || CAST(doc_id AS VARCHAR) ELSE '-' END
             AS tail_body,
           CAST(1048576 + doc_id AS BIGINT) AS max_data,
           CASE WHEN doc_id % 7 = 0
                THEN 'bye-' || CAST(doc_id AS VARCHAR) ELSE '-' END
             AS close_reason
    FROM documents ORDER BY doc_id
    """
