"""minideflate + transfer operators: the decoder is tested against
the REAL stdlib encoder (zlib/gzip output at every compression level,
so stored, fixed-Huffman and dynamic-Huffman blocks all appear), plus
gzip member framing (FNAME/FEXTRA/FHCRC, concatenated members,
trailer verification) and chunked transfer-encoding framing."""

import gzip
import io
import random
import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import minideflate as md


# ---------------------------------------------------------------- raw
def test_inflate_stored_fixed_dynamic_blocks():
    payload = b"abcabcabcabc" * 40 + bytes(range(256))
    for level in (0, 1, 6, 9):
        comp = zlib.compress(payload, level)
        # strip the 2-byte zlib header and 4-byte adler trailer
        plain, end = md.inflate(comp, 2)
        assert plain == payload
        assert end == len(comp) - 4


def test_inflate_overlapping_backreference():
    # length > distance forces the byte-by-byte RLE copy path
    payload = b"a" * 1000
    comp = zlib.compress(payload, 9)
    assert md.inflate(comp, 2)[0] == payload


def test_inflate_empty():
    assert md.inflate(zlib.compress(b"", 6), 2)[0] == b""


def test_inflate_truncated_raises():
    comp = zlib.compress(b"hello world" * 50, 6)
    with pytest.raises(md.DeflateError):
        md.inflate(comp[: len(comp) // 2], 2)


def test_inflate_reserved_block_type_raises():
    # BFINAL=1, BTYPE=3 (reserved)
    with pytest.raises(md.DeflateError):
        md.inflate(bytes([0b111]))


def test_inflate_stored_len_nlen_mismatch_raises():
    bad = bytes([0b000]) + struct.pack("<HH", 5, 0) + b"abcde"
    with pytest.raises(md.DeflateError):
        md.inflate(bad)


@given(st.integers(0, 10**9))
@settings(max_examples=60, deadline=None)
def test_inflate_roundtrip_fuzz(seed):
    rnd = random.Random(seed)
    n = rnd.randint(0, 4000)
    kind = rnd.choice(["random", "text", "runs"])
    if kind == "random":
        payload = bytes(rnd.randrange(256) for _ in range(n))
    elif kind == "text":
        payload = " ".join(
            rnd.choice(["the", "quick", "brown", "fox", "店舗", "一覧"])
            for _ in range(n // 4)
        ).encode("utf-8")
    else:
        payload = b"".join(
            bytes([rnd.randrange(256)]) * rnd.randint(1, 300)
            for _ in range(n // 100 + 1)
        )
    level = rnd.choice([0, 1, 2, 6, 9])
    assert md.inflate(zlib.compress(payload, level), 2)[0] == payload


# --------------------------------------------------------------- gzip
def test_gunzip_single_member_fname():
    buf = io.BytesIO()
    with gzip.GzipFile(
        filename="x.html", mode="wb", fileobj=buf, mtime=1234
    ) as f:
        f.write(b"hello gzip")
    plain, meta, end = md.gunzip_member(buf.getvalue())
    assert plain == b"hello gzip"
    assert meta["fname"] == "x.html"
    assert meta["mtime"] == 1234
    assert meta["crc_ok"] and meta["isize_ok"]
    assert end == len(buf.getvalue())


def test_gunzip_concatenated_members():
    data = gzip.compress(b"part one|", mtime=0) + gzip.compress(
        b"part two", mtime=0
    )
    members = md.gunzip_members(data)
    assert [p for p, _ in members] == [b"part one|", b"part two"]
    assert md.gunzip(data) == b"part one|part two"


def test_gunzip_fextra_and_fhcrc():
    # hand-build a header with FEXTRA + FHCRC (stdlib writes neither)
    raw = b"payload with extras"
    deflated = zlib.compress(raw, 6)[2:-4]
    extra = b"AB" + struct.pack("<H", 4) + b"anth"  # doesn't matter
    hdr = (
        b"\x1f\x8b\x08"
        + bytes([md._FEXTRA | md._FHCRC])
        + struct.pack("<I", 0)
        + b"\x00\x03"
        + struct.pack("<H", len(extra))
        + extra
    )
    hdr += struct.pack("<H", md.crc32(hdr) & 0xFFFF)
    blob = hdr + deflated + struct.pack(
        "<II", md.crc32(raw), len(raw) & 0xFFFFFFFF
    )
    plain, meta, end = md.gunzip_member(blob)
    assert plain == raw and meta["crc_ok"] and meta["isize_ok"]
    assert end == len(blob)


def test_gunzip_corrupt_trailer_detected():
    blob = bytearray(gzip.compress(b"verify me", mtime=0))
    blob[-5] ^= 0xFF  # flip a CRC byte
    _, meta, _ = md.gunzip_member(bytes(blob))
    assert not meta["crc_ok"]
    with pytest.raises(md.DeflateError):
        md.gunzip(bytes(blob))


def test_gunzip_bad_magic_raises():
    with pytest.raises(md.DeflateError):
        md.gunzip_member(b"\x00\x00junk")


def test_crc32_matches_zlib():
    for blob in (b"", b"a", b"hello", bytes(range(256)) * 7):
        assert md.crc32(blob) == zlib.crc32(blob)


# ------------------------------------------------- spark gates (e2e)
def _docs(spark):
    import pandas as pd

    rows = pd.DataFrame(
        {
            "doc_id": list(range(12)),
            "text": [
                f"doc {i} " + ("lorem ipsum 店舗一覧 " * (7 * i + 1))
                for i in range(12)
            ],
        }
    )
    return spark.createDataFrame(rows)


def test_gzip_decode_gate(spark):
    from goto_eater_crawler_spark.operators import transfer as tx

    docs = _docs(spark)
    out = tx.gzip_decode_metadata(tx.synth_gzip_bodies(docs)).orderBy(
        "doc_id"
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(rows) == {0, 3, 6, 9}
    for d, r in rows.items():
        assert r["n_members"] == 1 + d % 2
        assert r["crc_ok"] and r["isize_ok"]
        assert r["text"] == texts[d]
        assert r["n_bytes"] == len(texts[d].encode("utf-8"))
        assert r["fname"] == (f"doc{d}.html" if d % 2 == 0 else None)


def test_gzip_decode_torn_payload_yields_null_row(spark):
    from goto_eater_crawler_spark.operators import transfer as tx

    bodies = spark.createDataFrame(
        [(1, bytearray(b"\x1f\x8b\x08\x00torn"))],
        "doc_id long, payload binary",
    )
    row = tx.gzip_decode_metadata(bodies).collect()[0]
    assert row["doc_id"] == 1 and row["n_members"] is None


def test_zstd_decode_gate(spark):
    from goto_eater_crawler_spark.operators import transfer as tx

    docs = _docs(spark)
    out = tx.zstd_decode_metadata(tx.synth_zstd_bodies(docs))
    rows = {r["doc_id"]: r for r in out.collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(rows) == {0, 3, 6, 9}
    for d, r in rows.items():
        assert r["n_frames"] == 1 + d % 2
        assert r["n_skippable"] == (1 if d % 4 == 0 else 0)
        assert r["checksum_ok"] is True
        assert r["text"] == texts[d]
        assert r["n_bytes"] == len(texts[d].encode("utf-8"))


def test_zstd_decode_torn_payload_yields_null_row(spark):
    from goto_eater_crawler_spark.operators import transfer as tx

    bodies = spark.createDataFrame(
        [(1, bytearray(b"\x28\xb5\x2f\xfdtorn"))],
        "doc_id long, payload binary",
    )
    row = tx.zstd_decode_metadata(bodies).collect()[0]
    assert row["doc_id"] == 1 and row["n_frames"] is None


def test_bz2_decode_gate(spark):
    from goto_eater_crawler_spark.operators import transfer as tx

    docs = _docs(spark)
    out = tx.bz2_decode_metadata(tx.synth_bz2_bodies(docs))
    rows = {r["doc_id"]: r for r in out.collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(rows) == {0, 3, 6, 9}
    for d, r in rows.items():
        raw = texts[d].encode("utf-8")
        assert r["n_streams"] == 1 + d % 2
        exp_blocks = (
            (1 if raw else 0)
            if d % 2 == 0
            else (1 if len(raw) // 2 else 0) + (1 if raw[len(raw) // 2:] else 0)
        )
        assert r["n_blocks"] == exp_blocks
        assert r["crc_ok"] is True
        assert r["text"] == texts[d]
        assert r["n_bytes"] == len(raw)


def test_xz_decode_gate(spark):
    from goto_eater_crawler_spark.operators import transfer as tx

    docs = _docs(spark)
    out = tx.xz_decode_metadata(tx.synth_xz_bodies(docs))
    rows = {r["doc_id"]: r for r in out.collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(rows) == {0, 3, 6, 9}
    checks = {0: "crc64", 1: "crc32", 2: "sha256", 3: "none"}
    for d, r in rows.items():
        assert r["n_streams"] == 1 + d % 2
        assert r["check_type"] == checks[d % 4]
        assert r["checks_ok"] is True
        assert r["text"] == texts[d]
        assert r["n_bytes"] == len(texts[d].encode("utf-8"))


def test_chunked_decode_gate(spark):
    from goto_eater_crawler_spark.operators import transfer as tx

    docs = _docs(spark)
    out = tx.chunked_decode_metadata(tx.synth_chunked_bodies(docs))
    rows = {r["doc_id"]: r for r in out.collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for d, r in rows.items():
        raw = texts[d].encode("utf-8")
        size = 256 + 64 * (d % 5)
        assert r["text"] == texts[d]
        assert r["n_bytes"] == len(raw)
        assert r["n_chunks"] == (len(raw) + size - 1) // size
        assert r["has_trailer"] == (d % 2 == 1)
