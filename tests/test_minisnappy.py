"""minisnappy: tested exclusively against the REAL producer —
libsnappy via pyarrow — over text/random/run/json corpora, plus the
framing format (stream identifier, padding/skippable chunks, masked
CRC-32C verification) and the public CRC-32C check value."""

import random

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import minisnappy as ms


def _corpus(seed: int, n: int) -> bytes:
    rnd = random.Random(seed)
    words = ["the", "quick", "fox", "restaurant", "crawl", "snappy",
             "店舗", "一覧", "https://example.com/p?q=1", "12:00"]
    kind = rnd.choice(["text", "random", "runs", "json"])
    if kind == "text":
        return " ".join(rnd.choice(words) for _ in range(n // 5)).encode()
    if kind == "random":
        return bytes(rnd.randrange(256) for _ in range(n))
    if kind == "runs":
        return b"".join(
            bytes([rnd.randrange(256)]) * rnd.randint(1, 200)
            for _ in range(n // 50 + 1)
        )
    return b"".join(
        b'{"id":%d,"h":"h%d"}\n' % (i, i % 37) for i in range(n // 20 + 1)
    )


def test_crc32c_check_value():
    # the public CRC-32C (Castagnoli) check value, e.g. RFC 3720 §B.4
    assert ms.crc32c(b"123456789") == 0xE3069283
    assert ms.crc32c(b"") == 0
    # 32 bytes of zeros, RFC 3720 test vector
    assert ms.crc32c(b"\x00" * 32) == 0x8A9136AA


@pytest.mark.parametrize("seed", range(8))
def test_raw_roundtrip_real_producer(seed):
    raw = _corpus(seed, 40_000)
    comp = pa.compress(raw, codec="snappy", asbytes=True)
    assert ms.uncompress(comp) == raw


def test_raw_edge_sizes():
    for raw in (b"", b"a", b"ab", b"x" * 70_000, b"abcd" * 30_000):
        comp = pa.compress(raw, codec="snappy", asbytes=True)
        assert ms.uncompress(comp) == raw


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=3000))
def test_raw_roundtrip_fuzz(raw):
    comp = pa.compress(raw, codec="snappy", asbytes=True)
    assert ms.uncompress(comp) == raw


def test_framed_roundtrip_with_padding_and_split():
    raw = _corpus(3, 30_000)
    mid = len(raw) // 2
    stream = ms.frame([raw[:mid], raw[mid:]], pad=7)
    chunks = ms.framed_chunks(stream)
    assert len(chunks) == 2
    assert b"".join(c for c, _ in chunks) == raw
    assert all(m["crc_ok"] for _, m in chunks)


def test_framed_uncompressed_chunk_path():
    # incompressible data: the writer must fall back to an
    # uncompressed (0x01) chunk per framing_format.txt
    rnd = random.Random(9)
    raw = bytes(rnd.randrange(256) for _ in range(5000))
    stream = ms.frame([raw])
    chunks = ms.framed_chunks(stream)
    assert chunks[0][1]["compressed"] is False
    assert chunks[0][0] == raw


def test_framed_crc_mismatch_detected():
    raw = b"hello snappy framing " * 50
    stream = bytearray(ms.frame([raw]))
    # flip one bit inside the chunk's stored CRC (bytes 4..8 of the
    # first data chunk, which follows the 10-byte stream-id chunk)
    stream[10 + 4] ^= 0x01
    chunks = ms.framed_chunks(bytes(stream))
    assert chunks[0][1]["crc_ok"] is False


def test_framed_rejects_missing_stream_id():
    with pytest.raises(ms.SnappyError):
        ms.framed_chunks(b"\x00\x05\x00\x00xxxxx")


def test_framed_rejects_reserved_unskippable():
    stream = ms.frame([b"ok"]) + b"\x02\x01\x00\x00z"
    with pytest.raises(ms.SnappyError):
        ms.framed_chunks(stream)


def test_raw_rejects_bad_offset_and_length():
    # copy with offset 0 is structurally invalid
    with pytest.raises(ms.SnappyError):
        ms.uncompress(bytes([4, 0b000001_01, 0]))
    # declared length != produced length
    good = bytearray(pa.compress(b"abcabcabc", codec="snappy", asbytes=True))
    good[0] += 1  # bump the varint preamble
    with pytest.raises(ms.SnappyError):
        ms.uncompress(bytes(good))


def test_overlapping_copy_rle():
    # libsnappy encodes long runs as overlapping copies (off < len);
    # pin the RLE walk explicitly
    raw = b"A" * 10_000
    comp = pa.compress(raw, codec="snappy", asbytes=True)
    assert ms.uncompress(comp) == raw


def test_raw_block_starting_with_ff_not_misrouted(spark):
    # a raw block whose uncompressed length is 127 mod 128 has 0xff
    # as its first varint byte — the gate dispatch must NOT route it
    # to the framing parser (regression: sf0.001 doc lengths hit this)
    from goto_eater_crawler_spark.operators import transfer as tx

    text = "x" * 255  # 255 % 128 == 127
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    row = tx.snappy_decode_metadata(tx.synth_snappy_bodies(docs)).collect()[0]
    assert row["framed"] is False and row["n_bytes"] == 255
    assert row["text"] == text
