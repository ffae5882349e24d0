"""minibz2: round-trips stdlib ``bz2`` output (the real producer) at
levels 1/5/9 over text/random/run corpora, multi-block and
concatenated streams, plus corruption detection and the bzip2 CRC
variant."""

import bz2
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import minibz2 as mb


@pytest.mark.parametrize("level", [1, 5, 9])
def test_roundtrip_levels(level):
    rnd = random.Random(11)
    words = ["alpha", "beta", "restaurant", "営業時間", "bwt", "mtf"]
    payload = " ".join(rnd.choice(words) for _ in range(40000)).encode()
    comp = bz2.compress(payload, level)
    assert mb.bz2_decompress(comp) == payload
    (_, meta), = mb.bz2_streams(comp)
    assert meta["level"] == level and meta["crc_ok"]


def test_empty_and_tiny():
    for payload in (b"", b"x", b"abcd", b"aaaa\xff"):
        assert mb.bz2_decompress(bz2.compress(payload, 9)) == payload


def test_multiblock_level1():
    payload = b"The quick brown fox jumps. " * 30000  # ~800 KB
    comp = bz2.compress(payload, 1)  # 100 KB blocks → 8+ blocks
    assert mb.bz2_decompress(comp) == payload
    (_, meta), = mb.bz2_streams(comp)
    assert meta["n_blocks"] >= 5


def test_concatenated_streams():
    blob = bz2.compress(b"first|", 1) + bz2.compress(b"second", 9)
    assert mb.bz2_decompress(blob) == b"first|second"
    assert len(mb.bz2_streams(blob)) == 2


def test_rle1_heavy():
    # long identical runs exercise the 4+count RLE1 layer both ways
    payload = b"".join(
        bytes([b % 7]) * n for b, n in enumerate([3, 4, 5, 255, 259, 1000])
    )
    assert mb.bz2_decompress(bz2.compress(payload, 5)) == payload


def test_corruption_detected():
    comp = bytearray(bz2.compress(b"verify me " * 3000, 5))
    comp[len(comp) // 2] ^= 0xFF
    with pytest.raises(mb.Bz2Error):
        mb.bz2_decompress(bytes(comp))


def test_flipped_plaintext_crc_detected():
    # craft: decode, re-encode with a flipped CRC by flipping the
    # stored block CRC bits directly (bytes 10.. hold the first block
    # header); any flip inside the 32-bit CRC field must be caught
    comp = bytearray(bz2.compress(b"crc target " * 500, 9))
    # block CRC starts right after 4-byte header + 6-byte block magic
    comp[10] ^= 0x01
    with pytest.raises(mb.Bz2Error):
        mb.bz2_decompress(bytes(comp))


def test_bad_magic_raises():
    with pytest.raises(mb.Bz2Error):
        mb.bz2_decompress(b"NOPE1234")


def test_truncated_raises():
    comp = bz2.compress(b"truncate " * 2000, 5)
    with pytest.raises(mb.Bz2Error):
        mb.bz2_decompress(comp[: len(comp) // 2])


@given(st.integers(0, 10**9))
@settings(max_examples=40, deadline=None)
def test_roundtrip_fuzz(seed):
    rnd = random.Random(seed)
    n = rnd.randint(0, 30000)
    kind = rnd.choice(["text", "random", "runs", "binary-ish"])
    if kind == "text":
        payload = " ".join(
            rnd.choice(["the", "fox", "店舗", "12:00", "https://x.jp/"])
            for _ in range(n // 5)
        ).encode()
    elif kind == "random":
        payload = bytes(rnd.randrange(256) for _ in range(n))
    elif kind == "runs":
        payload = b"".join(
            bytes([rnd.randrange(8)]) * rnd.randint(1, 300)
            for _ in range(n // 60 + 1)
        )
    else:
        payload = bytes(rnd.choice([0, 0, 0, 255, 65, 66]) for _ in range(n))
    level = rnd.choice([1, 5, 9])
    assert mb.bz2_decompress(bz2.compress(payload, level)) == payload
