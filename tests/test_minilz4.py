"""minilz4: tested exclusively against the REAL producer — liblz4 via
pyarrow ("lz4" frames, "lz4_raw" bare blocks) — across the fast and
HC match searchers, plus frame-layer features (multi-block frames,
concatenated frames, skippable frames, the liblz4-written XXH32
header-checksum byte) and public XXH32 vectors."""

import random

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import minilz4 as ml


def _corpus(seed: int, n: int) -> bytes:
    rnd = random.Random(seed)
    words = ["the", "quick", "fox", "restaurant", "crawl", "lz4",
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


def test_xxh32_public_vectors():
    assert ml.xxh32(b"") == 0x02CC5D05
    assert ml.xxh32(b"a") == 0x550D7456
    assert ml.xxh32(b"", seed=1) == 0x0B2CB792
    # >=16 bytes exercises the 4-lane stripe path
    assert ml.xxh32(b"0123456789abcdef") == ml.xxh32(b"0123456789abcdef")
    assert ml.xxh32(b"0123456789abcdef") != ml.xxh32(b"0123456789abcdeg")


def test_header_checksum_is_a_real_cross_check():
    # liblz4 wrote the HC byte; our own XXH32 must re-derive it
    f = pa.compress(b"hello " * 100, codec="lz4", asbytes=True)
    assert ml.lz4_frames(f)[0][1]["header_ok"] is True
    bad = bytearray(f)
    # FLG is at offset 4; flip a used descriptor bit (block-indep)
    # so the stored HC no longer matches
    bad[4] ^= 0x20
    assert ml.lz4_frames(bytes(bad))[0][1]["header_ok"] is False


@pytest.mark.parametrize("level", [1, 4, 9, 12])
@pytest.mark.parametrize("seed", range(4))
def test_frame_roundtrip_levels(level, seed):
    raw = _corpus(seed * 7 + level, 30_000)
    codec = pa.Codec("lz4", compression_level=level)
    frames = ml.lz4_frames(codec.compress(raw, asbytes=True))
    assert len(frames) == 1
    content, meta = frames[0]
    assert content == raw
    assert meta["header_ok"] and meta["checksum_ok"]


def test_raw_block_roundtrip():
    for seed in range(6):
        raw = _corpus(seed, 20_000)
        comp = pa.compress(raw, codec="lz4_raw", asbytes=True)
        assert ml.block_decompress(comp) == raw


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=3000))
def test_frame_roundtrip_fuzz(raw):
    f = pa.compress(raw, codec="lz4", asbytes=True)
    frames = ml.lz4_frames(f)
    assert b"".join(c for c, _ in frames) == raw
    assert all(m["checksum_ok"] for _, m in frames)


def test_multi_block_frame():
    # > 64 KiB forces multiple blocks at liblz4's default BD code 4
    raw = _corpus(2, 1) + b"block " * 30_000  # ~180 KB
    frames = ml.lz4_frames(pa.compress(raw, codec="lz4", asbytes=True))
    content, meta = frames[0]
    assert content == raw
    assert meta["n_blocks"] == (len(raw) + 65535) // 65536


def test_concatenated_and_skippable_frames():
    a, b = b"first segment " * 300, b"second segment " * 300
    skip = (0x184D2A50).to_bytes(4, "little") + (4).to_bytes(4, "little") + b"meta"
    buf = (
        skip
        + pa.compress(a, codec="lz4", asbytes=True)
        + pa.compress(b, codec="lz4", asbytes=True)
    )
    frames = ml.lz4_frames(buf)
    assert [m["skippable"] for _, m in frames] == [True, False, False]
    assert b"".join(c for c, _ in frames) == a + b


def test_rejects_bad_magic_and_dict():
    with pytest.raises(ml.Lz4Error):
        ml.lz4_frames(b"\x00\x00\x00\x00")
    f = bytearray(pa.compress(b"x" * 100, codec="lz4", asbytes=True))
    f[4] |= 0x01  # set the DictID flag
    with pytest.raises(ml.Lz4Error):
        ml.lz4_frames(bytes(f))


def test_block_rejects_bad_offset():
    # token: 1 literal + match; offset 0 is invalid
    with pytest.raises(ml.Lz4Error):
        ml.block_decompress(bytes([0x10 | 4, ord("a"), 0, 0]))


def test_overlapping_match_rle():
    raw = b"B" * 50_000
    comp = pa.compress(raw, codec="lz4_raw", asbytes=True)
    assert ml.block_decompress(comp) == raw
