"""minilzma: round-trips REAL producer output — stdlib ``lzma`` and
the xz CLI — across presets, check types (CRC32/CRC64/SHA-256/none,
all verified by our own implementations), custom lc/lp/pb filter
parameters, multi-block and threaded streams, FORMAT_ALONE, and
corruption/truncation detection."""

import lzma
import random
import subprocess

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import minilzma as ml

XZ_BIN = "/root/miniconda/bin/xz"


def _corpus(seed: int, n: int) -> bytes:
    rnd = random.Random(seed)
    kind = rnd.choice(["text", "random", "runs", "json"])
    if kind == "text":
        words = ["the", "fox", "restaurant", "店舗", "https://x.jp/?q=1"]
        return " ".join(rnd.choice(words) for _ in range(n // 5)).encode()
    if kind == "random":
        return bytes(rnd.randrange(256) for _ in range(n))
    if kind == "runs":
        return b"".join(
            bytes([rnd.randrange(9)]) * rnd.randint(1, 250)
            for _ in range(n // 60 + 1)
        )
    return b"".join(
        b'{"id":%d,"h":"h%d"}\n' % (i, i % 41) for i in range(n // 20 + 1)
    )


@pytest.mark.parametrize("preset", [0, 1, 6, 9, 9 | lzma.PRESET_EXTREME])
def test_xz_roundtrip_presets(preset):
    payload = _corpus(31, 300000)
    assert ml.xz_decompress(lzma.compress(payload, preset=preset)) == payload


@pytest.mark.parametrize(
    "check,name",
    [
        (lzma.CHECK_NONE, "none"),
        (lzma.CHECK_CRC32, "crc32"),
        (lzma.CHECK_CRC64, "crc64"),
        (lzma.CHECK_SHA256, "sha256"),
    ],
)
def test_check_types_verified(check, name):
    payload = _corpus(5, 80000)
    comp = lzma.compress(payload, check=check)
    (content, meta), = ml.xz_streams(comp)
    assert content == payload
    assert meta["check"] == name and meta["checks_ok"] is True


@pytest.mark.parametrize(
    "lc,lp,pb", [(0, 0, 0), (4, 0, 2), (0, 2, 0), (3, 1, 2), (0, 4, 2)]
)
def test_custom_literal_context_params(lc, lp, pb):
    payload = _corpus(7, 120000)
    filt = [{"id": lzma.FILTER_LZMA2, "preset": 6,
             "lc": lc, "lp": lp, "pb": pb}]
    comp = lzma.compress(payload, format=lzma.FORMAT_XZ, filters=filt)
    assert ml.xz_decompress(comp) == payload


def test_empty_and_tiny():
    for payload in (b"", b"x", b"abc"):
        assert ml.xz_decompress(lzma.compress(payload)) == payload


def test_multiblock_cli():
    payload = _corpus(13, 600000)
    comp = subprocess.run(
        [XZ_BIN, "--block-size=65536", "-6", "-c"],
        input=payload, capture_output=True,
    ).stdout
    assert ml.xz_decompress(comp) == payload
    (_, meta), = ml.xz_streams(comp)
    assert meta["n_blocks"] >= 8  # size fields + index all cross-checked


def test_threaded_cli_stream():
    payload = _corpus(23, 500000)
    comp = subprocess.run(
        [XZ_BIN, "-T4", "--block-size=65536", "-c"],
        input=payload, capture_output=True,
    ).stdout
    assert ml.xz_decompress(comp) == payload


def test_concatenated_streams_with_padding():
    blob = lzma.compress(b"one|") + b"\x00" * 8 + lzma.compress(b"two")
    assert ml.xz_decompress(blob) == b"one|two"
    assert len(ml.xz_streams(blob)) == 2


@pytest.mark.parametrize("preset", [0, 6, 9])
def test_format_alone(preset):
    payload = _corpus(3, 90000)
    comp = lzma.compress(payload, format=lzma.FORMAT_ALONE, preset=preset)
    assert ml.lzma_alone_decompress(comp) == payload


def test_corruption_detected():
    comp = bytearray(lzma.compress(_corpus(1, 60000)))
    comp[len(comp) // 2] ^= 0xFF
    with pytest.raises(ml.LzmaError):
        ml.xz_decompress(bytes(comp))


def test_truncated_raises():
    comp = lzma.compress(_corpus(2, 60000))
    with pytest.raises(ml.LzmaError):
        ml.xz_decompress(comp[: len(comp) // 2])


def test_bad_magic_raises():
    with pytest.raises(ml.LzmaError):
        ml.xz_decompress(b"\x00\x01\x02\x03\x04\x05junk")


def test_crc64_vector():
    # ECMA-182 reflected check value for the standard 9-byte probe
    assert ml.crc64(b"123456789") == 0x995DC9BBDF1939FA


@given(st.integers(0, 10**9))
@settings(max_examples=30, deadline=None)
def test_roundtrip_fuzz(seed):
    rnd = random.Random(seed)
    payload = _corpus(seed, rnd.randint(0, 20000))
    preset = rnd.choice([0, 1, 6, 9])
    if rnd.random() < 0.3:
        comp = lzma.compress(payload, format=lzma.FORMAT_ALONE,
                             preset=preset)
        assert ml.lzma_alone_decompress(comp) == payload
    else:
        check = rnd.choice([lzma.CHECK_NONE, lzma.CHECK_CRC32,
                            lzma.CHECK_CRC64, lzma.CHECK_SHA256])
        comp = lzma.compress(payload, preset=preset, check=check)
        assert ml.xz_decompress(comp) == payload
