"""minizstd: tested exclusively against REAL producers — the zstd
CLI and libzstd via ctypes — at levels spanning --fast/default/max,
plus frame-layer features (concatenated frames, skippable frames,
checksum verification, dictionary rejection) and XXH64 vectors."""

import ctypes
import random
import subprocess

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import minizstd as mz

ZSTD_BIN = "/root/miniconda/bin/zstd"


def _cli(payload: bytes, *args: str) -> bytes:
    return subprocess.run(
        [ZSTD_BIN, *args, "-c"], input=payload, capture_output=True
    ).stdout


_LIB = None


def _lib_compress(payload: bytes, level: int, checksum: bool = True) -> bytes:
    global _LIB
    if _LIB is None:
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
        lib.ZSTD_isError.restype = ctypes.c_uint
        lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
        _LIB = lib
    lib = _LIB
    cctx = lib.ZSTD_createCCtx()
    lib.ZSTD_CCtx_setParameter(cctx, 100, level)  # ZSTD_c_compressionLevel
    lib.ZSTD_CCtx_setParameter(cctx, 201, int(checksum))  # checksumFlag
    bound = lib.ZSTD_compressBound(len(payload))
    dst = ctypes.create_string_buffer(bound)
    n = lib.ZSTD_compress2(cctx, dst, bound, payload, len(payload))
    assert not lib.ZSTD_isError(n)
    return dst.raw[:n]


def _corpus(seed: int, n: int) -> bytes:
    rnd = random.Random(seed)
    words = ["the", "quick", "fox", "restaurant", "crawl", "zstd",
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


@pytest.mark.parametrize("level", ["-1", "-5", "-12", "-19", "--fast=5"])
def test_cli_roundtrip_levels(level):
    rnd = random.Random(13)
    words = ["alpha", "beta", "gamma", "営業時間", "block", "frame"]
    payload = " ".join(rnd.choice(words) for _ in range(60000)).encode()
    comp = _cli(payload, level)
    assert mz.zstd_decompress(comp) == payload
    (content, meta), = mz.zstd_frames(comp)
    assert meta["checksum_ok"] is True  # real XXH64 vs ours


def test_cli_multiblock_and_long_window():
    payload = _corpus(99, 700000)  # > 5 blocks of 128 KiB
    for args in (["-19"], ["-12", "--long=20"]):
        assert mz.zstd_decompress(_cli(payload, *args)) == payload


def test_empty_and_tiny():
    for payload in (b"", b"x", b"ab"):
        assert mz.zstd_decompress(_cli(payload, "-3")) == payload


def test_concatenated_and_skippable_frames():
    a, b = b"first part|" * 50, b"second part" * 80
    skip = (0x184D2A5F).to_bytes(4, "little") + (7).to_bytes(
        4, "little"
    ) + b"padding"
    blob = _cli(a, "-9") + skip + _cli(b, "-1")
    assert mz.zstd_decompress(blob) == a + b
    frames = mz.zstd_frames(blob)
    assert [m["skippable"] for _, m in frames] == [False, True, False]


def test_no_checksum_frame():
    payload = b"no check " * 400
    comp = _cli(payload, "-9", "--no-check")
    (content, meta), = mz.zstd_frames(comp)
    assert content == payload and meta["checksum_ok"] is None


def test_corrupt_payload_detected():
    payload = _corpus(5, 50000)
    comp = bytearray(_cli(payload, "-9"))
    comp[len(comp) // 2] ^= 0xFF
    with pytest.raises(mz.ZstdError):
        mz.zstd_decompress(bytes(comp))


def test_truncated_raises():
    comp = _cli(b"truncate me " * 500, "-9")
    with pytest.raises(mz.ZstdError):
        mz.zstd_decompress(comp[: len(comp) // 2])


def test_bad_magic_raises():
    with pytest.raises(mz.ZstdError):
        mz.zstd_decompress(b"\x00\x00\x00\x00junk")


def test_dictionary_frame_rejected():
    # magic + FHD(did_flag=1) + window descriptor + nonzero dict id
    blob = (0xFD2FB528).to_bytes(4, "little") + bytes([0x01, 0x00, 0x05])
    with pytest.raises(mz.ZstdError, match="dictionaries"):
        mz.decode_frame(blob)


def test_fcs_mismatch_detected():
    # one-shot libzstd writes the Frame_Content_Size (the CLI in pipe
    # mode doesn't know it); locate the FCS field from the FHD flags
    # and corrupt it — content still decodes, size check must fire
    comp = bytearray(_lib_compress(b"q" * 300, 1, checksum=False))
    fhd = comp[4]
    _, meta, _ = mz.decode_frame(bytes(comp))
    assert meta["fcs"] == 300, "precondition: frame carries FCS"
    off = 5 + (0 if fhd & 0x20 else 1)  # skip window descriptor
    comp[off] ^= 0x01
    with pytest.raises(mz.ZstdError, match="content size"):
        mz.decode_frame(bytes(comp))


def test_xxh64_known_vectors():
    # the canonical empty-input vector from the xxHash spec
    assert mz.xxh64(b"") == 0xEF46DB3751D8E999
    # cross-check longer inputs against the real implementation via
    # the CLI's frame checksum (every CLI round-trip above asserts
    # checksum_ok, which compares our XXH64 to libzstd's)
    payload = bytes(range(256)) * 40
    (_, meta), = mz.zstd_frames(_cli(payload, "-1"))
    assert meta["checksum_ok"] is True


@given(st.integers(0, 10**9))
@settings(max_examples=40, deadline=None)
def test_lib_roundtrip_fuzz(seed):
    rnd = random.Random(seed)
    payload = _corpus(seed, rnd.randint(0, 30000))
    level = rnd.choice([-5, -1, 1, 3, 9, 15, 19])
    comp = _lib_compress(payload, level, checksum=rnd.random() < 0.7)
    assert mz.zstd_decompress(comp) == payload
