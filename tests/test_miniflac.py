"""miniflac: FLAC (RFC 9639) subset — lossless roundtrip fuzz,
decode-only surfaces (LPC, multi-partition Rice, wasted bits,
5-bit-param method), and integrity-check rejection."""

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import miniflac as fl
from goto_eater_crawler_spark.functions.miniwav import AudioFormatError


def _enc_dec(sr, chans, bits=16, blocksize=256):
    data = fl.flac_encode(sr, chans, bits=bits, blocksize=blocksize)
    dsr, dch, dbits, dchans = fl.flac_decode(data)
    assert (dsr, dch, dbits) == (sr, len(chans), bits)
    return data, dchans


@given(st.integers(0, 10**9))
@settings(max_examples=40, deadline=None)
def test_roundtrip_fuzz(seed):
    rnd = random.Random(seed)
    nch = rnd.choice([1, 1, 2, 2, 3])
    bits = rnd.choice([8, 16, 24])
    n = rnd.randint(1, 700)
    lim = 1 << (bits - 1)

    def clamp(v):
        return max(-lim, min(lim - 1, v))

    kind = rnd.choice(["const", "ramp", "noise", "small", "stereo_off"])
    chans = []
    for _ in range(nch):
        if kind == "const":
            ch = [rnd.randrange(-lim, lim)] * n
        elif kind == "ramp":
            b0, s = rnd.randrange(-100, 100), rnd.randrange(-3, 4)
            ch = [clamp(b0 + s * i) for i in range(n)]
        elif kind == "noise":
            ch = [rnd.randrange(-lim, lim) for _ in range(n)]
        elif kind == "small":
            ch = [clamp(rnd.randrange(-8, 8)) for _ in range(n)]
        elif not chans:
            ch = [clamp(rnd.randrange(-120, 120)) for _ in range(n)]
        else:
            off = rnd.randrange(-7, 8)
            ch = [clamp(x + off) for x in chans[0]]
        chans.append(ch)
    _, dchans = _enc_dec(rnd.choice([8000, 44100, 12345]), chans,
                         bits=bits, blocksize=rnd.choice([192, 256, 512]))
    assert dchans == chans


def test_left_side_constant_side():
    # right = left + const offset -> side subframe is CONSTANT; the
    # exact-cost chooser must pick a side assignment and reconstruct
    left = [100 + 3 * i + (5 if i % 2 == 0 else -5) for i in range(512)]
    right = [x - 17 for x in left]
    data, dchans = _enc_dec(8000, [left, right])
    assert dchans == [left, right]
    # at least one frame uses a side assignment (8, 9, or 10)
    r = fl._Reader(data, 4)
    r.u(1); r.u(7); r.u(24)
    for _ in range(34 * 8 // 8):
        r.u(8)
    r.u(14); r.u(1); r.u(1); r.u(4); r.u(4)
    assert r.u(4) in (8, 9, 10)


def test_multiframe_and_partial_tail():
    # 600 samples at blocksize 256 -> frames 256, 256, 88 (16-bit
    # end-of-header blocksize form on the tail)
    ch = [(i * 7) % 200 - 100 for i in range(600)]
    _, dchans = _enc_dec(48000, [ch])
    assert dchans == [ch]


def test_utf8_coded_number_multibyte():
    # >128 frames forces multi-byte coded frame numbers
    ch = [i % 64 for i in range(192 * 130)]
    _, dchans = _enc_dec(8000, [ch], blocksize=192)
    assert dchans == [ch]
    for n in (0, 127, 128, 2047, 2048, 65535, 1 << 30, (1 << 36) - 1):
        r = fl._Reader(fl._utf8_encode(n))
        assert fl._utf8_decode(r) == n


def _handmade_stream(subframe_writer, n=16, sr=8000, bits=16):
    """One-frame mono stream whose subframe bits are written by
    `subframe_writer(w)`; STREAMINFO MD5 zeroed (skip check)."""
    w = fl._Writer()
    w.u(1, 1)
    w.u(7, 0)
    w.u(24, 34)
    w.u(16, n)
    w.u(16, n)
    w.u(24, 0)
    w.u(24, 0)
    w.u(20, sr)
    w.u(3, 0)
    w.u(5, bits - 1)
    w.u(36, n)
    meta = w.to_bytes() + b"\0" * 16

    w = fl._Writer()
    w.u(14, fl._SYNC)
    w.u(2, 0)
    w.u(4, 7)          # 16-bit blocksize at end of header
    w.u(4, 0)          # sample rate from STREAMINFO
    w.u(4, 0)          # mono
    w.u(3, 4)          # 16-bit samples
    w.u(1, 0)
    w.u(8, 0)          # frame number 0
    w.u(16, n - 1)
    hdr = w.to_bytes()
    w.u(8, fl._crc8(hdr))
    subframe_writer(w)
    w.align()
    body = w.to_bytes()
    return b"fLaC" + meta + body + fl._crc16(body).to_bytes(2, "big")


def test_lpc_subframe_decode():
    # LPC order 2, coefs (2, -1) at shift 0 == the fixed order-2
    # predictor; residuals hand-coded -> decoder must reconstruct the
    # quadratic-ish series (decode-only surface: encoder never emits LPC)
    warm = [10, 13]
    resid = [1, -2, 0, 3, -1, 0, 2, -3, 1, 0, -1, 2, 0, 1]

    def sub(w):
        w.u(1, 0)
        w.u(6, 0b100001)   # LPC order 2
        w.u(1, 0)          # no wasted bits
        w.s(16, warm[0])
        w.s(16, warm[1])
        w.u(4, 14)         # precision 15
        w.s(5, 0)          # shift 0
        w.s(15, 2)
        w.s(15, -1)
        fl._write_residual(w, resid)

    data = _handmade_stream(sub, n=16)
    _, _, _, chans = fl.flac_decode(data)
    exp = list(warm)
    for r in resid:
        exp.append(r + 2 * exp[-1] - exp[-2])
    assert chans == [exp]


def test_multipartition_and_method1_decode():
    # residual split across 4 partitions with distinct 5-bit params
    # (method 1) and one raw-escape partition
    samples = [i * 3 for i in range(16)]  # order-1 residual = 3 each

    def sub(w):
        w.u(1, 0)
        w.u(6, 0b001001)   # FIXED order 1
        w.u(1, 0)
        w.s(16, samples[0])
        resid = [3] * 15
        w.u(2, 1)          # method 1: 5-bit params
        w.u(4, 2)          # partition order 2 -> 4 partitions of 4
        chunks = [resid[:3], resid[3:7], resid[7:11], resid[11:15]]
        for i, chunk in enumerate(chunks):
            if i == 2:
                w.u(5, 31)  # escape
                w.u(5, 4)   # 4-bit raw signed residuals
                for v in chunk:
                    w.s(4, v)
            else:
                k = i  # varied rice params
                w.u(5, k)
                for v in chunk:
                    u = fl._zigzag(v)
                    w.unary(u >> k)
                    if k:
                        w.u(k, u & ((1 << k) - 1))

    data = _handmade_stream(sub, n=16)
    _, _, _, chans = fl.flac_decode(data)
    assert chans == [samples]


def test_wasted_bits_decode():
    # all samples share a factor of 4 -> wasted=2, subframe coded at
    # bits-2 and shifted back up on output
    vals = [4 * v for v in (5, 9, -3, 7, 0, 1, -8, 2, 6, -1, 3, 4, -2, 8,
                            7, -5)]

    def sub(w):
        w.u(1, 0)
        w.u(6, 1)          # VERBATIM
        w.u(1, 1)          # wasted-bits flag
        w.u(2, 1)          # unary 1 -> wasted = 2
        for v in vals:
            w.s(14, v >> 2)

    data = _handmade_stream(sub, n=16)
    _, _, _, chans = fl.flac_decode(data)
    assert chans == [vals]


def test_integrity_rejection():
    ch = [(i * 11) % 100 for i in range(300)]
    data = bytearray(fl.flac_encode(8000, [ch]))
    # flip a bit inside the first frame body -> CRC-16 (or MD5) trips
    with pytest.raises(AudioFormatError):
        bad = bytearray(data)
        bad[60] ^= 0x10
        fl.flac_decode(bytes(bad))
    # truncation -> overrun
    with pytest.raises(AudioFormatError):
        fl.flac_decode(bytes(data[:-10]))
    # bad magic
    with pytest.raises(AudioFormatError):
        fl.flac_decode(b"fLaX" + bytes(data[4:]))
    # MD5 corruption (metadata area, frames untouched)
    with pytest.raises(AudioFormatError, match="MD5"):
        bad = bytearray(data)
        bad[4 + 4 + 18] ^= 0xFF  # first MD5 byte
        fl.flac_decode(bytes(bad))


def test_compression_is_real():
    # structured inputs must compress well below raw PCM size
    saw = [100 + (3 if i % 2 else -3) for i in range(4096)]
    assert len(fl.flac_encode(44100, [saw])) < 4096 * 2 / 3
    ramp = [-3000 + 2 * i for i in range(4096)]  # zero order-2 residual
    assert len(fl.flac_encode(44100, [ramp])) < 4096 * 2 / 10


def test_wide_residual_32bit_noise():
    # 32-bit noise forces zigzag widths past the 5-bit escape field's
    # 31-bit cap; the encoder must stay on the Rice path there
    rnd = random.Random(3)
    lim = 1 << 31
    ch = [rnd.randrange(-lim, lim) for _ in range(200)]
    data = fl.flac_encode(44100, [ch], bits=32)
    _, _, dbits, dchans = fl.flac_decode(data)
    assert dbits == 32 and dchans == [ch]
