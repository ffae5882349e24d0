"""minih264 codec contract: Exp-Golomb and NAL/emulation-prevention
machinery, LOSSLESS I_PCM roundtrips (the property the closed-form
DuckDB oracle for multimodal_h264_decode depends on), frame
cropping, hostile PCM byte patterns that force escaping, and the
documented rejection surface (CABAC, non-I_PCM macroblocks, inter
slices, interlace).

Unlike minivp8/miniwebp there is NO self-consistency caveat here:
I_PCM streams carry only spec-defined bit syntax (Rec. H.264
§7.3-7.4), no implementation-chosen tables.

No reference analogue (the reference crawler decodes no video);
build-spec frontier for the multimodal family.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import minih264 as h264
from goto_eater_crawler_spark.functions.miniimg import ImageFormatError

# ---------------------------------------------------------------------------
# bit syntax
# ---------------------------------------------------------------------------


@given(st.lists(st.integers(0, 2**20), max_size=50),
       st.lists(st.integers(-2**18, 2**18), max_size=50))
@settings(max_examples=60, deadline=None)
def test_exp_golomb_roundtrip(ues, ses):
    w = h264.BitWriter()
    for v in ues:
        w.ue(v)
    for v in ses:
        w.se(v)
    w.rbsp_trailing()
    r = h264.BitReader(w.to_bytes())
    assert [r.ue() for _ in ues] == ues
    assert [r.se() for _ in ses] == ses


@given(st.binary(max_size=300))
@settings(max_examples=80, deadline=None)
def test_emulation_prevention_roundtrip(payload):
    ebsp = h264.rbsp_to_ebsp(payload)
    # no start-code or escape-eligible pattern may survive in EBSP
    for i in range(len(ebsp) - 2):
        if ebsp[i] == 0 and ebsp[i + 1] == 0:
            assert ebsp[i + 2] > 3, ebsp[i:i + 3]
    assert h264.ebsp_to_rbsp(ebsp) == payload


def test_more_rbsp_data_stop_bit():
    w = h264.BitWriter()
    w.ue(3)
    w.rbsp_trailing()
    r = h264.BitReader(w.to_bytes())
    assert r.more_rbsp_data()
    assert r.ue() == 3
    assert not r.more_rbsp_data()


# ---------------------------------------------------------------------------
# lossless roundtrip
# ---------------------------------------------------------------------------


@given(st.integers(0, 10**9))
@settings(max_examples=20, deadline=None)
def test_ipcm_roundtrip_lossless(seed):
    rnd = random.Random(seed)
    w = 2 * rnd.randrange(8, 25)   # even, 16..48, incl. non-MB-aligned
    h = 2 * rnd.randrange(8, 17)
    # bias toward 0x00/0x01/0x03 to stress emulation prevention
    pick = lambda: rnd.choice([0, 0, 1, 2, 3, 255, rnd.randrange(256)])
    y = [[pick() for _ in range(w)] for _ in range(h)]
    u = [[pick() for _ in range(w // 2)] for _ in range(h // 2)]
    v = [[pick() for _ in range(w // 2)] for _ in range(h // 2)]
    data = h264.h264_encode_ipcm(w, h, y, u, v)
    W, H, dy, du, dv = h264.h264_decode(data)
    assert (W, H) == (w, h)
    assert dy == y and du == u and dv == v


def test_cropping_non_mb_aligned():
    y = [[x % 256 for x in range(36)] for _ in range(20)]
    u = [[7] * 18 for _ in range(10)]
    v = [[9] * 18 for _ in range(10)]
    data = h264.h264_encode_ipcm(36, 20, y, u, v)
    W, H, dy, du, dv = h264.h264_decode(data)
    assert (W, H) == (36, 20)
    assert dy == y and du == u and dv == v
    with pytest.raises(ValueError, match="even"):
        h264.h264_encode_ipcm(15, 16, [[0] * 15] * 16, [[0] * 7] * 8,
                              [[0] * 7] * 8)


# ---------------------------------------------------------------------------
# rejection surface
# ---------------------------------------------------------------------------


def _flip_pps_cabac(data: bytes) -> bytes:
    # rebuild the stream with entropy_coding_mode_flag = 1
    units = h264.split_annexb(data)
    out = bytearray()
    for ebsp in units:
        rbsp = h264.ebsp_to_rbsp(ebsp)
        if rbsp[0] & 0x1F == 8:
            body = bytearray(rbsp[1:])
            # pps_id=0 -> '1', sps_id=0 -> '1', then the cabac flag is
            # bit 2 of the first byte (MSB-first): set it
            body[0] |= 0x20
            rbsp = rbsp[:1] + bytes(body)
        out += b"\x00\x00\x00\x01" + h264.rbsp_to_ebsp(rbsp)
    return bytes(out)


def test_error_modes():
    good = h264.h264_encode_ipcm(16, 16, [[9] * 16] * 16, [[1] * 8] * 8,
                                 [[2] * 8] * 8)
    with pytest.raises(ImageFormatError, match="start code"):
        h264.h264_decode(b"\xff" * 12)
    with pytest.raises(ImageFormatError, match="CABAC"):
        h264.h264_decode(_flip_pps_cabac(good))
    # slice before its PPS/SPS
    units = h264.split_annexb(good)
    idr_only = b"\x00\x00\x00\x01" + units[2]
    with pytest.raises(ImageFormatError, match="unknown PPS"):
        h264.h264_decode(idr_only)
    # truncated PCM samples
    with pytest.raises(ImageFormatError):
        h264.h264_decode(good[:len(good) // 2])
