"""minivp8 codec contract: the bool coder (exact interval arithmetic
vs the RFC 6386 §7.3 window decoder), flat-frame EXACTNESS through
the full lossy pipeline (the property the closed-form DuckDB oracle
for multimodal_webp_lossy_decode depends on), decode ==
encoder-simulated reconstruction on arbitrary content (so every
divergence between the two interpretations of the spec is a test
failure, not silent drift), transform identities, header fields,
and error modes.

No reference analogue (the reference crawler decodes no images);
build-spec frontier for the multimodal family. The module docstring
documents the self-consistency caveat (no native libvpx in this
sandbox).
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import minivp8 as vp8
from goto_eater_crawler_spark.functions.miniimg import (
    ImageFormatError,
    decode_image,
)

# ---------------------------------------------------------------------------
# bool coder
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(st.integers(1, 255), st.integers(0, 1)),
        max_size=400,
    )
)
@settings(max_examples=80, deadline=None)
def test_bool_coder_roundtrip(seq):
    bw = vp8.BoolEncoder()
    for p, b in seq:
        bw.put(p, b)
    bd = vp8.BoolDecoder(bw.to_bytes())
    assert [bd.get(p) for p, _ in seq] == [b for _, b in seq]


def test_bool_coder_literals_and_empty():
    bw = vp8.BoolEncoder()
    bw.literal(7, 93)
    bw.literal(8, 255)
    bw.literal(1, 0)
    bd = vp8.BoolDecoder(bw.to_bytes())
    assert (bd.literal(7), bd.literal(8), bd.literal(1)) == (93, 255, 0)
    # empty partition still emits a decodable (>= 2 byte) stream
    assert len(vp8.BoolEncoder().to_bytes()) >= 2


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def test_idct_dc_only_identity():
    # DC-only coefficient D reconstructs the constant (D + 4) >> 3 —
    # the algebra the flat-MB closed form uses
    for d in (-2048, -8, 0, 8, 64, 2040):
        blk = [0] * 16
        blk[0] = d
        assert vp8.idct4x4(blk) == [(d + 4) >> 3] * 16


def test_iwht_dc_only_identity():
    for w in (-512, -64, 0, 64, 512):
        blk = [0] * 16
        blk[0] = w
        assert vp8.iwht4x4(blk) == [(w + 3) >> 3] * 16


def test_flat_wht_roundtrip():
    # fwht pairs iwht exactly on flat inputs: iwht(fwht(d*16)) == d*16
    for d in (-400, -8, 0, 8, 120, 400):
        assert vp8.iwht4x4(vp8.fwht4x4([d] * 16)) == [d] * 16


@given(st.lists(st.integers(-255, 255), min_size=16, max_size=16))
@settings(max_examples=60, deadline=None)
def test_wht_roundtrip_near_exact(vals):
    # general WHT roundtrip is exact up to the (x+1)>>1 / (x+3)>>3
    # rounding — bounded by 1
    back = vp8.iwht4x4(vp8.fwht4x4(vals))
    assert all(abs(a - b) <= 1 for a, b in zip(back, vals))


def test_fdct_flat_is_dc_only():
    for r in (-128, -3, 0, 5, 127):
        co = vp8.fdct4x4([r] * 16)
        assert co[0] == 8 * r
        assert co[1:] == [0] * 15


# ---------------------------------------------------------------------------
# frame codec: flat exactness + simulated-recon contract
# ---------------------------------------------------------------------------


@given(
    st.integers(1, 3),  # mb cols
    st.integers(1, 2),  # mb rows
    st.integers(0, 255),  # y tone
    st.integers(0, 127),  # u tone / 2
    st.integers(0, 127),  # v tone / 2
    st.sampled_from([vp8.DC_PRED, vp8.TM_PRED]),
)
@settings(max_examples=40, deadline=None)
def test_flat_frame_exact(mc, mr, yv, ut, vt, ymode):
    # flat frames survive the LOSSY pipeline exactly at qindex 0:
    # Y rides the Y2/WHT path (Qy2 = 8r, no parity constraint), chroma
    # DCs need even residuals (even tones)
    w, h = 16 * mc, 16 * mr
    uv_, vv = 2 * ut, 2 * vt
    y = [[yv] * w for _ in range(h)]
    u = [[uv_] * (w // 2) for _ in range(h // 2)]
    v = [[vv] * (w // 2) for _ in range(h // 2)]
    frame, ry, ru, rv = vp8.vp8_frame_encode(
        w, h, y, u, v, qindex=0, y_mode=ymode
    )
    assert ry == y and ru == u and rv == v
    dw, dh, dy, du, dv = vp8.vp8_frame_decode(frame)
    assert (dw, dh) == (w, h)
    assert dy == y and du == u and dv == v


@given(
    st.integers(0, 10**9),
    st.sampled_from([0, 10, 40, 90, 127]),
    st.sampled_from([vp8.DC_PRED, vp8.V_PRED, vp8.H_PRED, vp8.TM_PRED]),
    st.sampled_from([vp8.DC_PRED, vp8.V_PRED, vp8.H_PRED, vp8.TM_PRED]),
)
@settings(max_examples=25, deadline=None)
def test_decode_matches_simulated_recon(seed, qi, ym, um):
    # arbitrary content: the decoder must land on the encoder's own
    # simulated reconstruction BIT-EXACTLY — drives AC tokens, all six
    # extra-bit categories, signs, zero runs, skip MBs, and the
    # nonzero-context machinery
    rnd = random.Random(seed)
    w, h = 16 * rnd.randrange(1, 4), 16 * rnd.randrange(1, 3)
    y = [[rnd.randrange(256) for _ in range(w)] for _ in range(h)]
    u = [[rnd.randrange(256) for _ in range(w // 2)] for _ in range(h // 2)]
    v = [[rnd.randrange(256) for _ in range(w // 2)] for _ in range(h // 2)]
    frame, ry, ru, rv = vp8.vp8_frame_encode(
        w, h, y, u, v, qindex=qi, y_mode=ym, uv_mode=um
    )
    dw, dh, dy, du, dv = vp8.vp8_frame_decode(frame)
    assert (dw, dh) == (w, h)
    assert dy == ry and du == ru and dv == rv


def test_low_qindex_bounds_error():
    # qindex 0 (quant step 4): reconstruction error on arbitrary
    # content stays within a few levels
    rnd = random.Random(42)
    w = h = 32
    y = [[rnd.randrange(256) for _ in range(w)] for _ in range(h)]
    u = [[rnd.randrange(256) for _ in range(16)] for _ in range(16)]
    v = [[rnd.randrange(256) for _ in range(16)] for _ in range(16)]
    _, ry, _, _ = vp8.vp8_frame_encode(w, h, y, u, v, qindex=0)
    err = max(abs(a - b) for ra, rb in zip(y, ry) for a, b in zip(ra, rb))
    assert err <= 6


def test_non_mb_aligned_crops():
    y = [[37] * 20 for _ in range(20)]
    u = [[90] * 10 for _ in range(10)]
    v = [[180] * 10 for _ in range(10)]
    frame, ry, _, _ = vp8.vp8_frame_encode(20, 20, y, u, v)
    dw, dh, dy, du, dv = vp8.vp8_frame_decode(frame)
    assert (dw, dh) == (20, 20)
    assert len(dy) == 20 and len(dy[0]) == 20
    assert len(du) == 10 and len(du[0]) == 10
    assert dy == ry == y  # flat non-aligned still exact (edge padding)


def test_skip_and_nonskip_mix():
    # left MB carries coefficients, right MB is flat-equal to its
    # neighborhood -> skip path; both decode exactly under DC_PRED
    w, h = 32, 16
    y = [[60] * w for _ in range(h)]
    u = [[100] * 16 for _ in range(8)]
    v = [[200] * 16 for _ in range(8)]
    frame, ry, ru, rv = vp8.vp8_frame_encode(w, h, y, u, v, qindex=0)
    _, _, dy, du, dv = vp8.vp8_frame_decode(frame)
    assert dy == y and du == u and dv == v


# ---------------------------------------------------------------------------
# header + container + dispatch + errors
# ---------------------------------------------------------------------------


def test_quant_factors_structure():
    q0 = vp8.quant_factors(0)
    assert q0 == {"y1dc": 4, "y1ac": 4, "y2dc": 8, "y2ac": 8,
                  "uvdc": 4, "uvac": 4}
    q127 = vp8.quant_factors(127)
    assert q127["y1dc"] == 157 and q127["y1ac"] == 284
    assert q127["uvdc"] == 132  # UV dc cap
    # monotone lookups
    assert all(vp8._DC_QLOOKUP[i] <= vp8._DC_QLOOKUP[i + 1] for i in range(127))
    assert all(vp8._AC_QLOOKUP[i] <= vp8._AC_QLOOKUP[i + 1] for i in range(127))


def test_container_and_decode_image_dispatch():
    data = vp8.webp_encode_lossy(
        16, 16, [[50] * 16] * 16, [[128] * 8] * 8, [[128] * 8] * 8
    )
    assert data[:4] == b"RIFF" and data[12:16] == b"VP8 "
    w, h, dy, du, dv = vp8.webp_decode_lossy(data)
    assert (w, h) == (16, 16) and dy[0][0] == 50
    # generic path: miniimg dispatch -> RGB via integer BT.601;
    # u = v = 128 makes it greyscale: r == g == b == 298*(y-16)+128 >> 8
    w2, h2, mode, rows = decode_image(data)
    assert (w2, h2, mode) == (16, 16, "RGB")
    expected = (298 * (50 - 16) + 128) >> 8
    assert rows[0][:3] == bytes([expected] * 3)


def test_error_modes():
    good = vp8.webp_encode_lossy(
        16, 16, [[1] * 16] * 16, [[2] * 8] * 8, [[4] * 8] * 8
    )
    frame = good[20:]
    with pytest.raises(ImageFormatError):
        vp8.vp8_frame_decode(frame[:5])  # truncated
    bad_start = bytearray(frame)
    bad_start[3] = 0x00  # break the keyframe start code
    with pytest.raises(ImageFormatError):
        vp8.vp8_frame_decode(bytes(bad_start))
    inter = bytearray(frame)
    inter[0] |= 1  # frame_type = interframe
    with pytest.raises(ImageFormatError):
        vp8.vp8_frame_decode(bytes(inter))
    with pytest.raises(ImageFormatError):
        vp8.webp_decode_lossy(b"RIFF\x00\x00\x00\x00WEBPVP8X" + b"\x00" * 8)
    # B_PRED-coded mode bit: craft a stream whose first ymode bool is 0
    # by flipping the encoder's first mode bit via a hand-built header
    bw = vp8.BoolEncoder()
    bw.put(128, 0)
    bw.put(128, 0)
    bw.put(128, 0)
    bw.put(128, 0)
    bw.literal(6, 0)
    bw.literal(3, 0)
    bw.put(128, 0)
    bw.literal(2, 0)
    bw.literal(7, 0)
    for _ in range(5):
        bw.put(128, 0)
    bw.put(128, 0)
    for _ in range(4 * 8 * 3 * 11):
        bw.put(vp8._UPDATE_PROB, 0)
    bw.put(128, 0)  # mb_no_coeff_skip off
    bw.put(vp8._KF_YMODE_PROBS[0], 0)  # B_PRED
    part1 = bw.to_bytes()
    tag = (1 << 4) | (len(part1) << 5)
    hdr = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF,
                 0x9D, 0x01, 0x2A, 16, 0, 16, 0])
    with pytest.raises(ImageFormatError, match="B_PRED"):
        vp8.vp8_frame_decode(hdr + part1 + b"\x00\x00")
