"""minijpeg — pure-python baseline JFIF codec (round 4, VERDICT r3
ask #5). Pins: exactness on block-constant images (what the oracle
gate relies on), the standard |err|<=1 bound on arbitrary content
(AC paths: zigzag, run-length/ZRL/EOB, receive-extend), byte
stuffing, edge-block crop, non-default tables, and the documented
unsupported-stream errors."""

from __future__ import annotations

import random

import pytest

from goto_eater_crawler_spark.functions import minijpeg as mj
from goto_eater_crawler_spark.functions.miniimg import (
    ImageFormatError,
    decode_image,
)


def _grad(w, h, f):
    return [bytes([f(x, y) % 256 for x in range(w)]) for y in range(h)]


def test_flat_blocks_roundtrip_exactly():
    # every 8x8 block constant + quant all-ones -> bit-exact decode
    # (only the integral DC coefficient survives) — the property the
    # multimodal_jpeg_decode oracle is built on
    rows = [bytes([40] * 16 + [195] * 16)] * 24
    out = mj.jpeg_decode(mj.jpeg_encode_grey(32, 24, rows))
    assert out == (32, 24, "L", rows)


def test_arbitrary_content_within_one_grey_level():
    rnd = random.Random(11)
    for w, h in [(8, 8), (16, 16), (24, 17), (13, 9)]:
        rows = _grad(w, h, lambda x, y: rnd.randrange(256))
        W, H, mode, out = mj.jpeg_decode(mj.jpeg_encode_grey(w, h, rows))
        assert (W, H, mode) == (w, h, "L")
        err = max(
            abs(a - b) for ra, rb in zip(rows, out) for a, b in zip(ra, rb)
        )
        assert err <= 1, (w, h, err)


def test_byte_stuffing_survives_roundtrip():
    # find content whose entropy stream contains a stuffed 0xFF00 —
    # the classic decoder bug surface (T.81 F.1.2.3)
    rnd = random.Random(3)
    for seed in range(40):
        rnd.seed(seed)
        rows = _grad(16, 16, lambda x, y: rnd.randrange(256))
        enc = mj.jpeg_encode_grey(16, 16, rows)
        if b"\xff\x00" in enc[enc.index(b"\xda") :]:
            _, _, _, out = mj.jpeg_decode(enc)
            assert max(
                abs(a - b) for ra, rb in zip(rows, out) for a, b in zip(ra, rb)
            ) <= 1
            return
    pytest.fail("no stuffed byte produced in 40 random images")


def test_nonstandard_quant_table_is_read_from_dqt():
    # decoder must use the DQT table from the stream, not assume ones:
    # q=16 everywhere quantizes a flat block's DC (8*(v-128)) to
    # round(8*(v-128)/16)*16 — decode still lands within q/2 + 1
    rows = [bytes([200] * 16)] * 16
    enc = mj.jpeg_encode_grey(16, 16, rows, quant=[16] * 64)
    _, _, _, out = mj.jpeg_decode(enc)
    err = max(abs(v - 200) for r in out for v in r)
    assert err <= 9  # 16/2 + rounding
    assert err > 0 or out == rows  # sanity: q=16 actually quantized


def test_restart_intervals_roundtrip_and_resync():
    """DRI + RSTn (T.81 F.1.2.3 / F.2.1.3.1): the resync structure
    real camera JPEGs carry — byte-aligned RST markers every k MCUs,
    DC predictor reset on both sides, and a corrupted marker is a
    loud error, not silent garbage."""
    rnd = random.Random(5)
    rows = _grad(32, 24, lambda x, y: rnd.randrange(256))  # 12 MCUs
    enc = mj.jpeg_encode_grey(32, 24, rows, restart_interval=4)
    assert b"\xff\xdd" in enc  # DRI present
    scan = enc[enc.index(b"\xda") :]
    assert b"\xff\xd0" in scan and b"\xff\xd1" in scan  # RST0, RST1
    W, H, mode, out = mj.jpeg_decode(enc)
    assert (W, H, mode) == (32, 24, "L")
    assert max(
        abs(a - b) for ra, rb in zip(rows, out) for a, b in zip(ra, rb)
    ) <= 1
    # flat image with restarts stays exact (DC-only blocks, reset
    # predictors included)
    flat = [bytes([50] * 16 + [210] * 16)] * 16
    enc2 = mj.jpeg_encode_grey(32, 16, flat, restart_interval=3)
    assert mj.jpeg_decode(enc2)[3] == flat
    # corrupt the first RST marker -> loud resync error
    bad = bytearray(enc)
    i = bad.index(b"\xff\xd0")
    bad[i + 1] = 0xD5
    with pytest.raises(ImageFormatError, match="RST"):
        mj.jpeg_decode(bytes(bad))


def test_color_444_roundtrip():
    """Baseline 4:4:4 color: interleaved Y/Cb/Cr MCUs (one block per
    component, per-component DC predictors), JFIF color transform both
    ways. Error budget: quant is all-ones, so the bound is the two
    float color transforms + DCT rounding (<= 3 levels measured; pin
    4 for slack)."""
    rnd = random.Random(9)
    for w, h, ri in [(16, 16, 0), (21, 13, 2), (8, 8, 0)]:
        rgb = [
            bytes(rnd.randrange(256) for _ in range(3 * w)) for _ in range(h)
        ]
        W, H, mode, out = mj.jpeg_decode(
            mj.jpeg_encode_color(w, h, rgb, restart_interval=ri)
        )
        assert (W, H, mode) == (w, h, "RGB")
        err = max(
            abs(a - b) for ra, rb in zip(rgb, out) for a, b in zip(ra, rb)
        )
        assert err <= 4, (w, h, ri, err)


def test_color_flat_regions_stay_tight():
    # flat color halves: only the color-transform rounding remains
    w, h = 16, 16
    rgb = [bytes(([200, 30, 60] * (w // 2)) + ([20, 180, 240] * (w // 2)))] * h
    W, H, mode, out = mj.jpeg_decode(mj.jpeg_encode_color(w, h, rgb))
    assert mode == "RGB"
    assert max(
        abs(a - b) for ra, rb in zip(rgb, out) for a, b in zip(ra, rb)
    ) <= 1


def test_color_transform_pair_is_near_inverse():
    rnd = random.Random(21)
    for _ in range(200):
        r, g, b = rnd.randrange(256), rnd.randrange(256), rnd.randrange(256)
        r2, g2, b2 = mj.ycbcr_to_rgb(*mj.rgb_to_ycbcr(r, g, b))
        assert abs(r - r2) <= 2 and abs(g - g2) <= 2 and abs(b - b2) <= 2


def test_420_flat_mcu_tiles_roundtrip_exactly():
    # two 16x16 constant tiles = two full 4:2:0 MCUs: the chroma
    # box-average and replication upsample are exact over constants,
    # so the only lossy steps are the two color transforms
    c1, c2 = (40, 77, 211), (190, 23, 99)
    row = bytes(list(c1) * 16 + list(c2) * 16)
    w, h, mode, out = mj.jpeg_decode(
        mj.jpeg_encode_color(32, 16, [row] * 16, subsampling="420")
    )
    assert (w, h, mode) == (32, 16, "RGB")
    e1 = bytes(mj.ycbcr_to_rgb(*mj.rgb_to_ycbcr(*c1)) * 16)
    e2 = bytes(mj.ycbcr_to_rgb(*mj.rgb_to_ycbcr(*c2)) * 16)
    assert all(r == e1 + e2 for r in out)


def test_420_odd_dims_flat_exact_and_restart_equivalent():
    c = (100, 150, 200)
    rows = [bytes(list(c) * 20)] * 12  # 20x12: partial edge MCUs
    w, h, mode, out = mj.jpeg_decode(
        mj.jpeg_encode_color(20, 12, rows, subsampling="420")
    )
    exp = bytes(mj.ycbcr_to_rgb(*mj.rgb_to_ycbcr(*c)) * 20)
    assert (w, h) == (20, 12) and all(r == exp for r in out)
    # DRI/RSTn resync with the block-quad MCU layout decodes the same
    two = bytes(list(c) * 16 + list((9, 99, 199)) * 16)
    plain = mj.jpeg_decode(
        mj.jpeg_encode_color(32, 16, [two] * 16, subsampling="420")
    )
    rst = mj.jpeg_decode(
        mj.jpeg_encode_color(
            32, 16, [two] * 16, subsampling="420", restart_interval=1
        )
    )
    assert plain == rst


def test_420_luma_gradient_within_unit_error():
    # chroma-flat (grey) gradient: subsampling loses nothing, so the
    # full AC path at 4:2:0 must stay within the standard |err|<=1
    rows = [
        bytes(
            v
            for x in range(24)
            for v in ((x * 11 + y * 5) % 256,) * 3
        )
        for y in range(16)
    ]
    w, h, mode, out = mj.jpeg_decode(
        mj.jpeg_encode_color(24, 16, rows, subsampling="420")
    )
    assert (w, h, mode) == (24, 16, "RGB")
    assert max(
        abs(a - b) for ra, rb in zip(rows, out) for a, b in zip(ra, rb)
    ) <= 1


def test_progressive_flat_roundtrips_exactly():
    rows = [bytes([55] * 16)] * 16
    assert mj.jpeg_decode(mj.jpeg_encode_progressive(16, 16, rows)) == (
        16, 16, "L", rows
    )
    c1, c2 = (40, 77, 211), (190, 23, 99)
    row = bytes(list(c1) * 8 + list(c2) * 8)
    w, h, mode, out = mj.jpeg_decode(
        mj.jpeg_encode_progressive(16, 16, [row] * 16)
    )
    e1 = bytes(mj.ycbcr_to_rgb(*mj.rgb_to_ycbcr(*c1)) * 8)
    e2 = bytes(mj.ycbcr_to_rgb(*mj.rgb_to_ycbcr(*c2)) * 8)
    assert mode == "RGB" and all(r == e1 + e2 for r in out)


def test_progressive_decode_equals_baseline_decode():
    # the strongest oracle available: both codecs quantize to the SAME
    # coefficients, so the decoded pixels must be IDENTICAL — any
    # EOB-run / refinement / correction-bit desync shows immediately
    rnd = random.Random(42)
    for trial in range(20):
        w = rnd.choice([8, 16, 24, 17, 23])
        h = rnd.choice([8, 16, 19, 24])
        if rnd.random() < 0.5:
            rows = [bytes(rnd.randrange(256) for _ in range(w)) for _ in range(h)]
            base = mj.jpeg_encode_grey(w, h, rows)
        else:
            rows = [
                bytes(rnd.randrange(256) for _ in range(3 * w)) for _ in range(h)
            ]
            base = mj.jpeg_encode_color(w, h, rows)
        prog = mj.jpeg_encode_progressive(w, h, rows)
        assert mj.jpeg_decode(base) == mj.jpeg_decode(prog), f"trial {trial}"


def test_progressive_equivalence_under_coarse_quant():
    # quant=16 forces multi-bit AC magnitudes, long zero runs and real
    # EOB runs, so the successive-approximation refinement scans carry
    # genuine correction bits (not just flat-block DC)
    q = [16] * 64
    for trial in range(6):
        rows = [
            bytes((x * 37 + y * 11 + trial * 5) % 256 for x in range(24))
            for y in range(16)
        ]
        assert mj.jpeg_decode(
            mj.jpeg_encode_grey(24, 16, rows, quant=q)
        ) == mj.jpeg_decode(mj.jpeg_encode_progressive(24, 16, rows, quant=q))


def test_sampling_factor_out_of_range_raises():
    enc = bytearray(mj.jpeg_encode_color(8, 8, [bytes([1, 2, 3] * 8)] * 8))
    i = enc.index(b"\xff\xc0")
    # marker(2) len(2) precision(1) height(2) width(2) ncomp(1) then
    # (id, sampling, tq) triplets — set Y's sampling factor to 5x5
    enc[i + 11] = 0x55
    with pytest.raises(ImageFormatError, match="out of range"):
        mj.jpeg_decode(bytes(enc))
    with pytest.raises(ValueError, match="subsampling"):
        mj.jpeg_encode_color(8, 8, [bytes([1, 2, 3] * 8)] * 8,
                             subsampling="422")


def test_unsupported_streams_raise_imageformaterror():
    rows = [bytes([1] * 8)] * 8
    enc = bytearray(mj.jpeg_encode_grey(8, 8, rows))
    # flip SOF0 -> SOF3 (lossless sequential)
    i = enc.index(b"\xff\xc0")
    enc[i + 1] = 0xC3
    with pytest.raises(ImageFormatError, match="non-baseline"):
        mj.jpeg_decode(bytes(enc))
    # flip SOF0 -> SOF2: the frame parses (progressive is supported)
    # but a full-band Ss=0..63 scan is malformed inside SOF2
    enc[i + 1] = 0xC2
    with pytest.raises(ImageFormatError, match="Se=0"):
        mj.jpeg_decode(bytes(enc))
    with pytest.raises(ImageFormatError, match="SOI"):
        mj.jpeg_decode(b"\x89PNGnot-a-jpeg")
    with pytest.raises(ImageFormatError):
        mj.jpeg_decode(mj.jpeg_encode_grey(8, 8, rows)[:40])  # truncated


def test_decode_image_dispatches_jpeg():
    rows = [bytes([7] * 8 + [222] * 8)] * 8
    w, h, mode, out = decode_image(mj.jpeg_encode_grey(16, 8, rows))
    assert (w, h, mode) == (16, 8, "L") and out == rows


def test_huffman_tables_are_wellformed():
    # canonical code construction must be prefix-free and complete
    for bits, vals in [
        (mj.DC_LUM_BITS, mj.DC_LUM_VALS),
        (mj.AC_LUM_BITS, mj.AC_LUM_VALS),
    ]:
        assert sum(bits) == len(vals)
        codes = mj._huff_codes(bits, vals)
        seen = set()
        for code, length in codes.values():
            assert code < (1 << length)
            for c2, l2 in seen:
                if l2 <= length:
                    assert (code >> (length - l2)) != c2, "prefix collision"
            seen.add((code, length))


def test_zigzag_is_the_standard_order():
    # spot-pin the first 10 entries of T.81 Figure A.6 ((v, u) pairs)
    assert mj.ZIGZAG[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    assert sorted(mj.ZIGZAG) == [(r, c) for r in range(8) for c in range(8)]
