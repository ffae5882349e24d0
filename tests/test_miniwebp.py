"""miniwebp codec contract: VP8L roundtrips across every encoder knob
(cache bits, subtract-green, LZ77 on/off), prefix-code machinery
(simple codes, code-length codes, 16/17/18 repeats, max_symbol),
LZ77 window edges, and error modes.

No reference analogue (the reference crawler decodes no images);
build-spec frontier for the multimodal family — see
operators/multimodal.py and the multimodal_webp_decode gate. The
module docstring documents the self-consistency caveat (no native
dwebp in this sandbox).
"""

from __future__ import annotations

import random

import pytest

from goto_eater_crawler_spark.functions import miniwebp as mw
from goto_eater_crawler_spark.functions.miniimg import (
    ImageFormatError,
    decode_image,
)


def _img(rnd: random.Random, w: int, h: int, kind: str) -> list[bytes]:
    if kind == "random":
        return [bytes(rnd.randrange(256) for _ in range(3 * w)) for _ in range(h)]
    if kind == "flat":
        c = (rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
        return [bytes(c * w) for _ in range(h)]
    if kind == "repeat":  # LZ77 pressure: long self-similar runs
        unit = bytes(rnd.randrange(256) for _ in range(9))
        row = (unit * (w // 3 + 1))[: 3 * w]
        return [row for _ in range(h)]
    return [
        bytes(b for x in range(w) for b in ((x // 3) % 4 * 60, y % 256, (x + y) % 256))
        for y in range(h)
    ]


def test_roundtrip_fuzz_across_all_knobs():
    rnd = random.Random(5)
    for kind in ("flat", "repeat", "stripes", "random"):
        for w, h in ((1, 1), (3, 2), (16, 16), (33, 7)):
            for cb in (0, 4, 6):
                for sg in (False, True):
                    for lz in (True, False):
                        rows = _img(rnd, w, h, kind)
                        out = mw.webp_decode(
                            mw.webp_encode(
                                w, h, rows,
                                use_cache_bits=cb,
                                subtract_green=sg,
                                lz77=lz,
                            )
                        )
                        assert out == (w, h, "RGB", rows), (kind, w, h, cb, sg, lz)


def test_lz77_uses_2d_distance_map_and_linear_codes():
    # vertically-repeating image: matches land one row up (the 2D map
    # hot path); wide random-prefix image forces linear >120 codes too
    rnd = random.Random(9)
    row = bytes(rnd.randrange(256) for _ in range(3 * 40))
    rows = [row] * 30
    assert mw.webp_decode(mw.webp_encode(40, 30, rows))[3] == rows
    two = [bytes(rnd.randrange(256) for _ in range(3 * 200))] * 2
    big = [two[0], two[1]] * 15
    assert mw.webp_decode(mw.webp_encode(200, 30, big))[3] == big


def test_prefix_code_repeat_symbols_decode():
    # hand-build a normal code using 17/18 zero-runs and 16 repeats:
    # alphabet 300, symbols 0 and 299 at length 1 each... simpler:
    # exercise _read_prefix_code against _canonical_codes directly
    w = mw._LsbWriter()
    w.bits(0, 1)  # normal
    # CL code: symbols {0:len2, 1:len2, 18:len2, 16:len1}? keep tiny:
    # lengths for CL symbols: 1 -> 2 bits? Use: sym1 len1, sym18 len2,
    # sym16 len2 (canonical complete: 1@1 + 2@2)
    cl = [0] * 19
    cl[1] = 1
    cl[18] = 2
    cl[16] = 2
    order = mw._CLC_ORDER
    num = max(order.index(s) for s in (1, 16, 18)) + 1
    w.bits(num - 4, 4)
    for i in range(num):
        w.bits(cl[order[i]], 3)
    w.bits(0, 1)  # no max_symbol
    codes = mw._canonical_codes(cl)

    def emit(sym, extra=None, nbits=0):
        c, ln = codes[sym]
        w.code(c, ln)
        if nbits:
            w.bits(extra, nbits)

    # alphabet 64: sym0 len1 via: '1'(len1) then 16-repeat x3 of prev?
    # simplest: [1, 18(run 61), 1, 1] -> lengths 1,0*61,1,1 invalid
    # (3 symbols at len1). Use: 1,1 then 18 zeros(run 62): two len-1
    # symbols = complete code.
    emit(1)
    emit(1)
    emit(18, 62 - 11, 7)
    dec = mw._read_prefix_code(mw._LsbReader(w.flush()), 64)
    assert dec[(1, 0)] == 0 and dec[(1, 1)] == 1


def test_decode_image_dispatches_webp_and_gif():
    rows = [bytes([10, 200, 30] * 8)] * 4
    assert decode_image(mw.webp_encode(8, 4, rows)) == (8, 4, "RGB", rows)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    seed=st.integers(0, 2**32 - 1),
    cb=st.sampled_from([0, 3, 6]),
    sg=st.booleans(),
    lz=st.booleans(),
    palette=st.integers(2, 40),
)
def test_roundtrip_property(w, h, seed, cb, sg, lz, palette):
    # low-cardinality pixel palettes maximize LZ77/cache interplay;
    # hypothesis shrinks any failing stream to a minimal image
    rnd = random.Random(seed)
    colors = [
        bytes(rnd.randrange(256) for _ in range(3)) for _ in range(palette)
    ]
    rows = [
        b"".join(colors[rnd.randrange(palette)] for _ in range(w))
        for _ in range(h)
    ]
    out = mw.webp_decode(
        mw.webp_encode(w, h, rows, use_cache_bits=cb, subtract_green=sg,
                       lz77=lz)
    )
    assert out == (w, h, "RGB", rows)


def test_error_modes():
    with pytest.raises(ImageFormatError, match="RIFF"):
        mw.webp_decode(b"NOTRIFF.....")
    # 'VP8 ' now dispatches to minivp8 (round 4): an empty lossy
    # chunk is a truncated VP8 frame, not an unsupported format
    with pytest.raises(ImageFormatError, match="truncated"):
        mw.webp_decode(b"RIFF\x04\x00\x00\x00WEBPVP8 \x00\x00\x00\x00")
    with pytest.raises(ImageFormatError, match="VP8X"):
        mw.webp_decode(b"RIFF\x04\x00\x00\x00WEBPVP8X\x00\x00\x00\x00")
    good = mw.webp_encode(4, 4, [bytes([1, 2, 3] * 4)] * 4)
    with pytest.raises(ImageFormatError):
        mw.webp_decode(good[:24])  # truncated bitstream
    with pytest.raises(ValueError, match="rows"):
        mw.webp_encode(4, 4, [b"xx"])