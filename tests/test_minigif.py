"""minigif codec contract: GIF-LZW roundtrips (variable width growth,
KwKwK, 4096-dictionary resets), container roundtrips (palettes,
interlace, multi-frame compositing, transparency), error modes.

No reference analogue (the reference crawler decodes no images);
build-spec frontier for the multimodal family — see
operators/multimodal.py and the multimodal_gif_decode gate.
"""

from __future__ import annotations

import random

import pytest

from goto_eater_crawler_spark.functions import minigif as mg
from goto_eater_crawler_spark.functions.miniimg import ImageFormatError

PAL16 = [(i * 3 % 256, i * 7 % 256, i * 11 % 256) for i in range(16)]


def test_lzw_roundtrip_fuzz_covers_growth_and_reset():
    rnd = random.Random(1)
    for trial in range(40):
        mcs = rnd.choice([2, 3, 4, 8])
        n = rnd.choice([1, 7, 100, 3000, 20000])
        alpha = 1 << mcs
        if rnd.random() < 0.4:
            data = bytes(rnd.randrange(alpha) for _ in range(n))
        else:  # repetitive input keeps the dictionary under pressure
            unit = bytes(
                rnd.randrange(alpha) for _ in range(rnd.randrange(1, 9))
            )
            data = (unit * (n // len(unit) + 1))[:n]
        enc = mg.lzw_encode(mcs, data)
        assert mg.lzw_decode(mcs, enc, n) == data, f"trial {trial}"


def test_lzw_kwkwk_case():
    # 'ababab...' immediately reuses the just-defined code
    data = bytes([0, 1] * 200)
    assert mg.lzw_decode(2, mg.lzw_encode(2, data), len(data)) == data


def test_single_frame_roundtrip_and_interlace():
    idx = bytes((x + y) % 16 for y in range(13) for x in range(21))
    exp = b"".join(bytes(PAL16[i]) for i in idx)
    for interlace in (False, True):
        w, h, frames = mg.gif_decode(
            mg.gif_encode(21, 13, PAL16, [idx], interlace=interlace)
        )
        assert (w, h, len(frames)) == (21, 13, 1)
        assert frames[0][1] == exp


def test_multiframe_delays_and_compositing():
    f1 = bytes((x + y) % 16 for y in range(13) for x in range(21))
    f2 = bytes((x * y) % 16 for y in range(13) for x in range(21))
    w, h, frames = mg.gif_decode(
        mg.gif_encode(21, 13, PAL16, [f1, f2], delays_cs=[5, 12])
    )
    assert [d for d, _ in frames] == [5, 12]
    assert frames[1][1] == b"".join(bytes(PAL16[i]) for i in f2)


def test_two_color_palette_uses_min_code_size_2():
    g = mg.gif_encode(8, 8, [(0, 0, 0), (255, 255, 255)], [bytes([0, 1] * 32)])
    w, h, frames = mg.gif_decode(g)
    assert frames[0][1][:6] == bytes([0, 0, 0, 255, 255, 255])


def test_transparency_leaves_canvas():
    # frame 2 paints index 1 everywhere but declares it transparent:
    # the composited canvas must still show frame 1
    f1 = bytes([0] * 64)
    enc = bytearray(mg.gif_encode(8, 8, [(9, 9, 9), (200, 1, 2)], [f1, f1]))
    # flip frame 2's GCE to transparent-on with transparent index 1,
    # and its pixels to index 1 by re-encoding frame 2's data: simpler
    # to rebuild the stream with minigif primitives
    body = mg.gif_encode(8, 8, [(9, 9, 9), (200, 1, 2)], [f1])
    # append a transparent frame by hand: GCE flags=0x05, tidx=1
    patch = bytes([0x21, 0xF9, 4, 0x05, 0, 0, 1, 0])
    patch += bytes([0x2C]) + (0).to_bytes(2, "little") * 2
    patch += (8).to_bytes(2, "little") * 2 + b"\x00\x02"
    patch += mg._subblocks(mg.lzw_encode(2, bytes([1] * 64)))
    data = body[:-1] + patch + b"\x3b"
    w, h, frames = mg.gif_decode(bytes(data))
    assert len(frames) == 2
    assert frames[1][1] == frames[0][1]  # transparent overlay: no change
    assert frames[0][1][:3] == bytes([9, 9, 9])
    _ = enc


def _set_disposal(data: bytes, frame: int, method: int) -> bytes:
    """Flip the disposal bits in the frame-th GCE of an encoded gif."""
    out = bytearray(data)
    seen = -1
    i = 13 + 3 * 16  # after header + 16-color GCT
    while i < len(out):
        if out[i] == 0x21 and out[i + 1] == 0xF9:
            seen += 1
            if seen == frame:
                out[i + 3] = (out[i + 3] & ~0x1C) | (method << 2)
                return bytes(out)
            i += 8
        else:
            i += 1
    raise AssertionError("GCE not found")


def test_disposal_restore_background_and_previous():
    # frame 1 paints color 5 everywhere; frame 2 paints color 9.
    # With disposal 2 on frame 1, the canvas resets to the BACKGROUND
    # color (index 0 — NON-black here so the two disposal modes are
    # distinguishable) before frame 2 — but frame 2 repaints fully, so
    # probe with a frame 2 that's transparent everywhere instead.
    pal = [(7, 77, 177)] + PAL16[1:]
    f1 = bytes([5] * 64)
    f2 = bytes([9] * 64)
    base = mg.gif_encode(8, 8, pal, [f1, f2], delays_cs=[1, 1])

    # disposal 1 (encoder default): frame 2 shows its own paint
    _, _, frames = mg.gif_decode(base)
    assert frames[1][1][:3] == bytes(pal[9])

    # make frame 2 fully transparent so the post-disposal canvas shows
    enc = bytearray(_set_disposal(base, 0, 2))
    i = enc.index(bytes([0x21, 0xF9]), 20)  # frame 1's GCE
    j = enc.index(bytes([0x21, 0xF9]), i + 8)  # frame 2's GCE
    enc[j + 3] |= 0x01  # transparency on
    enc[j + 6] = 9  # transparent index = frame 2's only color
    _, _, frames = mg.gif_decode(bytes(enc))
    assert frames[0][1][:3] == bytes(pal[5])
    assert frames[1][1][:3] == bytes(pal[0])  # background restored (7,77,177)

    # disposal 3: canvas reverts to the PRE-frame state (black start)
    enc3 = bytearray(_set_disposal(base, 0, 3))
    j = enc3.index(bytes([0x21, 0xF9]), enc3.index(bytes([0x21, 0xF9]), 20) + 8)
    enc3[j + 3] |= 0x01
    enc3[j + 6] = 9
    _, _, frames = mg.gif_decode(bytes(enc3))
    assert frames[1][1][:3] == b"\x00\x00\x00"  # pre-frame canvas


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=80,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    mcs=st.integers(2, 8),
    seed=st.integers(0, 2**32 - 1),
    n=st.integers(0, 6000),
    runny=st.booleans(),
)
def test_lzw_roundtrip_property(mcs, seed, n, runny):
    rnd = random.Random(seed)
    alpha = 1 << mcs
    if runny:  # long runs force KwKwK + dictionary growth/reset
        unit = bytes(rnd.randrange(alpha) for _ in range(rnd.randrange(1, 5)))
        data = (unit * (n // max(len(unit), 1) + 1))[:n]
    else:
        data = bytes(rnd.randrange(alpha) for _ in range(n))
    assert mg.lzw_decode(mcs, mg.lzw_encode(mcs, data), n) == data


def test_error_modes():
    with pytest.raises(ImageFormatError, match="signature"):
        mg.gif_decode(b"NOTAGIF.....")
    idx = bytes([0] * 64)
    good = mg.gif_encode(8, 8, PAL16, [idx])
    with pytest.raises(ImageFormatError):
        mg.gif_decode(good[:20])  # truncated
    with pytest.raises(ValueError, match="palette"):
        mg.gif_encode(8, 8, [(0, 0, 0)], [idx])
