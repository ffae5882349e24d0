"""miniimg: pure-python PNG/BMP codec + pixel ops (round-3 upgrade of
the multimodal decode stub to a real decoder for non-entropy-coded
formats), and the Spark image-decode operators built on it."""

from __future__ import annotations

import random

import pytest

from goto_eater_crawler_spark.functions import miniimg as mi


def _rand_rows(w, h, nch, seed):
    rng = random.Random(seed)
    return [bytes(rng.randrange(256) for _ in range(w * nch)) for _ in range(h)]


@pytest.mark.parametrize("mode,nch", [("L", 1), ("RGB", 3), ("RGBA", 4)])
def test_png_roundtrip_all_filters(mode, nch):
    w, h = 13, 9
    rows = _rand_rows(w, h, nch, seed=nch)
    for filters in (None, [y % 5 for y in range(h)], [4] * h, [3] * h):
        data = mi.png_encode(w, h, mode, rows, filters)
        assert mi.png_decode(data) == (w, h, mode, rows), filters


def test_bmp_roundtrip_including_row_padding():
    for w in (10, 11, 12, 13):  # exercise 4-byte row padding cases
        rows = _rand_rows(w, 5, 3, seed=w)
        assert mi.bmp_decode(mi.bmp_encode(w, 5, rows)) == (w, 5, "RGB", rows)


def test_decode_dispatch_and_unsupported_formats():
    rows = [bytes([7] * 4)]
    png = mi.png_encode(4, 1, "L", rows)
    assert mi.decode_image(png)[2] == "L"
    bmp = mi.bmp_encode(1, 1, [bytes([1, 2, 3])])
    assert mi.decode_image(bmp)[2] == "RGB"
    for bad in (b"\xff\xd8\xff\xe0JFIF", b"RIFFxxxxWEBP", b"", b"garbage"):
        with pytest.raises(mi.ImageFormatError):
            mi.decode_image(bad)
    # truncated IDAT must raise, not return garbage
    with pytest.raises(Exception):
        mi.png_decode(png[:30])


def test_grey_resize_ahash_contracts():
    # vertical two-tone 16x16 -> half-0 half-1 hash per row
    rows = [bytes([10, 10, 10] * 8 + [200, 200, 200] * 8) for _ in range(16)]
    grid = mi.to_grey(16, 16, "RGB", rows)
    assert mi.ahash(grid) == 0x0F0F0F0F0F0F0F0F
    # horizontal two-tone -> top 32 bits 0, bottom 32 bits 1
    grid_h = [[10] * 16 for _ in range(8)] + [[200] * 16 for _ in range(8)]
    assert mi.ahash(grid_h) == 0x00000000FFFFFFFF
    # resize floor-mapping determinism
    g = [[1, 2], [3, 4]]
    assert mi.resize_nearest(g, 4, 4) == [
        [1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]
    ]
    # near-dup invariance: small luminance perturbation keeps the hash
    noisy = [[v + 3 for v in row] for row in grid_h]
    assert mi.ahash(noisy) == mi.ahash(grid_h)


def test_image_decode_operator_real_png(spark):
    """End-to-end: synth real PNGs in one Arrow pass, decode in
    another, and check a hand-computed row (doc_id=0: 8x8, vertical
    a=0/b=155 -> mean 77.5, hash 0x0F..)."""
    from goto_eater_crawler_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(i, "t") for i in range(15)], ["doc_id", "text"]
    )
    imgs = mm.synth_images(docs, mod=7)  # doc_ids 0, 7, 14
    meta = {r["doc_id"]: r for r in mm.image_decode_metadata(imgs).collect()}
    assert set(meta) == {0, 7, 14}
    r0 = meta[0]
    assert (r0["width"], r0["height"], r0["mode"]) == (8, 8, "L")
    assert r0["mean_grey"] == pytest.approx(77.5)
    assert r0["ahash"] == 0x0F0F0F0F0F0F0F0F
    r7 = meta[7]  # odd -> horizontal split, h = 8 + 21 % 7 = 8
    assert r7["ahash"] == 0x00000000FFFFFFFF
    # undecodable payload -> null row, not a task failure
    bad = spark.createDataFrame(
        [(99, bytearray(b"\xff\xd8\xff\xe0JFIF"))], "doc_id long, payload binary"
    )
    row = mm.image_decode_metadata(bad).collect()[0]
    assert row["doc_id"] == 99 and row["width"] is None and row["ahash"] is None


def test_apng_roundtrip_multiframe():
    from goto_eater_crawler_spark.functions import miniimg

    w, h = 10, 7
    frames = [
        [bytes([(v + y) % 256 for _ in range(w)]) for y in range(h)]
        for v in (3, 99, 200, 254)
    ]
    blob = miniimg.apng_encode(w, h, "L", frames)
    W, H, mode, out = miniimg.apng_decode(blob)
    assert (W, H, mode) == (w, h, "L")
    assert out == frames


def test_apng_decodes_plain_png_as_one_frame():
    from goto_eater_crawler_spark.functions import miniimg

    rows = [bytes([y * 11 % 256] * 5) for y in range(4)]
    png = miniimg.png_encode(5, 4, "L", rows, filters=[0, 1, 2, 4])
    W, H, mode, out = miniimg.apng_decode(png)
    assert (W, H, mode, len(out)) == (5, 4, "L", 1)
    assert out[0] == rows
    # and png_decode (shared _defilter) agrees
    assert miniimg.png_decode(png)[3] == rows


def test_apng_rejects_offset_frames():
    import struct

    import pytest as _pytest

    from goto_eater_crawler_spark.functions import miniimg

    w, h = 6, 4
    frames = [[bytes([9] * w) for _ in range(h)]] * 2
    blob = bytearray(miniimg.apng_encode(w, h, "L", frames))
    # corrupt the second fcTL's x_offset (find the 2nd fcTL chunk)
    idx = blob.index(b"fcTL", blob.index(b"fcTL") + 4)
    # body starts 4 bytes after type; x_offset is at body offset 12
    off = idx + 4 + 12
    blob[off:off + 4] = struct.pack(">I", 2)
    # CRC now wrong too, but the offset check fires first
    with _pytest.raises(miniimg.ImageFormatError):
        miniimg.apng_decode(bytes(blob))


def test_image_neardup_pairs_planted_structure(spark):
    """synth_neardup_images plants (base, base+3) pairs one aHash bit
    apart; the banded join must find EXACTLY those pairs at
    hamming <= 2 (pigeonhole recall is exact for <= bands-1), each at
    hamming 1, through the REAL PNG encode->decode->ahash path."""
    from goto_eater_crawler_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(i, "t") for i in range(30)], ["doc_id", "text"]
    )
    fps = mm.image_decode_metadata(mm.synth_neardup_images(docs, 3))
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in mm.image_neardup_pairs(fps, max_hamming=2).collect()
    }
    # selected docs 0,3,6,...,27; planted pairs (6k, 6k+3)
    expected = {(6 * k, 6 * k + 3): 1 for k in range(5)}
    assert got == expected
    # the decoded hash really is the closed-form H (threshold + bit
    # order + PNG round trip all exact)
    meta = {r["doc_id"]: r["ahash"] for r in fps.collect()}
    for d in range(0, 30, 3):
        v = (d // 3) % 2
        dl = (d - 3 * v) & 0xFFFFF
        assert meta[d] == ((1 << 62) | (dl << 40) | (dl << 20) | dl) ^ v


def test_image_neardup_pigeonhole_guard():
    from goto_eater_crawler_spark.operators import multimodal as mm

    with pytest.raises(ValueError):
        mm.image_neardup_pairs(None, max_hamming=4, bands=4)
