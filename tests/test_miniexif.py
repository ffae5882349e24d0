"""TIFF/EXIF IFD walk (functions/miniexif.py) — TIFF 6.0 layout rules.

Pins: both byte orders, inline-vs-out-of-line value placement (the
left-justified inline rule), NUL-terminated ASCII, RATIONAL as two
u32s, unknown tags/types skipped, corrupt structures fail loudly.
"""

from __future__ import annotations

import struct

import pytest

from goto_eater_crawler_spark.functions import miniexif

FIELDS = {
    270: "a longer description string",   # ASCII > 4 bytes: out-of-line
    271: "ca",                            # ASCII <= 4 bytes incl NUL: inline
    274: 6,                               # SHORT: inline, left-justified
    282: (300, 7),                        # RATIONAL: always out-of-line
    306: "2021:01:02 03:04:05",
}


@pytest.mark.parametrize("be", [False, True])
def test_roundtrip_both_endians(be):
    blob = miniexif.write_tiff(FIELDS, big_endian=be)
    assert blob[:2] == (b"MM" if be else b"II")
    got = miniexif.read_tiff(blob)
    assert got["description"] == FIELDS[270]
    assert got["make"] == "ca"
    assert got["orientation"] == 6
    assert got["x_resolution"] == (300, 7)
    assert got["datetime"] == FIELDS[306]


def test_inline_short_is_left_justified():
    # a big-endian SHORT inline must occupy the FIRST two bytes of the
    # value field; a reader that unpacks all four as u32 gets 6<<16
    blob = miniexif.write_tiff({274: 6}, big_endian=True)
    assert miniexif.read_tiff(blob)["orientation"] == 6


def test_unknown_tag_and_type_skipped():
    blob = bytearray(miniexif.write_tiff({274: 1, 271: "x"}))
    # rewrite the 271 entry's tag to an unregistered one (40000)
    n = struct.unpack_from("<H", blob, 8)[0]
    for i in range(n):
        base = 10 + 12 * i
        tag = struct.unpack_from("<H", blob, base)[0]
        if tag == 271:
            struct.pack_into("<H", blob, base, 40000)
    got = miniexif.read_tiff(bytes(blob))
    assert "make" not in got and got["orientation"] == 1


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="byte-order"):
        miniexif.read_tiff(b"XX\x2a\x00" + b"\x00" * 16)
    with pytest.raises(ValueError, match="magic"):
        miniexif.read_tiff(b"II\x2b\x00" + b"\x00" * 16)


def test_truncated_out_of_line_value_rejected():
    blob = miniexif.write_tiff(FIELDS)
    with pytest.raises(ValueError, match="truncated"):
        miniexif.read_tiff(blob[:-8])


def test_entries_in_ascending_tag_order():
    blob = miniexif.write_tiff(FIELDS)
    n = struct.unpack_from("<H", blob, 8)[0]
    tags = [struct.unpack_from("<H", blob, 10 + 12 * i)[0] for i in range(n)]
    assert tags == sorted(tags)  # spec requirement
