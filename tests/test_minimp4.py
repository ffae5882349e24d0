"""functions/minimp4 — ISO-BMFF box walk structural contracts."""

from __future__ import annotations

import struct

import pytest

from goto_eater_crawler_spark.functions import minimp4 as m


def _meta(**kw):
    defaults = dict(
        timescale=600, duration=1200, tracks=[("vide", 640, 480)]
    )
    defaults.update(kw)
    return m.parse_mp4(m.write_mp4(**defaults))


def test_roundtrip_version0():
    got = _meta(version=0, tracks=[("vide", 320, 240), ("soun", 0, 0)])
    assert got["brand"] == "isom"
    assert got["mvhd_version"] == 0
    assert (got["timescale"], got["duration"]) == (600, 1200)
    assert got["handlers"] == ["vide", "soun"]
    assert (got["width"], got["height"]) == (320, 240)


def test_roundtrip_version1_64bit_fields():
    # v1 mvhd duration is u64 — a 32-bit read would wrap/misalign
    big = (1 << 32) + 7
    got = _meta(version=1, duration=big)
    assert got["mvhd_version"] == 1
    assert got["duration"] == big
    assert got["width"] == 640  # tkhd v1 offset rule held


def test_largesize_mdat_roundtrip():
    blob = m.write_mp4(
        timescale=1000,
        duration=5000,
        tracks=[("vide", 100, 50)],
        largesize_mdat=True,
        payload=b"abc",
    )
    boxes = [(t, b - a) for t, a, b in m.walk(blob)]
    assert boxes[-1][0] == b"mdat" and boxes[-1][1] == 3
    assert m.parse_mp4(blob)["timescale"] == 1000


def test_size_zero_extends_to_end():
    blob = struct.pack(">I", 0) + b"mdat" + b"payload-to-eof"
    boxes = list(m.walk(blob))
    assert boxes == [(b"mdat", 8, len(blob))]


def test_unknown_boxes_skipped():
    blob = m.write_mp4(timescale=10, duration=20, tracks=[("vide", 8, 8)])
    extra = struct.pack(">I", 12) + b"wide" + b"zzzz"
    assert m.parse_mp4(extra + blob)["timescale"] == 10


def test_truncated_header_rejected():
    blob = m.write_mp4(timescale=10, duration=20, tracks=[("vide", 8, 8)])
    with pytest.raises(m.Mp4Error):
        list(m.walk(blob[: len(blob) - 3] + b"\x00\x00\x00\x0c" + b"fr"))


def test_child_overrunning_parent_rejected():
    # a moov whose declared child size exceeds the moov span
    bad_child = struct.pack(">I", 4096) + b"mvhd" + b"\x00" * 8
    moov = struct.pack(">I", 8 + len(bad_child)) + b"moov" + bad_child
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4
    with pytest.raises(m.Mp4Error):
        m.parse_mp4(ftyp + moov)


def test_trak_without_hdlr_rejected():
    tk = m._box(b"trak", m._tkhd(0, 1, 10, 4, 4))
    moov = m._box(b"moov", m._mvhd(0, 600, 600) + tk)
    ftyp = m._box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"mp41")
    with pytest.raises(m.Mp4Error):
        m.parse_mp4(ftyp + moov)


def test_missing_mvhd_rejected():
    ftyp = m._box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"mp41")
    with pytest.raises(m.Mp4Error):
        m.parse_mp4(ftyp + m._box(b"moov", b""))


def test_first_video_track_wins_dimensions():
    got = _meta(
        tracks=[("soun", 0, 0), ("vide", 111, 222), ("vide", 9, 9)]
    )
    assert (got["width"], got["height"]) == (111, 222)
    assert got["handlers"] == ["soun", "vide", "vide"]
