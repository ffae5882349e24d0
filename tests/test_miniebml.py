"""miniebml (RFC 9559) vint/master-element contracts."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import miniebml as eb


def test_vint_size_widths_roundtrip():
    for v in (0, 1, 126, 127, 128, 16382, 16383, 16384, 2**35, 2**49):
        raw = eb.write_size(v)
        got, pos = eb.read_size(raw, 0)
        assert got == v and pos == len(raw)


def test_size_all_ones_means_unknown():
    assert eb.read_size(b"\xff", 0) == (None, 1)
    # 2-byte all-ones too
    assert eb.read_size(b"\x7f\xff", 0) == (None, 2)


def test_id_keeps_marker_bit():
    eid, pos = eb.read_id(bytes.fromhex("1a45dfa3"), 0)
    assert eid == eb.EBML_HEADER and pos == 4
    eid, pos = eb.read_id(b"\xae", 0)
    assert eid == eb.TRACK_ENTRY and pos == 1


def test_known_size_segment_roundtrip():
    blob = eb.build_webm(
        duration_ms=12000.0, video=("V_VP9", 640, 480),
        audio=("A_OPUS", 2, 48000.0),
    )
    m = eb.parse(blob)
    assert m["doctype"] == "webm" and m["ebml_version"] == 1
    assert m["duration"] == 12000.0
    assert [t["type"] for t in m["tracks"]] == [1, 2]
    assert m["tracks"][0]["width"] == 640
    assert m["tracks"][1]["channels"] == 2
    assert m["tracks"][1]["sampling"] == 48000.0


def test_unknown_size_segment_parses_to_eof():
    blob = eb.build_webm(
        duration_ms=5000.0, video=("V_VP8", 320, 240),
        unknown_size_segment=True,
    )
    # the segment's size byte is the 0xFF unknown marker
    hdr_len = len(
        eb.element(
            eb.EBML_HEADER,
            eb.uint_el(eb.E_EBML_VERSION, 1) + eb.str_el(eb.E_DOCTYPE, "webm"),
        )
    )
    assert blob[hdr_len + 4] == 0xFF
    m = eb.parse(blob)
    assert m["duration"] == 5000.0 and len(m["tracks"]) == 1


def test_wide_and_narrow_floats_both_read():
    for wide in (False, True):
        blob = eb.build_webm(
            duration_ms=23000.0, video=("V_VP9", 320, 240),
            wide_floats=wide,
        )
        assert eb.parse(blob)["duration"] == 23000.0


def test_unknown_ids_skipped_by_size():
    # splice an unknown (but well-formed) element inside Info
    info_body = (
        eb.uint_el(eb.E_TS_SCALE, 1000000)
        + eb.element(0xEC, b"\x00" * 5)  # Void-like filler
        + eb.float_el(eb.E_DURATION, 7000.0)
    )
    blob = (
        eb.element(
            eb.EBML_HEADER,
            eb.uint_el(eb.E_EBML_VERSION, 1) + eb.str_el(eb.E_DOCTYPE, "webm"),
        )
        + eb.element(eb.SEGMENT, eb.element(eb.INFO, info_body))
    )
    m = eb.parse(blob)
    assert m["duration"] == 7000.0


def test_element_overrun_rejected():
    # child claims more bytes than its container holds
    bad_info = eb.write_id(eb.INFO) + eb.write_size(3) + (
        eb.write_id(eb.E_TS_SCALE) + eb.write_size(200)
    )
    blob = (
        eb.element(
            eb.EBML_HEADER,
            eb.uint_el(eb.E_EBML_VERSION, 1) + eb.str_el(eb.E_DOCTYPE, "webm"),
        )
        + eb.write_id(eb.SEGMENT)
        + eb.write_size(len(bad_info))
        + bad_info
    )
    with pytest.raises(ValueError, match="overrun"):
        eb.parse(blob)


def test_unknown_size_leaf_rejected():
    blob = (
        eb.element(
            eb.EBML_HEADER,
            eb.uint_el(eb.E_EBML_VERSION, 1) + eb.str_el(eb.E_DOCTYPE, "webm"),
        )
        + eb.write_id(eb.E_DURATION) + b"\xff" + b"\x00" * 4
    )
    with pytest.raises(ValueError, match="non-master"):
        eb.parse(blob)


def test_truncation_sweep():
    blob = eb.build_webm(
        duration_ms=9000.0, video=("V_VP9", 320, 240),
        audio=("A_OPUS", 1, 48000.0),
    )
    hdr_len = len(
        eb.element(
            eb.EBML_HEADER,
            eb.uint_el(eb.E_EBML_VERSION, 1) + eb.str_el(eb.E_DOCTYPE, "webm"),
        )
    )
    for cut in range(1, len(blob)):
        if cut == hdr_len:
            # header alone is a valid (segmentless) stream prefix
            assert eb.parse(blob[:cut])["tracks"] == []
            continue
        with pytest.raises(ValueError):
            eb.parse(blob[:cut])


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=16, max_value=7680),
    h=st.integers(min_value=16, max_value=4320),
    dur=st.integers(min_value=1, max_value=10**6),
    unk=st.booleans(),
    wide=st.booleans(),
)
def test_roundtrip_property(w, h, dur, unk, wide):
    blob = eb.build_webm(
        duration_ms=float(dur), video=("V_VP9", w, h),
        unknown_size_segment=unk, wide_floats=wide,
    )
    m = eb.parse(blob)
    t = m["tracks"][0]
    assert (t["width"], t["height"]) == (w, h)
    if wide or dur < 2**24:
        assert m["duration"] == float(dur)
