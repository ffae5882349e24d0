"""functions/minimp3 — ID3v2 synchsafe + MPEG frame-walk contracts."""

from __future__ import annotations

import pytest
from hypothesis import given
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import minimp3 as m


def test_roundtrip_basic():
    blob = m.write_mp3(
        {"TIT2": "hello", "TPE1": "band"},
        bitrate_idx=10,  # 160 kbps
        sr_idx=1,  # 48000
        n_frames=4,
    )
    got = m.parse_mp3(blob)
    assert got == {
        "title": "hello",
        "artist": "band",
        "bitrate_kbps": 160,
        "sample_rate": 48000,
        "n_frames": 4,
        "duration_ms": 4 * 1152 * 1000 // 48000,
    }


@given(st.integers(0, 1 << 28 - 1))
def test_synchsafe_roundtrip(n):
    enc = m.synchsafe(n)
    assert all(b < 0x80 for b in enc)  # never contains frame sync
    assert m.unsynchsafe(enc) == n


def test_synchsafe_multibyte_is_load_bearing():
    # 200-byte tag: a plain u32 read would compute a different size
    # (200 = 0b11001000 -> synchsafe 0x01 0x48) and lose frame sync.
    blob = m.write_mp3({"TIT2": "x"}, 5, 0, 2, id3_pad=170)
    assert m.unsynchsafe(blob[6:10]) > 127
    assert m.parse_mp3(blob)["n_frames"] == 2


def test_padding_bit_changes_frame_length():
    assert m.frame_len(9, 1, 1) == m.frame_len(9, 1, 0) + 1
    # alternating padding across frames still walks cleanly
    assert m.parse_mp3(m.write_mp3({}, 9, 1, 5))["n_frames"] == 5


def test_lost_sync_rejected():
    blob = m.write_mp3({"TIT2": "x"}, 5, 0, 2)
    bad = bytearray(blob)
    _, off = m.read_id3v2(blob)
    bad[off] = 0x00  # clobber first sync byte
    with pytest.raises(m.Mp3Error):
        m.parse_mp3(bytes(bad))


def test_truncated_final_frame_rejected():
    blob = m.write_mp3({}, 5, 0, 3)
    with pytest.raises(m.Mp3Error):
        m.parse_mp3(blob[:-5])


def test_reserved_bitrate_index_rejected():
    hdr = m.frame_header(15, 0, 0)
    with pytest.raises(m.Mp3Error):
        m.parse_mp3(hdr + b"\x00" * 100)


def test_id3_frame_overrun_rejected():
    import struct

    body = b"TIT2" + struct.pack(">IH", 9999, 0) + b"\x00hi"
    blob = b"ID3\x03\x00\x00" + m.synchsafe(len(body)) + body
    with pytest.raises(m.Mp3Error):
        m.read_id3v2(blob)


def test_no_tag_stream_parses():
    blob = m.write_mp3({}, 3, 2, 2)
    # strip the (empty-frames) ID3 tag entirely
    _, off = m.read_id3v2(blob)
    got = m.parse_mp3(blob[off:])
    assert got["title"] is None and got["n_frames"] == 2
    assert got["sample_rate"] == 32000
