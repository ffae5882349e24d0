"""functions/miniws — RFC 6455 framing contracts."""

from __future__ import annotations

import pytest

from goto_eater_crawler_spark.functions import miniws as m

KEY = b"\x12\x34\x56\x78"


def test_unmask_is_load_bearing():
    f = m.write_frame(0x1, b"hello", mask_key=KEY)
    assert b"hello" not in f  # bytes actually masked on the wire
    got = m.parse_stream(f)
    assert got["messages"] == [(0x1, b"hello")]
    assert got["n_masked"] == 1


def test_extended_16bit_length_roundtrip():
    payload = bytes(range(256)) * 2  # 512 >= 126
    f = m.write_frame(0x2, payload, mask_key=KEY)
    assert f[1] & 0x7F == 126
    assert m.parse_stream(f)["messages"] == [(0x2, payload)]


def test_extended_64bit_length_roundtrip():
    payload = b"x" * 70000
    f = m.write_frame(0x2, payload)
    assert f[1] & 0x7F == 127
    assert m.parse_stream(f)["messages"] == [(0x2, payload)]


def test_fragmentation_with_interleaved_ping():
    ping = m.write_frame(0x9, b"hb", mask_key=KEY)
    stream = m.write_fragmented(0x1, b"abcdefghij", 3, KEY, [ping])
    got = m.parse_stream(stream)
    assert got["messages"] == [(0x1, b"abcdefghij")]
    assert got["pings"] == [b"hb"]
    assert got["n_frames"] == 4


def test_data_frame_inside_open_message_rejected():
    first = m.write_frame(0x1, b"ab", fin=False)
    second = m.write_frame(0x1, b"cd")  # must be continuation, not text
    with pytest.raises(m.WsError):
        m.parse_stream(first + second)


def test_continuation_without_open_message_rejected():
    with pytest.raises(m.WsError):
        m.parse_stream(m.write_frame(0x0, b"xx"))


def test_fragmented_control_frame_rejected():
    with pytest.raises(m.WsError):
        m.parse_stream(m.write_frame(0x9, b"p", fin=False))


def test_stream_ending_mid_message_rejected():
    with pytest.raises(m.WsError):
        m.parse_stream(m.write_frame(0x1, b"ab", fin=False))


def test_truncated_payload_rejected():
    f = m.write_frame(0x1, b"hello world", mask_key=KEY)
    with pytest.raises(m.WsError):
        m.parse_stream(f[:-3])


def test_non_minimal_extended_length_rejected():
    import struct

    bad = bytes([0x81, 126]) + struct.pack(">H", 5) + b"abcde"
    with pytest.raises(m.WsError):
        m.parse_stream(bad)
