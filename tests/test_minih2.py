"""minih2 (RFC 9113) framing contracts: padding asymmetry,
CONTINUATION adjacency, R-bit masking, truncation sweep."""

from __future__ import annotations

import pytest

from goto_eater_crawler_spark.functions import minih2 as h2


def _session(frames: list[bytes]) -> bytes:
    return h2.PREFACE + b"".join(frames)


def test_padding_stripped_from_body_but_counted_in_flow():
    buf = _session([
        h2.data_frame(1, b"hello", end_stream=True, pad_len=7),
    ])
    m = h2.decode_session(buf)
    assert m["bodies"][1] == b"hello"
    assert m["flow_consumed"] == 5 + 1 + 7  # body + pad-len octet + pad


def test_interleaved_streams_reassemble_independently():
    buf = _session([
        h2.data_frame(1, b"AB"),
        h2.data_frame(3, b"xy"),
        h2.data_frame(1, b"CD", end_stream=True),
        h2.data_frame(3, b"z", end_stream=True),
    ])
    m = h2.decode_session(buf)
    assert m["bodies"] == {1: b"ABCD", 3: b"xyz"}
    assert m["ended"] == [1, 3]


def test_continuation_must_be_adjacent_same_stream():
    # another stream's frame between HEADERS and CONTINUATION: error
    buf = _session([
        h2.frame(h2.T_HEADERS, 0, 3, b"part1"),
        h2.data_frame(1, b"x"),
        h2.frame(h2.T_CONTINUATION, h2.F_END_HEADERS, 3, b"part2"),
    ])
    with pytest.raises(ValueError, match="interrupted"):
        h2.decode_session(buf)
    # correct adjacency decodes
    ok = _session([
        h2.frame(h2.T_HEADERS, 0, 3, b"part1"),
        h2.frame(h2.T_CONTINUATION, h2.F_END_HEADERS, 3, b"part2"),
    ])
    assert h2.decode_session(ok)["n_frames"] == 2


def test_unterminated_header_block_rejected():
    buf = _session([h2.frame(h2.T_HEADERS, 0, 3, b"p")])
    with pytest.raises(ValueError, match="unterminated"):
        h2.decode_session(buf)


def test_continuation_without_headers_rejected():
    buf = _session([h2.frame(h2.T_CONTINUATION, h2.F_END_HEADERS, 3, b"")])
    with pytest.raises(ValueError, match="without open"):
        h2.decode_session(buf)


def test_r_bit_masked_not_rejected():
    f = bytearray(h2.data_frame(1, b"q", end_stream=True))
    f[5] |= 0x80  # set the reserved bit of the stream id
    m = h2.decode_session(h2.PREFACE + bytes(f))
    assert m["bodies"][1] == b"q"


def test_settings_ack_with_payload_rejected():
    raw = h2.frame(h2.T_SETTINGS, h2.F_ACK, 0, b"\x00" * 6)
    with pytest.raises(ValueError, match="ACK with payload"):
        h2.decode_session(h2.PREFACE + raw)


def test_pad_length_exceeding_payload_rejected():
    # PADDED flag, payload is 1 octet saying pad=200 but nothing follows
    raw = h2.frame(h2.T_DATA, h2.F_PADDED, 1, bytes([200]))
    with pytest.raises(ValueError, match="pad length exceeds"):
        h2.decode_session(h2.PREFACE + raw)


def test_data_on_stream_zero_rejected():
    with pytest.raises(ValueError, match="stream 0"):
        h2.decode_session(_session([h2.data_frame(0, b"x")]))


def test_missing_preface_rejected():
    with pytest.raises(ValueError, match="preface"):
        h2.decode_session(h2.data_frame(1, b"x"))


def test_truncation_sweep():
    frames = [
        h2.settings_frame([(h2.SETTINGS_MAX_FRAME_SIZE, 16384)]),
        h2.data_frame(1, b"hello", end_stream=True, pad_len=2),
        h2.frame(h2.T_GOAWAY, 0, 0, (1).to_bytes(4, "big") + bytes(4)),
    ]
    buf = _session(frames)
    # exact frame boundaries parse as a shorter (valid) session;
    # every OTHER cut must raise — never misparse
    boundaries = {len(h2.PREFACE)}
    off = len(h2.PREFACE)
    for f in frames:
        off += len(f)
        boundaries.add(off)
    for cut in range(len(h2.PREFACE), len(buf)):
        if cut in boundaries:
            m = h2.decode_session(buf[:cut])
            assert m["n_frames"] < len(frames)
        else:
            with pytest.raises(ValueError):
                h2.decode_session(buf[:cut])
