"""miniquic (RFC 9000 frame layer) — vectors + rule tests.

Varint vectors are RFC 9000 §A.1's own examples; the rest pin the
rules the walk claims: non-canonical decode legality, ACK -2 gap
arithmetic and pn-0 underflow, §2.2 overlap equality, and the
implicit-length STREAM must-be-last position rule.
"""

from __future__ import annotations

import pytest
from hypothesis import given
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import miniquic as mq


# --- §16 / §A.1 varints ----------------------------------------------------

RFC_VECTORS = [
    (bytes.fromhex("c2197c5eff14e88c"), 151288809941952652),
    (bytes.fromhex("9d7f3e7d"), 494878333),
    (bytes.fromhex("7bbd"), 15293),
    (bytes.fromhex("25"), 37),
]


@pytest.mark.parametrize("raw,val", RFC_VECTORS)
def test_rfc_a1_varint_vectors(raw, val):
    v, pos = mq.decode_varint(raw, 0)
    assert (v, pos) == (val, len(raw))
    assert mq.encode_varint(val) == raw  # all four are shortest-form


def test_non_canonical_decode_is_legal():
    # §A.1: 0x4025 and 0x25 both decode to 37
    assert mq.decode_varint(bytes.fromhex("4025"), 0)[0] == 37
    assert mq.decode_varint(bytes.fromhex("80000025"), 0)[0] == 37
    assert mq.canonical_len(37) == 1
    assert mq.encode_varint(37, width=4) == bytes.fromhex("80000025")


def test_varint_truncation_rejected():
    with pytest.raises(ValueError):
        mq.decode_varint(bytes.fromhex("c2197c"), 0)
    with pytest.raises(ValueError):
        mq.decode_varint(b"", 0)
    with pytest.raises(ValueError):
        mq.encode_varint(1 << 62)


@given(st.integers(min_value=0, max_value=(1 << 62) - 1))
def test_varint_roundtrip(v):
    raw = mq.encode_varint(v)
    assert mq.decode_varint(raw, 0) == (v, len(raw))
    assert len(raw) == mq.canonical_len(v)


# --- ACK arithmetic --------------------------------------------------------

def test_ack_two_ranges_counts():
    # largest=10, first_len=2 acks {8,9,10}; gap=1, len=1 then acks
    # next_largest = 8 - 1 - 2 = 5, smallest = 4 -> {4,5}
    buf = mq.ack_frame(10, 0, [(0, 2), (1, 1)])
    m = mq.decode_payload(buf)
    assert m["acks"][0]["n_acked"] == 5
    assert m["acks"][0]["largest"] == 10


def test_ack_underflow_rejected():
    with pytest.raises(ValueError, match="underflow"):
        mq.decode_payload(mq.ack_frame(1, 0, [(0, 2)]))
    with pytest.raises(ValueError, match="underflow"):
        # second range: next_largest = 5-0-2 = 3, len 4 -> -1
        mq.decode_payload(mq.ack_frame(10, 0, [(0, 5), (0, 4)]))


# --- stream reassembly rules ----------------------------------------------

def test_overlap_equal_ok_mismatch_rejected():
    ok = mq.stream_frame(0, b"abcd", offset=0) + mq.stream_frame(
        0, b"cdef", offset=2, fin=True
    )
    m = mq.decode_payload(ok)
    assert m["streams"][0]["body"] == b"abcdef"
    assert m["streams"][0]["complete"]
    bad = mq.stream_frame(0, b"abcd", offset=0) + mq.stream_frame(
        0, b"XYef", offset=2, fin=True
    )
    with pytest.raises(ValueError, match="overlap"):
        mq.decode_payload(bad)


def test_gap_leaves_stream_incomplete():
    buf = mq.stream_frame(0, b"abc", offset=0) + mq.stream_frame(
        0, b"xyz", offset=10, fin=True
    )
    s = mq.decode_payload(buf)["streams"][0]
    assert s["body"] == b"abc" and not s["complete"]


def test_implicit_length_absorbs_successors():
    # §19.8: the LEN-less form extends to end of packet BY DEFINITION
    # — that is why it must be encoded last. A frame placed after it
    # is not detectable; it becomes stream data.
    tail = mq.stream_frame(4, b"tail", explicit_len=False, fin=True)
    ok = mq.stream_frame(0, b"x", offset=0, fin=True) + tail
    assert mq.decode_payload(ok)["streams"][4]["body"] == b"tail"
    bad = tail + mq.stream_frame(0, b"x", offset=0, fin=True)
    m = mq.decode_payload(bad)
    assert 0 not in m["streams"]
    assert m["streams"][4]["body"].startswith(b"tail")
    assert len(m["streams"][4]["body"]) > 4


def test_conflicting_fin_offsets_rejected():
    buf = mq.stream_frame(0, b"ab", offset=0, fin=True) + mq.stream_frame(
        0, b"abc", offset=0, fin=True
    )
    with pytest.raises(ValueError, match="FIN"):
        mq.decode_payload(buf)


def test_unknown_frame_type_rejected():
    with pytest.raises(ValueError, match="unknown frame"):
        mq.decode_payload(bytes([0x42]))


def test_padding_not_counted_as_frames():
    buf = bytes(5) + bytes([mq.FT_PING]) + bytes(3)
    m = mq.decode_payload(buf)
    assert m["n_frames"] == 1 and m["padding"] == 8 and m["pings"] == 1


def test_truncation_sweep():
    # every strict prefix of a valid payload either raises or yields
    # a walk that never reads past the buffer (no silent garbage)
    full = (
        mq.crypto_frame(0, b"hello")
        + mq.ack_frame(9, 1, [(0, 1)])
        + mq.stream_frame(0, b"body", offset=0, fin=True)
    )
    mq.decode_payload(full)
    for i in range(1, len(full)):
        try:
            mq.decode_payload(full[:i])
        except ValueError:
            pass


def test_max_data_and_max_stream_data_kept_apart():
    # a payload carrying BOTH limit frame types (r4 ADVICE): the
    # connection-level max_data must not be clobbered by a later
    # MAX_STREAM_DATA, which is tracked per stream id instead
    buf = (
        bytes([mq.FT_MAX_DATA]) + mq.encode_varint(5000)
        + bytes([mq.FT_MAX_STREAM_DATA])
        + mq.encode_varint(4) + mq.encode_varint(1234)
        + bytes([mq.FT_MAX_STREAM_DATA])
        + mq.encode_varint(8) + mq.encode_varint(777)
    )
    m = mq.decode_payload(buf)
    assert m["max_data"] == 5000
    assert m["max_stream_data"] == {4: 1234, 8: 777}
    assert m["n_frames"] == 3


def test_flow_control_limits_monotone():
    # §4.1: a limit that does not increase the window is ignored —
    # frames can arrive reordered
    buf = (
        bytes([mq.FT_MAX_DATA]) + mq.encode_varint(5000)
        + bytes([mq.FT_MAX_DATA]) + mq.encode_varint(3000)
        + bytes([mq.FT_MAX_STREAM_DATA])
        + mq.encode_varint(4) + mq.encode_varint(900)
        + bytes([mq.FT_MAX_STREAM_DATA])
        + mq.encode_varint(4) + mq.encode_varint(600)
    )
    m = mq.decode_payload(buf)
    assert m["max_data"] == 5000
    assert m["max_stream_data"] == {4: 900}
