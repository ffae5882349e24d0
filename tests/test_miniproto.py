"""functions/miniproto — wire-format walk contracts."""

from __future__ import annotations

import pytest
from hypothesis import given
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import miniproto as m

_KW = dict(
    rec_id=7,
    url="https://x.example/p",
    status=200,
    delta=-3,
    content_type="text/html",
    size=512,
    tags=[1, 300, 0],
    score=2.5,
    crc=0xDEADBEEF,
)


def test_roundtrip_all_fields():
    got = m.decode_fetch(m.encode_fetch(**_KW))
    assert got == dict(_KW)


def test_unknown_field_skip_is_load_bearing():
    with_unknown = m.encode_fetch(**_KW, plant_unknown=True)
    without = m.encode_fetch(**_KW, plant_unknown=False)
    assert len(with_unknown) > len(without)
    assert m.decode_fetch(with_unknown) == m.decode_fetch(without)


@given(st.integers(0, (1 << 64) - 1))
def test_varint_roundtrip(n):
    enc = m.write_varint(n)
    got, end = m.read_varint(enc, 0)
    assert (got, end) == (n, len(enc))


@given(st.integers(-(1 << 62), 1 << 62))
def test_zigzag_roundtrip(n):
    assert m.unzigzag(m.zigzag(n)) == n


def test_zigzag_spec_vectors():
    # the table published in the encoding spec
    assert [m.zigzag(v) for v in (0, -1, 1, -2, 2147483647, -2147483648)] \
        == [0, 1, 2, 3, 4294967294, 4294967295]


def test_truncated_varint_rejected():
    with pytest.raises(m.ProtoError):
        m.read_varint(b"\x80\x80", 0)


def test_missing_required_field_rejected():
    blob = m.encode_fetch(**_KW)
    # drop the trailing fixed32 crc field (key + 4 bytes)
    with pytest.raises(m.ProtoError):
        m.decode_fetch(blob[: len(blob) - 5])


def test_packed_overrun_rejected():
    # a packed field whose declared length cuts a varint in half
    bad = m._key(6, 2) + m.write_varint(1) + b"\x80"
    with pytest.raises(m.ProtoError):
        m.decode_fetch(bad)
