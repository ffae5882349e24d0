"""minimsgpack — spec-family vectors, sign-extension contract,
rejections, and a hypothesis roundtrip."""

from __future__ import annotations

import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import minimsgpack as mp


def test_immediates():
    assert mp.encode(None) == b"\xc0"
    assert mp.encode(True) == b"\xc3"
    assert mp.encode(False) == b"\xc2"
    assert mp.encode(0) == b"\x00"
    assert mp.encode(127) == b"\x7f"
    assert mp.encode(-1) == b"\xff"
    assert mp.encode(-32) == b"\xe0"
    for b in (b"\xc0", b"\xc2", b"\xc3", b"\x7f", b"\xe0"):
        assert mp.encode(mp.decode(b)) == b


def test_canonical_int_families():
    assert mp.encode(128) == b"\xcc\x80"
    assert mp.encode(256) == b"\xcd\x01\x00"
    assert mp.encode(1 << 16) == b"\xce\x00\x01\x00\x00"
    assert mp.encode(1 << 32)[0] == 0xCF
    assert mp.encode(-33) == b"\xd0" + struct.pack(">b", -33)
    assert mp.encode(-129) == b"\xd1" + struct.pack(">h", -129)
    assert mp.encode(-(1 << 31)) == b"\xd2" + struct.pack(">i", -(1 << 31))
    assert mp.encode(-(1 << 32))[0] == 0xD3


def test_sign_extension_contract():
    # same bytes, different tag: uint8 0xff = 255, int8 0xff = -1
    assert mp.decode(b"\xcc\xff") == 255
    assert mp.decode(b"\xd0\xff") == -1
    assert mp.decode(b"\xcf" + b"\xff" * 8) == (1 << 64) - 1
    assert mp.decode(b"\xd3" + b"\xff" * 8) == -1


def test_str_vs_bin_families():
    assert mp.encode("abc") == b"\xa3abc"
    assert mp.encode(b"abc") == b"\xc4\x03abc"
    s = "x" * 32  # first width past fixstr
    assert mp.encode(s) == b"\xd9\x20" + b"x" * 32
    assert mp.decode(b"\xda\x00\x03abc") == "abc"  # legal wide form


def test_containers_nested():
    obj = {"a": [1, -2, None], "b": {"c": True}, "n": -300}
    assert mp.decode(mp.encode(obj)) == obj
    # fixmap/fixarray tags
    assert mp.encode({})[0] == 0x80
    assert mp.encode([])[0] == 0x90
    assert mp.decode(b"\xdc\x00\x02\x01\x02") == [1, 2]
    assert mp.decode(b"\xde\x00\x01\xa1a\x05") == {"a": 5}


def test_floats():
    assert mp.decode(b"\xca" + struct.pack(">f", 1.5)) == 1.5
    v = mp.decode(mp.encode(3.14159))
    assert math.isclose(v, 3.14159, rel_tol=0)


def test_rejections():
    with pytest.raises(mp.MsgpackError, match="never used"):
        mp.decode(b"\xc1")
    with pytest.raises(mp.MsgpackError, match="trailing"):
        mp.decode(b"\x01\x02")
    with pytest.raises(mp.MsgpackError, match="duplicate"):
        mp.decode(b"\x82\xa1a\x01\xa1a\x02")
    with pytest.raises(mp.MsgpackError, match="truncated"):
        mp.decode(b"\xcd\x01")
    with pytest.raises(mp.MsgpackError, match="truncated"):
        mp.decode(b"\x91")
    with pytest.raises(mp.MsgpackError):  # ext unsupported
        mp.decode(b"\xd4\x01\x00")


SCALARS = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(1 << 63), max_value=(1 << 64) - 1),
    st.floats(allow_nan=False, width=64),
    st.text(max_size=40),
    st.binary(max_size=40),
)
OBJS = st.recursive(
    SCALARS,
    lambda inner: st.one_of(
        st.lists(inner, max_size=5),
        st.dictionaries(st.text(max_size=8), inner, max_size=5),
    ),
    max_leaves=20,
)


@settings(max_examples=150, deadline=None)
@given(OBJS)
def test_roundtrip(obj):
    assert mp.decode(mp.encode(obj)) == obj
