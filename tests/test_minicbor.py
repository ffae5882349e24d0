"""functions/minicbor — RFC 8949 walk contracts."""

from __future__ import annotations

import math
import struct

import pytest
from hypothesis import given
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import minicbor as m


def test_rfc8949_appendix_a_vectors():
    # published examples from the RFC's Appendix A table
    vectors = [
        (0, bytes.fromhex("00")),
        (10, bytes.fromhex("0a")),
        (23, bytes.fromhex("17")),
        (24, bytes.fromhex("1818")),
        (100, bytes.fromhex("1864")),
        (1000, bytes.fromhex("1903e8")),
        (1000000, bytes.fromhex("1a000f4240")),
        (-1, bytes.fromhex("20")),
        (-100, bytes.fromhex("3863")),
        (1.1, bytes.fromhex("fb3ff199999999999a")),
        (False, bytes.fromhex("f4")),
        (True, bytes.fromhex("f5")),
        (None, bytes.fromhex("f6")),
        ("a", bytes.fromhex("6161")),
        ([1, 2, 3], bytes.fromhex("83010203")),
        ({"a": 1, "b": [2, 3]}, bytes.fromhex("a26161016162820203")),
    ]
    for val, enc in vectors:
        assert m.encode(val) == enc, val
        assert m.decode(enc) == val, enc.hex()


def test_indefinite_array_roundtrip_and_vector():
    # RFC: [_ 1, [2, 3]] = 9f 01 82 02 03 ff
    enc = m.encode([1, [2, 3]], indefinite_arrays=True)
    assert enc == bytes.fromhex("9f01" + "9f0203ff" + "ff")
    assert m.decode(enc) == [1, [2, 3]]
    assert m.decode(bytes.fromhex("9f018202 03ff".replace(" ", ""))) == [
        1, [2, 3],
    ]


@given(
    st.recursive(
        st.one_of(
            st.integers(-(1 << 60), 1 << 60),
            st.text(max_size=8),
            st.binary(max_size=8),
            st.booleans(),
            st.none(),
        ),
        lambda inner: st.lists(inner, max_size=4)
        | st.dictionaries(st.text(max_size=4), inner, max_size=4),
        max_leaves=12,
    )
)
def test_roundtrip_property(obj):
    assert m.decode(m.encode(obj)) == obj
    assert m.decode(m.encode(obj, indefinite_arrays=True)) == obj


def test_break_inside_definite_array_rejected():
    with pytest.raises(m.CborError):
        m.decode(bytes.fromhex("8201ff"))


def test_trailing_bytes_rejected():
    with pytest.raises(m.CborError):
        m.decode(bytes.fromhex("0000"))


def test_truncations_rejected():
    enc = m.encode({"k": [1, 2, "abc"]})
    for cut in range(1, len(enc)):
        with pytest.raises(m.CborError):
            m.decode(enc[:cut])


def test_float64_bit_exact():
    for v in (0.5, -0.0, 1e308, math.pi):
        enc = m.encode(v)
        assert struct.pack(">d", m.decode(enc)) == struct.pack(">d", v)
