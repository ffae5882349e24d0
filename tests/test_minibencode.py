"""minibencode (BEP 3) canonical-form contracts."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import minibencode as bc


def test_spec_examples():
    assert bc.encode(42) == b"i42e"
    assert bc.encode(-7) == b"i-7e"
    assert bc.encode(0) == b"i0e"
    assert bc.encode("spam") == b"4:spam"
    assert bc.encode(["a", 1]) == b"l1:ai1ee"
    assert bc.encode({"cow": "moo", "spam": "eggs"}) == (
        b"d3:cow3:moo4:spam4:eggse"
    )


def test_dict_keys_byte_sorted_on_encode():
    blob = bc.encode({"z": 1, "a": 2, "m": 3})
    assert blob.index(b"1:a") < blob.index(b"1:m") < blob.index(b"1:z")


def test_out_of_order_keys_rejected():
    with pytest.raises(ValueError, match="sorted"):
        bc.decode(b"d1:b0:1:a0:e")


def test_duplicate_key_rejected():
    with pytest.raises(ValueError, match="sorted"):
        bc.decode(b"d1:a0:1:a0:e")


def test_leading_zero_integer_rejected():
    with pytest.raises(ValueError):
        bc.decode(b"i03e")
    with pytest.raises(ValueError):
        bc.decode(b"i-0e")


def test_trailing_bytes_rejected():
    with pytest.raises(ValueError, match="trailing"):
        bc.decode(b"i1ei2e")


def test_truncated_string_rejected():
    with pytest.raises(ValueError, match="truncated"):
        bc.decode(b"10:short")


_atom = st.one_of(
    st.integers(min_value=-(10**12), max_value=10**12),
    st.binary(min_size=0, max_size=20),
)
_val = st.recursive(
    _atom,
    lambda c: st.one_of(
        st.lists(c, max_size=4),
        st.dictionaries(
            st.text(alphabet="abcxyz09", min_size=1, max_size=6),
            c,
            max_size=4,
        ),
    ),
    max_leaves=12,
)


def _norm(v):
    if isinstance(v, list):
        return [_norm(x) for x in v]
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    return v


@settings(max_examples=100, deadline=None)
@given(v=_val)
def test_roundtrip_property(v):
    assert bc.decode(bc.encode(v)) == _norm(v)
