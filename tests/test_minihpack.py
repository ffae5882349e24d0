"""functions/minihpack — RFC 7541 contracts."""

from __future__ import annotations

import pytest
from hypothesis import given
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import minihpack as hp


def test_rfc_c1_integer_examples():
    # RFC 7541 Appendix C.1: 10 in 5-bit prefix; 1337 in 5-bit
    # prefix -> 1f 9a 0a; 42 in 8-bit prefix
    assert hp.encode_int(10, 5) == bytes([0x0A])
    assert hp.encode_int(1337, 5) == bytes([0x1F, 0x9A, 0x0A])
    assert hp.encode_int(42, 8) == bytes([0x2A])
    assert hp.decode_int(bytes([0x1F, 0x9A, 0x0A]), 0, 5) == (1337, 3)


@given(st.integers(0, 1 << 30), st.integers(1, 8))
def test_integer_roundtrip(v, prefix):
    enc = hp.encode_int(v, prefix)
    got, end = hp.decode_int(enc, 0, prefix)
    assert (got, end) == (v, len(enc))


def test_static_table_basics():
    t = hp.DynamicTable()
    assert t.lookup(2) == (":method", "GET")
    assert t.lookup(61) == ("www-authenticate", "")
    with pytest.raises(hp.HpackError):
        t.lookup(0)
    with pytest.raises(hp.HpackError):
        t.lookup(62)  # empty dynamic table


def test_dynamic_indexing_and_rfc_entry_size():
    t = hp.DynamicTable()
    blk = hp.Encoder()
    data = blk.literal_indexing("x-a", "1") + hp.Encoder().indexed(62)
    got = hp.decode_block(data, t)
    assert got == [("x-a", "1"), ("x-a", "1")]
    assert t.size == len("x-a") + len("1") + 32  # §4.1 entry size


def test_eviction_order_is_oldest_first():
    t = hp.DynamicTable(max_size=80)
    t.insert("aaaa", "1")  # 37
    t.insert("bbbb", "2")  # 37, total 74
    t.insert("cccc", "3")  # would be 111 -> evict aaaa
    assert t.evictions == 1
    assert [n for n, _ in t.entries] == ["cccc", "bbbb"]


def test_size_update_evicts_mid_connection():
    t = hp.DynamicTable()
    t.insert("aaaa", "1")
    t.insert("bbbb", "2")
    hp.decode_block(hp.encode_int(40, 5, 0x20), t)  # size update
    assert t.evictions == 1 and len(t.entries) == 1
    assert t.entries[0][0] == "bbbb"


def test_cross_block_state_is_required():
    enc = hp.Encoder()
    b1 = enc.literal_indexing("x-t", "v")
    b2 = enc.indexed(62)
    t = hp.DynamicTable()
    assert hp.decode_block(b1, t) == [("x-t", "v")]
    assert hp.decode_block(b2, t) == [("x-t", "v")]
    # a FRESH table cannot decode block 2 (stateless decoder fails)
    with pytest.raises(hp.HpackError):
        hp.decode_block(b2, hp.DynamicTable())


def test_huffman_flag_rejected_as_out_of_scope():
    blob = bytes([0x40, 0x83, 0x01, 0x02, 0x03])  # H bit set on name
    with pytest.raises(hp.HpackError):
        hp.decode_block(blob, hp.DynamicTable())


def test_truncated_string_rejected():
    blob = bytes([0x40, 0x05, 0x61, 0x62])  # claims 5, has 2
    with pytest.raises(hp.HpackError):
        hp.decode_block(blob, hp.DynamicTable())
