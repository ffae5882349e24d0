"""minisqlite walk contracts: big-endian varints (anti-LEB128),
page-1 header duality, b-tree invariants, serial-type widths."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import minisqlite as sq


def _rows(n: int):
    return [
        (i + 1, [i * 3, f"lab{i}", i % 2, (i - 2) * 10**i, None])
        for i in range(n)
    ]


def test_varint_is_big_endian_not_leb128():
    # 300 = 0b100101100 -> SQLite: 0x82 0x2C (high group first);
    # LEB128 would be 0xAC 0x02
    assert sq.write_varint(300) == b"\x82\x2c"
    assert sq.read_varint(b"\x82\x2c", 0) == (300, 2)


def test_varint_9byte_and_negative():
    v = (1 << 62) + 987654321
    raw = sq.write_varint(v)
    assert len(raw) == 9
    assert sq.read_varint(raw, 0) == (v, 9)
    raw = sq.write_varint(-1)
    assert len(raw) == 9 and sq.read_varint(raw, 0)[0] == -1


@settings(max_examples=120, deadline=None)
@given(v=st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_varint_roundtrip_property(v):
    assert sq.read_varint(sq.write_varint(v), 0)[0] == v


def test_record_minimal_serial_widths():
    rec = sq.encode_record([0, 1, 127, 128, 2**23, -(2**31) - 1, 2**50])
    # types: 0->8, 1->9, int8, int16, int32 (2^23 exceeds int24's
    # 2^23-1 max), int48, int64
    assert rec[1:8] == bytes([8, 9, 1, 2, 4, 5, 6])
    assert sq.decode_record(rec) == [
        0, 1, 127, 128, 2**23, -(2**31) - 1, 2**50,
    ]
    # int24 boundary value really uses 3 bytes
    rec24 = sq.encode_record([2**23 - 1])
    assert rec24[1] == 3 and sq.decode_record(rec24) == [2**23 - 1]


def test_roundtrip_two_leaves():
    rows = _rows(7)
    m = sq.read_db(sq.build_db("docs", rows, rows_per_leaf=4))
    assert m["rows"] == rows
    assert m["n_pages"] == 4
    assert m["tables"][0]["rootpage"] == 2
    assert "CREATE TABLE docs" in m["tables"][0]["sql"]


def test_page1_duality_cell_offsets_are_page_relative():
    blob = sq.build_db("docs", _rows(3))
    # page-1 b-tree header at offset 100; its first cell pointer
    # must point past the 100-byte db header
    ncells = struct.unpack_from(">H", blob, 103)[0]
    assert ncells == 1
    off = struct.unpack_from(">H", blob, 108)[0]
    assert 100 < off < sq.PAGE_SIZE


def test_interior_key_must_match_child_max_rowid():
    blob = bytearray(sq.build_db("docs", _rows(7), rows_per_leaf=4))
    # corrupt the interior cell's rowid key (page 2)
    pg = 1 * sq.PAGE_SIZE
    off = struct.unpack_from(">H", blob, pg + 12)[0]
    key_pos = pg + off + 4
    blob[key_pos] = 0x7F  # key 127 != child max 4
    with pytest.raises(ValueError, match="child's max rowid"):
        sq.read_db(bytes(blob))


def test_wrong_page_count_rejected():
    blob = bytearray(sq.build_db("docs", _rows(3)))
    struct.pack_into(">I", blob, 28, 99)
    with pytest.raises(ValueError, match="page_count"):
        sq.read_db(bytes(blob))


def test_bad_magic_rejected():
    blob = bytearray(sq.build_db("docs", _rows(3)))
    blob[0] ^= 1
    with pytest.raises(ValueError, match="magic"):
        sq.read_db(bytes(blob))


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=12),
    vals=st.lists(
        st.one_of(
            st.none(),
            st.integers(min_value=-(2**62), max_value=2**62),
            st.text(
                alphabet="abcdefghij XYZ", min_size=0, max_size=20
            ),
        ),
        min_size=1,
        max_size=5,
    ),
)
def test_db_roundtrip_property(n, vals):
    rows = [(i + 1, list(vals)) for i in range(n)]
    m = sq.read_db(sq.build_db("t", rows, rows_per_leaf=3))
    assert m["rows"] == rows
