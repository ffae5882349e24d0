"""miniparquet data-page walk vs pyarrow, the reference producer."""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import miniparquet as mp


def _pq(table, **kw):
    sink = io.BytesIO()
    pq.write_table(
        table, sink, compression=kw.pop("compression", "NONE"),
        use_dictionary=kw.pop("use_dictionary", False),
        data_page_version="1.0", **kw,
    )
    return sink.getvalue()


def test_values_match_pyarrow():
    t = pa.table({
        "id": pa.array([1, -2, None, 4], pa.int64()),
        "f": pa.array([0.5, None, 2.25, -8.0], pa.float64()),
        "s": pa.array(["a", "", None, "日本"], pa.utf8()),
        "i32": pa.array([7, None, -9, 0], pa.int32()),
    })
    cols = mp.read_table_values(_pq(t))
    for name in t.column_names:
        assert cols[name] == t.column(name).to_pylist(), name
    assert cols["_num_rows"] == 4


def test_multi_row_group():
    t = pa.table({"id": pa.array(list(range(100)), pa.int64())})
    blob = _pq(t, row_group_size=30)
    cols = mp.read_table_values(blob)
    assert cols["id"] == list(range(100))
    assert len(mp.read_footer(blob)["row_groups"]) == 4


def test_rle_hybrid_both_arms():
    # long null runs force RLE runs; alternating nulls force
    # bit-packed groups — both arms of the hybrid live
    vals = [None] * 40 + [1] * 40 + [i if i % 2 else None
                                     for i in range(40)]
    t = pa.table({"x": pa.array(vals, pa.int64())})
    assert mp.read_table_values(_pq(t))["x"] == vals


def test_dictionary_chunk_refused():
    t = pa.table({"s": pa.array(["a", "b", "a"] * 10, pa.utf8())})
    blob = _pq(t, use_dictionary=True)
    with pytest.raises(mp.ParquetError, match="dictionary"):
        mp.read_table_values(blob)


def test_compressed_page_refused():
    t = pa.table({"id": pa.array(list(range(50)), pa.int64())})
    blob = _pq(t, compression="snappy")
    with pytest.raises(mp.ParquetError):
        mp.read_table_values(blob)


def test_rle_bp_decode_vectors():
    # RLE run: header = count<<1 (LSB 0); width 1 -> 1 value byte
    assert mp._rle_bp_decode(bytes([10 << 1, 1]), 1, 10) == [1] * 10
    # bit-packed: header = groups<<1 | 1; 1 group of 8, width 1,
    # byte 0b10110100 -> LSB-first values
    got = mp._rle_bp_decode(bytes([(1 << 1) | 1, 0b10110100]), 1, 8)
    assert got == [0, 0, 1, 0, 1, 1, 0, 1]
    with pytest.raises(mp.ParquetError, match="truncated"):
        mp._rle_bp_decode(bytes([10 << 1]), 1, 10)


@settings(max_examples=30, deadline=None)
@given(st.lists(
    st.one_of(st.none(),
              st.integers(min_value=-(1 << 62), max_value=1 << 62)),
    min_size=1, max_size=60,
))
def test_roundtrip_fuzz(vals):
    t = pa.table({"x": pa.array(vals, pa.int64())})
    assert mp.read_table_values(_pq(t))["x"] == vals
