"""miniarrowipc vs pyarrow, the reference producer — values must
match pyarrow's own reader exactly, and the refuse-don't-misread
arms must fire."""

from __future__ import annotations

import io
import struct

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import miniarrowipc as ai


def _stream(table, chunks=None):
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, table.schema) as w:
        if chunks:
            off = 0
            for c in chunks:
                w.write_table(table.slice(off, c))
                off += c
        else:
            w.write_table(table)
    return sink.getvalue()


def _columns(m):
    cols = {f["name"]: [] for f in m["fields"]}
    for b in m["batches"]:
        for k, v in b["columns"].items():
            cols[k].extend(v)
    return cols


BASE = pa.table({
    "id": pa.array([1, -2, 3, None, 5], pa.int64()),
    "score": pa.array([1.5, None, 2.25, 8.0, -0.125], pa.float64()),
    "tag": pa.array(["a", None, "", "日本語", "dd"], pa.utf8()),
    "flag": pa.array([True, False, None, True, False], pa.bool_()),
})


def test_values_match_pyarrow_reader():
    blob = _stream(BASE)
    m = ai.read_stream(blob)
    theirs = pa.ipc.open_stream(io.BytesIO(blob)).read_all()
    assert _columns(m) == {
        name: theirs.column(name).to_pylist()
        for name in theirs.column_names
    }
    assert [f["type"] for f in m["fields"]] == [
        ("int", 64, True), ("float", 2), ("utf8",), ("bool",),
    ]


def test_multi_batch_and_nullability():
    m = ai.read_stream(_stream(BASE, chunks=[2, 2, 1]))
    assert len(m["batches"]) == 3
    assert [b["n_rows"] for b in m["batches"]] == [2, 2, 1]
    assert _columns(m)["id"] == [1, -2, 3, None, 5]


def test_narrow_int_types():
    t = pa.table({
        "a": pa.array([1, 255], pa.uint8()),
        "b": pa.array([-300, 300], pa.int16()),
        "c": pa.array([1.5, -2.5], pa.float32()),
    })
    cols = _columns(ai.read_stream(_stream(t)))
    assert cols == {"a": [1, 255], "b": [-300, 300], "c": [1.5, -2.5]}


def test_empty_table():
    t = pa.table({"id": pa.array([], pa.int64())})
    m = ai.read_stream(_stream(t))
    assert _columns(m) == {"id": []}


def test_dictionary_refused():
    t = pa.table({
        "d": pa.array(["x", "y", "x"]).dictionary_encode(),
    })
    with pytest.raises(ai.ArrowError, match="[Dd]ictionary"):
        ai.read_stream(_stream(t))


def test_unsupported_type_refused():
    t = pa.table({"ts": pa.array([1, 2], pa.timestamp("us"))})
    with pytest.raises(ai.ArrowError, match="ordinal"):
        ai.read_stream(_stream(t))


def test_bad_marker_and_truncation():
    blob = _stream(BASE)
    with pytest.raises(ai.ArrowError, match="marker"):
        ai.read_stream(b"\x00" + blob[1:])
    for cut in (4, len(blob) // 2, len(blob) - 3):
        with pytest.raises(ai.ArrowError):
            ai.read_stream(blob[:cut])


def test_batch_before_schema_refused():
    blob = _stream(BASE)
    # find the second message (the record batch) and present the
    # stream starting there
    mlen = struct.unpack_from("<i", blob, 4)[0]
    second = blob[8 + mlen:]
    with pytest.raises(ai.ArrowError, match="before schema"):
        ai.read_stream(second)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(),
                      st.integers(min_value=-(1 << 62),
                                  max_value=1 << 62)),
            st.one_of(st.none(), st.text(max_size=12)),
            st.one_of(st.none(), st.booleans()),
        ),
        min_size=0, max_size=25,
    )
)
def test_roundtrip_fuzz(rows):
    t = pa.table({
        "i": pa.array([r[0] for r in rows], pa.int64()),
        "s": pa.array([r[1] for r in rows], pa.utf8()),
        "b": pa.array([r[2] for r in rows], pa.bool_()),
    })
    cols = _columns(ai.read_stream(_stream(t)))
    assert cols["i"] == [r[0] for r in rows]
    assert cols["s"] == [r[1] for r in rows]
    assert cols["b"] == [r[2] for r in rows]
