"""PDF 1.5 xref-stream walk, source-map VLQ, and cookie-match edge
contracts."""

from __future__ import annotations

import re
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import minipdf15 as p15
from goto_eater_crawler_spark.functions import minivlq as vlq


def test_pdf15_roundtrip_two_pages():
    pages = [[["A1", "B2"], ["C3", "D4"]], [["x", "y", "z"]]]
    rows = p15.extract_text_rows(p15.write_pdf15(pages))
    assert [[c for _, c in r] for r in rows[0]] == [["A1", "B2"],
                                                   ["C3", "D4"]]
    assert [[c for _, c in r] for r in rows[1]] == [["x", "y", "z"]]


def test_pdf15_predictor_is_load_bearing():
    """Rows after the first are stored as Up deltas: parsing the
    inflated xref data WITHOUT undoing the predictor must yield
    garbage offsets (≠ the real ones)."""
    blob = p15.write_pdf15([[["t"]]])
    m = re.search(rb"startxref\s+(\d+)", blob[-100:])
    xoff = int(m.group(1))
    _, xdata = p15._read_stream_obj(blob, xoff)
    rows_pred = p15._png_up_decode(xdata, 7)
    stride = 8
    raw_rows = [xdata[i + 1 : i + stride] for i in range(0, len(xdata), stride)]
    assert raw_rows != rows_pred  # delta rows differ from resolved rows
    # and the resolved entries point at real "N 0 obj" headers
    for row in rows_pred:
        if row[0] == 1:
            off = int.from_bytes(row[1:5], "big")
            assert re.compile(rb"\d+ 0 obj").match(blob, off)


def test_pdf15_objstm_holds_catalog():
    blob = p15.write_pdf15([[["q"]]])
    m = re.search(rb"/Type /ObjStm.*?stream\r?\n", blob, re.S)
    assert m
    lm = re.search(rb"/ObjStm /N (\d+) /First (\d+) /Length (\d+)", blob)
    start = m.end()
    data = zlib.decompress(blob[start : start + int(lm.group(3))])
    assert b"/Type /Catalog" in data and b"/Type /Pages" in data


def test_vlq_known_digits():
    # sourcemap spec examples: 0->'A', 1->'C', -1->'D', 16->'gB'
    assert vlq.vlq_encode(0) == "A"
    assert vlq.vlq_encode(1) == "C"
    assert vlq.vlq_encode(-1) == "D"
    assert vlq.vlq_encode(16) == "gB"
    assert vlq.vlq_decode("gB", 0) == (16, 2)


@settings(max_examples=200, deadline=None)
@given(v=st.integers(min_value=-(2**30), max_value=2**30))
def test_vlq_roundtrip(v):
    s = vlq.vlq_encode(v)
    assert vlq.vlq_decode(s, 0) == (v, len(s))


def test_mappings_semicolon_resets_only_gen_col():
    # two lines; src accumulators cross the ';', gen_col resets
    m = vlq.decode_mappings(
        vlq.encode_mappings(
            [[[5, 0, 2, 3]], [[7, 0, 1, -2]]]
        )
    )
    assert m["segments"] == [(0, 5, 0, 2, 3), (1, 7, 0, 3, 1)]


def test_mappings_empty_line_counts():
    m = vlq.decode_mappings("AAAA;;AAAA")
    assert m["n_lines"] == 3 and m["n_segments"] == 2


def test_bad_field_count_rejected():
    with pytest.raises(ValueError, match="fields"):
        vlq.decode_mappings("AA")  # 2-field segment is illegal


def test_cookie_path_boundary_not_prefix_string(spark):
    """'/a' must match '/a/b/c' but NOT '/ab' (RFC 6265 §5.1.4)."""
    from goto_eater_crawler_spark.plans.queries import _COOKIE_JAR
    import duckdb

    # drive just the oracle's path predicate on a probe table
    sql = """
    SELECT p, cp,
           (p = cp OR (cp = substr(p, 1, length(cp))
             AND (substr(cp, length(cp), 1) = '/'
                  OR substr(p, length(cp) + 1, 1) = '/'))) AS ok
    FROM (VALUES ('/a/b/c', '/a'), ('/ab', '/a'), ('/a', '/a'),
                 ('/a/b', '/a/'), ('/ab', '/a/')) AS t(p, cp)
    """
    rows = {(p, cp): ok for p, cp, ok in duckdb.sql(sql).fetchall()}
    assert rows[("/a/b/c", "/a")] is True
    assert rows[("/ab", "/a")] is False
    assert rows[("/a", "/a")] is True
    assert rows[("/a/b", "/a/")] is True
    assert rows[("/ab", "/a/")] is False
    assert ("sid", "example.org", False, "/", False) in _COOKIE_JAR
