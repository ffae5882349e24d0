"""Microdata scoping + HTTP-date walk contracts."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.operators import transfer as tx


def test_civil_days_epoch_anchor():
    assert tx._days_from_civil(1970, 1, 1) == 0
    assert tx._days_from_civil(1970, 1, 2) == 1
    assert tx._days_from_civil(1969, 12, 31) == -1
    assert tx._days_from_civil(2000, 3, 1) == 11017


def test_rfc9110_example_all_three_forms():
    # the RFC's own example date in its three forms
    assert tx.parse_http_date("Sun, 06 Nov 1994 08:49:37 GMT") == 784111777
    assert tx.parse_http_date("Sunday, 06-Nov-94 08:49:37 GMT") == 784111777
    assert tx.parse_http_date("Sun Nov  6 08:49:37 1994") == 784111777


def test_two_digit_year_pivot():
    # 70-99 -> 19xx, 00-69 -> 20xx
    e1999 = tx.parse_http_date("Friday, 31-Dec-99 23:59:59 GMT")
    e2000 = tx.parse_http_date("Saturday, 01-Jan-00 00:00:00 GMT")
    assert e2000 - e1999 == 1


def test_format_roundtrip_all_formats():
    for fmt in ("imf", "rfc850", "asctime"):
        s = tx.format_http_date(2010, 7, 4, 12, 30, 45, fmt)
        assert tx.parse_http_date(s) == (
            tx._days_from_civil(2010, 7, 4) * 86400
            + 12 * 3600 + 30 * 60 + 45
        )


def test_asctime_day_is_space_padded():
    s = tx.format_http_date(1994, 11, 6, 8, 49, 37, "asctime")
    assert " Nov  6 " in s


def test_bad_timezone_rejected():
    with pytest.raises(ValueError, match="timezone"):
        tx.parse_http_date("Sun, 06 Nov 1994 08:49:37 UTC")


@settings(max_examples=100, deadline=None)
@given(
    y=st.integers(min_value=1971, max_value=2068),
    mo=st.integers(min_value=1, max_value=12),
    d=st.integers(min_value=1, max_value=28),
    hh=st.integers(min_value=0, max_value=23),
    mm=st.integers(min_value=0, max_value=59),
    ss=st.integers(min_value=0, max_value=59),
)
def test_epoch_matches_python_calendar(y, mo, d, hh, mm, ss):
    import calendar

    expect = calendar.timegm((y, mo, d, hh, mm, ss, 0, 0, 0))
    for fmt in ("imf", "asctime"):
        s = tx.format_http_date(y, mo, d, hh, mm, ss, fmt)
        assert tx.parse_http_date(s) == expect


def test_microdata_nested_scope_does_not_leak(spark):
    from goto_eater_crawler_spark.operators import extract as ex

    docs = spark.createDataFrame([(4,), (7,)], "doc_id long")
    rows = {
        r.doc_id: r
        for r in ex.microdata_extract(
            ex.synth_microdata_pages(docs)
        ).collect()
    }
    # street lives ONLY under the nested PostalAddress
    assert rows[4].street == "5 Main St"
    assert rows[4].postal == "004-0001"
    assert rows[7].name == "Shop 7"
    assert rows[7].menu == "/menu/7"
    assert rows[7].cuisine == "cuisine0"
