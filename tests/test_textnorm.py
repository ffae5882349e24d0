"""normalize_text parity with the reference pipeline, including its
own inline golden (pipelines.py:53-54)."""

from __future__ import annotations

import pandas as pd

from goto_eater_crawler_spark.functions.textnorm import (
    normalize_item,
    normalize_text,
    normalize_text_series,
    strip_series,
)


def test_reference_golden():
    # the reference's own assert, pipelines.py:53-54
    assert normalize_text("山下<br>町12-12\r\n  一二三ビル1F") == "山下町12-12  一二三ビル1F"


def test_falsy_passthrough():
    assert normalize_text(None) is None
    assert normalize_text("") == ""


def test_tag_removal_variants():
    assert normalize_text("a<br/>b") == "ab"
    assert normalize_text('a<a href="x">b</a>c') == "abc"
    assert normalize_text("x<BR>y") == "xy"
    # multiline attribute (DOTALL)
    assert normalize_text('p<img\nsrc="x">q') == "pq"


def test_series_matches_scalar():
    vals = [
        "山下<br>町12-12\r\n  一二三ビル1F",
        None,
        "",
        "  plain  ",
        "a<br/>b\nc",
        "〒980-0021 仙台市<b>青葉区</b>",
    ]
    s = pd.Series(vals, dtype=object)
    got = normalize_text_series(s).tolist()
    want = [normalize_text(v) for v in vals]
    assert got == want


def test_strip_series_matches_pipeline():
    vals = [" x ", None, "", "y"]
    got = strip_series(pd.Series(vals, dtype=object)).tolist()
    assert got == ["x", None, "", "y"]


def test_normalize_item_field_groups():
    item = {
        "shop_name": " A<br>B ",
        "address": "c\nd",
        "opening_hours": " 9-17 ",
        "closing_day": "月<hr>火",
        "genre_name": " 和食 ",
        "tel": " 03-1 ",
        "zip_code": " 980 ",
        "official_page": " http://x ",
        "area_name": None,
        "detail_page": " keep as-is ",
    }
    out = normalize_item(item)
    assert out["shop_name"] == "AB"
    assert out["address"] == "cd"
    assert out["opening_hours"] == "9-17"
    assert out["closing_day"] == "月火"
    assert out["genre_name"] == "和食"
    assert out["tel"] == "03-1"
    assert out["zip_code"] == "980"
    assert out["official_page"] == "http://x"
    assert out["area_name"] is None
    # detail_page is NOT normalized (pipelines.py:31-38 field lists)
    assert out["detail_page"] == " keep as-is "
