"""Per-family golden extraction parity (engine batch extractor vs the
independent oracle parser) — pure pandas, no Spark session needed."""

from __future__ import annotations

import pandas as pd
import pytest

from goto_eater_crawler_spark.sources.families import FAMILIES


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_engine_oracle_parity(family):
    fam = FAMILIES[family]
    site = fam.gen_site(f"{family.replace('_', '-')}.example.jp")
    assert site, family
    total_items = 0
    for pg in site:
        pdf = pd.DataFrame(
            [{"url": pg["url"], "source": "s", "depth": 0, "html": pg["body"]}]
        )
        recs, links = fam.extract_batch(pdf)
        o_items, o_links = fam.oracle_parse(pg["url"], pg["body"])
        stripped = [
            {k: v for k, v in r.items() if k not in ("url", "source", "item_index")}
            for r in recs
        ]
        assert stripped == o_items, pg["url"]
        assert [l["url"] for l in links] == o_links, pg["url"]
        # item_index is document order
        assert [r["item_index"] for r in recs] == list(range(len(recs)))
        total_items += len(recs)
    assert total_items > 0


def test_fixture_determinism():
    for family, fam in FAMILIES.items():
        a = fam.gen_site("h.example.jp")
        b = fam.gen_site("h.example.jp")
        assert a == b, family


def test_quirks_present():
    """Each documented reference quirk must actually occur in fixtures."""
    lx = FAMILIES["list_xpath"]
    site = lx.gen_site("q.example.jp", 3, 8)
    items = []
    for pg in site:
        its, _ = lx.oracle_parse(pg["url"], pg["body"])
        items.extend(its)
    assert any(i["zip_code"] is None for i in items)  # tochigi.py:36-40
    assert any(i.get("provided_lat") is None for i in items)  # no-latlng gmap
    assert any(i["tel"] is None for i in items)

    ja = FAMILIES["json_api"]
    its, _ = ja.oracle_parse("u", ja.gen_site("j.example.jp")[0]["body"])
    assert any(i["shop_name"] == "　きてみいや" for i in its)  # kochi.py:41-46

    lt = FAMILIES["label_table"]
    details = [
        p for p in lt.gen_site("t.example.jp") if b'<table class="shop"' in p["body"]
    ]
    its = [lt.oracle_parse(p["url"], p["body"])[0][0] for p in details]
    assert any(i["genre_name"] is None for i in its)  # fukui.py:47-53
    assert any(i["genre_name"] and "|" in i["genre_name"] for i in its)  # kagawa.py:33
    assert any("<br>" in (i["address"] or "") for i in its)  # pre-normalize body quirk

    cb = FAMILIES["csv_body"]
    its, _ = cb.oracle_parse("u", cb.gen_site("c.example.jp")[0]["body"])
    raw = cb.gen_site("c.example.jp")[0]["body"].decode("utf-8")
    assert "<!--" in raw and not any("<!--" in i["shop_name"] for i in its)
    assert len(its) < raw.count("\n") - 1  # empty-address rows skipped
