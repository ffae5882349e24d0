"""Feed ingestion: RFC 822 / ISO-8601 parsing, entity unescaping,
tolerant XML walk over both formats, and the Spark gate end-to-end."""

import pandas as pd
import pytest

from goto_eater_crawler_spark.sources import feeds


def test_xml_unescape():
    assert feeds.xml_unescape("a &amp; b &lt;c&gt;") == "a & b <c>"
    assert feeds.xml_unescape("&quot;x&apos;") == "\"x'"
    assert feeds.xml_unescape("&#65;&#x42;") == "AB"
    assert feeds.xml_unescape("&bogus;") == "&bogus;"


@pytest.mark.parametrize(
    "s,want",
    [
        ("Tue, 01 Jun 2021 12:00:00 GMT", pd.Timestamp(2021, 6, 1, 12)),
        ("Wed, 2 Jun 2021 08:30:05 GMT", pd.Timestamp(2021, 6, 2, 8, 30, 5)),
        ("2021-06-03T12:00:00Z", pd.Timestamp(2021, 6, 3, 12)),
        ("2021-06-03T12:00:00.123Z", pd.Timestamp(2021, 6, 3, 12)),
        ("yesterday", None),
        ("Tue, 01 Xxx 2021 12:00:00 GMT", None),
    ],
)
def test_parse_feed_ts(s, want):
    assert feeds.parse_feed_ts(s) == want


def test_parse_rss():
    xml = """<?xml version="1.0"?><rss version="2.0"><channel>
    <title>T</title><link>https://site/</link>
    <item><link>https://site/a</link>
      <pubDate>Tue, 01 Jun 2021 12:00:00 GMT</pubDate>
      <title>A &amp; B</title></item>
    <item><title>no link, skipped?</title></item>
    <item><link> https://site/b </link></item>
    </channel></rss>"""
    items = feeds.parse_feed(xml)
    # channel-level <link> is outside <item> and not emitted; the
    # linkless item is skipped; whitespace is stripped
    assert [i["url"] for i in items] == ["https://site/a", "https://site/b"]
    assert items[0]["title"] == "A & B"
    assert items[0]["published"] == pd.Timestamp(2021, 6, 1, 12)
    assert items[1]["published"] is None and items[1]["title"] is None
    assert all(i["fmt"] == "rss" for i in items)


def test_parse_atom():
    xml = """<feed xmlns="http://www.w3.org/2005/Atom"><title>F</title>
    <entry><link rel="alternate" href="https://site/x"/>
      <updated>2021-06-03T12:00:00Z</updated><title>X</title></entry>
    <entry><link href='https://site/y' /><updated>bad date</updated></entry>
    </feed>"""
    items = feeds.parse_feed(xml)
    assert [i["url"] for i in items] == ["https://site/x", "https://site/y"]
    assert items[0]["published"] == pd.Timestamp(2021, 6, 3, 12)
    assert items[1]["published"] is None
    assert all(i["fmt"] == "atom" for i in items)


def test_gate_roundtrip(spark):
    docs = spark.range(0, 40).selectExpr("id AS doc_id")
    out = feeds.feed_items(feeds.synth_feed_bodies(docs)).orderBy(
        "feed_id", "item_url"
    ).collect()
    assert len(out) == 8 * 3  # doc_id % 5 == 0 -> 8 feeds x 3 items
    r0 = out[0]
    assert r0["feed_id"] == 0 and r0["fmt"] == "rss"
    assert r0["item_url"] == "https://w0.example.test/doc/0"
    assert r0["title"] == "Doc 0 & notes"
    # (5 // 5) % 2 == 1 -> atom
    atom_rows = [r for r in out if r["feed_id"] == 5]
    assert {r["fmt"] for r in atom_rows} == {"atom"}
    assert {r["published_ts"].day for r in atom_rows} == {6, 7, 8}
