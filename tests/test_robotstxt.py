"""robots.txt parsing goldens + corpus-derived robots table
(functions/robotstxt.py), wired into robots_split."""

from __future__ import annotations

from goto_eater_crawler_spark.functions.robotstxt import (
    DEFAULT_DELAY,
    parse_robots_txt,
    robots_from_pages,
)

BODY = """
# comments are ignored
User-agent: bingbot
Disallow: /private/
Crawl-delay: 7

User-agent: *
Allow: /shop/public/
Disallow: /shop/
Disallow: /admin/
Crawl-delay: 1.5

User-agent: evilbot
Disallow: /
"""


def test_wildcard_group_selected():
    got = parse_robots_txt(BODY, agent="our-crawler")
    assert got["allow_prefixes"] == ["/shop/public/"]
    assert got["disallow_prefixes"] == ["/shop/", "/admin/"]
    assert got["crawl_delay"] == 1.5


def test_longest_agent_match_beats_wildcard():
    got = parse_robots_txt(BODY, agent="Mozilla-compatible bingbot/2.0")
    assert got["disallow_prefixes"] == ["/private/"]
    assert got["crawl_delay"] == 7.0


def test_multi_agent_group_and_case_insensitivity():
    body = "USER-AGENT: A\nuser-agent: B\nDISALLOW: /x/\n"
    for agent in ("a", "b"):
        got = parse_robots_txt(body, agent=agent)
        assert got["disallow_prefixes"] == ["/x/"]


def test_empty_disallow_means_allow_all():
    body = "User-agent: *\nDisallow:\n"
    got = parse_robots_txt(body)
    assert got["disallow_prefixes"] == []
    assert got["crawl_delay"] == DEFAULT_DELAY


def test_no_matching_group_defaults_open():
    body = "User-agent: otherbot\nDisallow: /\n"
    got = parse_robots_txt(body, agent="us")
    assert got["disallow_prefixes"] == []


def test_rules_before_any_ua_ignored():
    body = "Disallow: /x/\nUser-agent: *\nDisallow: /y/\n"
    assert parse_robots_txt(body)["disallow_prefixes"] == ["/y/"]


def test_robots_from_pages_feeds_robots_split(spark):
    from goto_eater_crawler_spark.functions.urltools import with_url_identity
    from goto_eater_crawler_spark.operators.politeness import robots_split
    from goto_eater_crawler_spark.schema import PAGES_SCHEMA

    pages = spark.createDataFrame(
        [
            {
                "url": "https://closed.example.jp/robots.txt",
                "warc_ts": None,
                "html": b"User-agent: *\nDisallow: /\nCrawl-delay: 9\n",
                "text": None,
                "lang": None,
            },
            {
                "url": "https://open.example.jp/robots.txt",
                "warc_ts": None,
                "html": b"User-agent: *\nDisallow: /admin/\n",
                "text": None,
                "lang": None,
            },
            {  # an ordinary page must not contribute robots rows
                "url": "https://open.example.jp/shop/",
                "warc_ts": None,
                "html": b"<html>shop</html>",
                "text": None,
                "lang": None,
            },
        ],
        PAGES_SCHEMA,
    )
    robots = robots_from_pages(pages)
    rows = {r["host"]: r for r in robots.collect()}
    assert set(rows) == {"closed.example.jp", "open.example.jp"}
    assert rows["closed.example.jp"]["crawl_delay"] == 9.0

    frontier = with_url_identity(
        spark.createDataFrame(
            [
                ("https://closed.example.jp/shop/1",),
                ("https://open.example.jp/shop/1",),
                ("https://open.example.jp/admin/x",),
            ],
            ["url"],
        )
    )
    allowed, dropped = robots_split(frontier, robots)
    assert {r["url"] for r in allowed.collect()} == {
        "https://open.example.jp/shop/1"
    }
    assert {r["url"] for r in dropped.collect()} == {
        "https://closed.example.jp/shop/1",
        "https://open.example.jp/admin/x",
    }


def test_wildcard_rules_flow_from_body_to_split(spark):
    # RFC 9309 wildcards parsed from a real robots.txt body drive the
    # engine's split end to end: '*.pdf$' anchor + 'Allow' carve-out
    # with longest-match semantics
    from pyspark.sql import functions as F

    from goto_eater_crawler_spark.functions.urltools import with_url_identity
    from goto_eater_crawler_spark.operators.politeness import robots_split
    from goto_eater_crawler_spark.schema import PAGES_SCHEMA

    body = (
        b"User-agent: *\n"
        b"Disallow: /*.pdf$\n"
        b"Disallow: /private*\n"
        b"Allow: /private/ok*\n"
    )
    pages = spark.createDataFrame(
        [
            {
                "url": "https://w.example.jp/robots.txt",
                "warc_ts": None,
                "html": body,
                "text": None,
                "lang": None,
            }
        ],
        PAGES_SCHEMA,
    )
    robots = robots_from_pages(pages)
    frontier = with_url_identity(
        spark.createDataFrame(
            [
                ("https://w.example.jp/a/doc.pdf",),
                ("https://w.example.jp/a/doc.pdfx",),
                ("https://w.example.jp/private/no",),
                ("https://w.example.jp/private/ok/1",),
            ],
            ["url"],
        ).select("url", F.lit(1.0).alias("priority"), F.lit(0).alias("depth"))
    ).withColumn(
        "host", F.regexp_extract("canonical_url", r"^[a-z]+://([^/]*)", 1)
    )
    allowed, dropped = robots_split(frontier, robots)
    a = {r["canonical_url"].rsplit("jp", 1)[1] for r in allowed.collect()}
    d = {r["canonical_url"].rsplit("jp", 1)[1] for r in dropped.collect()}
    assert d == {"/a/doc.pdf", "/private/no"}
    assert a == {"/a/doc.pdfx", "/private/ok/1"}
