"""Distributed bench-web generator — synthetic crawl space at 10^5-10^7
URLs, generated entirely with native Spark expressions (no driver-side
loops, no Python UDFs) and written to parquet once per parameter set.

Shape per host (modeled on the reference's two-hop list->detail sites,
e.g. tokyo_gnavi.py:66-151):
  - list page 1 (the seed) links to list pages 2..L (a direct pager)
    and to its own D detail pages;
  - list pages 2..L each link to D detail pages;
  - detail pages carry a label_table body (one shop record each).

Host 0 is the deliberate HOT HOST (hot_factor x more lists — models
tokyo_gnavi.py:26's 32k-page host for skew handling).

Page count = sum over hosts of (L_h + L_h * D).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def host_name(i) -> F.Column:
    return F.format_string("bench-%04d.example.jp", i)


def _list_url(host: F.Column, p: F.Column) -> F.Column:
    return F.concat(F.lit("https://"), host, F.format_string("/shops/?p=%d", p))


def _detail_url(host: F.Column, sid: F.Column) -> F.Column:
    return F.concat(F.lit("https://"), host, F.format_string("/shops/detail/%d", sid))


def gen_bench_web(
    spark: SparkSession,
    n_hosts: int = 300,
    lists_per_host: int = 10,
    details_per_list: int = 100,
    hot_factor: int = 10,
) -> DataFrame:
    """Return the pages DataFrame (url, warc_ts, html, text, lang)."""
    hosts = spark.range(n_hosts).select(
        F.col("id").alias("host_id"),
        host_name(F.col("id")).alias("host"),
        F.when(F.col("id") == 0, F.lit(lists_per_host * hot_factor))
        .otherwise(F.lit(lists_per_host))
        .alias("n_lists"),
    )

    # ---- list pages -----------------------------------------------------
    lists = hosts.select(
        "host_id",
        "host",
        "n_lists",
        F.explode(F.sequence(F.lit(1), F.col("n_lists"))).alias("p"),
    )
    # pager on page 1: direct anchors to every other list page (the
    # family extractor follows each <a class="detail"> link; content
    # sniffing on fetch decides list-vs-detail parse)
    pager = F.when(
        F.col("p") == 1,
        F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(2), F.col("n_lists")),
                lambda q: F.format_string(
                    '<article><a class="detail" href="/shops/?p=%d">p</a></article>',
                    q,
                ),
            ),
        ),
    ).otherwise(F.lit(""))
    detail_anchors = F.concat_ws(
        "",
        F.transform(
            F.sequence(
                (F.col("p") - 1) * details_per_list,
                F.col("p") * details_per_list - 1,
            ),
            lambda sid: F.format_string(
                '<article><a class="detail" href="/shops/detail/%d">d</a></article>',
                sid,
            ),
        ),
    )
    list_pages = lists.select(
        _list_url(F.col("host"), F.col("p")).alias("url"),
        F.concat(
            F.lit("<html><body><main>"), detail_anchors, pager, F.lit("</main></body></html>")
        ).cast("binary").alias("html"),
    )

    # ---- detail pages ---------------------------------------------------
    details = hosts.select(
        "host_id",
        "host",
        F.explode(
            F.sequence(F.lit(0), F.col("n_lists") * details_per_list - 1)
        ).alias("sid"),
    )
    body = F.format_string(
        '<html><body><table class="shop">'
        "<tr><th>店舗名</th><td>ベンチ食堂%06d</td></tr>"
        "<tr><th>住所</th><td>〒100-%04d 中央区ベンチ町%d-%d</td></tr>"
        "<tr><th>TEL</th><td>03-%04d-%04d</td></tr>"
        "<tr><th>ジャンル</th><td>和食｜洋食</td></tr>"
        "<tr><th>営業時間</th><td>11:00〜22:00</td></tr>"
        "<tr><th>定休日</th><td>水曜日</td></tr>"
        '<tr><th>URL</th><td><a href="http://b%d.example.com/">site</a></td></tr>'
        "</table>"
        '<a class="map" href="https://maps.google.com/maps?q=35.%03d,139.%03d&z=16">地図</a>'
        "</body></html>",
        F.col("sid"),
        F.pmod(F.col("sid"), F.lit(10000)),
        F.pmod(F.col("sid"), F.lit(100)),
        F.pmod(F.col("sid"), F.lit(9)),
        F.pmod(F.col("sid") * 7, F.lit(10000)),
        F.pmod(F.col("sid") * 13, F.lit(10000)),
        F.col("sid"),
        F.pmod(F.col("sid"), F.lit(1000)),
        F.pmod(F.col("sid") * 3, F.lit(1000)),
    )
    detail_pages = details.select(
        _detail_url(F.col("host"), F.col("sid")).alias("url"),
        body.cast("binary").alias("html"),
    )

    return (
        list_pages.unionByName(detail_pages)
        .withColumn("warc_ts", F.lit("2021-03-14 00:00:00").cast("timestamp"))
        .withColumn("text", F.lit(None).cast("string"))
        .withColumn("lang", F.lit("ja"))
        .select("url", "warc_ts", "html", "text", "lang")
    )


def steady_state_frontier(
    spark: SparkSession,
    n_hosts: int = 300,
    lists_per_host: int = 10,
    details_per_list: int = 100,
    hot_factor: int = 10,
) -> DataFrame:
    """The scaling-protocol frontier: one STEADY-STATE round of a huge
    crawl — every list page plus the even-numbered detail pages of the
    same bench web, as a DataFrame (the 10^10-scale seed path; a
    driver-side list cannot hold a production round).

    Processing this round exercises every hot-path operator at full
    width: fetch join over the whole corpus, vectorized extract of all
    bodies, link discovery (lists re-emit every detail url), intra-round
    dedup, and the bloom/exact seen-set split where ~half the candidate
    links are already seen (the seeded evens) and half are genuinely
    new (the odds) — the mixed regime a mid-crawl round sees.
    """
    hosts = spark.range(n_hosts).select(
        F.col("id").alias("host_id"),
        host_name(F.col("id")).alias("host"),
        F.when(F.col("id") == 0, F.lit(lists_per_host * hot_factor))
        .otherwise(F.lit(lists_per_host))
        .alias("n_lists"),
    )
    lists = hosts.select(
        "host_id",
        "host",
        F.explode(F.sequence(F.lit(1), F.col("n_lists"))).alias("p"),
    ).select(
        _list_url(F.col("host"), F.col("p")).alias("url"),
        F.format_string("bench_%04d", F.col("host_id")).alias("source"),
    )
    details = hosts.select(
        "host_id",
        "host",
        F.explode(
            F.sequence(F.lit(0), F.col("n_lists") * details_per_list - 1, F.lit(2))
        ).alias("sid"),
    ).select(
        _detail_url(F.col("host"), F.col("sid")).alias("url"),
        F.format_string("bench_%04d", F.col("host_id")).alias("source"),
    )
    return (
        lists.unionByName(details)
        .withColumn("parse_family", F.lit("label_table"))
        .withColumn("depth", F.lit(0))
        .withColumn("retry_count", F.lit(0))
        .withColumn("meta", F.create_map().cast("map<string,string>"))
    )


def bench_seeds(n_hosts: int) -> list[dict]:
    return [
        {
            "url": f"https://bench-{i:04d}.example.jp/shops/?p=1",
            "source": f"bench_{i:04d}",
            "parse_family": "label_table",
            "depth": 0,
            "meta": {},
        }
        for i in range(n_hosts)
    ]


def bench_robots(n_hosts: int) -> list[dict]:
    # mixed crawl delays mirroring the reference's 1.0-4.0 s spread
    delays = [1.0, 1.2, 1.5, 2.0, 3.0, 4.0]
    return [
        {
            "host": f"bench-{i:04d}.example.jp",
            "allow_prefixes": [],
            "disallow_prefixes": [],
            "crawl_delay": delays[i % len(delays)],
        }
        for i in range(n_hosts)
    ]
