"""Politeness quota unit properties (SURVEY.md §5.1 "quota window
determinism"): per-host quota respected, serial rank contiguous and
deterministic, selection invariant to input partitioning, hot-host
skew handled by the salted two-phase plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goto_eater_crawler_spark.operators.politeness import (
    quota_split,
    robots_split,
    with_crawl_delay,
)
from goto_eater_crawler_spark.schema import ROBOTS_SCHEMA

BUDGET = 12.0


@pytest.fixture(scope="module")
def frontier(spark):
    # 3 hosts: hot (1000 urls), medium (50), tiny (2); mixed priority
    rows = spark.range(1052).select(
        F.when(F.col("id") < 1000, F.lit("hot.example.jp"))
        .when(F.col("id") < 1050, F.lit("mid.example.jp"))
        .otherwise(F.lit("tiny.example.jp"))
        .alias("host"),
        F.concat(F.lit("https://x/"), F.col("id").cast("string")).alias(
            "canonical_url"
        ),
        (100.0 - (F.col("id") % 3)).alias("priority"),
        (F.col("id") % 3).cast("int").alias("depth"),
    )
    return rows.localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def robots(spark):
    return spark.createDataFrame(
        [
            {"host": "hot.example.jp", "allow_prefixes": [], "disallow_prefixes": [], "crawl_delay": 1.0},
            {"host": "mid.example.jp", "allow_prefixes": [], "disallow_prefixes": [], "crawl_delay": 3.0},
            {"host": "tiny.example.jp", "allow_prefixes": [], "disallow_prefixes": [], "crawl_delay": 4.0},
        ],
        ROBOTS_SCHEMA,
    ).localCheckpoint(eager=True)


def _select(frontier, robots, n_salts):
    sel, deferred = quota_split(
        with_crawl_delay(frontier, robots), BUDGET, n_salts
    )
    return sel, deferred


def test_quota_respected_and_rank_contiguous(spark, frontier, robots):
    sel, deferred = _select(frontier, robots, 8)
    rows = sel.collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r["rank_in_host"])
    quotas = {"hot.example.jp": 12, "mid.example.jp": 4, "tiny.example.jp": 3}
    for host, ranks in by_host.items():
        assert len(ranks) <= quotas[host], host
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), host
    # nothing lost: selected + deferred == input
    assert sel.count() + deferred.count() == frontier.count()
    # tiny host fully selected (2 < quota 3)
    assert len(by_host["tiny.example.jp"]) == 2


def test_selection_deterministic_across_partitionings(spark, frontier, robots):
    """The selected SET and serial order must not depend on physical
    partitioning or salt count — the contract that makes crawl order
    reproducible on any cluster size."""
    base_sel, _ = _select(frontier, robots, 8)
    base = sorted(
        (r["host"], r["rank_in_host"], r["canonical_url"])
        for r in base_sel.collect()
    )
    for variant in (
        frontier.repartition(3),
        frontier.repartition(64, "canonical_url"),
        frontier.coalesce(1),
    ):
        for salts in (1, 4, 32):
            sel, _ = _select(variant.localCheckpoint(eager=True), robots, salts)
            got = sorted(
                (r["host"], r["rank_in_host"], r["canonical_url"])
                for r in sel.collect()
            )
            assert got == base, f"salts={salts}"


def test_serial_order_matches_contract(spark, frontier, robots):
    """rank_in_host enumerates (priority desc, depth asc, url asc)."""
    sel, _ = _select(frontier, robots, 8)
    for host_rows in [
        [r for r in sel.collect() if r["host"] == "hot.example.jp"]
    ]:
        host_rows.sort(key=lambda r: r["rank_in_host"])
        keys = [(-r["priority"], r["depth"], r["canonical_url"]) for r in host_rows]
        assert keys == sorted(keys)


def test_robots_prefix_semantics(spark, frontier):
    rb = spark.createDataFrame(
        [
            {
                "host": "hot.example.jp",
                "allow_prefixes": ["/1"],
                "disallow_prefixes": ["/"],
                "crawl_delay": 1.0,
            },
            {"host": "mid.example.jp", "allow_prefixes": [], "disallow_prefixes": [], "crawl_delay": 3.0},
            {"host": "tiny.example.jp", "allow_prefixes": [], "disallow_prefixes": [], "crawl_delay": 3.0},
        ],
        ROBOTS_SCHEMA,
    )
    allowed, dropped = robots_split(frontier, rb)
    a_hot = [r["canonical_url"] for r in allowed.collect() if r["host"] == "hot.example.jp"]
    d_hot = [r["canonical_url"] for r in dropped.collect() if r["host"] == "hot.example.jp"]
    # allow /1* overrides the blanket disallow (kochi-style exclusion
    # with a carve-out); everything else on the host is dropped
    assert a_hot and all(u.startswith("https://x/1") for u in a_hot)
    assert d_hot and not any(u.startswith("https://x/1") for u in d_hot)
    assert len(a_hot) + len(d_hot) == 1000


def _split_urls(spark, rules, urls):
    """Run robots_split over one host with the given allow/disallow
    pattern lists; return (allowed set, dropped set) of paths."""
    fr = spark.createDataFrame(
        [
            {
                "host": "h.example.jp",
                "canonical_url": f"https://h.example.jp{p}",
                "priority": 1.0,
                "depth": 0,
            }
            for p in urls
        ]
    )
    rb = spark.createDataFrame(
        [
            {
                "host": "h.example.jp",
                "allow_prefixes": rules.get("allow", []),
                "disallow_prefixes": rules.get("disallow", []),
                "crawl_delay": 1.0,
            }
        ],
        ROBOTS_SCHEMA,
    )
    allowed, dropped = robots_split(fr, rb)
    pre = len("https://h.example.jp")
    return (
        {r["canonical_url"][pre:] for r in allowed.collect()},
        {r["canonical_url"][pre:] for r in dropped.collect()},
    )


def test_robots_wildcard_patterns_rfc9309(spark):
    # * matches any octet sequence; trailing $ anchors the end
    a, d = _split_urls(
        spark,
        {"disallow": ["/*.pdf$"]},
        ["/x/doc.pdf", "/doc.pdf", "/doc.pdfx", "/pdf/doc.txt"],
    )
    assert d == {"/x/doc.pdf", "/doc.pdf"}
    assert a == {"/doc.pdfx", "/pdf/doc.txt"}

    a, d = _split_urls(
        spark,
        {"disallow": ["/private*"], "allow": ["/private/ok*"]},
        ["/private/a", "/private/ok/1", "/privateX", "/public"],
    )
    assert d == {"/private/a", "/privateX"}
    assert a == {"/private/ok/1", "/public"}


def test_robots_longest_match_wins(spark):
    # RFC 9309 §2.2.2: the LONGEST matching pattern wins, allow wins
    # length ties — NOT the old allow-always-overrides simplification
    a, d = _split_urls(
        spark,
        {"allow": ["/a"], "disallow": ["/a/b/c"]},
        ["/a/x", "/a/b/c/d"],
    )
    assert a == {"/a/x"} and d == {"/a/b/c/d"}

    # equal lengths: allow wins
    a, d = _split_urls(
        spark, {"allow": ["/ab"], "disallow": ["/ab"]}, ["/ab/x"]
    )
    assert a == {"/ab/x"} and d == set()


def test_robots_like_metacharacters_are_literal(spark):
    # %, _ and backslash in rule paths must match literally, not as
    # SQL LIKE metacharacters
    a, d = _split_urls(
        spark,
        {"disallow": ["/q%20x", "/u_v", "/w\\z"]},
        ["/q%20x/1", "/qA20x", "/u_v", "/uXv", "/w\\z", "/wz"],
    )
    assert d == {"/q%20x/1", "/u_v", "/w\\z"}
    assert a == {"/qA20x", "/uXv", "/wz"}
