"""Host-rank (PageRank) operator properties (operators/hostrank.py):
probability-distribution invariant, authority ordering, dangling-mass
handling, and the north_rule O3 priority wiring."""

from __future__ import annotations

import pytest

from goto_eater_crawler_spark.operators import hostrank as hr


@pytest.fixture(scope="module")
def star_edges(spark):
    # hub: everyone links to 'center'; center links to 'a' only
    rows = [(f"n{i}", "center") for i in range(6)] + [("center", "a")]
    return spark.createDataFrame(rows, ["src", "dst"])


def test_rank_is_a_distribution(spark, star_edges):
    ranks = hr.host_rank(star_edges, iterations=8).collect()
    total = sum(r["rank"] for r in ranks)
    assert abs(total - 1.0) < 1e-4  # dangling mass redistributed
    assert all(r["rank"] > 0 for r in ranks)


def test_authority_ordering(spark, star_edges):
    got = {r["host"]: r["rank"] for r in hr.host_rank(star_edges, 8).collect()}
    # the hub and its sole outlink dominate the leaves ('a' actually
    # tops: center funnels ALL its rank to 'a' — classic rank-sink
    # funneling); every leaf is symmetric
    assert got["a"] > got["center"] > got["n0"]
    leaves = {v for h, v in got.items() if h.startswith("n")}
    assert len(leaves) == 1


def test_dangling_nodes_keep_mass_flowing(spark):
    # chain into a sink: a -> b -> c (c has no out-edges)
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    got = {r["host"]: r["rank"] for r in hr.host_rank(edges, 10).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-4
    assert got["c"] > got["b"] > got["a"]


def test_host_edges_drops_self_loops(spark):
    links = spark.createDataFrame(
        [("x.jp", "x.jp"), ("x.jp", "y.jp"), ("x.jp", "y.jp")],
        ["host", "link_host"],
    )
    got = hr.host_edges(links).collect()
    assert [(r["src"], r["dst"]) for r in got] == [("x.jp", "y.jp")]


def test_host_rank_drives_global_round_capacity(spark):
    """With host_ranks + a global round capacity (the reference's
    CONCURRENT_REQUESTS cap, T7), the higher-ranked host's URLs are
    fetched in earlier rounds — rank genuinely schedules across
    hosts, not just within them."""
    from goto_eater_crawler_spark.plans.crawl import CrawlConfig, CrawlEngine
    from goto_eater_crawler_spark.sources import webgen

    body = b"<html><body>no cards here</body></html>"
    pages, seeds = [], []
    for host in ("ha.jp", "hb.jp"):
        for i in range(3):
            url = f"https://{host}/p{i}"
            pages.append(
                {"url": url, "warc_ts": None, "html": body, "text": None, "lang": None}
            )
            seeds.append(
                {
                    "url": url,
                    "source": "s",
                    "parse_family": "list_xpath",
                    "depth": 0,
                    "meta": {},
                }
            )
    robots = [
        {"host": h, "allow_prefixes": [], "disallow_prefixes": [], "crawl_delay": 3.0}
        for h in ("ha.jp", "hb.jp")
    ]
    ranks = spark.createDataFrame(
        [("ha.jp", 0.9), ("hb.jp", 0.1)], ["host", "rank"]
    )
    res = CrawlEngine(
        spark,
        webgen.pages_df(spark, pages),
        webgen.robots_df(spark, robots),
        CrawlConfig(
            round_budget=1e6,
            max_rounds=8,
            host_ranks=ranks,
            round_capacity=2,
        ),
    ).run(seeds)
    log = sorted(
        (
            (r["round"], r["host"], r["url"])
            for r in res.fetch_log.filter("status='fetched'").collect()
        )
    )
    # capacity 2/round: round 1 = two ha urls; round 2 = last ha (90)
    # + first hb (10); round 3 = remaining hb
    by_round = {}
    for rnd, host, _ in log:
        by_round.setdefault(rnd, []).append(host)
    assert by_round[1] == ["ha.jp", "ha.jp"]
    assert sorted(by_round[2]) == ["ha.jp", "hb.jp"]
    assert by_round[3] == ["hb.jp", "hb.jp"]


def test_with_host_rank_reprioritizes_frontier(spark):
    frontier = spark.createDataFrame(
        [
            ("https://hub.jp/x", "hub.jp", 0),
            ("https://leaf.jp/y", "leaf.jp", 0),
            ("https://hub.jp/deep", "hub.jp", 3),
        ],
        ["canonical_url", "host", "depth"],
    )
    ranks = spark.createDataFrame(
        [("hub.jp", 0.6), ("leaf.jp", 0.1)], ["host", "rank"]
    )
    got = {
        r["canonical_url"]: r["priority"]
        for r in hr.with_host_rank(frontier, ranks).collect()
    }
    # priority = rank * 100 - depth (north_rule O3)
    assert got["https://hub.jp/x"] == pytest.approx(60.0)
    assert got["https://hub.jp/deep"] == pytest.approx(57.0)
    assert got["https://leaf.jp/y"] == pytest.approx(10.0)
    # unknown hosts fall to rank 0 (never block the frontier)
    more = spark.createDataFrame(
        [("https://new.jp/z", "new.jp", 1)], ["canonical_url", "host", "depth"]
    )
    (row,) = hr.with_host_rank(more, ranks).collect()
    assert row["priority"] == pytest.approx(-1.0)


def test_hits_matches_numpy_power_iteration(spark, star_edges):
    """hits() reproduces the textbook mutual-reinforcement recurrence
    (a = E^T h, h = E a, L1-normalized per half-step) computed
    densely on the driver."""
    rows = star_edges.collect()
    hosts = sorted({r["src"] for r in rows} | {r["dst"] for r in rows})
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    E = [[0.0] * n for _ in range(n)]
    for r in rows:
        E[idx[r["src"]]][idx[r["dst"]]] = 1.0
    h = [1.0 / n] * n
    for _ in range(3):
        a = [sum(E[u][v] * h[u] for u in range(n)) for v in range(n)]
        sa = sum(a)
        a = [x / sa for x in a]
        h = [sum(E[u][v] * a[v] for v in range(n)) for u in range(n)]
        sh = sum(h)
        h = [x / sh for x in h]
    got = {r["host"]: (r["authority"], r["hub"]) for r in hr.hits(star_edges, 3).collect()}
    for host in hosts:
        assert got[host][0] == pytest.approx(a[idx[host]], abs=1e-6)
        assert got[host][1] == pytest.approx(h[idx[host]], abs=1e-6)


def test_hits_hub_authority_separation(spark, star_edges):
    """In the star graph the leaves are pure hubs (they only point at
    center) and 'center'/'a' carry the authority — HITS separates the
    two roles where PageRank conflates them into one score."""
    got = {r["host"]: r for r in hr.hits(star_edges, 3).collect()}
    assert got["center"]["authority"] > got["n0"]["authority"]
    assert got["n0"]["hub"] > got["a"]["hub"]
    # L1 invariants: each score vector sums to 1
    assert sum(r["authority"] for r in got.values()) == pytest.approx(1.0, abs=1e-4)
    assert sum(r["hub"] for r in got.values()) == pytest.approx(1.0, abs=1e-4)


def test_hits_empty_graph(spark):
    empty = spark.createDataFrame([], "src string, dst string")
    assert hr.hits(empty, 3).count() == 0
