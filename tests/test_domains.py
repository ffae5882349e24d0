"""Registered-domain (PLD) extraction — publicsuffix.org longest-match
semantics (operators/domains.py)."""

from pyspark.sql import functions as F

from goto_eater_crawler_spark.operators.domains import (
    registered_domain,
    suffix_dim,
)


def _run(spark, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], ["host"])
    out = registered_domain(df, suffix_dim(spark))
    return {r["host"]: r["registered_domain"] for r in out.collect()}


def test_longest_match_wins(spark):
    got = _run(
        spark,
        [
            "a.shop.example.co.jp",  # co.jp (2) beats jp (1)
            "b.example.jp",  # jp only
            "x.y.example.com",
            "deep.a.b.c.example.ne.jp",
        ],
    )
    assert got["a.shop.example.co.jp"] == "example.co.jp"
    assert got["b.example.jp"] == "example.jp"
    assert got["x.y.example.com"] == "example.com"
    assert got["deep.a.b.c.example.ne.jp"] == "example.ne.jp"


def test_default_rule_and_short_hosts(spark):
    got = _run(
        spark,
        [
            "foo.example.dev",  # unknown TLD -> last 2 labels
            "example.dev",
            "localhost",  # single label -> itself (fallback k capped)
            "co.jp",  # exactly a public suffix: no label left of it
        ],
    )
    assert got["foo.example.dev"] == "example.dev"
    assert got["example.dev"] == "example.dev"
    assert got["localhost"] == "localhost"
    # a bare public suffix is not registrable; the PSL algorithm
    # returns no registrable domain — our operator falls back to the
    # default rule's last-2 (the suffix itself), never NULL
    assert got["co.jp"] == "co.jp"


def test_wildcard_rule(spark):
    # *.ck: any single label under ck is itself a public suffix
    got = _run(
        spark,
        [
            "foo.bar.ck",  # suffix = bar.ck (wildcard) -> foo.bar.ck
            "a.foo.bar.ck",  # same suffix, deeper host
            "bar.ck",  # IS a public suffix: documented fallback last-2
        ],
    )
    assert got["foo.bar.ck"] == "foo.bar.ck"
    assert got["a.foo.bar.ck"] == "foo.bar.ck"
    assert got["bar.ck"] == "bar.ck"


def test_exception_rule_beats_wildcard(spark):
    # !www.ck cancels *.ck: suffix = ck, registrable = www.ck
    got = _run(
        spark,
        [
            "www.ck",  # the exception itself is registrable
            "foo.www.ck",  # deeper host under the exception
            "a.b.www.ck",
        ],
    )
    assert got["www.ck"] == "www.ck"
    assert got["foo.www.ck"] == "www.ck"
    assert got["a.b.www.ck"] == "www.ck"


def test_suffix_join_is_broadcast(spark):
    df = spark.createDataFrame([("a.example.co.jp",)], ["host"])
    out = registered_domain(df, suffix_dim(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
