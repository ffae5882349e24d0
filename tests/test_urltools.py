"""Canonicalization parity: the native Catalyst implementation and the
plain-Python oracle implementation must agree byte-for-byte."""

from __future__ import annotations

from pyspark.sql import functions as F

from goto_eater_crawler_spark.functions.urltools import (
    canonicalize_url,
    canonicalize_url_col,
    host_col,
    url_host,
    with_url_identity,
)

URLS = [
    "https://www.gotoeat-tochigi.jp/merchant/index.php",
    "https://www.gotoeat-tochigi.jp/merchant/index.php?page=2",
    "HTTPS://WWW.Example.JP/path/TO/x?b=2&a=1",
    "https://example.jp:443/x?z=9&a=1&a=0",
    "http://example.jp:80/",
    "http://example.jp:8080/y",
    "https://example.jp",
    "https://example.jp/x?page=2&per_page=10#frag",
    "https://wp.example.jp/wp-json/api/search?per_page=10&page=3",
    "https://example.jp/a%20b?q=%E3%81%82",
    # bracketed IPv6 + userinfo authorities: host_col and url_host
    # must agree ('[::1]:8080' -> '::1'); see ADVICE round 1
    "http://[::1]:8080/x",
    "https://[2001:db8::7]/path?a=1",
    "http://user:pw@example.jp:8080/y",
    "http://user@[::1]/z",
    # already-canonical fast-path guard boundaries (urltools.py
    # _CANONICAL_ALREADY): inside the guard with tricky payloads ...
    "https://e.jp/",
    "https://e.jp/UPPER/Case",  # path case preserved on both paths
    "https://e.jp/a@b:c",  # @ and : in path, not authority
    "https://e.jp./x",  # trailing-dot host stays as-is
    "https://b9.example.com/shops/detail/123",
    # ... and just outside it (each must take the full tree)
    "https://e.jp",  # no path -> '/' appended
    "HTTPS://e.jp/x",  # scheme case folds
    "https://e.jp:443/x",  # default port strips
    "https://E.jp/x",  # host case folds
    "https://e.jp/x?b=2&a=1",  # query sorts
    "https://e.jp/x#f",  # fragment drops
    "  https://e.jp/x ",  # surrounding whitespace trims
]


def test_python_canonicalization_basics():
    assert canonicalize_url("https://example.jp") == "https://example.jp/"
    assert canonicalize_url("http://Example.JP:80/x") == "http://example.jp/x"
    assert canonicalize_url("https://e.jp/x?b=2&a=1") == "https://e.jp/x?a=1&b=2"
    assert canonicalize_url("https://e.jp/x?a=1#f") == "https://e.jp/x?a=1"
    assert url_host("https://WWW.E.JP:443/x") == "www.e.jp"


def test_native_python_parity(spark):
    df = spark.createDataFrame([(u,) for u in URLS], ["url"])
    got = df.select(
        "url",
        canonicalize_url_col(F.col("url")).alias("canon"),
        host_col(F.col("url")).alias("host"),
    ).collect()
    for row in got:
        assert row["canon"] == canonicalize_url(row["url"]), row["url"]
        assert row["host"] == url_host(row["url"]), row["url"]


def test_with_url_identity_is_native(spark):
    df = with_url_identity(spark.createDataFrame([(u,) for u in URLS], ["url"]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rows = df.collect()
    assert all(isinstance(r["url_hash"], int) for r in rows)
    # canonicalization is idempotent
    df2 = df.select(
        F.col("canonical_url"),
        canonicalize_url_col(F.col("canonical_url")).alias("c2"),
    )
    for r in df2.collect():
        assert r["canonical_url"] == r["c2"]


# ---------------------------------------------------------------------------
# property-based parity: generated http(s) URLs, python vs Catalyst
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_host_label = st.text("abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=8)
_path_seg = st.text("abcdefghijklmnopqrstuvwxyz0123456789._-%", min_size=0, max_size=8)
_qkey = st.text("abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=5)
_qval = st.text("abcdefghijklmnopqrstuvwxyz0123456789", min_size=0, max_size=5)


@st.composite
def http_urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    host = ".".join(draw(st.lists(_host_label, min_size=1, max_size=3)))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = "/".join(draw(st.lists(_path_seg, min_size=0, max_size=3)))
    params = draw(st.lists(st.tuples(_qkey, _qval), min_size=0, max_size=4))
    frag = draw(st.sampled_from(["", "#x", "#frag/ment?y=1"]))
    url = f"{scheme}://{host}{port}/{path}"
    if params:
        url += "?" + "&".join(f"{k}={v}" for k, v in params)
    return url + frag


_dot_seg = st.sampled_from(["..", ".", "a", "b2"])

_href = st.one_of(
    http_urls(),  # absolute
    st.builds(lambda p: "/" + p, _path_seg),  # root-relative
    st.builds(lambda a, b: f"/{a}/{b}?x=1", _path_seg, _path_seg),
    # root-relative with dot segments: urljoin applies RFC 3986
    # remove_dot_segments here — the class that caught the round-3
    # fast-path divergence (ADVICE r3 #1)
    st.builds(lambda segs: "/" + "/".join(segs), st.lists(_dot_seg, min_size=1, max_size=4)),
    _path_seg,  # relative (fallback path)
    st.builds(lambda h, p: f"//{h}/{p}", _host_label, _path_seg),  # scheme-rel
    st.sampled_from(["", "?q=2", "#frag", "../up", "./here"]),
)


from hypothesis import example


@settings(max_examples=200, deadline=None)
@given(http_urls(), _href)
@example(base="HTTP://0/", href="/")  # scheme-case fold (found by fuzz)
# dot-segment removal in the root-relative branch (ADVICE r3 #1: the
# fast path used to return 'http://h/a/../b' where urljoin — and the
# reference's scrapy response.urljoin — returns 'http://h/b')
@example(base="http://h/x", href="/a/../b")
@example(base="http://h/x", href="/a/./b")
@example(base="http://h/x", href="/..")
@example(base="http://h/x", href="/.")
@example(base="http://h/x", href="/a/..")
@example(base="http://h/x", href="/.hidden/ok")  # false-positive class: slow path, still equal
def test_fast_urljoin_matches_stdlib(base, href):
    """fast_urljoin (the python extract hot path; stdlib urljoin was
    45% of worker CPU) must be byte-equal to urllib.parse.urljoin on
    every href class — fast paths AND fallback."""
    from urllib.parse import urljoin

    from goto_eater_crawler_spark.functions.urltools import fast_urljoin

    assert fast_urljoin(base, href) == urljoin(base, href), (base, href)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(http_urls(), min_size=1, max_size=60))
def test_parity_property(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = df.select(
        "url",
        canonicalize_url_col(F.col("url")).alias("canon"),
        host_col(F.col("url")).alias("host"),
    ).collect()
    for row in got:
        assert row["canon"] == canonicalize_url(row["url"]), repr(row["url"])
        assert row["host"] == url_host(row["url"]), repr(row["url"])
