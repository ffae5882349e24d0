"""URL canonicalization, host extraction and 64-bit URL hashing.

The reference dedupes requests with Scrapy's default dupefilter, whose
fingerprint is built over a canonicalized URL (method + canonical url +
body; SURVEY.md §2.2 P7). Our engine keys everything on
``xxhash64(canonical_url)`` (north_rule: "canonicalized-URL 64-bit
hash").

Two implementations, pinned byte-equal by tests/test_urltools.py:

- :func:`canonicalize_url_col` — **native Catalyst expressions only**
  (parse_url / regexp / split / array_sort). This is the hot path: it
  runs inside WholeStageCodegen on every discovered link, no Python.
- :func:`canonicalize_url` — plain Python, used by the single-threaded
  crawl oracle in tests and by driver-side seed synthesis.

Canonical form (shared contract):
  * scheme lowercased
  * authority lowercased, default port stripped (``:80`` http,
    ``:443`` https)
  * empty path -> ``/``
  * query params (full ``k=v`` strings) sorted lexicographically,
    joined with ``&`` (mirrors the reference's fingerprint treating
    sorted POST formdata as part of the key, e.g. yamagata.py:59-61)
  * fragment dropped
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Python implementation (oracle / driver-side)
# ---------------------------------------------------------------------------


def canonicalize_url(url: str) -> str:
    """Canonicalize one URL. Must stay byte-equal to
    :func:`canonicalize_url_col` (tests enforce)."""
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    authority = parts.netloc.lower()
    if scheme == "http" and authority.endswith(":80"):
        authority = authority[: -len(":80")]
    elif scheme == "https" and authority.endswith(":443"):
        authority = authority[: -len(":443")]
    path = parts.path or "/"
    query = "&".join(sorted(parts.query.split("&"))) if parts.query else ""
    out = f"{scheme}://{authority}{path}"
    if query:
        out += f"?{query}"
    return out


def url_host(url: str) -> str:
    """Lowercased host (no port) of a URL — python side."""
    host = urlsplit(url).hostname
    return host.lower() if host else ""


_BASE_PREFIX = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*")


def fast_urljoin(base: str, href: str) -> str:
    """urljoin with fast paths for the two href classes that dominate
    real link extraction — absolute URLs and root-relative paths.

    stdlib urljoin costs ~36us/call (urlparse + urlunparse + coercion
    machinery) and was 45% of the python extract worker's CPU in a
    steady crawl round (~1M links). The fast paths are byte-equal to
    urljoin for their classes (hypothesis-pinned in test_urltools);
    everything else (relative paths, '../', '//host', '?q', '#f',
    empty) falls back to stdlib urljoin.
    """
    if href.startswith("http://") or href.startswith("https://"):
        return href
    if href.startswith("/") and not href.startswith("//"):
        # RFC 3986 §5.2.4: urljoin removes dot segments ('/./', '/../',
        # trailing '/.' or '/..') from a root-relative path; the fast
        # path must not skip that. The substring test '/.' is a
        # conservative superset (it also matches '/.hidden' etc.) —
        # false positives merely take the slow byte-equal path.
        if "/." not in href:
            m = _BASE_PREFIX.match(base)
            if m:
                pre = m.group(0)
                i = pre.index("://")
                # urljoin lowercases the scheme of its result
                return pre[:i].lower() + pre[i:] + href
    return urljoin(base, href)


# ---------------------------------------------------------------------------
# Native column implementations (engine hot path)
# ---------------------------------------------------------------------------


# Fast-path guard: URLs that are ALREADY canonical by construction —
# lowercase http/https scheme, lowercase ASCII reg-name authority with
# no userinfo/port/IPv6 (none of @ : [ fit the char class), a present
# path, and no query/fragment/whitespace anywhere. For a matching
# string every step of the canonical form is the identity: lower() is
# a no-op, the default-port strip cannot fire, path is non-empty and
# preserved as-is (case included), and there is no query to sort or
# fragment to drop. Discovered links in a crawl round are
# overwhelmingly in this class, and the guard is ONE anchored regex of
# plain character classes vs the ~7-op full tree (profiled round 4:
# the canonicalization tree was the largest JVM-side cost of the
# extract stage at ~5M links/round).
_CANONICAL_ALREADY = r"^https?://[a-z0-9.-]+/[^?#\s]*$"


def canonicalize_url_col(url: Column) -> Column:
    """Canonical URL as a pure Catalyst expression (no Python).

    Built from regexp_extract, NOT parse_url: parse_url is an
    interpreted expression constructing a java.net.URI per evaluation,
    and Catalyst re-inlines this whole tree at every downstream
    reference (filters, window keys, join keys, hashes) — regexps stay
    inside WholeStageCodegen and are ~an order of magnitude cheaper.
    Already-canonical URLs short-circuit through the
    :data:`_CANONICAL_ALREADY` guard (CaseWhen evaluates the full tree
    lazily, only for rows that fail the guard). Byte-parity with
    :func:`canonicalize_url` is pinned by tests/test_urltools.py.
    """
    u = F.trim(url)
    return F.when(u.rlike(_CANONICAL_ALREADY), u).otherwise(
        _canonicalize_url_col_full(u)
    )


def _canonicalize_url_col_full(u: Column) -> Column:
    """The full canonicalization tree over an already-trimmed column."""
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    authority = F.lower(
        F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    )
    authority = (
        F.when(scheme == "http", F.regexp_replace(authority, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(authority, ":443$", ""))
        .otherwise(authority)
    )
    path = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"^[^#]*?\?([^#]*)", 1)
    sorted_query = F.array_join(F.array_sort(F.split(query, "&")), "&")
    base = F.concat(scheme, F.lit("://"), authority, path)
    return F.when(query == "", base).otherwise(
        F.concat(base, F.lit("?"), sorted_query)
    )


def host_col(url: Column) -> Column:
    """Lowercased host (no port/userinfo) of a URL — native regexp
    (see canonicalize_url_col for why not parse_url). Byte-parity
    contract with :func:`url_host` (urlsplit().hostname), including
    bracketed IPv6 authorities: '[::1]:8080' -> '::1' on both sides
    (covered by the hypothesis parity corpus in test_urltools)."""
    auth = F.regexp_extract(
        F.trim(url), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1
    )
    no_user = F.regexp_replace(auth, r"^[^@]*@", "")
    v6 = F.regexp_extract(no_user, r"^\[([^\]]*)\]", 1)
    host = F.when(v6 != "", v6).otherwise(
        F.regexp_replace(no_user, r":\d*$", "")
    )
    u = F.trim(url)
    # same already-canonical guard as canonicalize_url_col: for a
    # matching URL the authority IS the host (no userinfo/port/IPv6 in
    # the char class, already lowercase) — one extract instead of four
    return F.when(
        u.rlike(_CANONICAL_ALREADY),
        F.regexp_extract(u, r"^https?://([^/]+)", 1),
    ).otherwise(F.lower(host))


def url_hash_col(canonical_url: Column) -> Column:
    """64-bit key of a canonical URL: Spark's native xxhash64
    (XXH64 over UTF-8 bytes, seed 42) — the engine's universal
    dedup/bucketing key."""
    return F.xxhash64(canonical_url)


def with_url_identity(df, url_col: str = "url"):
    """Add canonical_url / url_hash / host columns in one projection."""
    canon = canonicalize_url_col(F.col(url_col))
    return (
        df.withColumn("canonical_url", canon)
        .withColumn("url_hash", url_hash_col(F.col("canonical_url")))
        .withColumn("host", host_col(F.col(url_col)))
    )
