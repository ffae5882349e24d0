"""RSS 2.0 / Atom feed ingestion — frontier discovery from feeds.

Feeds are the push-side of crawl scheduling: a site's RSS/Atom feed
lists its fresh URLs with publish timestamps, so a recrawl scheduler
reads feeds instead of re-fetching every page (the
robots_sitemap_discovery / sitemap_extract siblings cover the pull
side). The reference crawls listing pages only (no feed arm in any of
its 49 sources); this is a build-spec frontier operator.

Both public formats are handled off one tolerant XML walk
(functions/minihtml.py ``parse(xml=True)`` — RSS's ``<link>`` is a
container there, not the HTML void element, and Atom's self-closed
``<link href=…/>`` carries the URL as an attribute):

* RSS 2.0 (RSS Advisory Board spec): channel/item, ``<link>`` text,
  RFC 822 ``<pubDate>`` (explicit month-name map on both the writer
  and the reader — no locale dependence);
* Atom (RFC 4287): feed/entry, ``<link href>``, ISO-8601
  ``<updated>``;
* predefined XML entities are unescaped by the reader itself
  (``&amp; &lt; &gt; &quot; &apos;`` + numeric forms).

Scale shape: feed payloads decode in one Arrow-batched stage, narrow
over the scan partitioning — one feed → few slim item rows, the
corpus never shuffles. The gate's synth derives every field
closed-form from doc_id (the WARC gates' URL/date conventions), so
the oracle re-states the whole decode in SQL.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
_WEEKDAYS = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]
_MONTH_NO = {m: i + 1 for i, m in enumerate(_MONTHS)}

_ENTITIES = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}


def xml_unescape(s: str) -> str:
    """The five predefined XML entities plus numeric references."""

    def sub(m: re.Match) -> str:
        body = m.group(1)
        if body.startswith("#x") or body.startswith("#X"):
            return chr(int(body[2:], 16))
        if body.startswith("#"):
            return chr(int(body[1:]))
        return _ENTITIES.get(body, m.group(0))

    return re.sub(r"&(#?[xX]?[0-9a-zA-Z]+);", sub, s)


def _rfc822(day: int, month: int, year: int, weekday: int) -> str:
    return (
        f"{_WEEKDAYS[weekday]}, {day:02d} {_MONTHS[month - 1]} {year} "
        "12:00:00 GMT"
    )


_RFC822_RE = re.compile(
    r"^\w{3}, (\d{1,2}) (\w{3}) (\d{4}) (\d{2}):(\d{2}):(\d{2})"
)
_ISO_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})(?:\.\d+)?Z?$"
)


def parse_feed_ts(s: str) -> pd.Timestamp | None:
    """RFC 822 (RSS pubDate) or ISO-8601 (Atom updated) → naive UTC."""
    s = s.strip()
    m = _RFC822_RE.match(s)
    if m:
        d, mon, y, hh, mm, ss = m.groups()
        if mon not in _MONTH_NO:
            return None
        return pd.Timestamp(
            int(y), _MONTH_NO[mon], int(d), int(hh), int(mm), int(ss)
        )
    m = _ISO_RE.match(s)
    if m:
        return pd.Timestamp(*(int(g) for g in m.groups()))
    return None


def parse_feed(xml: str) -> list[dict]:
    """One feed payload → item dicts {url, published, title}. Format
    is auto-detected from the root element (rss/channel vs feed)."""
    from ..functions import minihtml

    root = minihtml.parse(xml, xml=True)
    out = []
    if root.find("rss") is not None or root.find("channel") is not None:
        fmt, item_tag, ts_tag = "rss", "item", "pubdate"
    else:
        fmt, item_tag, ts_tag = "atom", "entry", "updated"
    for item in root.find_all(item_tag):
        link = item.find("link")
        if link is None:
            continue
        url = (link.get("href") or link.text()).strip()
        ts_node = item.find(ts_tag)
        title_node = item.find("title")
        out.append(
            {
                "fmt": fmt,
                "url": xml_unescape(url),
                "published": (
                    parse_feed_ts(ts_node.text()) if ts_node else None
                ),
                "title": (
                    xml_unescape(title_node.text().strip())
                    if title_node else None
                ),
            }
        )
    return out


# ------------------------------------------------- gate-scale synth
def synth_feed_bodies(docs: DataFrame, mod: int = 5) -> DataFrame:
    """(feed_id, payload) — per selected document one REAL feed XML
    listing three item URLs (doc_id .. doc_id+2) under the corpus URL
    and date conventions (the warc_ingest oracle's):

    - (doc_id // mod) % 2 == 0 → RSS 2.0 with RFC 822 pubDates;
    - (doc_id // mod) % 2 == 1 → Atom with self-closed <link href>
      and ISO-8601 <updated>;
    - titles carry a raw '&' written as '&amp;' (the reader must
      unescape).
    """
    import datetime as dt

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                items = []
                atom = (d // 5) % 2 == 1
                for k in range(3):
                    i = d + k
                    url = f"https://w{i % 7}.example.test/doc/{i}"
                    day = i % 28 + 1
                    title = f"Doc {i} &amp; notes"
                    if atom:
                        items.append(
                            f'<entry><link href="{url}" rel="alternate"/>'
                            f"<updated>2021-06-{day:02d}T12:00:00Z"
                            f"</updated><title>{title}</title></entry>"
                        )
                    else:
                        wd = dt.date(2021, 6, day).weekday()
                        items.append(
                            f"<item><link>{url}</link><pubDate>"
                            f"{_rfc822(day, 6, 2021, wd)}</pubDate>"
                            f"<title>{title}</title></item>"
                        )
                body = (
                    '<?xml version="1.0" encoding="utf-8"?>\n'
                    + (
                        '<feed xmlns="http://www.w3.org/2005/Atom">'
                        f"<title>Feed {d}</title>{''.join(items)}</feed>"
                        if atom
                        else "<rss version=\"2.0\"><channel>"
                        f"<title>Feed {d}</title>{''.join(items)}"
                        "</channel></rss>"
                    )
                )
                ids.append(d)
                payloads.append(body)
            yield pd.DataFrame({"feed_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="feed_id long, payload string")
    )


_FEED_SCHEMA = (
    "feed_id long, fmt string, item_url string, "
    "published_ts timestamp, title string"
)


def feed_items(bodies: DataFrame) -> DataFrame:
    """(feed_id, fmt, item_url, published_ts, title) — one row per
    feed item, decoded with the engine's own XML walk."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "feed_id", "fmt", "item_url", "published_ts", "title")}
            for feed_id, payload in zip(pdf["feed_id"], pdf["payload"]):
                for item in parse_feed(str(payload)):
                    out["feed_id"].append(int(feed_id))
                    out["fmt"].append(item["fmt"])
                    out["item_url"].append(item["url"])
                    out["published_ts"].append(item["published"])
                    out["title"].append(item["title"])
            yield pd.DataFrame(out)

    return bodies.mapInPandas(batches, schema=_FEED_SCHEMA)


def feed_extract_sql(mod: int = 5) -> str:
    """Closed-form oracle: every emitted field is a pure function of
    (doc_id, k) under the synth conventions."""
    return f"""
    SELECT doc_id AS feed_id,
           CASE WHEN (doc_id // {mod}) % 2 = 1 THEN 'atom' ELSE 'rss' END
             AS fmt,
           'https://w' || CAST((doc_id + k) % 7 AS VARCHAR)
             || '.example.test/doc/' || CAST(doc_id + k AS VARCHAR)
             AS item_url,
           CAST('2021-06-'
                || lpad(CAST((doc_id + k) % 28 + 1 AS VARCHAR), 2, '0')
                || ' 12:00:00' AS TIMESTAMP) AS published_ts,
           'Doc ' || CAST(doc_id + k AS VARCHAR) || ' & notes' AS title
    FROM documents, unnest([0, 1, 2]) AS t(k)
    WHERE doc_id % {mod} = 0
    ORDER BY feed_id, item_url
    """
