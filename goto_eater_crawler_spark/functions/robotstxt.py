"""robots.txt parsing — corpus bodies → the engine's robots dim table.

The reference obeys robots.txt through Scrapy's middleware
(``ROBOTSTXT_OBEY = True``, settings.py:21; kochi was dropped when a
Disallow appeared, main.py:32). The engine enforces robots through a
per-host dim table (operators/politeness.robots_split: allow/disallow
prefixes + crawl_delay); this module builds that table FROM the
corpus itself: fetch each host's ``/robots.txt`` like any other page,
parse the bodies vectorized (Arrow batches via mapInPandas — there
are only ~#hosts of them, but they arrive inside a 100 TB page
corpus, so the parse must be a pipelined scan, never a collect).

Parser semantics (RFC 9309): User-agent groups (a group = consecutive
UA lines followed by rules), group selection by longest
agent-substring match with ``*`` fallback, Allow/Disallow path RULES
(passed through verbatim — including ``*`` wildcards and trailing
``$`` anchors, which politeness.robots_split matches with the RFC's
longest-pattern-wins semantics since round 4; empty Disallow = allow
all), Crawl-delay, comments and case-insensitive field names.
``Sitemap`` lines are ignored (no sitemap fetch stage by design —
the reference discovers URLs purely by crawling).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..schema import ROBOTS_SCHEMA
from .urltools import url_host

DEFAULT_DELAY = 3.0  # reference settings.py:32


def parse_robots_txt(text: str, agent: str = "*") -> dict:
    """One body -> {allow_prefixes, disallow_prefixes, crawl_delay}.

    Group selection: the group whose User-agent token is the longest
    substring of ``agent`` wins; ``*`` matches anything with length 0.
    """
    groups: list[tuple[list[str], dict]] = []
    cur_agents: list[str] = []
    cur_rules: dict | None = None

    def start_group():
        nonlocal cur_rules
        cur_rules = {"allow": [], "disallow": [], "delay": None}
        groups.append((cur_agents, cur_rules))

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if cur_rules is not None:
                # a UA line after rules starts a NEW group
                cur_agents = []
                cur_rules = None
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow", "crawl-delay"):
            if not cur_agents:
                continue  # rules before any UA line: ignored
            if cur_rules is None:
                start_group()
            if field == "allow" and value:
                cur_rules["allow"].append(value)
            elif field == "disallow" and value:
                cur_rules["disallow"].append(value)
            elif field == "crawl-delay":
                try:
                    cur_rules["delay"] = float(value)
                except ValueError:
                    pass

    agent_l = agent.lower()
    best: dict | None = None
    best_len = -1
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                if best_len < 0:
                    best, best_len = rules, 0
            elif a in agent_l and len(a) > best_len:
                best, best_len = rules, len(a)
    if best is None:
        return {
            "allow_prefixes": [],
            "disallow_prefixes": [],
            "crawl_delay": DEFAULT_DELAY,
        }
    return {
        "allow_prefixes": list(best["allow"]),
        "disallow_prefixes": list(best["disallow"]),
        "crawl_delay": best["delay"] if best["delay"] is not None else DEFAULT_DELAY,
    }


def robots_from_pages(pages: DataFrame, agent: str = "*") -> DataFrame:
    """Derive the robots dim table from the pages corpus: rows whose
    url path is ``/robots.txt``, bodies parsed per host. The filter
    pushes into the parquet scan (url predicate + (url, html) column
    pruning); the parse is a pipelined Arrow pass over the few
    surviving rows."""
    cand = pages.filter(pages["url"].endswith("/robots.txt")).select(
        "url", "html"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                host = url_host(url)
                if not host:
                    continue
                try:
                    text = bytes(html).decode("utf-8", errors="replace")
                except Exception:
                    continue
                parsed = parse_robots_txt(text, agent)
                rows.append({"host": host, **parsed})
            yield pd.DataFrame(
                rows,
                columns=[
                    "host",
                    "allow_prefixes",
                    "disallow_prefixes",
                    "crawl_delay",
                ],
            )

    return cand.mapInPandas(batches, schema=ROBOTS_SCHEMA)
