"""Aho-Corasick multi-pattern text matching — the blocklist /
badword-filter pass of a C4/RefinedWeb-style corpus pipeline (Raffel
et al. 2020 filter lists; Aho & Corasick 1975).

Why an automaton and not P contains() scans: a production blocklist
is hundreds to thousands of patterns; P native contains() filters re-
scan every document P times (O(N*P) text passes at 100 TB), while the
AC automaton scans each document ONCE for all patterns
(O(N + matches)).  The automaton is built once per Arrow batch
iterator (driver ships only the pattern list, a few KB), documents
stream through ``mapInPandas``, and each partition emits ONE partial
count row per pattern — the shuffle is O(partitions x P) rows, never
O(docs).  This is the engine's standard slow-path contract: Python
only where built-in expressions genuinely can't express the semantics
(simultaneous multi-pattern scan), Arrow-batched, map-side combined.

Counting contract: ALL occurrences (every end position, suffix-link
closure), so patterns may overlap each other and be substrings of one
another.  The SQL oracle counts via replace() (non-overlapping,
left-greedy), which equals the AC count exactly when no pattern can
overlap ITSELF, i.e. the pattern is borderless (no proper prefix that
is also a suffix) — the gate's pattern list is all-borderless and the
unit tests pin the distinction on a bordered pattern.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_automaton(
    patterns: list[str],
) -> tuple[list[dict[str, int]], list[int], list[list[int]]]:
    """Goto/fail/output tables for the pattern set. States are ints,
    transitions dicts char->state; out[s] lists pattern indices ending
    at state s (suffix-link closure already folded in)."""
    goto: list[dict[str, int]] = [{}]
    out: list[list[int]] = [[]]
    for idx, p in enumerate(patterns):
        if not p:
            raise ValueError("empty pattern")
        s = 0
        for ch in p:
            if ch not in goto[s]:
                goto.append({})
                out.append([])
                goto[s][ch] = len(goto) - 1
            s = goto[s][ch]
        out[s].append(idx)
    fail = [0] * len(goto)
    queue = list(goto[0].values())
    head = 0
    while head < len(queue):
        s = queue[head]
        head += 1
        for ch, t in goto[s].items():
            queue.append(t)
            f = fail[s]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[t] = goto[f].get(ch, 0)
            out[t] = out[t] + out[fail[t]]
    return goto, fail, out


def count_all_occurrences(
    text: str,
    tables: tuple[list[dict[str, int]], list[int], list[list[int]]],
    counts: list[int],
) -> bool:
    """One pass over ``text``; adds every pattern occurrence (all end
    positions) into ``counts``. Returns True if anything matched."""
    goto, fail, out = tables
    s = 0
    hit = False
    for ch in text:
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        if out[s]:
            hit = True
            for idx in out[s]:
                counts[idx] += 1
    return hit


def match_counts(docs: DataFrame, patterns: list[str]) -> DataFrame:
    """(pattern, n_docs, n_matches) over ``docs(doc_id, text)`` —
    n_matches counts ALL occurrences, n_docs the documents with at
    least one.  One automaton scan per document, one partial row per
    (partition, pattern) into a tiny final groupBy; patterns with
    zero hits still emit (every partition reports the full pattern
    vector), so the result always has exactly len(patterns) rows."""
    pats = list(patterns)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tables = build_automaton(pats)
        occ = [0] * len(pats)
        docs_with = [0] * len(pats)
        for pdf in it:
            for text in pdf["text"]:
                per_doc = [0] * len(pats)
                if text is not None and count_all_occurrences(
                    str(text), tables, per_doc
                ):
                    for i, c in enumerate(per_doc):
                        occ[i] += c
                        if c:
                            docs_with[i] += 1
        yield pd.DataFrame(
            {
                "pattern": pats,
                "docs_part": docs_with,
                "matches_part": occ,
            }
        )

    partials = docs.select("text").mapInPandas(
        batches,
        schema="pattern string, docs_part long, matches_part long",
    )
    return (
        partials.groupBy("pattern")
        .agg(
            F.sum("docs_part").cast("long").alias("n_docs"),
            F.sum("matches_part").cast("long").alias("n_matches"),
        )
    )


def match_counts_sql(patterns: list[str], rel: str = "documents") -> str:
    """Oracle for :func:`match_counts` via replace()-count — exact
    for borderless patterns (callers must keep the gate list
    borderless; see module docstring)."""
    for p in patterns:
        for k in range(1, len(p)):
            assert p[:k] != p[-k:], f"pattern {p!r} has a border"
    vals = ", ".join("('" + p.replace("'", "''") + "')" for p in patterns)
    return f"""
    SELECT p.pattern,
           CAST(coalesce(sum(CASE WHEN contains(d.text, p.pattern)
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_docs,
           CAST(coalesce(sum((length(d.text)
                              - length(replace(d.text, p.pattern, '')))
                             // length(p.pattern)), 0) AS BIGINT)
             AS n_matches
    FROM (VALUES {vals}) p(pattern), {rel} d
    GROUP BY p.pattern ORDER BY p.pattern
    """
