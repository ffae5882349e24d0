"""Aho-Corasick blocklist matcher (text_blocklist_match gate)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.operators import acmatch as ac


def naive_all_occurrences(text: str, p: str) -> int:
    return sum(1 for i in range(len(text)) if text.startswith(p, i))


def run(text: str, patterns: list[str]) -> list[int]:
    tables = ac.build_automaton(patterns)
    counts = [0] * len(patterns)
    ac.count_all_occurrences(text, tables, counts)
    return counts


def test_overlapping_and_nested_patterns():
    # substring patterns both fire; suffix-link closure required
    assert run("scan merge scan", ["scan", "scan merge", "an"]) == [2, 1, 2]
    # self-overlapping (bordered) pattern counts ALL end positions...
    assert run("aaaa", ["aa"]) == [3]
    # ...which is exactly where the replace()-count oracle diverges
    # (non-overlapping left-greedy = 2), hence the borderless assert:
    with pytest.raises(AssertionError):
        ac.match_counts_sql(["aa"])
    ac.match_counts_sql(["ab"])  # borderless: fine


def test_empty_pattern_rejected():
    with pytest.raises(ValueError):
        ac.build_automaton(["ok", ""])


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab c", min_size=1, max_size=4),
        min_size=1,
        max_size=6,
        unique=True,
    ),
    st.text(alphabet="ab c", max_size=80),
)
def test_automaton_matches_naive_scan(patterns, text):
    assert run(text, patterns) == [
        naive_all_occurrences(text, p) for p in patterns
    ]


def test_match_counts_operator_shape_and_zero_rows(spark):
    docs = spark.createDataFrame(
        [
            (0, "the fast key and a join join"),
            (1, "nothing here"),
            (2, None),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["pattern"]: (r["n_docs"], r["n_matches"])
        for r in ac.match_counts(docs, ["join", "fast key", "zz"]).collect()
    }
    # zero-hit pattern still emits a row; null text is safe
    assert got == {"join": (1, 2), "fast key": (1, 1), "zz": (0, 0)}
