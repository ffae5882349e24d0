"""Prefix-doubling suffix ranking (operators/textdedup.suffix_ranks)
— Manber & Myers 1990.

Pins: doubling == the literal definition (dense rank by 64-char
suffix prefix) on hostile strings (max-tie runs, periodic strings,
end-sentinel edges), and the one-shuffle plan shape the docstring
claims.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from goto_eater_crawler_spark.operators.textdedup import suffix_ranks


def _definition(text: str, width: int = 64) -> list[int]:
    sufs = sorted(set(text[p : p + width] for p in range(len(text))))
    rank = {s: i + 1 for i, s in enumerate(sufs)}
    return [rank[text[p : p + width]] for p in range(len(text))]


HOSTILE = [
    "aaaaaaaaaaaaaaaa",          # all ties until length breaks them
    "abababababababab",          # period 2: pair ranks must separate
    "banana",                    # the classic
    "abracadabra",
    "z",                         # single char
    "ab" * 40 + "c",             # period longer than 64 resolved late
    "the quick brown fox jumps over the lazy dog " * 3,
]


def test_doubling_matches_definition_on_hostile_strings(spark):
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(HOSTILE)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["pos"]): r["rank64"]
        for r in suffix_ranks(d, trunc=200, width=64).collect()
    }
    for i, t in enumerate(HOSTILE):
        want = _definition(t)
        for p, w in enumerate(want):
            assert got[(i, p)] == w, (i, p, t[p : p + 8])


def test_shorter_suffix_sorts_first(spark):
    # 'a' (pos 3 of 'abca') < 'abca' (pos 0): the -1 sentinel rule
    d = spark.createDataFrame([(0, "abca")], "doc_id long, text string")
    r = {x["pos"]: x["rank64"] for x in suffix_ranks(d).collect()}
    assert r[3] < r[0]  # 'a' before 'abca'
    assert r[0] < r[1]  # 'abca' before 'bca'


def test_one_shuffle_for_all_passes(spark):
    d = spark.createDataFrame([(0, "banana")], "doc_id long, text string")
    plan = suffix_ranks(d)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_truncation_bounds_row_count(spark):
    d = spark.createDataFrame([(0, "x" * 500)], "doc_id long, text string")
    assert suffix_ranks(d, trunc=100).count() == 100
