"""DUST rule mining: LCP/LCS extraction pinned on hostile pairs, the
planted-class oracle derivation checked end-to-end on Spark, and the
support filter shown load-bearing (the session-id class vanishes)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.operators import dust


# ------------------------------------------------------- extraction
@pytest.mark.parametrize(
    "u1,u2,want",
    [
        # the three planted classes (oracle derivation)
        ("https://w3.example.test/doc/11",
         "https://w3.example.test/doc/11/index.html",
         ("", "/index.html")),
        ("https://w3.example.test/doc/11",
         "https://w3.example.test/doc/11?utm=feed",
         ("", "?utm=feed")),
        ("https://w0.example.test/doc/7",
         "https://www.w0.example.test/doc/7",
         ("", "ww.w")),
        # prefix/suffix overlap claims resolve prefix-first
        ("aXa", "aa", ("", "X")),
        ("aa", "aaa", ("", "a")),
        # shared trailing digits stay in the suffix
        ("x/doc/15", "x/doc/155", ("", "5")),
        # disjoint middles
        ("a/old/z", "a/new/z", ("new", "old")),
        # multi-byte codepoints compare as codepoints
        ("p/店舗/q", "p/一覧/q", ("一覧", "店舗")),
        # identical inputs mine the empty rule
        ("same", "same", ("", "")),
    ],
)
def test_extract_rule(u1, u2, want):
    assert dust.extract_rule(u1, u2) == want


@settings(max_examples=120, deadline=None)
@given(st.text(max_size=30), st.text(max_size=30))
def test_extract_rule_reconstructs(u1, u2):
    # invariant: u1 == P + x + S and u2 == P + y + S for the SAME
    # maximal common prefix P and a shared suffix S, with {x, y} the
    # returned (direction-normalized) rule middles
    n = min(len(u1), len(u2))
    p = 0
    while p < n and u1[p] == u2[p]:
        p += 1
    a, b = dust.extract_rule(u1, u2)
    assert a <= b
    for x, y in ((a, b), (b, a)):
        if (
            u1[p : p + len(x)] == x
            and u2[p : p + len(y)] == y
            and u1[p + len(x) :] == u2[p + len(y) :]
        ):
            break
    else:
        raise AssertionError((u1, u2, a, b))


def test_extract_rule_symmetry():
    for u1, u2 in [("a/old/z", "a/new/z"), ("x", "xy"), ("", "q")]:
        assert dust.extract_rule(u1, u2) == dust.extract_rule(u2, u1)


# ------------------------------------------------------- spark gate
def test_dust_rules_gate(spark):
    docs = spark.range(0, 200).selectExpr("id AS doc_id")
    pairs = dust.synth_alias_pairs(docs)
    out = {
        (r["alpha"], r["beta"]): r["support"]
        for r in dust.dust_rules(pairs).collect()
    }
    # the three constant classes, support = class count (50 each)
    assert out == {
        ("", "/index.html"): 50,
        ("", "?utm=feed"): 50,
        ("", "ww.w"): 50,
    }


def test_support_filter_drops_unique_session_ids(spark):
    # ONLY the sid class: every pair mines a distinct rule -> support
    # 1 -> the output must be EMPTY (filter is load-bearing)
    docs = spark.range(0, 200, 4).selectExpr("id AS doc_id")
    pairs = dust.synth_alias_pairs(docs)
    assert dust.dust_rules(pairs).count() == 0
    # without the threshold the class is visible
    assert dust.dust_rules(pairs, min_support=1).count() == 50
