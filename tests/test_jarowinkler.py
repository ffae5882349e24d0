"""jarowinkler — textbook vectors + hypothesis parity against the
DuckDB builtin (the third-party reference)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions.jarowinkler import (
    jaro,
    jaro_winkler,
)

VECTORS = [
    ("martha", "marhta", 0.9444444444444445, 0.9611111111111111),
    ("dixon", "dicksonx", 0.7666666666666666, 0.8133333333333332),
    ("dwayne", "duane", 0.8222222222222223, 0.8400000000000001),
    ("jellyfish", "smellyfish", 0.8962962962962964, 0.8962962962962964),
    ("abc", "abc", 1.0, 1.0),
    ("", "abc", 0.0, 0.0),
    ("", "", 0.0, 0.0),
    ("ab", "ba", 0.0, 0.0),
    ("abcdxxxxxx", "abcdyyyyyy", 0.6, 0.6),  # under the 0.7 bar
    ("abcde", "abcdz", 0.8666666666666667, 0.92),
]


@pytest.mark.parametrize("a,b,ej,ejw", VECTORS)
def test_textbook_vectors(a, b, ej, ejw):
    assert jaro(a, b) == pytest.approx(ej, abs=1e-12)
    assert jaro_winkler(a, b) == pytest.approx(ejw, abs=1e-12)


WORD = st.text(
    alphabet=st.characters(min_codepoint=97, max_codepoint=122),
    max_size=12,
)


@settings(max_examples=300, deadline=None)
@given(WORD, WORD)
def test_parity_vs_duckdb(a, b):
    got = duckdb.sql(
        "SELECT jaro_similarity($a, $b), jaro_winkler_similarity($a, $b)",
        params={"a": a, "b": b},
    ).fetchone()
    assert jaro(a, b) == pytest.approx(got[0], abs=1e-12), (a, b)
    assert jaro_winkler(a, b) == pytest.approx(got[1], abs=1e-12), (a, b)
