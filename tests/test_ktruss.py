"""k-truss peel — cascade depth and support exactness on the planted
graph (K6 + triangle strip + C4 + star)."""

from __future__ import annotations

from goto_eater_crawler_spark.operators import hostrank as hr


def _edges(spark):
    strip = [(10, 11), (10, 12), (11, 12), (11, 13), (12, 13),
             (12, 14), (13, 14), (13, 15), (14, 15)]
    c4 = [(20, 21), (21, 22), (22, 23), (23, 20)]
    star = [(30, 31), (30, 32), (30, 33), (30, 34)]
    k6 = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    return spark.createDataFrame(
        k6 + strip + c4 + star, "src long, dst long"
    )


def test_k4_truss_is_exactly_k6(spark):
    out = hr.ktruss(_edges(spark), 4, 3).collect()
    got = {(r.u, r.v): r.support for r in out}
    assert set(got) == {(a, b) for a in range(6) for b in range(a + 1, 6)}
    # every K6 edge closes a triangle with each of the 4 other nodes
    assert set(got.values()) == {4}


def test_strip_cascade_needs_two_rounds(spark):
    # iterations=1 leaves the strip's stranded 3-path in the result
    # (support-1 boundary edges die, but the path edges' supports
    # were computed BEFORE that peel) — the wrong truss
    one = {(r.u, r.v) for r in hr.ktruss(_edges(spark), 4, 1).collect()}
    assert (11, 12) in one and (12, 13) in one and (13, 14) in one
    two = {(r.u, r.v) for r in hr.ktruss(_edges(spark), 4, 2).collect()}
    assert not any(u >= 10 for u, _ in two)


def test_fixpoint_stable(spark):
    a = sorted(map(tuple, hr.ktruss(_edges(spark), 4, 3).collect()))
    b = sorted(map(tuple, hr.ktruss(_edges(spark), 4, 5).collect()))
    assert a == b


def test_k5_and_k6_regimes(spark):
    # k=5 (support >= 3): K6 still qualifies (support 4)
    k5 = {(r.u, r.v) for r in hr.ktruss(_edges(spark), 5, 3).collect()}
    assert len(k5) == 15
    # k=6 (support >= 4): K6 sits exactly on the bar
    k6 = {(r.u, r.v) for r in hr.ktruss(_edges(spark), 6, 3).collect()}
    assert len(k6) == 15
    # k=7 (support >= 5): nothing survives
    assert hr.ktruss(_edges(spark), 7, 3).count() == 0
