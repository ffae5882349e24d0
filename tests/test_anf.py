"""ANF / HyperBall (operators/hostrank.anf_exact, anf_hyperball).

The exact arm is the oracle gate (`graph_anf_neighborhood`); here we
pin its semantics on planted graphs and pin the HyperBall scale arm
(register merges, constant per-node state) against it.
"""

from __future__ import annotations

import pytest

from goto_eater_crawler_spark.operators import hostrank as hr

pytestmark = pytest.mark.usefixtures("spark")


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_anf_exact_chain(spark):
    # a -> b -> c -> d: balls grow one node per extra hop until the
    # chain end; radius is load-bearing.
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    rows = {
        r["host"]: (r["ball_1"], r["ball_2"], r["ball_3"])
        for r in hr.anf_exact(e, radius=3).collect()
    }
    assert rows["a"] == (2, 3, 4)
    assert rows["b"] == (2, 3, 3)
    assert rows["c"] == (2, 2, 2)
    assert rows["d"] == (1, 1, 1)


def test_anf_exact_cycle_fixpoint(spark):
    # 3-cycle: every ball saturates at 3 by radius 2 and stays there.
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    rows = {
        r["host"]: (r["ball_1"], r["ball_2"], r["ball_3"])
        for r in hr.anf_exact(e, radius=3).collect()
    }
    for h in "abc":
        assert rows[h] == (2, 3, 3)


def test_anf_exact_matches_unrolled_sql(spark):
    import duckdb

    pairs = [
        (f"h{i % 7}", f"h{(i * 3 + 1) % 7}") for i in range(30)
    ] + [("h7", "h0")]
    pairs = [p for p in pairs if p[0] != p[1]]
    e = _edges(spark, pairs)
    got = sorted(
        tuple(r) for r in hr.anf_exact(e, radius=3).collect()
    )
    vals = ", ".join(f"('{s}', '{d}')" for s, d in pairs)
    sql = hr.anf_exact_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", radius=3
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want


def test_hyperball_tracks_exact_within_hll_error(spark):
    # 40-node graph with varied ball sizes; m=64 registers -> rse
    # ~13%. Assert every estimate within 35% of exact (generous
    # multiple of the bound, deterministic draw).
    pairs = list(
        {
            (f"n{i % 40}", f"n{(i * 7 + 3) % 40}")
            for i in range(160)
            if i % 40 != (i * 7 + 3) % 40
        }
    )
    e = _edges(spark, pairs)
    exact = {
        r["host"]: r["ball_2"] for r in hr.anf_exact(e, radius=2).collect()
    }
    est = {
        r["host"]: r["est"] for r in hr.anf_hyperball(e, 2, log2m=6).collect()
    }
    assert set(est) == set(exact)
    for h, true in exact.items():
        assert abs(est[h] - true) <= max(2.0, 0.35 * true), (
            h,
            true,
            est[h],
        )


def test_hyperball_monotone_in_radius(spark):
    # register merges only ever raise registers: estimates are
    # non-decreasing in radius (HyperBall's defining invariant).
    pairs = [(f"n{i}", f"n{i + 1}") for i in range(12)]
    e = _edges(spark, pairs)
    e1 = {r["host"]: r["est"] for r in hr.anf_hyperball(e, 1).collect()}
    e3 = {r["host"]: r["est"] for r in hr.anf_hyperball(e, 3).collect()}
    for h in e1:
        assert e3[h] >= e1[h] - 1e-9
