"""OPIC importance + bow-tie SCC decomposition (operators/hostrank).

Pins: OPIC cash conservation (importance sums to ~1), dangling mass
actually flows (a sink node still accrues importance), ranking sanity
(a node fed by many beats a node fed by one); bow-tie planted-class
membership and level-count fixpoint.
"""

from __future__ import annotations

import pytest

from goto_eater_crawler_spark.operators.hostrank import opic_importance, scc_bowtie


def test_opic_conservation_and_dangling(spark):
    # star into a sink: 0..3 -> 4; 4 dangles (virtual-page path)
    edges = spark.createDataFrame(
        [(i, 4) for i in range(4)], "src long, dst long"
    )
    imp = {r["host"]: r["importance"] for r in opic_importance(edges, 5).collect()}
    assert abs(sum(imp.values()) - 1.0) < 1e-4  # cash conserved
    # the sink receives everything each round: by far the most banked
    assert imp[4] > max(imp[i] for i in range(4)) * 2
    # dangling redistribution keeps the sources alive (nonzero)
    assert all(imp[i] > 0 for i in range(4))


def test_opic_in_degree_orders_importance(spark):
    # 1,2,3 -> 0 and 3 -> 5: node 0 (fed by three) beats node 5 (one)
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (3, 5)], "src long, dst long"
    )
    imp = {r["host"]: r["importance"] for r in opic_importance(edges, 5).collect()}
    assert imp[0] > imp[5]


def _bowtie(spark):
    rows = (
        [(a, (a + 1) % 10) for a in range(10)]   # scc cycle
        + [(100, 101), (101, 102), (102, 0)]     # IN chain
        + [(5, 200), (200, 201), (201, 202)]     # OUT chain
        + [(300, 301), (301, 300)]               # disconnected: other
    )
    return spark.createDataFrame(rows, "src long, dst long")


def test_bowtie_planted_classes(spark):
    got = {r["host"]: r["cls"] for r in scc_bowtie(_bowtie(spark), 0, 12).collect()}
    assert all(got[a] == "scc" for a in range(10))
    assert got[100] == got[101] == got[102] == "in"
    assert got[200] == got[201] == got[202] == "out"
    assert got[300] == got[301] == "other"


def test_bowtie_too_few_levels_misclassifies_chain_tail(spark):
    # 2 levels: backward closure from 0 reaches 102, 101 but not 100
    got = {r["host"]: r["cls"] for r in scc_bowtie(_bowtie(spark), 0, 2).collect()}
    assert got[100] == "other"  # not yet discovered
    assert got[101] == "in"


def test_bowtie_fixpoint(spark):
    a = sorted(map(tuple, scc_bowtie(_bowtie(spark), 0, 12).collect()))
    b = sorted(map(tuple, scc_bowtie(_bowtie(spark), 0, 15).collect()))
    assert a == b
