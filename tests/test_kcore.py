"""k-core peeling (operators/hostrank.kcore) — Seidman 1983.

Pins: planted-structure membership (cycle + triangle survive k=2,
star and tail peel), the 5-round tail cascade (too few iterations =
wrong core), fixpoint at the gate's iteration count, and Spark ==
unrolled-SQL recurrence.
"""

from __future__ import annotations

import duckdb
import pytest

from goto_eater_crawler_spark.operators.hostrank import kcore, kcore_sql


def _edges(spark):
    rows = (
        [(a, (a + 1) % 20) for a in range(20)]  # 20-cycle: survives k=2
        + [(0, 100)]
        + [(100 + i, 101 + i) for i in range(4)]  # tail: 5-round cascade
        + [(200 + i, 200 + (i + 1) % 3) for i in range(3)]  # triangle
        + [(300, 301 + i) for i in range(5)]  # star: peels in 2 rounds
    )
    return spark.createDataFrame(rows, "src long, dst long")


def test_planted_structure(spark):
    got = {r["host"]: r["core_deg"] for r in kcore(_edges(spark), 2, 6).collect()}
    assert set(got) == set(range(20)) | {200, 201, 202}
    assert all(v == 2 for v in got.values())  # in-core degrees


def test_cascade_needs_all_rounds(spark):
    # after only 4 peel rounds the tail is still draining: node 100
    # (5th cascade round) wrongly survives
    early = {r["host"] for r in kcore(_edges(spark), 2, 4).collect()}
    assert 100 in early
    assert 100 not in {r["host"] for r in kcore(_edges(spark), 2, 6).collect()}


def test_fixpoint_at_gate_iterations(spark):
    a = sorted(map(tuple, kcore(_edges(spark), 2, 6).collect()))
    b = sorted(map(tuple, kcore(_edges(spark), 2, 9).collect()))
    assert a == b  # 6 iterations already at fixpoint


def test_k3_empty_core(spark):
    # nothing in the planted graph has min degree 3
    assert kcore(_edges(spark), 3, 6).isEmpty()


def test_spark_equals_unrolled_sql(spark):
    got = sorted(map(tuple, kcore(_edges(spark), 2, 6).collect()))
    rows = ", ".join(
        f"({s}, {d})"
        for s, d in [
            *[(a, (a + 1) % 20) for a in range(20)],
            (0, 100),
            *[(100 + i, 101 + i) for i in range(4)],
            *[(200 + i, 200 + (i + 1) % 3) for i in range(3)],
            *[(300, 301 + i) for i in range(5)],
        ]
    )
    edges_sql = f"SELECT * FROM (VALUES {rows}) AS t(src, dst)"
    want = sorted(
        map(tuple, duckdb.sql(kcore_sql(edges_sql, 2, 6)).fetchall())
    )
    assert got == want
