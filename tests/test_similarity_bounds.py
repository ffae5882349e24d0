"""NSW edge-build scale bounds (VERDICT r4 "What's wrong" #4 /
ask #6): the within-cell k-NN join must stay quadratic-in-CAP, not
quadratic-in-cell, no matter how skewed the cell assignment is.

Worst-case candidate-pair count pinned here:
    pairs <= n_cells * cell_cap * (cell_cap - 1)
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from goto_eater_crawler_spark.operators import similarity as sim


def _embs(spark, n, dim=4):
    # deterministic ring of unit-ish vectors; every vector distinct
    rows = [
        (i, [math.cos(0.1 * i + j) for j in range(dim)]) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def test_centroid_count_scales_with_n():
    assert sim.nsw_centroid_count(100) == 8  # floor
    assert sim.nsw_centroid_count(1024 * 8) == 8
    assert sim.nsw_centroid_count(1024 * 100) == 100
    assert sim.nsw_centroid_count(10**9) == 976563  # ~N/1024, NOT 8
    # expected occupancy never exceeds the target under the rule
    for n in (10**4, 10**6, 10**9):
        assert n / sim.nsw_centroid_count(n) <= 1024


def test_cell_cap_bounds_worst_case_pairs(spark):
    # pathological assignment: ONE centroid, every vector in the hot
    # cell. Uncapped this join is n*(n-1) = 9900 pairs; the cap must
    # hold it to cap*(cap-1) = 90.
    n, cap = 100, 10
    e = _embs(spark, n)
    cents = e.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("centroid_id"), F.col("embedding").alias("cent")
    )
    assigned = sim._assign(e, cents, with_ang=False).select(
        "vec_id", "embedding", "centroid_id"
    )
    # the capped node set is the first `cap` members per cell in
    # vec_id order — deterministic, so the bound is reproducible
    edges = sim.nsw_edges(e, cents, degree=3, assigned=assigned,
                          cell_cap=cap).collect()
    nodes = {r.src for r in edges} | {r.dst for r in edges}
    assert nodes <= set(range(cap)), nodes - set(range(cap))
    # per-src degree bound holds on the capped graph
    from collections import Counter

    deg = Counter(r.src for r in edges)
    assert max(deg.values()) <= 3
    # worst-case pair count: 1 cell * cap * (cap-1)
    assert len(edges) <= cap * (cap - 1)


def test_cell_cap_does_not_bind_on_healthy_cells(spark):
    # sized per nsw_centroid_count, the cap never binds: capped and
    # uncapped edge sets are identical
    n = 60
    e = _embs(spark, n)
    cents = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cent"),
    )
    capped = sim.nsw_edges(e, cents, degree=2, cell_cap=2048)
    uncapped = sim.nsw_edges(e, cents, degree=2, cell_cap=10**9)
    assert sorted(map(tuple, capped.collect())) == sorted(
        map(tuple, uncapped.collect())
    )


@pytest.mark.parametrize("n,cap,cells", [(1000, 64, 4), (500, 32, 16)])
def test_pair_bound_formula(n, cap, cells):
    # the documented inequality itself
    assert cap * (cap - 1) * cells < n * (n - 1)
