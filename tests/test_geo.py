"""operators/geo.grid_near_pairs — bucketing recall/uniqueness."""

from __future__ import annotations

import itertools

import pytest

from goto_eater_crawler_spark.operators import geo

pytestmark = pytest.mark.usefixtures("spark")


def _brute(points, t):
    out = set()
    for (ia, (xa, ya)), (ib, (xb, yb)) in itertools.combinations(
        sorted(points.items()), 2
    ):
        d2 = (xa - xb) ** 2 + (ya - yb) ** 2
        if d2 < t * t:
            out.add((min(ia, ib), max(ia, ib), d2))
    return out


def _run(spark, points, t):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in sorted(points.items())],
        "rec_id long, lat_u long, lng_u long",
    )
    return {
        (r["rec_a"], r["rec_b"], r["dist2"])
        for r in geo.grid_near_pairs(df, t).collect()
    }


def test_matches_brute_force_on_hostile_layout(spark):
    # deterministic pseudo-random cloud PLUS points planted exactly
    # on cell corners/edges (the boundary cases neighbor expansion
    # must cover), including exact-threshold pairs (excluded: < not <=).
    t = 1000
    points = {}
    for i in range(60):
        points[i] = ((i * 7919) % 9000, (i * 104729) % 9000)
    points[100] = (999, 999)     # cell (0,0) corner
    points[101] = (1000, 1000)   # cell (1,1) corner — dist2 = 2
    points[102] = (2000, 0)      # on a cell edge
    points[103] = (2999, 0)      # same-cell far end, dist 999
    points[104] = (0, 0)
    points[105] = (1000, 0)      # dist exactly t -> d2 == t*t, excluded
    assert _run(spark, points, t) == _brute(points, t)


def test_pairs_unique_even_when_sharing_many_cells(spark):
    # two points 1 apart share all 9 neighbor cells of each other;
    # the join must still emit exactly ONE row for the pair.
    points = {1: (500, 500), 2: (501, 500)}
    got = _run(spark, points, 1000)
    assert got == {(1, 2, 1)}


def test_no_cartesian_in_plan(spark):
    df = spark.createDataFrame(
        [(1, 0, 0), (2, 5, 5)], "rec_id long, lat_u long, lng_u long"
    )
    plan = (
        geo.grid_near_pairs(df, 1000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _py_dbscan(points, eps, min_pts):
    ids = sorted(points)
    nbrs = {
        i: [
            j
            for j in ids
            if (points[i][0] - points[j][0]) ** 2
            + (points[i][1] - points[j][1]) ** 2
            < eps * eps
        ]
        for i in ids
    }  # includes self
    core = {i for i in ids if len(nbrs[i]) >= min_pts}
    # components over core-core eps-pairs, label = min member
    label = {i: i for i in core}

    def find(i):
        while label[i] != i:
            label[i] = label[label[i]]
            i = label[i]
        return i

    for i in core:
        for j in nbrs[i]:
            if j in core:
                ri, rj = find(i), find(j)
                if ri != rj:
                    label[max(ri, rj)] = min(ri, rj)
    out = {}
    for i in ids:
        if i in core:
            out[i] = ("core", find(i))
        else:
            cl = [find(j) for j in nbrs[i] if j in core]
            out[i] = ("border", min(cl)) if cl else ("noise", -1)
    return out


def test_dbscan_matches_reference(spark):
    # two blobs, a border satellite, a bridge too thin to merge
    # blobs, and far noise
    pts = {}
    for i in range(6):
        pts[i] = (100 * i % 500, 100 * (i * 3) % 500)  # blob A-ish
    for i in range(6, 12):
        pts[i] = (10000 + 100 * (i % 5), 10000 + 130 * (i % 4))
    pts[20] = (1300, 0)       # satellite of A (border or noise)
    pts[21] = (50000, 50000)  # noise
    pts[22] = (5000, 5000)    # lone middle point
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in sorted(pts.items())],
        "rec_id long, lat_u long, lng_u long",
    )
    got = {
        r["rec_id"]: (r["role"], r["cluster_id"])
        for r in geo.dbscan(df, eps=1000, min_pts=4).collect()
    }
    assert got == _py_dbscan(pts, 1000, 4)


def test_dbscan_singleton_core_keeps_itself(spark):
    # 5 coincident points: all core, cluster = min id, and no other
    # cores exist anywhere -> the self-pair path is load-bearing
    df = spark.createDataFrame(
        [(i, 7, 7) for i in range(5)],
        "rec_id long, lat_u long, lng_u long",
    )
    got = {
        r["rec_id"]: (r["role"], r["cluster_id"])
        for r in geo.dbscan(df, eps=10, min_pts=5).collect()
    }
    assert got == {i: ("core", 0) for i in range(5)}
