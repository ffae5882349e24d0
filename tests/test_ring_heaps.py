"""Consistent-ring sharding + Heaps-fit contracts."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.plans.queries import (
    _RING_M,
    _ring_case,
    _ring_vnodes,
)


def _owner(kh: int, ring) -> str:
    for h, node in ring:
        if kh < h:
            return node
    return ring[0][1]


def test_vnode_hashes_distinct_across_9_nodes():
    ring = _ring_vnodes(9)
    hashes = [h for h, _ in ring]
    assert len(set(hashes)) == len(hashes) == 36
    assert all(0 <= h < _RING_M for h in hashes)


@settings(max_examples=200, deadline=None)
@given(kh=st.integers(min_value=0, max_value=_RING_M - 1))
def test_keys_only_move_to_the_new_node(kh):
    o8 = _owner(kh, _ring_vnodes(8))
    o9 = _owner(kh, _ring_vnodes(9))
    assert o9 == o8 or o9 == "n8"


def test_moved_fraction_matches_new_nodes_arc():
    ring8, ring9 = _ring_vnodes(8), _ring_vnodes(9)
    # n8's arcs: for each n8 vnode, the gap back to the previous
    # ring9 point (wrapping) is exactly the key range it captures
    hashes9 = sorted(h for h, _ in ring9)
    arc = 0
    for h, node in ring9:
        if node != "n8":
            continue
        i = hashes9.index(h)
        prev = hashes9[i - 1] if i > 0 else hashes9[-1] - _RING_M
        arc += h - prev
    # sampled moved fraction tracks the arc fraction
    moved = sum(
        1
        for kh in range(0, _RING_M, 65537)
        if _owner(kh, ring9) == "n8" and _owner(kh, ring8) != "n8"
    )
    total = len(range(0, _RING_M, 65537))
    assert abs(moved / total - arc / _RING_M) < 0.01


def test_ring_case_sql_matches_python_successor():
    import duckdb

    ring = _ring_vnodes(8)
    case = _ring_case("kh", ring)
    probe_khs = [0, _RING_M - 1] + [h - 1 for h, _ in ring] + [
        h for h, _ in ring
    ]
    rows = duckdb.sql(
        f"SELECT kh, {case} AS node FROM (SELECT unnest({probe_khs}) AS kh)"
    ).fetchall()
    for kh, node in rows:
        assert node == _owner(kh, ring), kh


def test_heaps_two_phase_prefix_equals_truth(spark):
    import math

    docs = [(i, f"w{i % 3} w{i // 2} common") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from goto_eater_crawler_spark.plans.queries import q_text_heaps_fit
    import goto_eater_crawler_spark.plans.queries as Q

    orig = Q._t
    Q._t = lambda s, sf, name: df
    try:
        row = q_text_heaps_fit(spark, "ignored").collect()[0]
    finally:
        Q._t = orig
    # ground truth, single pass
    seen, t, pts = set(), 0, []
    for i, text in docs:
        toks = text.lower().split()
        t += len(toks)
        seen.update(toks)
        if i % 20 == 0:
            pts.append((math.log(t), math.log(len(seen))))
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert row.n_points == n
    assert abs(row.beta - beta) < 1e-3
    assert row.tokens_total == t and row.vocab_total == len(seen)
