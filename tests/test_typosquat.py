"""operators/domains.typosquat_match — FastSS signature-join contracts."""

from __future__ import annotations

import pytest

from goto_eater_crawler_spark.operators import domains as dm

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, doms, brands):
    d = spark.createDataFrame([(x,) for x in doms], "domain string")
    b = spark.createDataFrame([(x,) for x in brands], "brand string")
    return {
        (r["domain"], r["brand"]): r["dist"]
        for r in dm.typosquat_match(d, b).collect()
    }


def test_all_single_edits_recalled(spark):
    # completeness for ed<=1: exact, every deletion, every
    # substitution, and an insertion must all surface.
    brand = "mailbox.io"
    doms = [brand]
    doms += [brand[:i] + brand[i + 1 :] for i in range(len(brand))]
    doms += [brand[:i] + "z" + brand[i + 1 :] for i in range(len(brand))]
    doms += [brand[:4] + "q" + brand[4:]]
    got = _run(spark, doms, [brand])
    for d in doms:
        assert (d, brand) in got, d
    assert got[(brand, brand)] == 0
    assert all(v <= 1 for v in got.values())


def test_distance2_signature_collision_rejected(spark):
    # N1("ab") and N1("ba") intersect (both contain "a" and "b") but
    # ed=2 — the exact-confirm arm must drop the pair, proving the
    # verify step is load-bearing, not decorative.
    got = _run(spark, ["ab"], ["ba"])
    assert got == {}


def test_far_strings_never_match(spark):
    got = _run(
        spark, ["zzzzzzzz.biz", "mail.example"], ["mailbox.io"]
    )
    assert got == {}


def test_duplicate_domains_collapse_to_one_pair(spark):
    got_rows = dm.typosquat_match(
        spark.createDataFrame(
            [("mailbox.io",)] * 5, "domain string"
        ),
        dm.typosquat_brands(spark),
    ).collect()
    assert len(got_rows) == 1


def test_plan_is_broadcast_not_cartesian(spark):
    d = spark.createDataFrame([("mailbox.io",)], "domain string")
    plan = dm.typosquat_match(
        d, dm.typosquat_brands(spark)
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
