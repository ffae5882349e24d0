"""Scan-level efficiency evidence: predicates reach the parquet scan
(PushedFilters) and projections prune the read schema (ReadSchema) —
the two properties that decide whether a 100 TB scan reads terabytes
or gigabytes. Asserted on representative query plans rather than
eyeballed once: a refactor that silently breaks pushdown (e.g. a UDF
wrapping the filter column, or a select * sneaking in) fails here."""

from __future__ import annotations

import re

from goto_eater_crawler_spark.plans.queries import queries

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    return queries()[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def _scans(plan):
    """(pushed_filters, read_schema) per FileScan in the plan."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\].*?ReadSchema: (\S+)", plan):
        out.append((m.group(1), m.group(2)))
    return out


def test_fetch_join_pushes_filter_and_prunes_columns(spark):
    plan = _plan(spark, "fetch_join")
    scans = _scans(plan)
    assert scans
    pushed = " | ".join(p for p, _ in scans)
    # the o_totalprice > 100000 predicate must reach the orders scan
    assert "GreaterThan(o_totalprice" in pushed
    # orders has 9 columns; the scan must read only the 3 used
    orders_schema = next(s for _, s in scans if "o_orderkey" in s)
    assert set(re.findall(r"(\w+):", orders_schema.split("<", 1)[1])) == {
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
    }


def test_membership_filter_pushes_in_list(spark):
    plan = _plan(spark, "membership_filter")
    pushed = " | ".join(p for p, _ in _scans(plan))
    assert "In(" in pushed or "EqualTo(" in pushed


def test_seen_anti_join_prunes_seen_side(spark):
    plan = _plan(spark, "seen_anti_join")
    scans = _scans(plan)
    # the "seen" (customer) scan must push the balance predicate and
    # read only the key column + predicate column
    cust = [(p, s) for p, s in scans if "c_custkey" in s]
    assert cust
    p, s = cust[0]
    assert "LessThan(c_acctbal" in p
    assert set(re.findall(r"(\w+):", s.split("<", 1)[1])) == {
        "c_custkey",
        "c_acctbal",
    }


def test_text_queries_prune_documents_scan(spark):
    # quality score uses only (doc_id, text): lang/source/n_chars must
    # not be read
    plan = _plan(spark, "text_quality_score")
    scans = _scans(plan)
    doc = next(s for _, s in scans if "doc_id" in s)
    cols = set(re.findall(r"(\w+):", doc.split("<", 1)[1]))
    assert cols == {"doc_id", "text"}, cols


def test_events_rollup_prunes_events_scan(spark):
    plan = _plan(spark, "events_hypertable_rollup")
    scans = _scans(plan)
    ev = next(s for _, s in scans if "event_type" in s)
    cols = set(re.findall(r"(\w+):", ev.split("<", 1)[1]))
    assert cols == {"ts", "event_type", "value"}, cols
