"""Random-hyperplane LSH near-dup properties: planted-pair recall
(the gate is non-vacuous), the mirrored hot-bucket cap actually drops
oversized buckets, the slim signature relation is persisted (evaluated
once, not per reference), and hyperplane generation is deterministic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goto_eater_crawler_spark.operators import rhplsh

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_planes_deterministic_and_balanced():
    a = rhplsh.planes()
    b = rhplsh.planes()
    assert a == b
    flat = [s for row in a for s in row]
    assert set(flat) == {1.0, -1.0}
    # LCG shouldn't degenerate: both signs well represented
    pos = sum(1 for s in flat if s > 0)
    assert 0.3 < pos / len(flat) < 0.7


def test_planted_pairs_recovered(spark, emb):
    got = rhplsh.rhp_dup_pairs(emb, 0.95, 200, 40).collect()
    # every planted (variant -i-1, base i) pair must surface: cosine
    # ~0.999 makes per-band collision ~0.89, missing all 6 bands has
    # probability ~2e-6 per pair — a miss means broken banding, not luck
    planted = {(-i - 1, i) for i in range(40)}
    found = {(r["a"], r["b"]) for r in got}
    assert planted <= found
    for r in got:
        assert r["cos_sim"] >= 0.95


def test_bucket_cap_drops_hot_buckets(spark):
    # 30 identical vectors -> one bucket of size 30 in EVERY band;
    # cap 10 must kill all candidates, cap 50 must find all pairs
    rows = [(i, [1.0] * rhplsh.DIM) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    capped = rhplsh.rhp_dup_pairs(df, 0.95, 30, 0, max_bucket=10)
    assert capped.count() == 0
    uncapped = rhplsh.rhp_dup_pairs(df, 0.95, 30, 0, max_bucket=50)
    assert uncapped.count() == 30 * 29 // 2


def test_signature_relation_persisted(spark, emb):
    plan = rhplsh.rhp_dup_pairs(emb, 0.95, 100, 20)._jdf.queryExecution().toString()
    assert "InMemoryRelation" in plan or "InMemoryTableScan" in plan
