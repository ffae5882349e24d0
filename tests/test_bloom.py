"""Bloom seen-set unit properties (SURVEY.md §5.1): zero false
negatives (a bloom may never drop a genuinely-new URL — the exact
table is only consulted for maybes), bounded false-positive rate at
the design point, and idempotent/associative block updates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goto_eater_crawler_spark.operators.dedup import (
    BloomParams,
    bloom_maybe_hashes,
    build_blocks,
    merge_blocks,
    split_new_urls,
    update_blocks,
)

PARAMS = BloomParams(n_blocks=8, m_bits=1 << 16, k=5)
N_SEEN = 2000  # ~0.03 bits load/block -> theoretical FP ~ 1e-4..1e-3


@pytest.fixture(scope="module")
def seen_hashes(spark):
    return (
        spark.range(N_SEEN)
        .select(F.xxhash64(F.concat(F.lit("seen-"), F.col("id"))).alias("url_hash"))
        .localCheckpoint(eager=True)
    )


@pytest.fixture(scope="module")
def blocks(spark, seen_hashes):
    return build_blocks(seen_hashes, PARAMS).localCheckpoint(eager=True)


def test_no_false_negatives(spark, seen_hashes, blocks):
    maybe = bloom_maybe_hashes(seen_hashes, blocks, PARAMS)
    # every inserted hash MUST test positive
    assert maybe.count() == N_SEEN


def test_fp_rate_bounded(spark, blocks):
    n_probe = 20000
    fresh = spark.range(n_probe).select(
        F.xxhash64(F.concat(F.lit("fresh-"), F.col("id"))).alias("url_hash")
    )
    fp = bloom_maybe_hashes(fresh, blocks, PARAMS).count()
    # k=5, m/n = 65536/250 per block -> theoretical fp ~ 2e-7; allow
    # generous slack for hash clustering
    assert fp / n_probe < 0.01, fp


def test_update_equals_build_merge(spark, seen_hashes, blocks):
    delta = spark.range(500).select(
        F.xxhash64(F.concat(F.lit("delta-"), F.col("id"))).alias("url_hash")
    )
    via_update = {
        r["block_id"]: bytes(r["bits"])
        for r in update_blocks(blocks, delta, PARAMS).collect()
    }
    via_merge = {
        r["block_id"]: bytes(r["bits"])
        for r in merge_blocks(blocks, build_blocks(delta, PARAMS), PARAMS).collect()
    }
    assert via_update == via_merge
    # idempotent: updating with the same delta twice changes nothing
    once = update_blocks(blocks, delta, PARAMS).localCheckpoint(eager=True)
    twice = {
        r["block_id"]: bytes(r["bits"])
        for r in update_blocks(once, delta, PARAMS).collect()
    }
    assert twice == via_update


def test_split_new_urls_exact_semantics(spark, seen_hashes, blocks):
    """The bloom accelerates; the exact table decides. Rows whose hash
    collides into the bloom must still come out as new via the exact
    check (fp path), so dedup semantics are exact regardless of FP."""
    seen_rows = seen_hashes.select(
        F.concat(F.lit("u"), F.col("url_hash").cast("string")).alias("canonical_url"),
        "url_hash",
    ).localCheckpoint(eager=True)
    # candidates: half genuinely seen, half fresh
    fresh = spark.range(1000).select(
        F.concat(F.lit("f"), F.col("id").cast("string")).alias("canonical_url"),
        F.xxhash64(F.concat(F.lit("fresh2-"), F.col("id"))).alias("url_hash"),
    )
    cand = seen_rows.limit(1000).unionByName(fresh)
    new_rows, definite, fp_checked = split_new_urls(
        cand, blocks, seen_rows, PARAMS
    )
    got = {r["canonical_url"] for r in new_rows.collect()}
    want = {r["canonical_url"] for r in fresh.collect()}
    assert got == want  # exactly the fresh ones, none of the seen ones
