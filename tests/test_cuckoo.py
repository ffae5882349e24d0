"""Cuckoo-filter seen-set properties (the north rule's "bloom/cuckoo"
second arm): zero false negatives, bounded FP rate, **deletion** (the
capability the bloom lacks), deterministic serialized blocks under
retries, exact split semantics, and the eviction-overflow stash
backstop on a deliberately tiny table."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from goto_eater_crawler_spark.operators.cuckoo import (
    CuckooParams,
    _contains_mask,
    _deserialize,
    _empty_block,
    _insert_new,
    _serialize,
    build_blocks,
    cuckoo_maybe_hashes,
    delete_from_blocks,
    split_new_urls_cuckoo,
    update_blocks,
)

PARAMS = CuckooParams(n_blocks=8, n_buckets=1 << 10)  # 4096 slots/block
N_SEEN = 2000


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
    assert cuckoo_maybe_hashes(seen_hashes, blocks, PARAMS).count() == N_SEEN


def test_fp_rate_bounded(spark, blocks):
    n_probe = 20000
    fresh = spark.range(n_probe).select(
        F.xxhash64(F.concat(F.lit("fresh-"), F.col("id"))).alias("url_hash")
    )
    fp = cuckoo_maybe_hashes(fresh, blocks, PARAMS).count()
    # 16-bit fingerprints, 2 buckets x 4 slots probed -> theoretical
    # FP ~ 8/2^16 ~ 1.2e-4; generous slack
    assert fp / n_probe < 0.01, fp


def test_delete_then_probe(spark, seen_hashes, blocks):
    """The cuckoo advantage: remove half the seen set; the kept half
    must still ALL test positive (no collateral false negatives from
    deletion of genuinely-inserted keys sharing a bucket), and the
    deleted half must (almost) all test negative."""
    dropped = seen_hashes.filter(F.pmod("url_hash", F.lit(2)) == 0)
    kept = seen_hashes.filter(F.pmod("url_hash", F.lit(2)) == 1)
    n_dropped, n_kept = dropped.count(), kept.count()
    after = delete_from_blocks(blocks, dropped, PARAMS).localCheckpoint(eager=True)
    assert cuckoo_maybe_hashes(kept, after, PARAMS).count() == n_kept
    still = cuckoo_maybe_hashes(dropped, after, PARAMS).count()
    # deleted keys may still hit via fingerprint collision with a kept
    # key (FP, not a bug); bound it by the FP envelope
    assert still / n_dropped < 0.02, still


def test_update_idempotent_and_deterministic(spark, seen_hashes, blocks):
    delta = spark.range(500).select(
        F.xxhash64(F.concat(F.lit("delta-"), F.col("id"))).alias("url_hash")
    )
    once = update_blocks(blocks, delta, PARAMS).localCheckpoint(eager=True)
    once_bytes = {r["block_id"]: bytes(r["bits"]) for r in once.collect()}
    twice = {
        r["block_id"]: bytes(r["bits"])
        for r in update_blocks(once, delta, PARAMS).collect()
    }
    # insert-if-absent: re-applying a round's delta is byte-identical
    # (the retry-safety contract the bloom gets from bitwise OR)
    assert twice == once_bytes
    # and a shuffled presentation of the same delta builds the same bytes
    again = {
        r["block_id"]: bytes(r["bits"])
        for r in update_blocks(
            blocks, delta.orderBy(F.desc("url_hash")), PARAMS
        ).collect()
    }
    assert again == once_bytes


def test_split_new_urls_exact_semantics(spark, seen_hashes, blocks):
    seen_rows = seen_hashes.select(
        F.concat(F.lit("u"), F.col("url_hash").cast("string")).alias("canonical_url"),
        "url_hash",
    ).localCheckpoint(eager=True)
    fresh = spark.range(1000).select(
        F.concat(F.lit("f"), F.col("id").cast("string")).alias("canonical_url"),
        F.xxhash64(F.concat(F.lit("fresh2-"), F.col("id"))).alias("url_hash"),
    )
    cand = seen_rows.limit(1000).unionByName(fresh)
    new_rows, _, _ = split_new_urls_cuckoo(cand, blocks, seen_rows, PARAMS)
    got = {r["canonical_url"] for r in new_rows.collect()}
    want = {r["canonical_url"] for r in fresh.collect()}
    assert got == want


def test_overflow_stash_keeps_no_false_negatives():
    """Tiny table (8 buckets x 4 slots = 32 slots) force-fed 60 keys:
    eviction chains must fail, failed keys land in the stash, and
    membership stays exact-positive for every inserted key. The undo
    path must also leave every pre-failure fingerprint findable."""
    params = CuckooParams(n_blocks=1, n_buckets=8)
    table, _ = _empty_block(params)
    stash: list[int] = []
    rng = np.random.default_rng(7)
    hashes = rng.integers(-(2**62), 2**62, size=60, dtype=np.int64)
    hashes = np.unique(hashes)
    _insert_new(table, stash, hashes, params)
    assert len(stash) > 0  # the scenario actually exercised overflow
    stash_arr = np.array(stash, dtype=np.int64)
    assert _contains_mask(table, stash_arr, hashes, params).all()
    # occupancy sanity: table is near-full, not corrupted
    assert (table != 0).sum() + len(stash) >= len(hashes)
    # round-trips through serialization
    t2, s2 = _deserialize(_serialize(table, stash_arr))
    assert (t2 == table).all() and (s2 == stash_arr).all()


def test_insert_deterministic_bytes():
    params = CuckooParams(n_blocks=1, n_buckets=1 << 8)
    rng = np.random.default_rng(11)
    hashes = np.unique(rng.integers(-(2**62), 2**62, size=500, dtype=np.int64))
    blobs = []
    for order in (hashes, hashes[::-1].copy()):
        table, _ = _empty_block(params)
        stash: list[int] = []
        # callers always pass np.unique output; simulate both arrival
        # orders upstream of that contract
        _insert_new(table, stash, np.unique(order), params)
        blobs.append(_serialize(table, np.array(stash, dtype=np.int64)))
    assert blobs[0] == blobs[1]


def test_crawl_with_cuckoo_filter_matches_oracle(spark):
    """Full fixture-web crawl with seen_filter='cuckoo': records,
    fetch order and seen set must equal the single-threaded oracle —
    the filter arm is swappable without any semantic drift — and the
    round metrics must carry the cuckoo via-counters."""
    from goto_eater_crawler_spark.plans.crawl import CrawlConfig, CrawlEngine
    from goto_eater_crawler_spark.schema import FEED_EXPORT_FIELDS
    from goto_eater_crawler_spark.sources import webgen
    from tests.oracle import crawl_oracle

    pages, seeds, robots = webgen.build_fixture_web()
    eng = CrawlEngine(
        spark,
        webgen.pages_df(spark, pages),
        webgen.robots_df(spark, robots),
        CrawlConfig(round_budget=12.0, max_rounds=32, seen_filter="cuckoo"),
    )
    res = eng.run(seeds)
    page_map = {p["url"]: p["html"] for p in pages}
    want = crawl_oracle(page_map, seeds, robots, round_budget=12.0, max_rounds=32)

    assert {r["canonical_url"] for r in res.seen.collect()} == want["seen"]
    got_order = [
        r["canonical_url"]
        for r in res.fetch_log.filter("status = 'fetched'")
        .orderBy("fetch_seq")
        .select("canonical_url")
        .collect()
    ]
    assert got_order == want["fetch_order"]
    got = {
        (r["url"], r["item_index"]): tuple(r[f] for f in FEED_EXPORT_FIELDS)
        for r in res.records.collect()
    }
    want_recs = {
        (r["url"], r["item_index"]): tuple(r[f] for f in FEED_EXPORT_FIELDS)
        for r in want["records"]
    }
    assert got == want_recs
    assert any(m.get("cuckoo_definite_new") for m in res.metrics)
    assert all("bloom_definite_new" not in m for m in res.metrics)


def test_crawl_retraction_refetches_only_retracted_url(spark):
    """VERDICT r3 ask #6 — the deletion path wired through the crawl
    loop: crawl the fixture web with the cuckoo arm, then model a
    mid-crawl policy change (robots flip / recrawl decision) by
    retracting ONE previously-fetched URL D and re-seeding its list
    page L. The retracted URL must be re-fetched (rediscovered as a
    link of L, passing the now-deleted filter + exact table); every
    OTHER link of L stays seen and is NOT re-fetched; and D's
    re-extracted records are byte-identical to its first fetch (the
    parity oracle)."""
    from goto_eater_crawler_spark.plans.crawl import CrawlConfig, CrawlEngine
    from goto_eater_crawler_spark.schema import FEED_EXPORT_FIELDS
    from goto_eater_crawler_spark.sources import webgen

    pages, seeds, robots = webgen.build_fixture_web()
    eng = CrawlEngine(
        spark,
        webgen.pages_df(spark, pages),
        webgen.robots_df(spark, robots),
        CrawlConfig(round_budget=1e6, max_rounds=8, seen_filter="cuckoo"),
    )
    res1 = eng.run(seeds)
    assert res1.blocks is not None

    host = "list-a.example.jp"
    seed = next(s for s in seeds if host in s["url"])
    fetched1 = res1.fetch_log.filter("status = 'fetched'").collect()
    # D: any URL the seed page links to directly (depth 1, same host)
    d_url = min(
        r["canonical_url"]
        for r in fetched1
        if r["host"] == host and r["depth"] == 1
    )
    l_url = next(
        r["canonical_url"]
        for r in fetched1
        if r["host"] == host and r["depth"] == 0
    )

    # control: re-seeding L WITHOUT retraction refetches only L (seeds
    # bypass the seen check by design — dupefilter marks at enqueue)
    ctl = eng.run_rounds(
        eng.seed_frontier([seed]), res1.seen, res1.blocks
    )
    assert {
        r["canonical_url"]
        for r in ctl.fetch_log.filter("status = 'fetched'").collect()
    } == {l_url}

    # retract D, re-seed L: exactly {L, D} fetched
    seen2, blocks2, retracted = eng.retract(res1.seen, res1.blocks, [d_url])
    assert [r["canonical_url"] for r in retracted.collect()] == [d_url]
    assert seen2.filter(F.col("canonical_url") == d_url).isEmpty()
    res2 = eng.run_rounds(eng.seed_frontier([seed]), seen2, blocks2)
    log2 = res2.fetch_log.filter("status = 'fetched'").collect()
    assert {r["canonical_url"] for r in log2} == {l_url, d_url}
    # the refetch came through the seen-split as a NEW url (filter
    # deletion observed), not via seeding
    assert sum(m["new_urls"] for m in res2.metrics) == 1

    # parity: D's re-extracted records byte-equal the first crawl's
    key = lambda r: (r["url"], r["item_index"])  # noqa: E731
    first = {
        key(r): tuple(r[f] for f in FEED_EXPORT_FIELDS)
        for r in res1.records.filter(F.col("url") == d_url).collect()
    }
    second = {
        key(r): tuple(r[f] for f in FEED_EXPORT_FIELDS)
        for r in res2.records.filter(F.col("url") == d_url).collect()
    }
    assert first == second
    # seen set is restored exactly after the refetch
    assert {r["canonical_url"] for r in res2.seen.collect()} == {
        r["canonical_url"] for r in res1.seen.collect()
    }

    # bloom arm must refuse retraction (no deletion support)
    bloom_eng = CrawlEngine(
        spark,
        webgen.pages_df(spark, pages),
        webgen.robots_df(spark, robots),
        CrawlConfig(round_budget=1e6, max_rounds=2),
    )
    with pytest.raises(ValueError, match="cuckoo"):
        bloom_eng.retract(res1.seen, res1.blocks, [d_url])


def test_robots_change_retraction_with_rebuild(spark):
    """Production trigger for retraction: a robots rule FLIP (one host
    goes fully disallowed mid-crawl). retract_for_robots must retract
    exactly that host's seen URLs — computed with robots_split's own
    prefix semantics — and with rebuild=True the filter is rebuilt
    from the surviving seen set (the arm immune to the
    fingerprint-collision caveat): every retracted URL reads as new,
    every surviving URL still reads as seen, and a follow-up crawl
    under the new robots refuses to refetch the host."""
    from goto_eater_crawler_spark.operators import cuckoo as ck
    from goto_eater_crawler_spark.plans.crawl import (
        CrawlConfig,
        CrawlEngine,
        _seen_ops,
    )
    from goto_eater_crawler_spark.sources import webgen

    pages, seeds, robots = webgen.build_fixture_web()
    cfg = CrawlConfig(round_budget=1e6, max_rounds=8, seen_filter="cuckoo")
    eng = CrawlEngine(
        spark, webgen.pages_df(spark, pages), webgen.robots_df(spark, robots), cfg
    )
    res1 = eng.run(seeds)
    host = "list-a.example.jp"
    host_urls = {
        r["canonical_url"]
        for r in res1.seen.collect()
        if f"//{host}/" in r["canonical_url"]
    }
    assert host_urls  # the host was crawled
    # blocked.example.jp is disallowed-all from round 0; its SEED is
    # in the seen set (dupefilter marks at enqueue) and is equally
    # disallowed under the new robots, so retraction covers it too
    expected = host_urls | {
        r["canonical_url"]
        for r in res1.seen.collect()
        if "//blocked.example.jp/" in r["canonical_url"]
    }

    # the rule flip: host fully disallowed
    new_robots = [
        dict(r, disallow_prefixes=["/"]) if r["host"] == host else dict(r)
        for r in robots
    ]
    seen2, blocks2, retracted = eng.retract_for_robots(
        res1.seen,
        res1.blocks,
        webgen.robots_df(spark, new_robots),
        rebuild=True,
    )
    assert {r["canonical_url"] for r in retracted.collect()} == expected
    survivors = {r["canonical_url"] for r in seen2.collect()}
    assert survivors == {
        r["canonical_url"] for r in res1.seen.collect()
    } - expected

    # rebuilt filter: retracted -> new, survivors -> seen (exact
    # end-to-end through the split)
    params = _seen_ops(cfg)[4]
    cand = res1.seen.select("canonical_url", "url_hash")
    new_rows, _, _ = ck.split_new_urls_cuckoo(cand, blocks2, seen2, params)
    assert {
        r["canonical_url"] for r in new_rows.collect()
    } == expected

    # a recrawl under the new robots refuses the host entirely
    eng2 = CrawlEngine(
        spark,
        webgen.pages_df(spark, pages),
        webgen.robots_df(spark, new_robots),
        cfg,
    )
    seed = next(s for s in seeds if host in s["url"])
    res2 = eng2.run_rounds(eng2.seed_frontier([seed]), seen2, blocks2)
    assert res2.fetch_log.filter("status = 'fetched'").isEmpty()
    assert not res2.fetch_log.filter("status = 'robots_dropped'").isEmpty()


def test_retraction_persists_through_checkpoint_store(spark, tmp_path):
    """Persistent-store retraction (T6 x cuckoo deletion): the
    committed seen deltas are rewritten minus the retracted rows and
    the updated blocks land under the latest committed round, so a
    resume-time reader observes the retraction exactly."""
    from goto_eater_crawler_spark.operators import cuckoo as ck
    from goto_eater_crawler_spark.plans.crawl import (
        SEEN_SCHEMA,
        CrawlConfig,
        CrawlEngine,
        _seen_ops,
    )
    from goto_eater_crawler_spark.sources import webgen

    pages, seeds, robots = webgen.build_fixture_web()
    cfg = CrawlConfig(
        round_budget=1e6,
        max_rounds=8,
        seen_filter="cuckoo",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    eng = CrawlEngine(
        spark, webgen.pages_df(spark, pages), webgen.robots_df(spark, robots), cfg
    )
    res1 = eng.run(seeds)
    d_url = min(r["canonical_url"] for r in res1.seen.collect())
    n_before = res1.seen.count()

    seen2, blocks2, _ = eng.retract(res1.seen, res1.blocks, [d_url])

    # stored state (what resume() reads) reflects the retraction
    committed = eng.store.committed_rounds()
    stored_seen = eng.store.read_many(committed, "seen_delta", SEEN_SCHEMA)
    assert stored_seen.filter(F.col("canonical_url") == d_url).isEmpty()
    assert stored_seen.count() == n_before - 1
    from goto_eater_crawler_spark.schema import BLOOM_BLOCK_SCHEMA

    stored_blocks = eng.store.read(committed[-1], "blocks", BLOOM_BLOCK_SCHEMA)
    params = _seen_ops(cfg)[4]
    cand = spark.createDataFrame([(d_url, 0)], SEEN_SCHEMA).withColumn(
        "url_hash", F.xxhash64("canonical_url")
    )
    new_rows, _, _ = ck.split_new_urls_cuckoo(
        cand, stored_blocks, stored_seen, params
    )
    assert new_rows.count() == 1  # D reads as new against stored state


def test_insert_delete_fuzz_model():
    """Hypothesis: any interleaving of insert-batches and delete-
    batches (deletes only of currently-inserted keys) keeps the
    no-false-negative invariant vs a python set model — EXCEPT for the
    data structure's documented deletion caveat (Fan et al. 2014):
    two distinct keys sharing (fingerprint, bucket pair) are one
    stored fingerprint, so deleting one may un-member the other. The
    fuzz therefore exempts exactly the keys whose signature collides
    with a deleted key's signature — everything else must stay
    contained (hypothesis found the 0 vs 2^56 collision that makes
    this precise contract necessary; the example is pinned)."""
    from hypothesis import example, given, settings
    from hypothesis import strategies as st

    from goto_eater_crawler_spark.operators.cuckoo import _fp_i1_i2

    params = CuckooParams(n_blocks=1, n_buckets=1 << 9)

    def sig(keys: np.ndarray) -> list[tuple[int, int, int]]:
        fps, i1s, i2s = _fp_i1_i2(keys, params)
        return [
            (int(f), min(int(a), int(b)), max(int(a), int(b)))
            for f, a, b in zip(fps, i1s, i2s)
        ]

    @settings(max_examples=40, deadline=None)
    # the fuzz-found signature collision, pinned in code (the local
    # .hypothesis example DB is untracked): 0 and 2^56 share fp AND
    # bucket pair, so deleting 0 un-members 2^56 — must stay EXEMPT
    @example(ops=[(True, [0]), (True, [2**56]), (False, [0])])
    @given(
        st.lists(
            st.tuples(
                st.booleans(),
                st.lists(st.integers(-(2**62), 2**62), min_size=1, max_size=40),
            ),
            min_size=1,
            max_size=8,
        )
    )
    def prop(ops):
        table, _ = _empty_block(params)
        stash: list[int] = []
        model: set[int] = set()
        deleted_sigs: set[tuple[int, int, int]] = set()
        for is_insert, keys in ops:
            keys = np.unique(np.array(keys, dtype=np.int64))
            if is_insert:
                stash_arr = np.array(stash, dtype=np.int64)
                fresh = keys[~_contains_mask(table, stash_arr, keys, params)]
                _insert_new(table, stash, fresh, params)
                model |= {int(k) for k in keys}
            else:
                # delete only currently-inserted keys (the contract)
                todel = np.array(
                    [k for k in keys if int(k) in model], dtype=np.int64
                )
                model -= {int(k) for k in todel}
                if todel.size:
                    deleted_sigs |= set(sig(todel))
                in_stash = np.isin(todel, np.array(stash, dtype=np.int64))
                for k in todel[in_stash]:
                    stash.remove(int(k))
                rest = todel[~in_stash]
                if rest.size:
                    fps, i1s, i2s = _fp_i1_i2(rest, params)
                    for j in range(rest.shape[0]):
                        for b in (int(i1s[j]), int(i2s[j])):
                            hit = np.flatnonzero(table[b] == fps[j])
                            if hit.size:
                                table[b, hit[0]] = 0
                                break
            if model:
                arr = np.array(sorted(model), dtype=np.int64)
                # exempt signature-collisions with deleted keys — the
                # documented deletion caveat; all other keys must hit
                exempt = np.array(
                    [s in deleted_sigs for s in sig(arr)], dtype=bool
                )
                hit = _contains_mask(
                    table, np.array(stash, dtype=np.int64), arr, params
                )
                assert (hit | exempt).all()

    prop()
