"""Structured Streaming surface: watermarked windowed ingest metrics
and the stateful streaming URL-seen filter (first-seen exactly once,
state surviving restarts via the streaming checkpoint)."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from goto_eater_crawler_spark.streaming import ingest, quota_stream, seen_stream


@pytest.fixture()
def landing(tmp_path):
    return str(tmp_path)


def _write_pages(spark, path: str, rows):
    from goto_eater_crawler_spark.schema import PAGES_SCHEMA

    spark.createDataFrame(rows, PAGES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_windowed_ingest_counts(spark, landing):
    src = os.path.join(landing, "pages")
    base = dt.datetime(2021, 3, 14, 10, 0, tzinfo=dt.timezone.utc)
    rows = []
    for i in range(40):
        rows.append(
            {
                "url": f"https://h{i % 4}.example.jp/p/{i}",
                "warc_ts": base + dt.timedelta(minutes=3 * i),
                "html": b"<html>x</html>",
                "text": None,
                "lang": "ja" if i % 3 else "en",
            }
        )
    _write_pages(spark, src, rows)
    counts = ingest.windowed_ingest_counts(
        ingest.pages_stream(spark, src), "1 hour", "2 hours"
    )
    ingest.run_to_memory(counts, "ingest_counts", os.path.join(landing, "ck1"))
    got = {
        (r["window_start"].hour, r["lang"]): r["n_pages"]
        for r in spark.table("ingest_counts").collect()
    }
    assert sum(got.values()) == 40
    # 40 pages x 3min span two hour-windows (10:00, 11:00)
    assert {h for h, _ in got} == {10, 11}
    # bytes accounted
    rates = ingest.per_host_rates(ingest.pages_stream(spark, src))
    ingest.run_to_memory(rates, "host_rates", os.path.join(landing, "ck2"))
    per_host = {}
    for r in spark.table("host_rates").collect():
        per_host[r["host"]] = per_host.get(r["host"], 0) + r["n_pages"]
    assert per_host == {f"h{i}.example.jp": 10 for i in range(4)}


def test_first_seen_stateful_across_restarts(spark, landing):
    src = os.path.join(landing, "cand")
    ck = os.path.join(landing, "ck_seen")
    os.makedirs(src, exist_ok=True)

    def feed(urls, fname):
        with open(os.path.join(src, fname), "w") as f:
            for u in urls:
                f.write(json.dumps({"url": u}) + "\n")

    out = os.path.join(landing, "seen_out")

    def drain():
        # file sink: the one that supports restart from checkpoint
        q = (
            seen_stream.first_seen_stream(
                seen_stream.candidates_stream(spark, src)
            )
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return [r["url"] for r in spark.read.parquet(out).collect()]

    # run 1: A, B (+ dup of A in same batch, + param-order alias of B)
    feed(
        [
            "https://h1.example.jp/a",
            "https://h1.example.jp/b?x=1&y=2",
            "https://h1.example.jp/a",
            "https://h1.example.jp/b?y=2&x=1",
        ],
        "f1.json",
    )
    got1 = drain()
    assert sorted(got1) == [
        "https://h1.example.jp/a",
        "https://h1.example.jp/b?x=1&y=2",
    ]

    # run 2 (RESTART, same checkpoint): B again + new C on h1, new D on h2
    feed(
        [
            "https://h1.example.jp/b?x=1&y=2",
            "https://h1.example.jp/c",
            "https://h2.example.jp/d",
        ],
        "f2.json",
    )
    got2 = drain()
    # only the genuinely-new URLs append — B was seen in run 1's state
    assert sorted(got2) == sorted(
        got1 + ["https://h1.example.jp/c", "https://h2.example.jp/d"]
    )


def _cand(url, host, prio, delay=None, depth=0):
    return {
        "url": url,
        "canonical_url": url,
        "host": host,
        "depth": depth,
        "priority": float(prio),
        "crawl_delay": delay,
    }


def test_streaming_quota_release(spark, landing):
    """Per-host quota per microbatch, serial order (priority desc,
    depth, canonical_url), deferred carry-over in state, and
    rank_in_host continuing across microbatches."""
    src = os.path.join(landing, "cands")
    ck = os.path.join(landing, "ck_quota")

    # batch 1: host a has 5 candidates, delay 10 (budget 30 -> quota 3);
    # host b has 2 candidates, delay 3 (quota 10 -> all released)
    b1 = [
        _cand("https://a.jp/u1", "a.jp", 5, 10.0),
        _cand("https://a.jp/u2", "a.jp", 4, 10.0),
        _cand("https://a.jp/u3", "a.jp", 3, 10.0),
        _cand("https://a.jp/u4", "a.jp", 2, 10.0),
        _cand("https://a.jp/u5", "a.jp", 1, 10.0),
        _cand("https://b.jp/v1", "b.jp", 1, 3.0),
        _cand("https://b.jp/v2", "b.jp", 2, 3.0),
    ]
    # batch 2: two more for host a — one hotter than the deferred ones
    b2 = [
        _cand("https://a.jp/u6", "a.jp", 10, 10.0),
        _cand("https://a.jp/u7", "a.jp", 0, 10.0),
    ]
    spark.createDataFrame(b1, quota_stream.CAND_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(b2, quota_stream.CAND_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    cands = (
        spark.readStream.schema(quota_stream.CAND_SCHEMA)
        .option("maxFilesPerTrigger", "1")  # one file per microbatch
        .parquet(src)
    )
    released = quota_stream.quota_release_stream(
        cands, round_budget=30.0, timeout_ms=2000
    )
    # a quota stream with armed idle-host timers never reports "no
    # more work" under availableNow (timer batches keep it live), so
    # poll until the deferred queue has drained, then stop.
    import time

    q = (
        released.writeStream.format("memory")
        .queryName("quota_rel")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table("quota_rel").count() >= 9 or not q.isActive:
                break
            time.sleep(2)
    finally:
        if q.isActive:
            q.stop()
        q.awaitTermination(30)

    rows = spark.table("quota_rel").collect()
    a = sorted(
        ((r["rank_in_host"], r["url"]) for r in rows if r["host"] == "a.jp")
    )
    b = sorted(
        ((r["rank_in_host"], r["url"]) for r in rows if r["host"] == "b.jp")
    )
    # batch1 releases u1-u3; batch2 merges deferred {u4,u5} with new
    # {u6,u7}, releases the serial top-3 {u6,u4,u5}, defers u7 —
    # ranks continue 4..6 across the batch boundary; u7 drains via a
    # timeout-fired batch (rank 7).
    assert a == [
        (1, "https://a.jp/u1"),
        (2, "https://a.jp/u2"),
        (3, "https://a.jp/u3"),
        (4, "https://a.jp/u6"),
        (5, "https://a.jp/u4"),
        (6, "https://a.jp/u5"),
        (7, "https://a.jp/u7"),
    ]
    assert b == [(1, "https://b.jp/v2"), (2, "https://b.jp/v1")]


def test_streaming_quota_delay_persists_in_state(spark, landing):
    """A slow host's crawl_delay is part of the per-host STATE: batches
    whose rows carry null delay, and timer-fired drain batches, must
    keep releasing floor(budget/delay) — not reset to DEFAULT_DELAY.
    (Round-2 advisor finding: delay lived only in the batch rows, so a
    delay-10 host drained its deferred queue at the delay-3 quota.)"""
    import threading
    import time

    src = os.path.join(landing, "cands_delay")
    ck = os.path.join(landing, "ck_quota_delay")

    # batch 1 teaches delay=10 (budget 30 -> quota 3) and defers 2 of 5;
    # batch 2 carries FIVE MORE rows with NULL delay -> with the bug the
    # quota recomputes from DEFAULT_DELAY=3 (quota 10) and releases all
    # 7 pending at once; with the fix it releases 3.
    b1 = [_cand(f"https://s.jp/a{i}", "s.jp", 10 - i, 10.0) for i in range(5)]
    b2 = [_cand(f"https://s.jp/b{i}", "s.jp", -i, None) for i in range(5)]
    spark.createDataFrame(b1, quota_stream.CAND_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(b2, quota_stream.CAND_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    cands = (
        spark.readStream.schema(quota_stream.CAND_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    released = quota_stream.quota_release_stream(
        cands, round_budget=30.0, timeout_ms=1500
    )

    batch_counts: list[int] = []
    lock = threading.Lock()

    def sink(batch_df, batch_id):
        n = batch_df.filter(batch_df.host == "s.jp").count()
        with lock:
            batch_counts.append(n)

    q = (
        released.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            with lock:
                done = sum(batch_counts) >= 10
            if done or not q.isActive:
                break
            time.sleep(1)
    finally:
        if q.isActive:
            q.stop()
        q.awaitTermination(30)

    with lock:
        counts = list(batch_counts)
    assert sum(counts) == 10, counts
    # floor(30/10)=3 is the hard per-batch ceiling — including the
    # null-delay batch 2 and every timer-fired drain batch.
    assert all(c <= 3 for c in counts), counts


def test_streaming_retry_and_dead_letter(spark, landing):
    """Misses accumulate per-URL retry counts in state, re-emit as
    retry rows when the backoff timer fires (deterministic decayed
    priority), clear on success, and dead-letter past the budget."""
    from goto_eater_crawler_spark.streaming import retry_stream as rs

    src = os.path.join(landing, "outcomes")
    ck = os.path.join(landing, "ck_retry")

    def outcome(url, status):
        return {
            "url": url,
            "canonical_url": url,
            "host": "a.jp",
            "url_hash": 12345,
            "status": status,
        }

    # batch 1: one miss (under budget -> retried on timer), one fetch
    b1 = [outcome("https://a.jp/m1", "miss"), outcome("https://a.jp/ok", "fetched")]
    # batch 2: m1 misses again; m2 appears and misses with a small
    # budget so a later batch dead-letters it
    b2 = [outcome("https://a.jp/m1", "miss")]
    b3 = [outcome("https://a.jp/m1", "miss")]
    for b in (b1, b2, b3):
        spark.createDataFrame(b, rs.IN_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    outcomes = (
        spark.readStream.schema(rs.IN_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = rs.retry_stream(outcomes, max_retries=2, backoff_base_ms=500)

    import time

    q = (
        out.writeStream.format("memory")
        .queryName("retry_out")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            rows = spark.table("retry_out").collect()
            if any(r["kind"] == "dead" for r in rows):
                break
            time.sleep(2)
    finally:
        if q.isActive:
            q.stop()
        q.awaitTermination(30)

    rows = spark.table("retry_out").collect()
    retries = [r for r in rows if r["kind"] == "retry"]
    dead = [r for r in rows if r["kind"] == "dead"]
    # m1: miss(1), miss(2), miss(3 > budget 2) -> dead with count 2;
    # timer batches may emit retry rows for counts 1-2 in between
    assert dead and dead[0]["canonical_url"] == "https://a.jp/m1"
    assert dead[0]["retry_count"] == 2
    for r in retries:
        assert r["canonical_url"] == "https://a.jp/m1"
        assert 1 <= r["retry_count"] <= 2
        # deterministic hash jitter: priority = 100 - n - 0.2345
        assert r["priority"] == pytest.approx(
            100.0 - r["retry_count"] - 0.2345
        )
    # the fetched URL never re-emits
    assert all(r["canonical_url"] != "https://a.jp/ok" for r in rows)


def test_hot_hosts_fold_emits_err_sentinel_when_counters_empty():
    """ADVICE r3 #5: at tiny capacity, decrement churn can empty the
    counter dict while decrement mass is nonzero — the fold must still
    emit the (host=null, cnt=decrement) sentinel row so the shard's
    error bound survives to the downstream merge."""
    import pandas as pd

    from goto_eater_crawler_spark.streaming.hotspots_stream import _update

    class _StubState:
        exists = False

        def update(self, v):
            self.value = v

    state = _StubState()
    # capacity=1: 'a' occupies the only counter; 'b' triggers a full
    # decrement (d=1) that zeroes and deletes it -> counters == {}
    frames = list(
        _update(1)((7,), iter([pd.DataFrame({"host": ["a.jp", "b.jp"]})]), state)
    )
    assert len(frames) == 1
    f = frames[0]
    assert len(f) == 1  # the sentinel alone — counters are empty
    assert f["host"].iloc[0] is None or pd.isna(f["host"].iloc[0])
    assert int(f["cnt"].iloc[0]) == 1 and int(f["err"].iloc[0]) == 1
    assert state.value == ("{}", 1)


def test_streaming_hot_hosts_mg_state(spark, landing):
    """MG heavy hitters in streaming state: counts accumulate across
    microbatches AND across a restart from checkpoint; in the exact
    regime (capacity > distinct hosts/shard) the merged counters
    equal the true per-host totals with zero error."""
    from goto_eater_crawler_spark.streaming import hotspots_stream

    src = os.path.join(landing, "hh_src")
    ck = os.path.join(landing, "hh_ck")
    os.makedirs(src, exist_ok=True)

    def feed(hosts, fname):
        with open(os.path.join(src, fname), "w") as f:
            for h in hosts:
                f.write(json.dumps({"host": h}) + "\n")

    batches = []

    def sink(df, epoch_id):
        batches.append((epoch_id, df.collect()))

    def drain():
        stream = spark.readStream.schema("host string").json(src)
        q = (
            hotspots_stream.hot_hosts_stream(stream, n_shards=4, capacity=64)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    feed(["a.jp"] * 5 + ["b.jp"] * 3 + ["c.jp"], "f1.json")
    drain()
    feed(["a.jp"] * 2 + ["c.jp"] * 4 + ["d.jp"], "f2.json")
    drain()  # restart: state must carry run-1 counts

    # final counters = last emission per shard
    last = {}
    for epoch, rows in batches:
        by_shard = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r)
        for s, rs in by_shard.items():
            last[s] = (epoch, rs)
    merged = {}
    err = 0
    for _, rs in last.values():
        for r in rs:
            if r["host"] is not None:
                merged[r["host"]] = merged.get(r["host"], 0) + r["cnt"]
        err += rs[0]["err"] if rs else 0
    assert err == 0  # exact regime
    assert merged == {"a.jp": 7, "b.jp": 3, "c.jp": 5, "d.jp": 1}
