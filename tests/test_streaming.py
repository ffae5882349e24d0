"""Structured Streaming surface: watermarked windowed ingest metrics
and the stateful streaming URL-seen filter (first-seen exactly once,
state surviving restarts via the streaming checkpoint)."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from goto_eater_crawler_spark.streaming import ingest, seen_stream


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
