"""Bench harness — prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Two parts:

1. **Relational queries** from ``__spark_entry__.queries()`` at
   ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
   ``local[$SPARK_GRAFT_CPUS]`` — per-query wall seconds.

2. **Crawl throughput + scaling** (BASELINE.md protocol): the frontier
   engine runs on a deterministic synthetic bench web (parquet,
   generated once, reused) at TWO parallelism levels — N = cpus/4 and
   4N = cpus cores — on the SAME input; reports URLs/sec at both and
   scaling efficiency = (thr_4N / thr_N) / 4. Sandbox stand-in for the
   north_rule's N vs 4N executors criterion (no real cluster here).

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
BENCH_HOSTS / BENCH_LISTS / BENCH_DETAILS (web size),
BENCH_SKIP_SCALING=1 (skip the N-core run).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from goto_eater_crawler_spark.operators.dedup import BloomParams  # noqa: E402
from goto_eater_crawler_spark.plans.crawl import CrawlConfig, CrawlEngine  # noqa: E402
from goto_eater_crawler_spark.session import get_spark  # noqa: E402
from goto_eater_crawler_spark.sources import benchweb  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_HOSTS = int(os.environ.get("BENCH_HOSTS", "300"))
LISTS = int(os.environ.get("BENCH_LISTS", "10"))
DETAILS = int(os.environ.get("BENCH_DETAILS", "100"))
HOT = int(os.environ.get("BENCH_HOT_FACTOR", "10"))
BENCH_DATA = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    ".bench_data",
    f"web_h{N_HOSTS}_l{LISTS}_d{DETAILS}_x{HOT}",
)


def ensure_bench_web() -> int:
    """Generate the bench web parquet once; return page count."""
    marker = os.path.join(BENCH_DATA, "_COUNT")
    if os.path.exists(marker):
        with open(marker) as f:
            return int(f.read())
    spark = get_spark("bench-gen", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    pages = benchweb.gen_bench_web(spark, N_HOSTS, LISTS, DETAILS, HOT)
    pages.repartition(CPUS * 2).write.mode("overwrite").parquet(BENCH_DATA)
    n = spark.read.parquet(BENCH_DATA).count()
    with open(marker, "w") as f:
        f.write(str(n))
    spark.stop()
    return n


def run_queries(spark) -> dict[str, float]:
    import __spark_entry__ as entrymod

    timings = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        _ = n
    return timings


def run_crawl(cores: int) -> dict:
    """One full crawl of the bench web at the given core count."""
    spark = get_spark(
        f"bench-crawl-{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    pages = spark.read.parquet(BENCH_DATA)
    from goto_eater_crawler_spark.schema import ROBOTS_SCHEMA

    robots = spark.createDataFrame(benchweb.bench_robots(N_HOSTS), ROBOTS_SCHEMA)
    seeds = benchweb.bench_seeds(N_HOSTS)
    cfg = CrawlConfig(
        round_budget=100000.0,  # quota ample: shape (3 rounds) from link structure
        max_rounds=8,
        bloom=BloomParams(n_blocks=max(cores, 16), m_bits=1 << 23, k=5),
        assign_fetch_seq=False,  # global seq window excluded from the hot path
        quota_salts=cores,
    )
    t0 = time.perf_counter()
    res = CrawlEngine(spark, pages, robots, cfg).run(seeds)
    elapsed = time.perf_counter() - t0
    fetched = sum(m["fetched"] for m in res.metrics)
    records = sum(m["records"] for m in res.metrics)
    spark.stop()
    return {
        "cores": cores,
        "sec": round(elapsed, 2),
        "fetched_urls": fetched,
        "records": records,
        "urls_per_sec": round(fetched / elapsed, 1),
        "rounds": len(res.metrics),
    }


def main() -> None:
    out: dict = {"sf": SF_DIR, "unit": "sec"}

    n_pages = ensure_bench_web()
    out["bench_web_pages"] = n_pages

    t_all = time.perf_counter()
    spark = get_spark("bench-queries", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    out["queries"] = run_queries(spark)
    spark.stop()

    if os.environ.get("BENCH_SKIP_SCALING") != "1":
        crawl_n = run_crawl(max(CPUS // 4, 1))
        out["crawl_N"] = crawl_n
    crawl_4n = run_crawl(CPUS)
    out["crawl_4N"] = crawl_4n
    if os.environ.get("BENCH_SKIP_SCALING") != "1":
        out["scaling_efficiency"] = round(
            (crawl_4n["urls_per_sec"] / out["crawl_N"]["urls_per_sec"]) / 4.0, 3
        )
    # headline value: total seconds for queries + the 4N crawl ("sec",
    # lower is better); crawl_4N.urls_per_sec carries the throughput
    # metric BASELINE.md tracks, scaling_efficiency the north_rule one.
    out["metric"] = "headline_total_sec"
    out["value"] = round(sum(out["queries"].values()) + crawl_4n["sec"], 2)
    out["crawl_urls_per_sec"] = crawl_4n["urls_per_sec"]
    out["total_sec"] = round(time.perf_counter() - t_all, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
