"""Profile the steady-state crawl round at one parallelism level with
Spark event logging, then decompose wall time into:

- per-stage task-time sums and stage wall times (executor-side work)
- inter-job driver gaps (serial driver/scheduling time — the Amdahl
  fraction that caps N->4N scaling efficiency)

Usage:  python tools/profile_steady.py <cores> [<out_json>]

The decomposition drives the round-3 scaling work (VERDICT item 3):
efficiency(2->8) = (T2/T8)/4; with T(n) = serial + parallel/n the
measured pair implies the serial seconds this tool attributes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from goto_eater_crawler_spark.session import get_spark  # noqa: E402


def run(cores: int, evdir: str, rounds: int = 1, x4: bool = False) -> dict:
    """``x4=True`` reproduces the bench's CLEAN-WINDOW leg exactly
    (bench.run_steady_round bucketed=True): 4x web, bucketed pages
    table, sort-merge fetch join, untimed warm-up round. ``rounds``
    repeats the timed round in the same JVM so the decomposition can
    target the JIT-plateaued round rather than the cold one."""
    os.makedirs(evdir, exist_ok=True)
    from goto_eater_crawler_spark.operators.dedup import BloomParams
    from goto_eater_crawler_spark.plans.crawl import CrawlConfig, CrawlEngine
    from goto_eater_crawler_spark.schema import ROBOTS_SCHEMA
    from goto_eater_crawler_spark.sources import benchweb

    data = bench.SCALE4X_DATA if x4 else bench.SCALE_DATA
    hosts = bench.SCALE4X_HOSTS if x4 else bench.SCALE_HOSTS
    spark = get_spark(
        f"profile-steady-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    if x4:
        pages = spark.read.table(bench._register_bucketed(spark, data, hosts))
    else:
        pages = spark.read.parquet(data)
    robots = spark.createDataFrame(
        benchweb.bench_robots(hosts), ROBOTS_SCHEMA
    )
    cfg = CrawlConfig(
        round_budget=1e9,
        max_rounds=1,
        bloom=BloomParams(n_blocks=64, m_bits=1 << 24, k=5),
        assign_fetch_seq=False,
        quota_salts=32,
        fetch_strategy="sortmerge" if x4 else "broadcast",
    )
    spark.range(0, cores * 10, 1, cores).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    if x4:
        warm = CrawlEngine(spark, pages, robots, cfg)
        warm_frontier = benchweb.steady_state_frontier(
            spark, min(64, hosts), bench.LISTS, bench.DETAILS, bench.HOT
        )
        warm.run_rounds(*warm.bootstrap(warm_frontier))
    windows = []
    fetched = 0
    for _ in range(max(1, rounds)):
        frontier = benchweb.steady_state_frontier(
            spark, hosts, bench.LISTS, bench.DETAILS, bench.HOT
        )
        eng = CrawlEngine(spark, pages, robots, cfg)
        state = eng.bootstrap(frontier)
        t0_epoch = time.time()
        t0 = time.perf_counter()
        res = eng.run_rounds(*state)
        elapsed = time.perf_counter() - t0
        m = res.metrics[0]
        fetched = m["fetched"]
        windows.append([t0_epoch, t0_epoch + elapsed])
    app_id = spark.sparkContext.applicationId
    spark.stop()
    secs = [round(w[1] - w[0], 2) for w in windows]
    best = min(range(len(secs)), key=lambda i: secs[i])
    return {
        "cores": cores,
        "sec": secs[best],
        "round_secs": secs,
        "fetched": fetched,
        "urls_per_sec": round(fetched / secs[best], 1),
        "app_id": app_id,
        "event_log": os.path.join(evdir, app_id),
        "window": windows[best],
    }


def decompose(event_log: str, window: tuple[float, float] | None = None) -> dict:
    """Parse a Spark JSON event log into job/stage walls, per-stage
    task-time sums (run/cpu/gc/deser) and inter-job driver gaps."""
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    task_sums: dict[int, dict] = {}
    with open(event_log) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {"start": ev["Submission Time"] / 1000.0}
            elif e == "SparkListenerJobEnd":
                j = jobs.get(ev["Job ID"])
                if j is not None:
                    j["end"] = ev["Completion Time"] / 1000.0
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                agg = task_sums.setdefault(
                    sid,
                    {
                        "run": 0.0, "cpu": 0.0, "gc": 0.0, "deser": 0.0,
                        "in_mb": 0.0, "sr_mb": 0.0, "sw_mb": 0.0,
                        "out_mb": 0.0,
                    },
                )
                agg["run"] += tm.get("Executor Run Time", 0) / 1000.0
                agg["cpu"] += tm.get("Executor CPU Time", 0) / 1e9
                agg["gc"] += tm.get("JVM GC Time", 0) / 1000.0
                agg["deser"] += tm.get("Executor Deserialize Time", 0) / 1000.0
                mb = 1024.0 * 1024.0
                agg["in_mb"] += (tm.get("Input Metrics") or {}).get(
                    "Bytes Read", 0
                ) / mb
                srm = tm.get("Shuffle Read Metrics") or {}
                agg["sr_mb"] += (
                    srm.get("Local Bytes Read", 0)
                    + srm.get("Remote Bytes Read", 0)
                ) / mb
                agg["sw_mb"] += (tm.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0
                ) / mb
                agg["out_mb"] += (tm.get("Output Metrics") or {}).get(
                    "Bytes Written", 0
                ) / mb
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                if "Submission Time" in si and "Completion Time" in si:
                    stages[si["Stage ID"]] = {
                        "stage": si["Stage ID"],
                        "name": si["Stage Name"].split("\n")[0][:90],
                        "submitted": si["Submission Time"] / 1000.0,
                        "wall": (si["Completion Time"] - si["Submission Time"])
                        / 1000.0,
                        "tasks": si["Number of Tasks"],
                    }
    for sid, s in stages.items():
        s.update(
            {k: round(v, 2) for k, v in task_sums.get(sid, {}).items()}
        )
    spans = sorted(
        (j["start"], j.get("end", j["start"])) for j in jobs.values()
    )
    if window:
        spans = [s for s in spans if s[0] >= window[0]]
        stages = {
            k: s for k, s in stages.items() if s["submitted"] >= window[0]
        }
    # union of job spans vs total window -> busy vs gap (driver serial)
    busy, cur_s, cur_e = 0.0, None, None
    for s, e in spans:
        if cur_s is None:
            cur_s, cur_e = s, e
        elif s <= cur_e:
            cur_e = max(cur_e, e)
        else:
            busy += cur_e - cur_s
            cur_s, cur_e = s, e
    if cur_s is not None:
        busy += cur_e - cur_s
    total = spans[-1][1] - spans[0][0] if spans else 0.0
    top = sorted(stages.values(), key=lambda s: -s["wall"])[:15]
    run_total = round(sum(s.get("run", 0.0) for s in stages.values()), 2)
    cpu_total = round(sum(s.get("cpu", 0.0) for s in stages.values()), 2)
    gc_total = round(sum(s.get("gc", 0.0) for s in stages.values()), 2)
    return {
        "n_jobs": len(spans),
        "jobs_window_sec": round(total, 2),
        "jobs_busy_sec": round(busy, 2),
        "driver_gap_sec": round(total - busy, 2),
        "task_run_sec_total": run_total,
        "task_cpu_sec_total": cpu_total,
        "task_gc_sec_total": gc_total,
        "top_stages": top,
    }


if __name__ == "__main__":
    # usage: profile_steady.py <cores> [rounds] [1x|4x] [out_json]
    cores = int(sys.argv[1])
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    x4 = len(sys.argv) > 3 and sys.argv[3] == "4x"
    out_path = sys.argv[4] if len(sys.argv) > 4 else None
    evdir = "/tmp/spark-events"
    r = run(cores, evdir, rounds, x4)
    r["decomp"] = decompose(r["event_log"], tuple(r["window"]))
    out = json.dumps(r, indent=1)
    print(out)
    if out_path:
        with open(out_path, "w") as f:
            f.write(out)
