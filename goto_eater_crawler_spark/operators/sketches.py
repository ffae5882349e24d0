"""Bounded-memory frequency sketching: distributed Misra-Gries heavy
hitters (Misra & Gries 1982; merge analysis per Agarwal et al.,
"Mergeable Summaries", PODS 2012 — public papers).

The crawl analogue: finding hot hosts / hot URL prefixes in a 10^10-row
fetch log without a full-width groupBy. The scale shape:

- stage 1 (no shuffle): each partition folds its rows into a
  Misra-Gries summary of at most ``capacity`` counters inside ONE
  mapInPandas pass — bounded memory regardless of partition size,
  vectorized per Arrow batch (value_counts), per-batch fold into the
  running dict.
- stage 2 (tiny shuffle): only the summaries shuffle — O(partitions x
  capacity) rows, not O(rows) — then one groupBy merges them: summed
  counts are within [true - sum(decrements), true], so each
  partition also emits its total decrement and the merge carries the
  global ``max_err`` alongside every estimate.
- exactness contract: a partition that never decrements (fewer than
  ``capacity`` distinct keys) reports err 0; when every partition
  reports 0 the counts are EXACT — the oracle gate runs in that
  regime, the pytest covers the lossy regime against brute force.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_fold(counters: dict, decrement: list[int], vals, cnts, capacity: int):
    """Fold a (value, count) batch into the MG counter dict."""
    for v, c in zip(vals, cnts):
        c = int(c)
        if v in counters:
            counters[v] += c
        elif len(counters) < capacity:
            counters[v] = c
        else:
            # decrement-all by the largest amount that keeps the
            # invariant: min(batch count, smallest counter)
            m = min(counters.values())
            d = min(c, m)
            decrement[0] += d
            for k in list(counters):
                counters[k] -= d
                if counters[k] == 0:
                    del counters[k]
            if c - d > 0:
                counters[v] = c - d


def mg_summaries(df: DataFrame, key_col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: (key, cnt) counter rows
    plus one (null, decrement) row per partition carrying its total
    decrement mass."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        decrement = [0]
        for pdf in batches:
            vc = pdf[key_col].value_counts()
            _mg_fold(counters, decrement, vc.index, vc.to_numpy(), capacity)
        out = pd.DataFrame(
            {"key": list(counters.keys()), "cnt": list(counters.values())}
        )
        err = pd.DataFrame({"key": [None], "cnt": [decrement[0]]})
        yield pd.concat([out, err], ignore_index=True)

    return df.select(F.col(key_col).cast("long").alias(key_col)).mapInPandas(
        summarize, schema="key long, cnt long"
    )


def heavy_hitters(
    df: DataFrame, key_col: str, k: int, capacity: int = 256
) -> DataFrame:
    """Top-k keys by (lower-bound) count with the global error bound:
    (key, n, max_err). n is exact when max_err == 0."""
    summ = mg_summaries(df, key_col, capacity)
    err = summ.filter(F.col("key").isNull()).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("max_err")
    )
    merged = (
        summ.filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.sum("cnt").alias("n"))
    )
    return (
        merged.crossJoin(F.broadcast(err))  # 1-row error bound stays in-plan
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(k)
        .select(F.col("key").alias(key_col), "n", "max_err")
    )
