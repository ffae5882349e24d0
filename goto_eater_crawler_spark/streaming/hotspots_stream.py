"""Streaming hot-host detection — the Misra-Gries heavy-hitter sketch
(operators/sketches.py) as a custom stateful Structured Streaming
operator: the continuous form of "which hosts are hammering the
frontier RIGHT NOW", maintained in bounded memory while the fetch-log
stream runs unbounded.

Sharding mirrors the batch design: group key = hash shard of the host
(not the host itself — a state-store group per host would defeat the
bounded-memory point), each shard folds its microbatch's host counts
into at most ``capacity`` counters carried in state, and every update
emits the shard's current counters plus its accumulated decrement
mass. A downstream consumer merges shards exactly like the batch
merge: sum counts per host, sum decrements into the global error
bound. Estimates are lower bounds within [true - err, true] — the
mergeable-summaries guarantee — and a shard that never decrements
(fewer distinct hosts than capacity) stays exact, batch after batch.

State layout: one row per shard, counters as a JSON object (host ->
count, <= capacity entries) plus the decrement total — small by
construction, and the whole value ships per update anyway.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sketches import _mg_fold

IN_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("host", T.StringType(), False),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("host", T.StringType(), True),
        T.StructField("cnt", T.LongType(), False),
        T.StructField("err", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("counters_json", T.StringType(), True),
        T.StructField("decrement", T.LongType(), True),
    ]
)


def _update(capacity: int):
    def fold(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            counters_json, dec = state.get
            counters = dict(json.loads(counters_json))
            decrement = [int(dec)]
        else:
            counters, decrement = {}, [0]
        for pdf in pdfs:
            vc = pdf["host"].value_counts()
            _mg_fold(counters, decrement, vc.index, vc.to_numpy(), capacity)
        state.update((json.dumps(counters, sort_keys=True), decrement[0]))
        # mirror the batch mg_summaries shape (ADVICE r3 #5): ALWAYS
        # append one (host=null, cnt=decrement) sentinel row so the
        # shard's error mass reaches the downstream merge even when
        # heavy decrement churn at tiny capacity empties the counter
        # set — an empty frame would silently understate the global
        # error bound for the microbatch.
        yield pd.DataFrame(
            {
                "shard": shard,
                "host": list(counters.keys()) + [None],
                "cnt": [int(c) for c in counters.values()] + [decrement[0]],
                "err": decrement[0],
            }
        )

    return fold


def hot_hosts_stream(
    fetch_stream: DataFrame, n_shards: int = 8, capacity: int = 64
) -> DataFrame:
    """fetch_stream: streaming (host string, ...) rows -> per-shard
    current MG counters (shard, host, cnt, err), re-emitted on every
    microbatch that touches the shard, plus one (host=null,
    cnt=decrement) sentinel row per shard (the batch mg_summaries
    shape — it keeps the error mass visible even when the counter set
    is empty). Merge downstream with groupBy(host).sum(cnt) over
    host IS NOT NULL and sum of per-shard err (or of the sentinels'
    cnt — identical by construction)."""
    sharded = fetch_stream.select(
        F.pmod(F.xxhash64("host"), F.lit(n_shards)).cast("int").alias("shard"),
        F.col("host"),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _update(capacity),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
