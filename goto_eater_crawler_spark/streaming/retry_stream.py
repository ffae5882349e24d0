"""Streaming retry / dead-letter — the batch engine's fetch-miss
re-enqueue (T3, reference middlewares.py:109-130 + RETRY_TIMES = 8
settings.py:119) as a custom stateful Structured Streaming operator.

Input: a stream of fetch outcomes ``(url, canonical_url, host,
status)`` with status 'fetched' | 'miss'. Per-host state
(``applyInPandasWithState``) tracks each pending URL's retry count;
each microbatch emits:

- ``kind='retry'`` rows for misses still under the retry budget, with
  ``retry_count`` incremented and a decayed ``priority`` whose jitter
  is hash-derived (deterministic — the batch engine's contract:
  wall-clock backoff has no meaning against a static corpus, so
  backoff becomes priority decay; plans/crawl.py retry path), and
- ``kind='dead'`` rows the moment a URL exhausts its budget
  (max_retries, default 8), after which its state is dropped, and
- a success clears the URL's pending state (a URL that eventually
  fetched stops consuming state).

Backoff pacing in continuous form: retry emissions are gated by a
processing-time timer per host — a missed URL re-emits only when the
host's backoff timer fires, re-armed with exponential growth
(2^retries x base, capped), mirroring the reference's
``2**retry_times + delay`` sleep. Timers are armed only while
something is pending, so a drained host leaves the query idle (see
quota_stream on why an always-armed timer must be avoided).
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

IN_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("canonical_url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("status", T.StringType(), False),  # fetched|miss
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # retry|dead
        T.StructField("host", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("canonical_url", T.StringType(), False),
        T.StructField("retry_count", T.IntegerType(), False),
        T.StructField("priority", T.DoubleType(), False),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("pending_json", T.StringType(), True)])

MAX_RETRIES = 8  # reference settings.py:119
BASE_PRIORITY = 100.0


def _decayed_priority(retry_count: int, url_hash: int) -> float:
    """The batch engine's deterministic backoff-as-priority-decay:
    priority - retry_count - hash-jitter (plans/crawl.py retry path).
    """
    return BASE_PRIORITY - retry_count - (url_hash % 10000) / 10000.0


def make_retry_fn(max_retries: int, backoff_base_ms: int):
    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        pending: dict[str, dict] = {}
        if state.exists:
            (blob,) = state.get
            pending = json.loads(blob) if blob else {}
        out = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                for r in pdf.to_dict("records"):
                    cu = r["canonical_url"]
                    if r["status"] == "fetched":
                        pending.pop(cu, None)  # success clears state
                        continue
                    ent = pending.get(cu) or {
                        "url": r["url"],
                        "url_hash": int(r["url_hash"]),
                        "retries": 0,
                    }
                    ent["retries"] += 1
                    if ent["retries"] > max_retries:
                        out.append(
                            {
                                "kind": "dead",
                                "host": host,
                                "url": ent["url"],
                                "canonical_url": cu,
                                "retry_count": ent["retries"] - 1,
                                "priority": 0.0,
                            }
                        )
                        pending.pop(cu, None)
                    else:
                        pending[cu] = ent
        else:
            # backoff timer fired: release every pending URL as a
            # retry row (the re-enqueue the batch engine does at the
            # next round boundary)
            for cu, ent in list(pending.items()):
                out.append(
                    {
                        "kind": "retry",
                        "host": host,
                        "url": ent["url"],
                        "canonical_url": cu,
                        "retry_count": ent["retries"],
                        "priority": _decayed_priority(
                            ent["retries"], ent["url_hash"]
                        ),
                    }
                )
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in OUT_SCHEMA.fields])
        if pending:
            state.update((json.dumps(pending),))
            max_r = max(e["retries"] for e in pending.values())
            # exponential, capped: 2^retries x base (middlewares.py:123-127)
            state.setTimeoutDuration(
                min(int((2 ** max_r) * backoff_base_ms), 60_000)
            )
        elif state.exists:
            state.remove()

    return fn


def retry_stream(
    outcomes: DataFrame,
    max_retries: int = MAX_RETRIES,
    backoff_base_ms: int = 1000,
) -> DataFrame:
    """outcomes: streaming DataFrame in IN_SCHEMA shape. Returns the
    retry/dead stream (OUT_SCHEMA)."""
    return outcomes.groupBy("host").applyInPandasWithState(
        make_retry_fn(max_retries, backoff_base_ms),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
