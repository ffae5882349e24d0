"""Streaming politeness quota — the per-host budget scheduler
(SURVEY.md §2.4 A6 / §2.5 W1) as a custom stateful Structured
Streaming operator.

The batch engine enforces politeness per round: each host releases at
most ``floor(round_budget / crawl_delay)`` URLs per round, in a
deterministic serial order, the rest deferred to the next round
(operators/politeness.quota_split). This module is the continuous
form: candidates stream in, per-host state (``applyInPandasWithState``)
holds the host's DEFERRED queue and its running emission count, and
each microbatch plays the role of a round — merge deferred + new
candidates, emit the quota head in serial order (priority desc, depth
asc, canonical_url asc — the same order contract as the batch
engine), push the tail back into state. ``rank_in_host`` continues
across microbatches, so downstream consumers see the exact serial
sequence a polite single-connection fetcher would issue.

A processing-time timeout re-fires idle hosts so a deferred queue
drains even when no new candidates arrive for that host (without it,
stateful functions only run for keys present in the batch).

State compactness: the deferred queue is a JSON blob here (fixture
scale); the production encoding is the packed-numpy style of
seen_stream.py, and a host whose queue outgrows the state store is
exactly the hot-host skew the batch engine salts — the stream's
analogue is sharding the group key to (host, shard).
"""

from __future__ import annotations

import json
import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CAND_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("canonical_url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("priority", T.DoubleType(), False),
        T.StructField("crawl_delay", T.DoubleType(), True),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("canonical_url", T.StringType(), False),
        T.StructField("rank_in_host", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("emitted", T.LongType(), True),
        T.StructField("deferred_json", T.StringType(), True),
        # the host's crawl-delay is part of state: timer-fired drain
        # batches (and batches whose rows carry null delay) must keep
        # honouring floor(budget/delay) for a slow host instead of
        # silently resetting to DEFAULT_DELAY.
        T.StructField("crawl_delay", T.DoubleType(), True),
    ]
)

DEFAULT_DELAY = 3.0  # reference settings.py:32


def _quota(budget: float, delay: float) -> int:
    return max(int(math.floor(budget / max(delay, 1e-9))), 1)


def _serial_key(row: dict):
    # the engine's per-host serial order (politeness._order):
    # priority desc, depth asc, canonical_url asc
    return (-row["priority"], row["depth"], row["canonical_url"])


def make_quota_fn(round_budget: float, timeout_ms: int | None = None):
    def release(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        emitted, pending, stored_delay = 0, [], None
        if state.exists:
            emitted_v, deferred_json, stored_delay = state.get
            emitted = int(emitted_v or 0)
            pending = json.loads(deferred_json) if deferred_json else []
        delay = stored_delay if stored_delay is not None else DEFAULT_DELAY
        if not state.hasTimedOut:
            for pdf in pdfs:
                for r in pdf.to_dict("records"):
                    if r.get("crawl_delay") is not None and not pd.isna(
                        r["crawl_delay"]
                    ):
                        delay = float(r["crawl_delay"])
                    pending.append(
                        {
                            "url": r["url"],
                            "canonical_url": r["canonical_url"],
                            "depth": int(r["depth"]),
                            "priority": float(r["priority"]),
                        }
                    )
        pending.sort(key=_serial_key)
        q = _quota(round_budget, delay)
        head, tail = pending[:q], pending[q:]
        if head:
            out = pd.DataFrame(
                {
                    "host": host,
                    "url": [r["url"] for r in head],
                    "canonical_url": [r["canonical_url"] for r in head],
                    "rank_in_host": [emitted + i + 1 for i in range(len(head))],
                }
            )
            yield out
        state.update(
            (
                emitted + len(head),
                json.dumps(tail) if tail else None,
                # persist the delay so timeout batches and null-delay
                # rows keep the floor(budget/delay) contract
                float(delay),
            )
        )
        if tail:
            # re-fire so the deferred queue drains even if no new
            # candidates arrive for this host. Armed ONLY while a
            # queue exists: a drained host keeps its rank counter but
            # no timer (an always-armed timer would make every
            # trigger schedule more timeout work forever — a
            # query that can never go idle). The period defaults to
            # the round budget — the next "round" for that host.
            state.setTimeoutDuration(
                timeout_ms if timeout_ms is not None else int(round_budget * 1000)
            )

    return release


def quota_release_stream(
    candidates: DataFrame,
    round_budget: float = 60.0,
    timeout_ms: int | None = None,
) -> DataFrame:
    """candidates: a streaming DataFrame in CAND_SCHEMA shape.
    Returns the released stream (OUT_SCHEMA): per host at most
    floor(budget/delay) rows per microbatch, serial order preserved,
    rank_in_host continuing across batches. ``timeout_ms`` overrides
    the idle-host re-fire period (defaults to the round budget)."""
    return candidates.groupBy("host").applyInPandasWithState(
        make_quota_fn(round_budget, timeout_ms),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
