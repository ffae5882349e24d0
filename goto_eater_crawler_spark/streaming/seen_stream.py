"""Streaming URL-seen filter — the dupefilter (SURVEY.md §2.2 P7) as a
custom stateful Structured Streaming operator.

Per-host groups carry their seen ``url_hash`` set in the state store
(``applyInPandasWithState``); a discovered URL is emitted exactly once
— the first time any microbatch sees it — and the state survives
restarts through the streaming checkpoint, mirroring the batch
engine's bloom+exact seen set (operators/dedup.py) in continuous form.

State layout: one row per host, the seen hashes as a packed
``binary`` blob (8 bytes/hash via numpy) — the state store ships the
whole value per update, so a compact encoding matters; at larger
scale the group key becomes (host, hash mod K) shards, same code.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.urltools import host_col, url_hash_col

CAND_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("seen_blob", T.BinaryType(), True)])


def _first_seen(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (host,) = key
    if state.exists:
        (blob,) = state.get
        seen = np.frombuffer(blob, dtype=np.int64)
    else:
        seen = np.empty(0, dtype=np.int64)
    seen_set = set(seen.tolist())
    out_urls, out_hashes = [], []
    for pdf in pdfs:
        for url, h in zip(pdf["url"], pdf["url_hash"]):
            h = int(h)
            if h not in seen_set:
                seen_set.add(h)
                out_urls.append(url)
                out_hashes.append(h)
    state.update((np.array(sorted(seen_set), dtype=np.int64).tobytes(),))
    if out_urls:
        yield pd.DataFrame(
            {"host": host, "url": out_urls, "url_hash": out_hashes}
        )


def candidates_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """readStream of discovered-URL rows (url string per row, json
    lines); identity columns added natively."""
    raw = (
        spark.readStream.schema(T.StructType([T.StructField("url", T.StringType())]))
        .json(landing_dir)
    )
    from ..functions.urltools import canonicalize_url_col

    canon = canonicalize_url_col(F.col("url"))
    return raw.select(
        canon.alias("url"),
        host_col(F.col("url")).alias("host"),
        url_hash_col(canon).alias("url_hash"),
    )


def first_seen_stream(candidates: DataFrame) -> DataFrame:
    """candidates (url, host, url_hash) -> first-seen rows only."""
    return candidates.groupBy("host").applyInPandasWithState(
        _first_seen,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
