"""Token-budget sequence packing — the step an LLM training pipeline
runs after filtering/dedup: concatenate documents into fixed-capacity
training sequences so padding waste is bounded (Krell et al. 2021,
"Efficient sequence packing without cross-contamination", studies the
bin-packing variants; production corpus builders most often run the
streaming NEXT-FIT discipline used here because it needs one pass and
O(1) state per shard).

Discipline: documents are assigned to shards by ``doc_id % shards``
and, within a shard, scanned in ``doc_id`` order with a single running
fill; a document that would overflow ``capacity`` closes the current
sequence and opens the next. Token counts are clamped to ``capacity``
(an over-long document becomes exactly one truncated sequence), so the
recurrence is total and the DuckDB oracle (a recursive CTE over the
same per-shard scan order) reproduces the assignment exactly.

Scale design: ONE shuffle (hash on the shard key), then each shard
packs independently inside ``applyInPandas`` — per-shard state is two
integers, the batch loop is a plain column scan, and shard count is
chosen to match cluster parallelism (at 100 TB: tens of thousands of
shards, each a few GB — no global sort, no driver state, no
cross-shard coordination). Determinism is total: shard assignment and
intra-shard order are pure functions of ``doc_id``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_SCHEMA = "doc_id bigint, shard int, tok bigint, seq_id bigint"


def pack_next_fit(
    docs: DataFrame,
    capacity: int = 256,
    shards: int = 8,
    tok_col: str = "tok",
) -> DataFrame:
    """(doc_id, shard, tok, seq_id): next-fit packing of ``docs``
    (carrying ``doc_id`` and a token-count column) into sequences of
    at most ``capacity`` tokens, per ``doc_id % shards`` shard."""
    d = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        (F.col("doc_id") % shards).cast("int").alias("shard"),
        F.least(F.col(tok_col), F.lit(capacity)).cast("long").alias("tok"),
    )
    cap = int(capacity)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq = 0
        fill = 0
        out = []
        for t in pdf["tok"].tolist():
            if fill + t > cap:
                seq += 1
                fill = t
            else:
                fill += t
            out.append(seq)
        pdf["seq_id"] = out
        return pdf[["doc_id", "shard", "tok", "seq_id"]]

    return d.groupBy("shard").applyInPandas(pack, PACK_SCHEMA)


def pack_next_fit_sql(
    docs_sql: str, capacity: int = 256, shards: int = 8
) -> str:
    """The same per-shard next-fit scan as a DuckDB recursive CTE
    (``docs_sql`` must yield (doc_id, tok) rows; tok is clamped to
    ``capacity`` here, mirroring :func:`pack_next_fit`)."""
    return f"""
    WITH RECURSIVE docs AS (
      SELECT doc_id, CAST(doc_id % {shards} AS INT) AS shard,
             least(tok, {capacity}) AS tok,
             row_number() OVER (PARTITION BY doc_id % {shards}
                                ORDER BY doc_id) AS rn
      FROM ({docs_sql})),
    pack(shard, rn, doc_id, tok, seq_id, fill) AS (
      SELECT shard, rn, doc_id, tok, CAST(0 AS BIGINT), tok
      FROM docs WHERE rn = 1
      UNION ALL
      SELECT d.shard, d.rn, d.doc_id, d.tok,
             CASE WHEN p.fill + d.tok > {capacity}
                  THEN p.seq_id + 1 ELSE p.seq_id END,
             CASE WHEN p.fill + d.tok > {capacity}
                  THEN d.tok ELSE p.fill + d.tok END
      FROM pack p JOIN docs d ON d.shard = p.shard AND d.rn = p.rn + 1)
    SELECT doc_id, shard, CAST(tok AS BIGINT) AS tok, seq_id
    FROM pack"""
