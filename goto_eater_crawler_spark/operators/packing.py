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


def span_corruption(docs: DataFrame, chunk: int = 20, span: int = 3) -> DataFrame:
    """T5 span-corruption accounting (Raffel et al., "Exploring the
    Limits of Transfer Learning...", JMLR 2020 §3.1.4 — the
    pretraining objective's data-prep pass): mask contiguous token
    spans, replace each with ONE sentinel in the encoder input and
    emit ``sentinel + original tokens`` pairs as the decoder target.
    The usual implementation draws span starts at random; a
    distributed, resumable pipeline needs the DETERMINISTIC variant —
    here every ``chunk``-token window corrupts one ``span``-token run
    whose offset is the Knuth multiplicative hash of (doc_id, window)
    — so any worker, any retry, any engine produces the same mask
    (the same reproducibility rule as the sampling gates).

    Non-overlap by construction: offsets land in [0, chunk - span],
    spans stay inside their window. Output per doc: n_tokens,
    n_spans, n_corrupted (masked tokens), input_len (kept + one
    sentinel per span), target_len (corrupted + one sentinel per
    span + EOS) — the (input, target) length budget the packing step
    (:func:`pack_next_fit`) consumes downstream.

    Scale shape: one whitespace split + one explode over
    length/chunk window ids per doc, one combinable groupBy — no
    shuffle beyond the doc_id aggregation, everything whole-stage
    codegen except nothing (pure native exprs).
    """
    n_tok = F.size(F.split(F.col("text"), " "))
    d = docs.select("doc_id", n_tok.alias("n_tokens"))
    win = d.select(
        "doc_id",
        "n_tokens",
        F.explode(
            F.expr("sequence(0, CAST((n_tokens - 1) / %d AS INT))" % chunk)
        ).alias("w"),
    )
    # window w covers tokens [w*chunk, min(n_tokens, (w+1)*chunk));
    # offset = hash(doc_id, w) mod (chunk - span + 1); the span clips
    # at the doc tail (last window may be short)
    off = (
        (F.col("doc_id") * 2654435761 + F.col("w") * 40503) % (chunk - span + 1)
    )
    start = F.col("w") * chunk + off
    corrupted = F.greatest(
        F.lit(0),
        F.least(F.lit(span).cast("long"), F.col("n_tokens") - start),
    )
    per_win = win.select(
        "doc_id",
        "n_tokens",
        corrupted.alias("c"),
        (corrupted > 0).cast("long").alias("s"),
    )
    return per_win.groupBy("doc_id").agg(
        F.first("n_tokens").alias("n_tokens"),
        F.sum("s").cast("bigint").alias("n_spans"),
        F.sum("c").cast("bigint").alias("n_corrupted"),
        (
            F.first("n_tokens") - F.sum("c") + F.sum("s")
        ).cast("bigint").alias("input_len"),
        (F.sum("c") + F.sum("s") + 1).cast("bigint").alias("target_len"),
    )


def span_corruption_sql(docs_sql: str, chunk: int = 20, span: int = 3) -> str:
    """DuckDB mirror — identical window/offset arithmetic."""
    m = chunk - span + 1
    return f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM ({docs_sql})),
    win AS (
      SELECT doc_id, n_tokens, CAST(u.w AS BIGINT) AS w
      FROM d, unnest(range(((n_tokens - 1) // {chunk}) + 1)) AS u(w)),
    per AS (
      SELECT doc_id, n_tokens,
             greatest(0, least({span},
               n_tokens - (w * {chunk}
                 + (doc_id * 2654435761 + w * 40503) % {m}))) AS c
      FROM win)
    SELECT doc_id, any_value(n_tokens) AS n_tokens,
           CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
           CAST(sum(c) AS BIGINT) AS n_corrupted,
           CAST(any_value(n_tokens) - sum(c)
                + sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS input_len,
           CAST(sum(c) + sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) + 1
                AS BIGINT) AS target_len
    FROM per GROUP BY doc_id
    """
