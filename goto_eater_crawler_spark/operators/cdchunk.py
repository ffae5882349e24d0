"""Content-defined chunking — the rsync/LBFS boundary rule
(Muthitacharoen et al. SOSP 2001) that blob stores and incremental
WARC/corpus snapshots use for storage-level dedup: split each
document where a rolling window fingerprint hits 0 mod D, so chunk
boundaries survive insertions/deletions (a fixed-size splitter would
shift every boundary after an edit; a content-defined one re-aligns).

Engine shape: 100% Catalyst expressions — the window hash, boundary
filter, chunk assembly, and per-chunk fingerprint are nested array
HOFs (sequence / filter / transform / aggregate) over the text
column, so the whole operator pipelines with the parquet scan inside
WholeStageCodegen: no UDF, no explode until the final chunk rows, no
shuffle at all.  At 100 TB this is one narrow map stage; the chunk
fingerprints then feed an ordinary hash groupBy for the dedup ratio.

Cross-engine contract: the window hash and chunk fingerprint are the
same fixed-order integer fold in Spark (F.aggregate) and DuckDB
(list_reduce) — h' = (31*h + codepoint) masked — no doubles, no
engine-hash dependency (the cross-engine float rule).  Window W=8,
divisor D=32: expected chunk ~32 chars on random text. ASCII corpus
assumed (Spark ascii() vs DuckDB ord() agree on single-byte chars).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WINDOW = 8
DIVISOR = 32
_WIN_MASK = (1 << 20) - 1  # window hash: 31*h < 2^25, no overflow
_FP_MASK = (1 << 40) - 1  # chunk fingerprint: 31*h < 2^45


def _poly_fold(text: Column, lo: Column, hi: Column, mask: int) -> Column:
    """(31*h + code) & mask over text[lo..hi] (1-indexed, inclusive)."""
    return F.aggregate(
        F.sequence(lo, hi),
        F.lit(0).cast("long"),
        lambda h, j: (h * 31 + F.ascii(text.substr(j, F.lit(1)))).bitwiseAND(
            F.lit(mask)
        ),
    )


def chunk_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, chunk_idx, chunk_start, chunk_len, chunk_fp) — chunk
    boundaries at every position i >= W whose trailing-W-window hash
    is 0 mod D, plus the document end; chunk_fp is the polynomial
    fingerprint of the chunk's own bytes (the dedup key)."""
    text = F.col("text")
    n = F.length(text)
    # O(len) Rabin-Karp rolling window hash: H_j = (H_{j-1} -
    # c_{j-W}*31^{W-1})*31 + c_j (mod 2^20) equals the direct
    # polynomial hash of the trailing W chars for every j >= W (no
    # subtraction fires before the window fills), so this fold and
    # the oracle's direct per-position fold compute the SAME integer
    # function — the rolling form just avoids the O(len*W) cost that
    # interpreted HOF lambdas can't afford.  One fold pass per doc,
    # state = (rolling hash, boundary list); the list grows only at
    # boundaries (~1 in D positions), keeping append cost negligible.
    out_mult = pow(31, WINDOW - 1) & _WIN_MASK
    mask_c = F.lit(_WIN_MASK)

    def roll(s: Column, j: Column) -> Column:
        c_in = F.ascii(text.substr(j, F.lit(1)))
        c_out = F.when(
            j > WINDOW, F.ascii(text.substr(j - WINDOW, F.lit(1)))
        ).otherwise(F.lit(0))
        h = (
            ((s["h"] - c_out * out_mult).bitwiseAND(mask_c) * 31 + c_in)
            .bitwiseAND(mask_c)
        )
        is_b = (j >= WINDOW) & (h % DIVISOR == 0)
        return F.struct(
            h.alias("h"),
            F.when(is_b, F.concat(s["b"], F.array(j)))
            .otherwise(s["b"])
            .alias("b"),
        )

    bounds = F.aggregate(
        F.sequence(F.lit(1), n),
        F.struct(
            F.lit(0).cast("long").alias("h"),
            F.array().cast("array<int>").alias("b"),
        ),
        roll,
    )["b"]

    def _bind(expr: Column, fn) -> Column:
        # Catalyst inlines every reference to a sub-expression, so an
        # expression used k times is EVALUATED k times (no CSE across
        # HOF boundaries). Binding it to a lambda variable via a
        # 1-element transform() makes later references variable
        # lookups — the fold above runs once per row, not once per
        # mention.
        return F.get(F.transform(F.array(expr), fn), 0)

    # append the doc end unless it's already a boundary (F.get is
    # null-safe on the empty array; null == n is false -> otherwise);
    # then explode (start, end) pairs FIRST and fingerprint each
    # chunk from the scalar row values: the per-chunk fold touches
    # only its own character range, so total work is O(total chars).
    pairs = _bind(
        bounds,
        lambda b: _bind(
            F.when(F.get(b, F.size(b) - 1) == n, b).otherwise(
                F.concat(b, F.array(n))
            ),
            lambda ends: F.zip_with(
                F.concat(
                    F.array(F.lit(0)), F.slice(ends, 1, F.size(ends) - 1)
                ),
                ends,
                lambda s, e: F.struct(s.alias("s"), e.alias("e")),
            ),
        ),
    )
    rows = docs.filter(n > 0).select(
        "doc_id", "text", F.posexplode(pairs).alias("k0", "p")
    )
    return rows.select(
        "doc_id",
        (F.col("k0") + 1).cast("long").alias("chunk_idx"),
        F.col("p.s").cast("long").alias("chunk_start"),
        (F.col("p.e") - F.col("p.s")).cast("long").alias("chunk_len"),
        _poly_fold(
            F.col("text"), F.col("p.s") + 1, F.col("p.e"), _FP_MASK
        ).alias("chunk_fp"),
    )


def chunk_rows_sql(rel: str = "documents") -> str:
    """DuckDB mirror of :func:`chunk_rows` — identical folds via
    list_reduce (initial accumulator prepended)."""
    win = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"generate_series(i - {WINDOW - 1}, i)), "
        f"(h, j) -> (h * 31 + ord(substr(text, CAST(j AS INTEGER), 1))) "
        f"& {_WIN_MASK})"
    )
    st = "(CASE WHEN k = 1 THEN 0 ELSE ends[CAST(k AS INTEGER) - 1] END)"
    en = "ends[CAST(k AS INTEGER)]"
    fp = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"generate_series(CAST({st} AS BIGINT) + 1, CAST({en} AS BIGINT))), "
        f"(h, j) -> (h * 31 + ord(substr(text, CAST(j AS INTEGER), 1))) "
        f"& {_FP_MASK})"
    )
    return f"""
    WITH b AS (
      SELECT doc_id, text, length(text) AS n,
             list_filter(generate_series(CAST({WINDOW} AS BIGINT),
                                         CAST(length(text) AS BIGINT)),
                         i -> ({win}) % {DIVISOR} = 0) AS bounds
      FROM {rel} WHERE length(text) > 0),
    e AS (
      SELECT doc_id, text, n,
             CASE WHEN bounds[len(bounds)] = n THEN bounds
                  ELSE list_append(bounds, CAST(n AS BIGINT)) END AS ends
      FROM b),
    k AS (
      SELECT doc_id, text, ends,
             unnest(generate_series(CAST(1 AS BIGINT),
                                    CAST(len(ends) AS BIGINT))) AS k
      FROM e)
    SELECT doc_id,
           CAST(k AS BIGINT) AS chunk_idx,
           CAST({st} AS BIGINT) AS chunk_start,
           CAST({en} - {st} AS BIGINT) AS chunk_len,
           CAST({fp} AS BIGINT) AS chunk_fp
    FROM k ORDER BY doc_id, chunk_idx
    """


# ---------------------------------------------------------------------------
# rsync fixed-block delta (minirsync) — the offset-scanning
# counterpart of the content-defined chunker above
# ---------------------------------------------------------------------------

RSYNC_BLOCK = 16


def rsync_recrawl_delta(docs: DataFrame, mod: int = 3) -> DataFrame:
    """Per selected doc (text >= 48 bytes): OLD = the archived text,
    NEW = the refetch with a '[[PATCH-<id>]]' insertion at byte 32.
    Sign OLD's aligned 16-byte blocks, scan NEW with the ROLLING weak
    checksum + md5 strong confirm, emit op stats, and verify the
    delta RECONSTRUCTS the refetch byte-identically. The patch
    marker uses '[' ']' — bytes absent from the corpus vocabulary —
    so no window overlapping the insertion can match a signed block
    and the op counts are closed-form. One Arrow map stage."""
    from typing import Iterator

    import pandas as pd

    from ..functions import minirsync as rs

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                old = str(text).encode("utf-8")
                ins = f"[[PATCH-{d}]]".encode()
                new = old[:32] + ins + old[32:]
                sigs = rs.signatures(old, RSYNC_BLOCK)
                ops = rs.delta(new, sigs, RSYNC_BLOCK)
                recon = rs.apply_delta(old, ops, RSYNC_BLOCK)
                rows.append((
                    d,
                    sum(1 for k, _ in ops if k == "copy"),
                    sum(1 for k, _ in ops if k == "lit"),
                    sum(len(v) for k, v in ops if k == "lit"),
                    len(new),
                    recon == new,
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_copy", "n_lit_runs",
                    "n_lit_bytes", "new_len", "recon_ok",
                ],
            )

    return (
        docs.filter(
            f"doc_id % {mod} = 0 AND octet_length(text) >= 48"
        )
        .select("doc_id", "text")
        .mapInPandas(
            batches,
            schema=(
                "doc_id long, n_copy int, n_lit_runs int, "
                "n_lit_bytes int, new_len int, recon_ok boolean"
            ),
        )
    )


def rsync_recrawl_delta_sql(mod: int = 3) -> str:
    """Closed-form oracle: with the marker bytes outside the corpus
    alphabet, greedy matching copies exactly OLD's len//16 aligned
    blocks; literals are the insertion plus OLD's trailing partial
    block (two runs, one when the tail is empty)."""
    nb = "octet_length(encode(text))"
    ins = "10 + length(CAST(doc_id AS VARCHAR))"
    return f"""
    SELECT doc_id,
           CAST({nb} // 16 AS INT) AS n_copy,
           CAST(CASE WHEN {nb} % 16 = 0 THEN 1 ELSE 2 END AS INT)
             AS n_lit_runs,
           CAST({ins} + {nb} % 16 AS INT) AS n_lit_bytes,
           CAST({nb} + {ins} AS INT) AS new_len,
           TRUE AS recon_ok
    FROM documents
    WHERE doc_id % {mod} = 0 AND {nb} >= 48
    ORDER BY doc_id
    """
