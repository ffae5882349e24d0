"""Charset detection / transcode operators for raw fetched bytes.

The reference's scrapy stack resolves every response's encoding
before spider callbacks run (TextResponse.encoding — header, meta
tag, then chardet); these operators give the 100 TB re-ingest
pipeline the same stage as an explicit, testable Spark operator over
a (doc_id, payload binary) relation: detect the charset with the
deterministic mini-chardet in functions/charsetdetect.py, transcode
to UTF-8, and report per-doc stats the DuckDB oracle can state
closed-form.

Scale shape: one Arrow-batched Python stage (mapInPandas — codec
work is genuinely Python), no shuffle: detection and transcode are
row-local, so the operator pipelines with the scan and any
downstream native exprs stay WholeStageCodegen.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions import charsetdetect

#: doc_id % 4 -> the encoding the synthesizer writes
SYNTH_ENCODINGS = ("utf-8", "shift_jis", "euc_jp", "iso-2022-jp")


def synth_encoded_docs(docs: DataFrame, mod: int = 5) -> DataFrame:
    """(doc_id, payload) — deterministic Japanese text (hiragana run,
    JIS X 0208 row 4 so every trial codec can represent it) encoded
    in one of the four wild-web encodings by doc_id:

    - n = 20 + d % 31 chars, char k = chr(0x3042 + (7d + 13k) % 81)
    - encoding = SYNTH_ENCODINGS[d % 4]

    Every property of the decoded text (char count, code-point sum,
    UTF-8 byte length = 3n) is closed-form in doc_id."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 20 + d % 31
                text = "".join(
                    chr(0x3042 + (7 * d + 13 * k) % 81) for k in range(n)
                )
                ids.append(d)
                payloads.append(text.encode(SYNTH_ENCODINGS[d % 4]))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def charset_transcode_stats(raw: DataFrame) -> DataFrame:
    """(doc_id, payload) -> (doc_id, charset, n_chars, cp_sum,
    utf8_len): detect, transcode to UTF-8, and report the decoded
    char count, code-point sum, and re-encoded UTF-8 byte length.
    Undetectable payloads yield charset='binary' with null stats."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "charset": [], "n_chars": [],
                "cp_sum": [], "utf8_len": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                try:
                    cs, text = charsetdetect.transcode_utf8(bytes(payload))
                except UnicodeDecodeError:
                    out["charset"].append("binary")
                    out["n_chars"].append(None)
                    out["cp_sum"].append(None)
                    out["utf8_len"].append(None)
                    continue
                out["charset"].append(cs)
                out["n_chars"].append(len(text))
                out["cp_sum"].append(sum(map(ord, text)))
                out["utf8_len"].append(len(text.encode("utf-8")))
            yield pd.DataFrame(out)

    return raw.select("doc_id", "payload").mapInPandas(
        batches,
        schema=(
            "doc_id long, charset string, n_chars long, "
            "cp_sum long, utf8_len long"
        ),
    )


def charset_transcode_sql(mod: int = 5) -> str:
    """Closed-form oracle for
    charset_transcode_stats(synth_encoded_docs): detection must name
    exactly the encoding the synthesizer chose, and the decoded text
    stats are pure functions of doc_id (hiragana is 3 UTF-8 bytes
    per char)."""
    return f"""
    SELECT doc_id,
           CASE doc_id % 4 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'shift_jis'
                WHEN 2 THEN 'euc_jp' ELSE 'iso-2022-jp' END AS charset,
           CAST(20 + doc_id % 31 AS BIGINT) AS n_chars,
           (SELECT CAST(SUM(12354 + (7 * doc_id + 13 * u.k) % 81) AS BIGINT)
            FROM (SELECT unnest(range(20 + doc_id % 31)) AS k) u) AS cp_sum,
           CAST(3 * (20 + doc_id % 31) AS BIGINT) AS utf8_len
    FROM documents WHERE doc_id % {mod} = 0
    """
