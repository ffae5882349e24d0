"""WARC ingestion source: Common-Crawl-style WARC blobs -> the
engine's pages relation (url, warc_ts, html) — the input_hint table
shape, produced from the raw upstream container instead of an
already-landed Iceberg table.

Scale shape: WARC files are embarrassingly parallel — one file (or one
range of gzip members) per task, no shuffle; ``warc_pages`` is a
mapInPandas 1->many expansion (one input blob row -> one output row
per ``response`` record), Arrow-batched, so the 100 TB ingest is a
single scan stage writing straight to the partitioned pages table.
Non-response records (warcinfo / request / metadata) and torn records
are dropped inside the worker (the codec resyncs to the next record
marker) — error handling never crosses the stage boundary.

``synth_warc_from_docs`` builds deterministic WARC bytes from the
``documents`` table in-plan, which lets the oracle gate state the
round-trip invariant in plain SQL: parse(synth(docs)) == docs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import miniwarc

WARC_PAGE_SCHEMA = (
    "url string, warc_ts timestamp, http_status int, mime string, html binary"
)


def warc_pages(warc_blobs: DataFrame, blob_col: str = "data") -> DataFrame:
    """(.., data binary) WARC blobs -> one row per response record:
    (url, warc_ts, http_status, mime, html)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[blob_col]:
                for rec in miniwarc.parse_warc(bytes(blob)):
                    if rec.rec_type != "response" or rec.target_uri is None:
                        continue
                    rows.append(
                        (
                            rec.target_uri,
                            pd.Timestamp(rec.date.rstrip("Z"))
                            if rec.date
                            else None,
                            rec.http_status,
                            rec.http_content_type,
                            rec.http_body,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "http_status", "mime", "html"]
            )

    return warc_blobs.mapInPandas(parse, schema=WARC_PAGE_SCHEMA)


def html_wrap_body(doc_id: int, text: str, links: bool = False) -> str:
    """The deterministic HTML page layout ``synth_warc_from_docs``
    wraps doc text in when ``html_wrap=True`` — single-line markup
    (title + nav boilerplate + one paragraph, plus two outlinks when
    ``links=True`` for the WAT gate) that a WET conversion strips
    back to plain text. Exposed so the oracle SQL can state the same
    construction."""
    tail = (
        f'<a href="/doc/{doc_id + 1}">next</a>'
        f'<a href="https://w{(doc_id + 1) % 7}.example.test/">hub</a>'
        if links
        else ""
    )
    return (
        f"<html><head><title>doc {doc_id}</title></head>"
        f"<body><nav>home | about</nav><p>{text}</p>{tail}</body></html>"
    )


def synth_warc_from_docs(
    documents: DataFrame,
    docs_per_file: int = 50,
    gzipped: bool = False,
    html_wrap: bool = False,
    links: bool = False,
    compression: str | None = None,
) -> DataFrame:
    """Deterministic WARC blobs from the documents table: doc_id ->
    url https://w{doc_id % 7}.example.test/doc/{doc_id}, fixed date
    spread, body = utf-8 text (wrapped in the ``html_wrap_body``
    markup when ``html_wrap=True``). One blob per
    ``doc_id // docs_per_file`` group (the grouping mirrors WARC's
    many-records-per-file layout)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        pages = [
            (
                f"https://w{int(d) % 7}.example.test/doc/{int(d)}",
                f"2021-06-{int(d) % 28 + 1:02d}T12:00:00Z",
                (
                    html_wrap_body(int(d), t, links) if html_wrap else t
                ).encode("utf-8"),
            )
            for d, t in zip(pdf["doc_id"], pdf["text"])
        ]
        return pd.DataFrame(
            {
                "file_id": [int(pdf["file_id"].iloc[0])],
                "data": [
                    miniwarc.write_warc(
                        pages, gzipped=gzipped, compression=compression
                    )
                ],
            }
        )

    return (
        documents.select(
            "doc_id",
            "text",
            (F.col("doc_id") / docs_per_file).cast("long").alias("file_id"),
        )
        .groupBy("file_id")
        .applyInPandas(build, schema="file_id long, data binary")
    )
