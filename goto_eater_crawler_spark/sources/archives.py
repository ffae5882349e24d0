"""ZIP / tar.gz archive ingestion sources: corpus-dump containers ->
the engine's pages relation, the siblings of ``sources/warc.py`` for
the two other containers web datasets actually ship in.

Scale shape (identical to WARC ingest): archives are embarrassingly
parallel — one container blob per task, no shuffle; each reader is a
mapInPandas 1->many expansion (one blob row -> one row per member
file), Arrow-batched, so a 100 TB ingest is a single scan stage
writing straight to the partitioned pages table. Member decode errors
never cross the stage boundary.

Producer/decoder contract: the synth builders write archives with the
REAL stdlib ``zipfile`` / ``tarfile`` (deflate via real zlib); the
readers walk them with the engine's OWN container+codec stack
(``functions/minizip.py`` / ``functions/minitar.py`` over
``functions/minideflate.py``), so the oracle round-trip gate pins
both the container walk and the inflater against a real
implementation.

Reference parity note: the reference's XLSX sources are ZIP
containers opened with stdlib zipfile (scripts download .xlsx and
openpyxl walks them); this path is the corpus-scale generalization —
cited at sources/families/xlsx_body.py.
"""

from __future__ import annotations

import io
import tarfile
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import minideflate, minitar, minizip

MEMBER_SCHEMA = (
    "name string, method int, n_bytes bigint, mtime_y int, text string"
)


def synth_zip_from_docs(
    documents: DataFrame, docs_per_file: int = 50
) -> DataFrame:
    """Deterministic ZIP blobs from the documents table: member
    ``doc/{doc_id}.txt``, body = utf-8 text, STORED for even doc_id /
    DEFLATED for odd (both methods in-corpus), fixed DOS timestamp
    2021-06-{doc_id%28+1} 12:00. One blob per doc_id//docs_per_file
    group. Writer is the REAL stdlib zipfile."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                zi = zipfile.ZipInfo(
                    f"doc/{d}.txt",
                    date_time=(2021, 6, d % 28 + 1, 12, 0, 0),
                )
                z.writestr(
                    zi,
                    t.encode("utf-8"),
                    compress_type=(
                        zipfile.ZIP_STORED if d % 2 == 0
                        else zipfile.ZIP_DEFLATED
                    ),
                )
        return pd.DataFrame(
            {
                "file_id": [int(pdf["file_id"].iloc[0])],
                "data": [buf.getvalue()],
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


def synth_targz_from_docs(
    documents: DataFrame, docs_per_file: int = 50
) -> DataFrame:
    """Deterministic .tar.gz blobs (stdlib tarfile, default PAX
    format, real-zlib gzip): member ``doc/{doc_id}.txt``, mtime =
    86400 * (doc_id % 28 + 1)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w:gz") as t:
            for d, txt in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                body = txt.encode("utf-8")
                ti = tarfile.TarInfo(f"doc/{d}.txt")
                ti.size = len(body)
                ti.mtime = 86400 * (d % 28 + 1)
                t.addfile(ti, io.BytesIO(body))
        return pd.DataFrame(
            {
                "file_id": [int(pdf["file_id"].iloc[0])],
                "data": [buf.getvalue()],
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


def zip_members(blobs: DataFrame, blob_col: str = "data") -> DataFrame:
    """(.., data binary) ZIP blobs -> one row per member through the
    OWN EOCD/CD walk + OWN inflate + OWN CRC-32 verify: (name,
    method, n_bytes, mtime_y, text)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[blob_col]:
                for e in minizip.parse_zip(bytes(blob)):
                    rows.append(
                        (
                            e.name,
                            e.method,
                            e.uncomp_size,
                            e.mtime[0],
                            e.data.decode("utf-8"),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["name", "method", "n_bytes", "mtime_y", "text"],
            )

    return blobs.mapInPandas(parse, schema=MEMBER_SCHEMA)


def targz_members(blobs: DataFrame, blob_col: str = "data") -> DataFrame:
    """(.., data binary) .tar.gz blobs -> one row per regular-file
    member through OWN gunzip (RFC 1952/1951) + OWN ustar/pax walk:
    (name, method=8, n_bytes, mtime_y=mtime//86400, text)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[blob_col]:
                raw = minideflate.gunzip(bytes(blob))
                for e in minitar.parse_tar(raw):
                    rows.append(
                        (
                            e.name,
                            8,
                            e.size,
                            e.mtime // 86400,
                            e.data.decode("utf-8"),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["name", "method", "n_bytes", "mtime_y", "text"],
            )

    return blobs.mapInPandas(parse, schema=MEMBER_SCHEMA)


AVRO_SCHEMA_JSON = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "lang", "type": "string"},
        {"name": "text", "type": "string"},
        {"name": "n_chars", "type": "long"},
        {"name": "even", "type": "boolean"},
    ],
}

AVRO_ROW_SCHEMA = (
    "doc_id bigint, lang string, text string, n_chars bigint, even boolean"
)


def synth_avro_from_docs(
    documents: DataFrame, docs_per_file: int = 50
) -> DataFrame:
    """Deterministic Avro object container files from the documents
    table (functions/miniavro.py): codec alternates null / deflate by
    file_id parity (both block paths in-corpus; deflate blocks are
    compressed by REAL zlib), sync marker fixed from file_id, 16
    records per block so multi-block framing is load-bearing."""
    from ..functions import miniavro

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        fid = int(pdf["file_id"].iloc[0])
        recs = [
            {
                "doc_id": int(d),
                "lang": la,
                "text": t,
                "n_chars": int(n),
                "even": int(d) % 2 == 0,
            }
            for d, la, t, n in zip(
                pdf["doc_id"], pdf["lang"], pdf["text"], pdf["n_chars"]
            )
        ]
        blob = miniavro.write_ocf(
            recs,
            AVRO_SCHEMA_JSON,
            codec="null" if fid % 2 == 0 else "deflate",
            sync=fid.to_bytes(8, "little") * 2,
            records_per_block=16,
        )
        return pd.DataFrame({"file_id": [fid], "data": [blob]})

    return (
        documents.select(
            "doc_id",
            "lang",
            "text",
            "n_chars",
            (F.col("doc_id") / docs_per_file).cast("long").alias("file_id"),
        )
        .groupBy("file_id")
        .applyInPandas(build, schema="file_id long, data binary")
    )


def avro_records(blobs: DataFrame, blob_col: str = "data") -> DataFrame:
    """(.., data binary) Avro OCF blobs -> one row per record through
    the OWN container walk (magic, metadata map, block framing, sync
    verify) + OWN zigzag-varint/primitive decode + OWN inflate for
    deflate blocks."""
    from ..functions import miniavro

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[blob_col]:
                _, recs = miniavro.read_ocf(bytes(blob))
                rows.extend(
                    (
                        r["doc_id"],
                        r["lang"],
                        r["text"],
                        r["n_chars"],
                        r["even"],
                    )
                    for r in recs
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "lang", "text", "n_chars", "even"],
            )

    return blobs.mapInPandas(parse, schema=AVRO_ROW_SCHEMA)
