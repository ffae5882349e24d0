"""Multimodal column plumbing — opaque binary payloads + typed
metadata, processed via Arrow-batched ``mapInPandas``.

The pattern a 100 TB multimodal pipeline needs: image/audio/video as
``binary`` columns flowing through Spark untouched, with decode /
feature-extraction stages as pandas-batch UDFs. The decode libraries
(PIL/ffmpeg/...) are NOT in this container, so the decode itself is a
clearly-marked STUB (``decode_image_stub``); everything around it —
schema, batching, partitioning, the metadata it would return — is real
and oracle-checked (byte length + header hex are pure functions of the
bytes, so DuckDB can verify the plumbing end to end).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def decode_image_stub(payload: bytes) -> dict:
    """Placeholder for a real image decode (PIL.Image.open). The
    container has no imaging libs; a real deployment swaps this body
    out. Deterministic fake: dimensions derived from the byte length
    so tests are stable."""
    # NOTE: real implementation would be:
    #   img = PIL.Image.open(io.BytesIO(payload)); return img.size, ...
    return {
        "width": 16 + len(payload) % 64,
        "height": 16 + (len(payload) * 7) % 64,
        "mode": "RGB",
    }


def binary_metadata(docs_with_payload: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, header_hex, width, height) over a binary
    ``payload`` column — one Arrow pass, no per-row Python."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [bytes(b) for b in pdf["payload"]]
            meta = [decode_image_stub(b) for b in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in payloads],
                    "header_hex": [b[:4].hex().upper() for b in payloads],
                    "width": [m["width"] for m in meta],
                    "height": [m["height"] for m in meta],
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        batches,
        schema="doc_id long, n_bytes long, header_hex string, width long, height long",
    )


def docs_as_binary(docs: DataFrame) -> DataFrame:
    """Model the multimodal table: text bytes stand in for an image
    payload (binary column + id)."""
    return docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )


FRAME_BYTES = 64  # stand-in frame size for the chunked-payload model


def frame_sample(
    docs_with_payload: DataFrame, every_k: int = 4
) -> DataFrame:
    """Frame sampling over a chunked binary payload — the video-
    pipeline batch shape: payload = concatenated fixed-size frames;
    emit every k-th frame's (doc_id, frame_idx, frame_hex_prefix).
    One Arrow pass, one->many rows per input (the explode shape a real
    ffmpeg frame sampler produces); decode itself stays stubbed like
    :func:`decode_image_stub`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, hexs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + FRAME_BYTES - 1) // FRAME_BYTES
                for fi in range(0, n_frames, every_k):
                    frame = b[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES]
                    ids.append(doc_id)
                    idxs.append(fi)
                    hexs.append(frame[:4].hex().upper())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_hex": hexs}
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        batches, schema="doc_id long, frame_idx long, frame_hex string"
    )


def frame_sample_sql(every_k: int = 4) -> str:
    return f"""
    SELECT doc_id, frame_idx,
           upper(substr(hex(encode(text)),
                        CAST(frame_idx AS INT) * {FRAME_BYTES} * 2 + 1, 8)) AS frame_hex
    FROM (
      SELECT doc_id, text, unnest(range(0,
               CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS BIGINT),
               {every_k})) AS frame_idx
      FROM documents)
    """


BINARY_METADATA_SQL = """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           substr(hex(encode(text)), 1, 8) AS header_hex,
           16 + octet_length(encode(text)) % 64 AS width,
           16 + (octet_length(encode(text)) * 7) % 64 AS height
    FROM documents
"""
