"""Streaming ingest monitoring over a landing ``pages`` directory.

The production shape: WARC-derived page rows land continuously in an
object-store table; this stream keeps per-window / per-language /
per-host ingest metrics without rescanning history. Event time is
``warc_ts`` (BASELINE.json input_hint schema); late pages are bounded
by the watermark, after which windows finalize.

All pure DataFrame API — the same code runs on a real cluster with a
kafka/file source swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urltools import host_col
from ..schema import PAGES_SCHEMA


def pages_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """readStream over a parquet landing directory of pages rows."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", "8")
        .parquet(landing_dir)
    )


def windowed_ingest_counts(
    pages: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window ingest counts per language with bounded
    lateness: (window_start, lang, n_pages, n_bytes)."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.octet_length("html")).alias("n_bytes"),
        )
        .select(F.col("w.start").alias("window_start"), "lang", "n_pages", "n_bytes")
    )


def per_host_rates(
    pages: DataFrame, window: str = "15 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Per-host windowed page counts — the ingest-side analogue of the
    crawl's politeness accounting (hot hosts surface here first)."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .withColumn("host", host_col(F.col("url")))
        .groupBy(F.window("warc_ts", window).alias("w"), "host")
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("w.start").alias("window_start"), "host", "n_pages")
    )


def run_to_memory(
    stream_df: DataFrame, name: str, checkpoint: str, mode: str = "complete"
):
    """Drain everything currently in the source into an in-memory
    table (availableNow trigger) — the test/bench harness runner.
    ``mode``: 'complete' for windowed aggregations (finalization
    doesn't depend on watermark progress within one drain), 'append'
    for row streams."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
