"""Sinks — per-source ordered CSV feeds.

The reference emits one CSV per spider with a fixed 12-column order
(settings.py:96-113, main.py:21-22) and post-sorts by shop_name
(csvsort, README.md:93-105; documented sort keys 店舗名、住所、ジャンル
README.md:53). ``write_source_csvs`` reproduces that: global sort on
(shop_name, address, genre_name), fixed column projection, one file
per source, overwrite (main.py:96-102).

Scale design: the write is EXECUTOR-SIDE end to end. One job hashes
all records to one task per source (``repartition("source")``), sorts
within the task (external, spill-able sort — never driver RAM), and
``partitionBy("source")`` splits the sorted stream into exactly one
CSV file per source; the driver only renames part files afterwards.
A hot source with 10^8 records costs one executor an external sort,
not a driver ``toPandas`` OOM. (A single sorted file per source is
the reference's output contract, so one-task-per-source is the floor;
sources are independent, so the job still parallelizes across them.)
"""

from __future__ import annotations

import glob
import os
import shutil
from urllib.parse import unquote

from pyspark.sql import DataFrame

from ..schema import FEED_EXPORT_FIELDS

SORT_KEYS = ["shop_name", "address", "genre_name"]


def sorted_feed(records: DataFrame, source: str) -> DataFrame:
    return (
        records.filter(records.source == source)
        .select(*FEED_EXPORT_FIELDS)
        .orderBy(*SORT_KEYS)
    )


def write_source_csvs(records: DataFrame, out_dir: str) -> list[str]:
    """One sorted UTF-8 CSV per source under out_dir/{source}.csv —
    single executor-side job, no driver materialization."""
    os.makedirs(out_dir, exist_ok=True)
    staging = os.path.join(out_dir, "_staging")
    (
        records.select("source", *FEED_EXPORT_FIELDS)
        # all rows of a source into ONE task; the within-task sort is
        # Spark's external sort, so a hot source spills, not OOMs.
        # 'source' leads the sort keys so the dynamic-partition
        # writer's required ordering (partition cols) is satisfied by
        # the existing order and its own (unstable) sort is elided —
        # otherwise it would scramble the feed order.
        .repartition("source")
        .sortWithinPartitions("source", *SORT_KEYS)
        .write.mode("overwrite")
        .option("header", True)
        # RFC-style quote doubling (the reference's csv module /
        # pandas convention), not backslash escapes
        .option("escape", '"')
        .partitionBy("source")
        .csv(staging)
    )
    written = []
    for d in sorted(os.listdir(staging)):
        if not d.startswith("source="):
            continue
        # partition dir names are percent-escaped by Spark
        source = unquote(d.split("=", 1)[1])
        parts = sorted(glob.glob(os.path.join(staging, d, "part-*.csv")))
        assert len(parts) == 1, f"expected one csv part for {source}: {parts}"
        path = os.path.join(out_dir, f"{source}.csv")
        shutil.move(parts[0], path)
        written.append(path)
    shutil.rmtree(staging)
    return written
