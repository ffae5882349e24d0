"""Sinks — per-source ordered CSV feeds.

The reference emits one CSV per spider with a fixed 12-column order
(settings.py:96-113, main.py:21-22) and post-sorts by shop_name
(csvsort, README.md:93-105; documented sort keys 店舗名、住所、ジャンル
README.md:53). ``write_source_csvs`` reproduces that: global sort on
(shop_name, address, genre_name), fixed column projection, one file
per source, overwrite (main.py:96-102).
"""

from __future__ import annotations

import os

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
    """One sorted UTF-8 CSV per source under out_dir/{source}.csv."""
    os.makedirs(out_dir, exist_ok=True)
    sources = [r["source"] for r in records.select("source").distinct().collect()]
    written = []
    for source in sorted(sources):
        pdf = sorted_feed(records, source).toPandas()
        path = os.path.join(out_dir, f"{source}.csv")
        pdf.to_csv(path, index=False, encoding="utf-8")
        written.append(path)
    return written
