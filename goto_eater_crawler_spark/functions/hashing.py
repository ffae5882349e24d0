"""Shared 60-bit hash — identical in Spark and DuckDB.

``h60(s) = int(md5(s)[:15], 16)`` (60 bits, always positive, fits
BIGINT). Spark: ``conv(substring(md5(s),1,15),16,10)``; DuckDB:
``('0x' || substr(md5(s),1,15))::BIGINT``. Both engines implement md5
identically, so every hash-derived operator built on h60 (MinHash
signatures, SimHash fingerprints, LSH band buckets) is byte-comparable
between the engine and its SQL oracle.

(The crawl path keeps native ``xxhash64`` — faster, JVM-side; h60 is
for operators whose *results* must be oracle-checkable.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h60_col(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}),1,15))::BIGINT)"
