"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship crawl-shaped query on sf0.001.
``queries()`` / ``oracle_sql()`` — the operator inventory from
SURVEY.md §2 (+ training-data ops), each Spark plan paired with an
ANSI-SQL DuckDB oracle over the same parquet tables. Implementations
live in ``goto_eater_crawler_spark/plans/queries.py`` (and the
dedup/similarity/text modules it pulls in).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from goto_eater_crawler_spark.plans import queries as _q  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the crawl engine's politeness-quota shape over the
    events table — per-host (user_id) serial rank, quota cut, then
    per-host aggregation. Mirrors SURVEY.md §2.4 A6 / §2.5 W1."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{SF0001}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.withColumn("rank_in_host", F.row_number().over(w))
        .filter(F.col("rank_in_host") <= 5)
        .groupBy(F.col("user_id").alias("host"))
        .agg(
            F.count("*").alias("n_selected"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("host")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
