"""TableStore contract tests (plans/store.py) — the pluggable round
state seam behind checkpoint/resume (T6)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from goto_eater_crawler_spark.plans.store import (
    IcebergStore,
    MemoryStore,
    ParquetManifestStore,
    make_store,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


def test_make_store_dispatch(spark, tmp_path):
    assert isinstance(make_store(spark, None), MemoryStore)
    assert isinstance(make_store(spark, str(tmp_path)), ParquetManifestStore)
    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        make_store(spark, "iceberg:nocat.db.crawl")


def test_parquet_store_write_read_roundtrip(spark, tmp_path):
    st = ParquetManifestStore(spark, str(tmp_path))
    df = spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA)
    back = st.write(df, 1, "frontier")
    assert sorted(r["k"] for r in back.collect()) == [1, 2]
    again = st.read(1, "frontier", SCHEMA)
    assert sorted(r["k"] for r in again.collect()) == [1, 2]


def test_parquet_store_commit_is_last_and_atomic(spark, tmp_path):
    """A round without its manifest is invisible to resume — the
    manifest write IS the commit (crash between data write and
    manifest leaves an uncommitted, replayable round)."""
    st = ParquetManifestStore(spark, str(tmp_path))
    df = spark.createDataFrame([(1, "a")], SCHEMA)
    st.write(df, 0, "frontier")
    st.commit_round(0, {"round": 0, "n": 1})
    st.write(df, 1, "frontier")  # crashed: data written, no manifest
    assert st.committed_rounds() == [0]
    st.commit_round(1, {"round": 1, "n": 2})
    assert st.committed_rounds() == [0, 1]
    assert st.round_info(1) == {"round": 1, "n": 2}


def test_parquet_store_read_many_is_one_flat_scan(spark, tmp_path):
    st = ParquetManifestStore(spark, str(tmp_path))
    for r in range(3):
        st.write(spark.createDataFrame([(r, f"r{r}")], SCHEMA), r, "records")
    # round 3 committed but with no records table — skipped, not fatal
    flat = st.read_many([0, 1, 2, 3], "records", SCHEMA)
    assert sorted(r["k"] for r in flat.collect()) == [0, 1, 2]
    plan = flat._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan  # single multi-path scan, no union fold


def test_memory_store_cuts_lineage_only(spark):
    st = MemoryStore(spark)
    df = spark.createDataFrame([(1, "a")], SCHEMA)
    back = st.write(df, 1, "x")
    assert back.collect()[0]["k"] == 1
    assert st.committed_rounds() == []
    st.commit_round(1, {})  # no-op, no error


def test_iceberg_store_requires_catalog(spark):
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        IcebergStore(spark, "missing_catalog.db.crawl")
