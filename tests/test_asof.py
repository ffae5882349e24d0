"""As-of join operator: semantics + scale-shape.

Semantics are also pinned against DuckDB's native ASOF LEFT JOIN via
the events_asof_join oracle gate; here: edge cases + plan shape."""

import datetime as dt

from pyspark.sql import functions as F

from goto_eater_crawler_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01T00:05:00"), 10.0),
            (2, "a", _ts("2024-01-01T00:00:00"), 20.0),  # before any right
            (3, "a", _ts("2024-01-01T00:10:00"), 30.0),  # exactly at right ts
            (4, "b", _ts("2024-01-01T09:00:00"), 40.0),
            (5, "c", _ts("2024-01-01T00:30:00"), 50.0),  # key with no right rows
        ],
        ["event_id", "user_id", "ts", "value"],
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T00:02:00"), 1.5),
            ("a", _ts("2024-01-01T00:10:00"), 2.5),
            ("b", _ts("2024-01-01T00:01:00"), 3.5),
        ],
        ["user_id", "ts", "price"],
    )
    return left, right


def test_asof_semantics(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: (r["matched_ts"], r["matched_price"])
        for r in asof_join(left, right, "user_id", "ts", ["price"]).collect()
    }
    assert out[1] == (_ts("2024-01-01T00:02:00"), 1.5)  # latest prior
    assert out[2] == (None, None)  # nothing earlier
    assert out[3] == (_ts("2024-01-01T00:10:00"), 2.5)  # inclusive ==
    assert out[4] == (_ts("2024-01-01T00:01:00"), 3.5)  # long gap ok
    assert out[5] == (None, None)  # key never in right


def test_asof_preserves_left_columns_and_rowcount(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "user_id", "ts", ["price"])
    assert out.columns == [
        "event_id", "user_id", "ts", "value", "matched_ts", "matched_price",
    ]
    assert out.count() == left.count()


def test_asof_plan_is_single_shuffle_merge(spark):
    """Scale shape: union-merge compiles to ONE hash partitioning by
    key + window sort — never a nested-loop / cartesian theta join
    (the quadratic trap) and no row multiplication."""
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, "user_id", "ts", ["price"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan and "Union" in plan


def test_asof_many_left_rows_between_right_rows(spark):
    # every left row between two right ticks sees the earlier tick
    left = spark.createDataFrame(
        [(i, "k", _ts(f"2024-01-01T00:00:{i:02d}"), 0.0) for i in range(30)],
        ["event_id", "user_id", "ts", "value"],
    )
    right = spark.createDataFrame(
        [("k", _ts("2024-01-01T00:00:10"), 1.0)],
        ["user_id", "ts", "price"],
    )
    rows = asof_join(left, right, "user_id", "ts", ["price"]).collect()
    for r in rows:
        if r["event_id"] < 10:
            assert r["matched_price"] is None
        else:
            assert r["matched_price"] == 1.0
