"""Range-join plan shape: the bucketized interval join must compile
to an equi-join (BroadcastHashJoin on bucket) with the interval
predicate as residual — never a nested-loop/cartesian over
rows x ranges — and must return exactly the theta-join result."""

from __future__ import annotations

from goto_eater_crawler_spark.plans.queries import queries

SF = "/root/testdata/sf0.001"


def test_range_join_no_nested_loop(spark):
    df = queries()["events_range_join"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the rows x ranges join is an EQUI join on bucket (+ residual)
    assert "BroadcastHashJoin [bucket" in plan
    # the only nested loop is the 1-row min/max bounds attach (the
    # in-plan-scalar pattern), never the events x windows relation
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "IdentityBroadcastMode" in plan
    assert "CartesianProduct" not in plan


def test_range_join_equals_theta_join(spark):
    got = queries()["events_range_join"](spark, SF).collect()
    e = spark.read.parquet(f"{SF}/events.parquet")
    e.createOrReplaceTempView("ev")
    want = spark.sql(
        """
        WITH b AS (SELECT cast(cast(min(ts) AS timestamp) AS double) AS tmin,
                          cast(cast(max(ts) AS timestamp) AS double) AS tmax
                   FROM ev),
        w AS (SELECT wid,
                     tmin + wid * ((tmax - tmin) / 24) AS w_start,
                     tmin + wid * ((tmax - tmin) / 24)
                       + 1.5 * ((tmax - tmin) / 24) AS w_end
              FROM b LATERAL VIEW explode(sequence(0, 23)) t AS wid)
        SELECT wid, count(*) AS n_events,
               round(sum(e.value), 4) AS sum_value
        FROM w JOIN ev e
          ON cast(cast(e.ts AS timestamp) AS double) >= w.w_start
         AND cast(cast(e.ts AS timestamp) AS double) < w.w_end
        GROUP BY wid ORDER BY wid
        """
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) == 24 and all(r["n_events"] > 0 for r in got)
