"""Misra-Gries heavy-hitters properties: exact regime (capacity >
distinct -> zero error, counts equal brute force), lossy regime (the
estimate is a lower bound within max_err of truth and true heavy
hitters survive), and the summary relation stays bounded."""

from __future__ import annotations

from pyspark.sql import functions as F

from goto_eater_crawler_spark.operators.sketches import (
    heavy_hitters,
    mg_summaries,
)


def _skewed(spark, n_rows=20000, n_keys=500):
    # zipf-ish: key = floor(sqrt(hash-uniform)) concentrates low keys
    return spark.range(n_rows).select(
        (
            F.floor(
                F.sqrt(F.pmod(F.xxhash64("id"), F.lit(n_keys * n_keys)).cast("double"))
            )
        ).alias("host")
    )


def test_exact_regime_matches_bruteforce(spark):
    df = _skewed(spark).repartition(8)
    got = heavy_hitters(df, "host", 15, capacity=4096).collect()
    want = (
        df.groupBy("host")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("host"))
        .limit(15)
        .collect()
    )
    assert [(r["host"], r["n"]) for r in got] == [
        (r["host"], r["n"]) for r in want
    ]
    assert all(r["max_err"] == 0 for r in got)


def test_lossy_regime_lower_bound_within_err(spark):
    # skewed tail + ONE planted dominant key (count 5000 >> any
    # possible decrement mass at 20k rows)
    dominant = spark.range(5000).select(F.lit(999999).alias("host"))
    df = _skewed(spark).unionByName(dominant).repartition(4)
    truth = {
        r["host"]: r["n"]
        for r in df.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    got = heavy_hitters(df, "host", 10, capacity=32).collect()
    err = got[0]["max_err"]
    assert err > 0  # capacity 32 << distinct keys: decrements happened
    for r in got:
        t = truth[r["host"]]
        assert r["n"] <= t, (r, t)
        assert r["n"] >= t - err, (r, t, err)
    # a key whose true count exceeds max_err cannot be evicted to
    # zero: the dominant key must survive and rank first
    assert got[0]["host"] == 999999


def test_summary_relation_bounded(spark):
    df = _skewed(spark).repartition(6)
    cap = 32
    summ = mg_summaries(df, "host", cap)
    # <= capacity counter rows + 1 error row per partition
    assert summ.count() <= 6 * (cap + 1)


def test_hll_registers_merge_associative(spark):
    from goto_eater_crawler_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    df = spark.range(50000).select((F.col("id") * 7 + 3).alias("k"))
    whole = {
        (r["reg"], r["mr"]) for r in hll_registers(df, "k").collect()
    }
    lo = hll_registers(df.filter("k % 2 = 0"), "k")
    hi = hll_registers(df.filter("k % 2 = 1"), "k")
    merged = {
        (r["reg"], r["mr"])
        for r in lo.unionByName(hi)
        .groupBy("reg")
        .agg(F.max("mr").alias("mr"))
        .collect()
    }
    assert merged == whole  # sketch of union == merge of sketches
    # idempotent: merging a sketch with itself changes nothing
    twice = {
        (r["reg"], r["mr"])
        for r in lo.unionByName(lo)
        .groupBy("reg")
        .agg(F.max("mr").alias("mr"))
        .collect()
    }
    assert twice == {(r["reg"], r["mr"]) for r in lo.collect()}
    # m=64 -> standard error ~1.04/8 = 13%; allow 3 sigma
    est = hll_estimate(hll_registers(df, "k")).collect()[0]["est"]
    assert abs(est - 50000) / 50000 < 0.4, est


def test_countmin_dominance_and_exact_regime(spark):
    from goto_eater_crawler_spark.operators.sketches import (
        cm_estimate,
        cm_sketch,
    )

    df = _skewed(spark, n_rows=5000, n_keys=300).withColumnRenamed("host", "u")
    probes = spark.range(30).select(F.col("id").alias("u"))
    exact = {
        r["u"]: r["c"]
        for r in df.filter(F.col("u") < 30)
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    # lossy regime (width 64 << 300 keys): estimates DOMINATE truth
    est = {
        r["u"]: r["est"]
        for r in cm_estimate(
            cm_sketch(df, "u", 64, 4), probes, "u", 64, 4
        ).collect()
    }
    assert set(est) == set(range(30))
    for k in range(30):
        assert est[k] >= exact.get(k, 0), k
    # exact regime: width > keys and a prime stride so no collisions
    est2 = {
        r["u"]: r["est"]
        for r in cm_estimate(
            cm_sketch(df, "u", 1024, 4), probes, "u", 1024, 4
        ).collect()
    }
    for k in range(30):
        assert est2[k] == exact.get(k, 0), k


# ------------------------------------------------------------- KLL
def _kll_estimates(spark, values, cap, qs, n_parts=4):
    from goto_eater_crawler_spark.operators import sketches as sk

    df = spark.createDataFrame(
        [(int(v),) for v in values], "n long"
    ).repartition(n_parts)
    sketch = sk.kll_merge(sk.kll_summaries(df, "n", cap=cap), cap=cap)
    rows = sk.kll_quantiles(sketch, qs).collect()
    return {r["q"]: (r["value"], r["total_weight"]) for r in rows}


def test_kll_exact_regime_matches_true_quantiles(spark):
    import math
    import random

    rnd = random.Random(4)
    values = [rnd.randrange(10**6) for _ in range(2000)]
    qs = [0.1, 0.5, 0.9, 0.99]
    est = _kll_estimates(spark, values, cap=4096, qs=qs)
    s = sorted(values)
    for q in qs:
        want = s[math.ceil(q * len(values)) - 1]
        assert est[q] == (want, len(values)), q


def test_kll_weight_mass_conserved_under_compaction(spark):
    from pyspark.sql import functions as F

    from goto_eater_crawler_spark.operators import sketches as sk

    n = 30000
    df = spark.range(n).selectExpr("CAST(id * 2654435761 % 99991 AS long) AS n")
    sketch = sk.kll_merge(sk.kll_summaries(df, "n", cap=128), cap=128)
    rows = sketch.select(
        F.sum(F.expr("shiftleft(1L, level)")).alias("w"),
        F.count(F.lit(1)).alias("rows"),
    ).collect()[0]
    assert rows["w"] == n
    assert rows["rows"] < 128 * 12  # sketch-sized, not data-sized


def test_kll_compacted_rank_error_bounded(spark):
    import random

    rnd = random.Random(8)
    n = 40000
    values = [rnd.randrange(10**9) for _ in range(n)]
    qs = [0.1, 0.25, 0.5, 0.75, 0.9]
    est = _kll_estimates(spark, values, cap=256, qs=qs, n_parts=8)
    s = sorted(values)
    rank_of = {v: i for i, v in reversed(list(enumerate(s, 1)))}
    for q in qs:
        v, w = est[q]
        assert w == n
        # the estimate is a real data value whose true rank is within
        # eps*n of the target (eps generous vs the O(1/cap) theory)
        true_rank = rank_of[v]
        assert abs(true_rank - q * n) <= 0.05 * n, (q, true_rank)


def test_kll_merge_equals_single_partition_estimates(spark):
    import random

    rnd = random.Random(15)
    values = [rnd.randrange(10**6) for _ in range(5000)]
    one = _kll_estimates(spark, values, cap=8192, qs=[0.5], n_parts=1)
    many = _kll_estimates(spark, values, cap=8192, qs=[0.5], n_parts=16)
    # exact regime: partitioning must not change the answer at all
    assert one == many
