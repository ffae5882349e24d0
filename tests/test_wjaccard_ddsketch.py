"""Weighted (multiset) Jaccard + DDSketch-dyadic gates.

The property the weighted arm exists for: a doc that repeats one
paragraph many times must NOT look near-identical to the single copy
(set Jaccard says it does — the spam-mirror failure mode). And the
DDSketch bucket index must be exactly floor(log2) with no float log
anywhere near it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from goto_eater_crawler_spark.operators import textdedup as td


def _wj(spark, rows, threshold=0.0):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r.doc_a, r.doc_b): r.wjaccard
        for r in td.weighted_jaccard_pairs(
            td.token_tf(docs), threshold
        ).collect()
    }


def test_spam_mirror_scores_low_weighted_high_set(spark):
    para = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(1, para), (2, " ".join([para] * 10))]
    wj = _wj(spark, rows)[(1, 2)]
    # identical 3-gram SET => set Jaccard would be ~1.0 (only the
    # paragraph-joining shingles differ); the multiset form sees the
    # 10x repetition: w_common = |shingles(para)| = 6, denominator
    # ~ 10x that side's mass.
    sj = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in td.jaccard_pairs(
            td.shingles(spark.createDataFrame(rows, "doc_id long, text string")),
            0.0,
        ).collect()
    }[(1, 2)]
    assert sj > 0.7, f"set Jaccard should be fooled, got {sj}"
    assert wj < 0.15, f"weighted Jaccard should not be, got {wj}"


def test_weighted_jaccard_identical_docs_is_one(spark):
    t = "one two three four five six"
    assert _wj(spark, [(1, t), (2, t)])[(1, 2)] == 1.0


def test_weighted_jaccard_integer_exact(spark):
    # Hand-computed: doc1 = A A B, doc2 = A B B over word-3-grams with
    # SHINGLE_K=3 means docs of 3 tokens have exactly 1 shingle each —
    # use longer docs so several shingles overlap with multiplicity.
    a = "x y z x y z x y z"  # shingles: xyz(3 via windows) etc.
    b = "x y z x y z"
    wj = _wj(spark, [(1, a), (2, b)])[(1, 2)]
    # tf vectors over 3-gram windows: doc1 windows = 7, doc2 = 4;
    # every doc2 window also occurs in doc1 with >= its multiplicity,
    # so w_common = 4, union = 7 + 4 - 4 = 7.
    assert wj == round(4 / 7, 4), wj


def test_ddsketch_bucket_is_floor_log2(spark):
    # powers of two sit exactly on bucket boundaries: v = 2^k must
    # land in bucket k, v = 2^k - 1 in bucket k-1.
    df = spark.createDataFrame(
        [(v,) for v in (1, 2, 3, 4, 7, 8, 1023, 1024, 1025)], "v long"
    ).select((F.length(F.bin("v")) - 1).cast("int").alias("bucket"), "v")
    got = {r.v: r.bucket for r in df.collect()}
    import math

    for v, b in got.items():
        assert b == math.floor(math.log2(v)), (v, b)


def test_ddsketch_relative_error_bound(spark, tmp_path):
    # end-to-end over a tiny synthetic events table: the estimate for
    # every quantile must be within (gamma-1)/(gamma+1) = 1/3
    # relative error of the TRUE quantile value.
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), i % 7,
         "view", float(1 + (i * 37) % 400) + 0.25, "{}")
        for i in range(1000)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    from goto_eater_crawler_spark.plans import queries as q

    out = q._QUERIES["events_ddsketch_quantiles"](spark, str(tmp_path))
    vals = sorted(r[4] for r in rows)
    for r in out.collect():
        true_v = vals[min(int(r.target_rank) - 1, len(vals) - 1)]
        rel = abs(r.est_value - true_v) / true_v
        assert rel <= 1 / 3 + 1e-9, (r.quantile, r.est_value, true_v, rel)
