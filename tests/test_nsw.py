"""NSW beam search — recall and beam/hop monotonicity properties
the oracle gate records but does not assert."""

from __future__ import annotations

from pyspark.sql import functions as F

from goto_eater_crawler_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_beam_search_recall(spark):
    e = _emb(spark)
    cents = sim.kmeans_centroids(e, 8, 2)
    out = sim.nsw_greedy_search(e, cents, 5, 6, 5, beam=6).collect()
    assert len(out) == 5
    # graph ANN is approximate; on this corpus the beam walk lands
    # the exact top-1 on most queries and is near-optimal on all
    for r in out:
        assert r.found_sim >= r.true_sim - 0.05, r
    assert sum(1 for r in out if r.hit) >= 3


def test_wider_beam_never_worse(spark):
    e = _emb(spark)
    cents = sim.kmeans_centroids(e, 8, 2)
    narrow = {r.query_id: r.found_sim
              for r in sim.nsw_greedy_search(e, cents, 5, 6, 3,
                                             beam=1).collect()}
    wide = {r.query_id: r.found_sim
            for r in sim.nsw_greedy_search(e, cents, 5, 6, 3,
                                           beam=6).collect()}
    for q in narrow:
        assert wide[q] >= narrow[q], q


def test_more_hops_never_worse(spark):
    e = _emb(spark)
    cents = sim.kmeans_centroids(e, 8, 2)
    one = {r.query_id: r.found_sim
           for r in sim.nsw_greedy_search(e, cents, 5, 6, 1,
                                          beam=4).collect()}
    four = {r.query_id: r.found_sim
            for r in sim.nsw_greedy_search(e, cents, 5, 6, 4,
                                           beam=4).collect()}
    for q in one:
        assert four[q] >= one[q], q  # the beam keeps best-so-far


def test_edges_degree_bound(spark):
    e = _emb(spark)
    cents = sim.kmeans_centroids(e, 8, 2)
    deg = (
        sim.nsw_edges(e, cents, 4)
        .groupBy("src")
        .agg(F.count("*").alias("d"))
        .agg(F.max("d").alias("mx"))
        .collect()[0]
    )
    assert deg.mx <= 4
