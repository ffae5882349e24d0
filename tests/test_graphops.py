"""TrustRank, forward triangle counting (operators/hostrank.py) and
next-fit sequence packing (operators/packing.py) properties: trust
conservation + seed decay, exact triangle counts on known graphs, and
hand-computed packing assignments with capacity clamping."""

from __future__ import annotations

import pytest

from goto_eater_crawler_spark.operators import hostrank as hr
from goto_eater_crawler_spark.operators import packing as pk


@pytest.fixture(scope="module")
def chain_edges(spark):
    # s -> a -> b -> c and a back-edge keeping everything connected
    rows = [("s", "a"), ("a", "b"), ("b", "c"), ("c", "s")]
    return spark.createDataFrame(rows, ["src", "dst"])


def test_trust_is_a_distribution_and_decays_from_seeds(spark, chain_edges):
    seeds = spark.createDataFrame([("s",)], ["host"])
    got = {
        r["host"]: r["trust"]
        for r in hr.trust_rank(chain_edges, seeds, iterations=20).collect()
    }
    assert abs(sum(got.values()) - 1.0) < 1e-4
    # trust decays monotonically with link distance from the seed
    assert got["s"] > got["a"] > got["b"] > got["c"] > 0


def test_trust_zero_off_seed_component(spark):
    # two components; seed only in the first — the second component
    # is unreachable from the teleport set, so its trust is ~0
    edges = spark.createDataFrame(
        [("s", "a"), ("a", "s"), ("x", "y"), ("y", "x")], ["src", "dst"]
    )
    seeds = spark.createDataFrame([("s",)], ["host"])
    got = {
        r["host"]: r["trust"]
        for r in hr.trust_rank(edges, seeds, iterations=10).collect()
    }
    assert got["x"] == 0.0 and got["y"] == 0.0
    assert got["s"] > 0 and got["a"] > 0


def test_trust_empty_seed_set(spark, chain_edges):
    seeds = spark.createDataFrame([("zz",)], ["host"])  # not in graph
    got = hr.trust_rank(chain_edges, seeds, iterations=3).collect()
    assert all(r["trust"] == 0.0 for r in got)


def test_triangles_k4(spark):
    # K4: every vertex sits on C(3,2) = 3 triangles
    vs = ["a", "b", "c", "d"]
    edges = spark.createDataFrame(
        [(u, v) for u in vs for v in vs if u < v], ["src", "dst"]
    )
    got = {r["host"]: r["triangles"] for r in hr.triangle_counts(edges).collect()}
    assert got == {v: 3 for v in vs}


def test_triangles_path_graph_has_none(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    got = {r["host"]: r["triangles"] for r in hr.triangle_counts(edges).collect()}
    assert got == {"a": 0, "b": 0, "c": 0, "d": 0}


def test_triangles_direction_and_dup_insensitive(spark):
    # the same triangle reported in mixed directions + duplicates
    # counts exactly once per vertex
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"), ("c", "a")],
        ["src", "dst"],
    )
    got = {r["host"]: r["triangles"] for r in hr.triangle_counts(edges).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_pack_next_fit_hand_case(spark):
    # one shard (shards=1): toks 100,100,100 -> seqs [0,0,1] at cap 256
    docs = spark.createDataFrame(
        [(0, 100), (1, 100), (2, 100)], ["doc_id", "tok"]
    )
    got = {
        r["doc_id"]: r["seq_id"]
        for r in pk.pack_next_fit(docs, capacity=256, shards=1).collect()
    }
    assert got == {0: 0, 1: 0, 2: 1}


def test_pack_clamps_overlong_docs(spark):
    # a 10_000-token doc becomes exactly one truncated sequence and
    # the scan continues — the recurrence stays total
    docs = spark.createDataFrame(
        [(0, 200), (1, 10_000), (2, 200)], ["doc_id", "tok"]
    )
    rows = {
        r["doc_id"]: (r["tok"], r["seq_id"])
        for r in pk.pack_next_fit(docs, capacity=256, shards=1).collect()
    }
    assert rows[1][0] == 256  # clamped
    assert rows == {0: (200, 0), 1: (256, 1), 2: (200, 2)}


def test_pack_shards_are_independent(spark):
    # same doc stream, 2 shards: packing happens per doc_id parity
    docs = spark.createDataFrame(
        [(i, 200) for i in range(6)], ["doc_id", "tok"]
    )
    rows = pk.pack_next_fit(docs, capacity=256, shards=2).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append((r["doc_id"], r["seq_id"]))
    for shard, docs_seqs in by_shard.items():
        # 200 > 256/2: every doc opens its own sequence within a shard
        seqs = [s for _, s in sorted(docs_seqs)]
        assert seqs == list(range(len(seqs)))
    assert set(by_shard) == {0, 1}


def test_label_propagation_two_cluster_structure(spark):
    """Synchronous LPA with smallest-label ties over the planted
    two-cluster graph: after 3 iterations labels must have collapsed
    inside each 25-node cluster (far fewer labels than nodes) and
    must NOT have merged the clusters across the single bridge —
    and Spark must agree with the DuckDB-unrolled recurrence."""
    import duckdb

    from goto_eater_crawler_spark.operators import hostrank as hr
    from goto_eater_crawler_spark.plans import queries as q

    got = {
        r["host"]: r["label"]
        for r in q.q_graph_communities_lpa(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert len(got) == 50
    a_labels = {lbl for h, lbl in got.items() if h < 25}
    b_labels = {lbl for h, lbl in got.items() if h >= 25}
    assert len(a_labels) <= 8 and len(b_labels) <= 8  # collapsed
    # the bridge may leak ONE label, not merge the communities
    assert len(a_labels & b_labels) <= 1

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        "'/root/testdata/sf0.001/customer.parquet'"
    )
    oracle = dict(
        con.execute(
            hr.label_propagation_sql(q._LPA_EDGES_SQL, 3)
        ).fetchall()
    )
    assert got == oracle
