"""Host ranking — PageRank power iteration over the host link graph.

The north rule's frontier priority is ``host_rank x W - depth``
(SURVEY.md §2.6 O3); round 1 shipped the priority *shape* with a
constant rank. This module computes the rank itself: standard damped
PageRank over (src_host, dst_host) edges — the graph a crawl
accumulates from its extract stream's cross-host links.

Scale design: each power iteration is ONE join (ranks against the
edge list, both hash-partitioned on the join key) + ONE groupBy sum
with map-side partial aggregation — the same bounded-shuffle shape as
textdedup.dedup_clusters. Ranks and edges are slim (hosts, not URLs:
10^7-ish rows at web scale, not 10^10), the driver loop
localCheckpoints per iteration, and dangling mass (hosts with no
out-links) is redistributed uniformly via one tiny aggregate per
iteration, keeping the rank a proper probability distribution.

The iteration count is FIXED (not run to convergence) so the DuckDB
oracle — the same recurrence unrolled as chained CTEs — reproduces
results exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_edges(links: DataFrame) -> DataFrame:
    """(src, dst) distinct host-level edges from an extract-stream
    link relation carrying (host, link_host) columns — self-loops
    dropped (intra-host navigation says nothing about authority)."""
    return (
        links.select(
            F.col("host").alias("src"), F.col("link_host").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def host_rank(
    edges: DataFrame, iterations: int = 5, damping: float = 0.85
) -> DataFrame:
    """(host, rank) after ``iterations`` damped power steps, ranks
    rounded to 6 decimals. Node set = every host on either edge end;
    initial rank uniform 1/N."""
    nodes = (
        edges.select(F.col("src").alias("host"))
        .unionByName(edges.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        # an early-round crawl can legitimately have an empty host
        # graph — return an empty (host, rank) relation instead of
        # dividing by zero below
        return nodes.withColumn("rank", F.lit(0.0).cast("double"))
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # edge contribution fractions are static across iterations —
    # precompute + checkpoint once
    frac = (
        edges.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("f"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    for _ in range(iterations):
        contribs = (
            frac.join(ranks, frac["src"] == ranks["host"])
            .select(F.col("dst").alias("host"), (F.col("rank") * F.col("f")).alias("c"))
            .groupBy("host")
            .agg(F.sum("c").alias("inflow"))
        )
        # dangling mass (rank held by hosts with no out-edges) stays
        # IN the plan as a 1-row broadcast — a driver collect here
        # would cost an extra Spark job per iteration, doubling the
        # loop's fixed job latency for no benefit
        dangling = (
            ranks.join(out_deg, ranks["host"] == out_deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        ranks = (
            nodes.join(contribs, "host", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "host",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.col("_dm") / F.lit(float(n))
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("host", F.round("rank", 6).alias("rank"))


def host_rank_sql(edges_sql: str, iterations: int = 5, damping: float = 0.85) -> str:
    """The same fixed-iteration recurrence unrolled as chained CTEs."""
    d = damping
    parts = [
        f"""WITH edges AS ({edges_sql}),
    nodes AS (SELECT DISTINCT host FROM (
        SELECT src AS host FROM edges UNION SELECT dst FROM edges)),
    nn AS (SELECT count(*) AS n FROM nodes),
    out_deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
    frac AS (SELECT e.src, e.dst, 1.0 / o.deg AS f
             FROM edges e JOIN out_deg o ON e.src = o.src),
    r0 AS (SELECT host, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    ]
    prev = "r0"
    for i in range(1, iterations + 1):
        parts.append(
            f"""d{i} AS (SELECT coalesce(sum(r.rank), 0.0) AS m FROM {prev} r
        ANTI JOIN out_deg o ON r.host = o.src),
    r{i} AS (
      SELECT n.host,
             (1.0 - {d}) / (SELECT n FROM nn)
             + {d} * (SELECT m FROM d{i}) / (SELECT n FROM nn)
             + {d} * coalesce(c.inflow, 0.0) AS rank
      FROM nodes n LEFT JOIN (
        SELECT f.dst AS host, sum(r.rank * f.f) AS inflow
        FROM frac f JOIN {prev} r ON f.src = r.host GROUP BY 1) c
      ON n.host = c.host)"""
        )
        prev = f"r{i}"
    return (
        ",\n    ".join(parts)
        + f"\n    SELECT host, round(rank, 6) AS rank FROM {prev}"
    )


def with_host_rank(frontier: DataFrame, ranks: DataFrame, weight: float = 100.0) -> DataFrame:
    """Re-prioritize a frontier with computed host ranks:
    priority = host_rank x W - depth (north_rule O3). Ranks is a slim
    per-host dim — broadcast, never shuffles the frontier."""
    return (
        frontier.join(F.broadcast(ranks), "host", "left")
        .withColumn(
            "priority",
            (
                F.coalesce(F.col("rank"), F.lit(0.0)) * F.lit(weight)
                - F.col("depth")
            ).cast("double"),
        )
        .drop("rank")
    )
