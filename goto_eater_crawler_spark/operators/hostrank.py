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
        f"""WITH edges AS MATERIALIZED ({edges_sql}),
    nodes AS MATERIALIZED (SELECT DISTINCT host FROM (
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


def hits(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Kleinberg HITS over (src, dst) host edges: (host, authority,
    hub) after ``iterations`` mutual-reinforcement steps, L1-normalized
    each half-step, rounded to 6 decimals.

    Complements :func:`host_rank` on the same crawl-accumulated graph:
    PageRank prioritizes FETCH order (authority of the page itself),
    HITS separates hub quality (seed/directory pages whose out-links
    are worth expanding — the crawl's frontier-expansion signal) from
    authority (pages worth keeping — the corpus-quality signal).

    Scale design mirrors :func:`host_rank`: each half-step is ONE
    hash-partitioned join of the slim per-host score relation against
    the edge list + ONE map-side-combinable groupBy sum; the L1
    normalizer stays in-plan as a 1-row broadcast (no driver collect
    per iteration); scores localCheckpoint per iteration so the
    lineage stays O(1). Iteration count FIXED so the DuckDB oracle
    (:func:`hits_sql`) reproduces results exactly.
    """
    nodes = (
        edges.select(F.col("src").alias("host"))
        .unionByName(edges.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn(
            "authority", F.lit(0.0).cast("double")
        ).withColumn("hub", F.lit(0.0).cast("double"))
    edges = edges.localCheckpoint(eager=True)

    def _l1(scores: DataFrame, col: str) -> DataFrame:
        total = scores.agg(F.sum(col).alias("_t"))
        return scores.crossJoin(F.broadcast(total)).select(
            "host", (F.col(col) / F.col("_t")).alias(col)
        )

    hub = nodes.withColumn("hub", F.lit(1.0 / n)).localCheckpoint(eager=True)
    auth = None
    for _ in range(iterations):
        # a = E^T h : authority inflow summed over in-edges
        a_raw = (
            edges.join(hub, edges["src"] == hub["host"])
            .groupBy(F.col("dst").alias("h2"))
            .agg(F.sum("hub").alias("authority"))
        )
        auth = _l1(
            nodes.join(a_raw, nodes["host"] == a_raw["h2"], "left")
            .select(
                "host",
                F.coalesce("authority", F.lit(0.0)).alias("authority"),
            ),
            "authority",
        ).localCheckpoint(eager=True)
        # h = E a : hub outflow summed over out-edges
        h_raw = (
            edges.join(auth, edges["dst"] == auth["host"])
            .groupBy(F.col("src").alias("h2"))
            .agg(F.sum("authority").alias("hub"))
        )
        hub = _l1(
            nodes.join(h_raw, nodes["host"] == h_raw["h2"], "left")
            .select("host", F.coalesce("hub", F.lit(0.0)).alias("hub")),
            "hub",
        ).localCheckpoint(eager=True)
    return (
        auth.join(hub, "host")
        .select(
            "host",
            F.round("authority", 6).alias("authority"),
            F.round("hub", 6).alias("hub"),
        )
    )


def hits_sql(edges_sql: str, iterations: int = 3) -> str:
    """The same fixed-iteration HITS recurrence unrolled as chained
    CTEs (the :func:`host_rank_sql` device)."""
    parts = [
        f"""WITH edges AS MATERIALIZED ({edges_sql}),
    nodes AS MATERIALIZED (SELECT DISTINCT host FROM (
        SELECT src AS host FROM edges UNION SELECT dst FROM edges)),
    h0 AS (SELECT host, 1.0 / (SELECT count(*) FROM nodes) AS hub
           FROM nodes)"""
    ]
    prev_h = "h0"
    prev_a = None
    for i in range(1, iterations + 1):
        parts.append(
            f"""ar{i} AS (SELECT e.dst AS host, sum(h.hub) AS authority
        FROM edges e JOIN {prev_h} h ON e.src = h.host GROUP BY 1),
    a{i} AS (SELECT n.host,
               coalesce(r.authority, 0.0)
                 / (SELECT sum(authority) FROM ar{i}) AS authority
             FROM nodes n LEFT JOIN ar{i} r ON n.host = r.host),
    hr{i} AS (SELECT e.src AS host, sum(a.authority) AS hub
        FROM edges e JOIN a{i} a ON e.dst = a.host GROUP BY 1),
    h{i} AS (SELECT n.host,
               coalesce(r.hub, 0.0) / (SELECT sum(hub) FROM hr{i}) AS hub
             FROM nodes n LEFT JOIN hr{i} r ON n.host = r.host)"""
        )
        prev_h, prev_a = f"h{i}", f"a{i}"
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT host, round(a.authority, 6) AS authority,
           round(h.hub, 6) AS hub
    FROM {prev_a} a JOIN {prev_h} h USING (host)"""
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


def trust_rank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """TrustRank (Gyongyi, Garcia-Molina & Pedersen, VLDB 2004):
    PageRank whose teleport vector is restricted to a hand-vetted
    trusted seed set, so trust decays with link distance from the
    seeds — the standard spam-demotion signal a production crawl
    runs NEXT TO :func:`host_rank` (rank says "fetch first", trust
    says "believe the content").

    Recurrence: r = (1-d)*t + d*(dangling_mass)*t + d*A'r with
    t(v) = 1/|S| on seed hosts, 0 elsewhere (biased teleport AND
    biased dangling redistribution — mass never leaks to untrusted
    hosts except through actual links).

    Scale design is :func:`host_rank`'s exactly: per iteration ONE
    hash-partitioned join of the slim (host, rank) relation against
    the precomputed contribution fractions + ONE map-side-combinable
    groupBy sum; dangling mass stays in-plan as a 1-row broadcast;
    iteration count FIXED so :func:`trust_rank_sql` reproduces the
    doubles exactly.
    """
    nodes = (
        edges.select(F.col("src").alias("host"))
        .unionByName(edges.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    seed_hosts = (
        nodes.join(seeds.select("host").distinct(), "host", "left_semi")
        .localCheckpoint(eager=True)
    )
    ns = seed_hosts.count()
    if ns == 0:
        # no trusted seed appears in the graph: trust is identically
        # zero (the paper's semantics), not a divide-by-zero
        return nodes.withColumn("trust", F.lit(0.0).cast("double"))
    tv = (
        nodes.join(
            seed_hosts.withColumn("_s", F.lit(1)), "host", "left"
        )
        .select(
            "host",
            F.when(F.col("_s").isNotNull(), F.lit(1.0 / ns))
            .otherwise(F.lit(0.0))
            .alias("t"),
        )
        .localCheckpoint(eager=True)
    )
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    frac = (
        edges.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("f"))
        .localCheckpoint(eager=True)
    )
    ranks = tv.select("host", F.col("t").alias("rank")).localCheckpoint(
        eager=True
    )
    for _ in range(iterations):
        contribs = (
            frac.join(ranks, frac["src"] == ranks["host"])
            .select(
                F.col("dst").alias("host"),
                (F.col("rank") * F.col("f")).alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("inflow"))
        )
        dangling = ranks.join(
            out_deg, ranks["host"] == out_deg["src"], "left_anti"
        ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        ranks = (
            tv.join(contribs, "host", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "host",
                (
                    F.lit(1.0 - damping) * F.col("t")
                    + F.lit(damping) * F.col("_dm") * F.col("t")
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("host", F.round("rank", 6).alias("trust"))


def trust_rank_sql(
    edges_sql: str,
    seeds_sql: str,
    iterations: int = 5,
    damping: float = 0.85,
) -> str:
    """The same fixed-iteration biased-teleport recurrence unrolled
    as chained CTEs (the :func:`host_rank_sql` device)."""
    d = damping
    parts = [
        f"""WITH edges AS MATERIALIZED ({edges_sql}),
    nodes AS MATERIALIZED (SELECT DISTINCT host FROM (
        SELECT src AS host FROM edges UNION SELECT dst FROM edges)),
    seeds AS (SELECT DISTINCT host FROM ({seeds_sql})
              WHERE host IN (SELECT host FROM nodes)),
    ns AS (SELECT count(*) AS n FROM seeds),
    tv AS (SELECT n.host,
                  CASE WHEN s.host IS NOT NULL
                       THEN 1.0 / (SELECT n FROM ns) ELSE 0.0 END AS t
           FROM nodes n LEFT JOIN seeds s ON n.host = s.host),
    out_deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
    frac AS (SELECT e.src, e.dst, 1.0 / o.deg AS f
             FROM edges e JOIN out_deg o ON e.src = o.src),
    r0 AS (SELECT host, t AS rank FROM tv)"""
    ]
    prev = "r0"
    for i in range(1, iterations + 1):
        parts.append(
            f"""d{i} AS (SELECT coalesce(sum(r.rank), 0.0) AS m FROM {prev} r
        ANTI JOIN out_deg o ON r.host = o.src),
    r{i} AS (
      SELECT t.host,
             (1.0 - {d}) * t.t
             + {d} * (SELECT m FROM d{i}) * t.t
             + {d} * coalesce(c.inflow, 0.0) AS rank
      FROM tv t LEFT JOIN (
        SELECT f.dst AS host, sum(r.rank * f.f) AS inflow
        FROM frac f JOIN {prev} r ON f.src = r.host GROUP BY 1) c
      ON t.host = c.host)"""
        )
        prev = f"r{i}"
    return (
        ",\n    ".join(parts)
        + f"\n    SELECT host, round(rank, 6) AS trust FROM {prev}"
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-host triangle counts over the undirected host graph —
    the clustering/community signal of the Broder et al. web-graph
    measurements, computed with the degree-ordered "forward"
    algorithm (Schank & Wagner 2005; Ortmann & Brandes 2014): orient
    every undirected edge from its lower (deg, host) endpoint to the
    higher, making the oriented graph a DAG whose out-degrees are
    bounded by the graph's arboricity (O(sqrt(m))), then count each
    triangle exactly once as an oriented wedge a->b, a->c closed by
    the oriented edge b->c.

    Scale design: wedges fan out from the LOW-degree endpoint only,
    so a 10^6-degree hub host never generates its quadratic wedge
    set (the naive node-iterator's 10^12-row blowup); the degree
    relation is hosts-only and broadcast; every join is a
    hash-partitioned equi-join on slim (host, host) pairs.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("host"))
        .unionByName(und.select(F.col("v").alias("host")))
        .groupBy("host")
        .agg(F.count("*").alias("deg"))
        .localCheckpoint(eager=True)
    )
    du = F.broadcast(deg.select(F.col("host").alias("u"), F.col("deg").alias("du")))
    dv = F.broadcast(deg.select(F.col("host").alias("v"), F.col("deg").alias("dv")))
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
            F.when(lo_first, F.col("dv")).otherwise(F.col("du")).alias("bdeg"),
        )
        .localCheckpoint(eager=True)  # referenced 3x below
    )
    o1 = oriented.select(
        F.col("a"), F.col("b").alias("x"), F.col("bdeg").alias("xdeg")
    )
    o2 = oriented.select(
        F.col("a"), F.col("b").alias("y"), F.col("bdeg").alias("ydeg")
    )
    wedge_lt = (F.col("xdeg") < F.col("ydeg")) | (
        (F.col("xdeg") == F.col("ydeg")) & (F.col("x") < F.col("y"))
    )
    closer = oriented.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tris = (
        o1.join(o2, "a")
        .filter(wedge_lt)
        .join(closer, ["x", "y"], "left_semi")
        .select("a", "x", "y")
    )
    per_host = (
        tris.select(F.col("a").alias("host"))
        .unionByName(tris.select(F.col("x").alias("host")))
        .unionByName(tris.select(F.col("y").alias("host")))
        .groupBy("host")
        .agg(F.count("*").alias("triangles"))
    )
    nodes = (
        edges.select(F.col("src").alias("host"))
        .unionByName(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    return nodes.join(per_host, "host", "left").select(
        "host", F.coalesce("triangles", F.lit(0)).cast("bigint").alias("triangles")
    )


# ---------------------------------------------------------------------------
# synchronous label propagation (Raghavan, Albert & Kumara 2007) —
# community detection over the host graph: mirror farms, template
# networks and link rings surface as label communities. Each
# SYNCHRONOUS iteration relabels every node with its neighbors'
# majority label; ties break to the SMALLEST label so the result is
# deterministic (plain LPA tie-breaks randomly — useless against a
# value-hash oracle). The (count, label) argmax is packed into one
# BIGINT score = cnt * 2^20 + (2^20-1 - label), so both engines take
# a plain integer max — no max_by tie ambiguity, no doubles.
# Iteration count FIXED, oracle = the recurrence unrolled as CTEs.
# Scale shape per iteration: ONE join of the slim (node, label)
# relation against the undirected edge list + ONE map-side-
# combinable groupBy — the host_rank shuffle budget exactly.
# ---------------------------------------------------------------------------

_LPA_LBL_BITS = 20
_LPA_LBL_MASK = (1 << _LPA_LBL_BITS) - 1


def label_propagation(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """(host, label) after ``iterations`` synchronous majority-label
    steps over the UNDIRECTED closure of (src, dst); labels start as
    the node ids (must fit 20 bits)."""
    und = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
    )
    for _ in range(iterations):
        score = (
            F.col("cnt") * (1 << _LPA_LBL_BITS)
            + (F.lit(_LPA_LBL_MASK) - F.col("lbl"))
        )
        labels = (
            und.join(labels, und["dst"] == labels["node"], "inner")
            .groupBy(und["src"].alias("node2"), "lbl")
            .agg(F.count("*").alias("cnt"))
            .groupBy(F.col("node2").alias("node"))
            .agg(F.max(score).alias("s"))
            .select(
                "node",
                (F.lit(_LPA_LBL_MASK) - F.col("s") % (1 << _LPA_LBL_BITS))
                .cast("long")
                .alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
    return labels.select(F.col("node").alias("host"), F.col("lbl").alias("label"))


def label_propagation_sql(edges_sql: str, iterations: int = 3) -> str:
    """DuckDB mirror — the identical packed-integer argmax per
    unrolled iteration."""
    stages = [
        f"e AS ({edges_sql})",
        "und AS (SELECT src, dst FROM e UNION "
        "SELECT dst, src FROM e)",
        "l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM und)",
    ]
    for i in range(iterations):
        score = (
            f"cnt * {1 << _LPA_LBL_BITS} + ({_LPA_LBL_MASK} - lbl)"
        )
        stages.append(
            f"c{i} AS (SELECT u.src AS node, l.lbl AS lbl, "
            f"CAST(count(*) AS BIGINT) AS cnt "
            f"FROM und u JOIN l{i} l ON u.dst = l.node GROUP BY 1, 2)"
        )
        stages.append(
            f"l{i + 1} AS (SELECT node, CAST({_LPA_LBL_MASK} - "
            f"(max({score}) % {1 << _LPA_LBL_BITS}) AS BIGINT) AS lbl "
            f"FROM c{i} GROUP BY node)"
        )
    return (
        "WITH " + ", ".join(stages)
        + f" SELECT node AS host, lbl AS label FROM l{iterations}"
    )


def kcore(edges: DataFrame, k: int, iterations: int) -> DataFrame:
    """k-core decomposition by synchronous peeling (Seidman, "Network
    structure and minimum degree", Social Networks 1983; the
    Batagelj–Zaversnik 2003 peel in bulk-synchronous form): repeat
    ``iterations`` times — compute each survivor's degree over edges
    whose BOTH endpoints survive, drop nodes with degree < k. The
    web-graph use: isolating densely-linked host neighborhoods (link
    farms, mirror rings) from the sparse periphery that peels away;
    cascades matter (a tail chain attached to a core peels one node
    per round), so callers pick ``iterations`` >= the longest cascade
    and pin fixpoint in tests.

    Scale shape: per iteration the survivor relation is a slim
    (node) set — TWO semi-joins of the undirected edge list against
    it plus ONE map-side-combinable count groupBy, all on the same
    node key; the edge list itself never grows or shuffles wider.
    Returns (host, core_deg): the members of the k-core with their
    within-core degree.
    """
    und = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    alive = und.select(F.col("src").alias("node")).distinct()
    deg = None
    for _ in range(iterations):
        deg = (
            und.join(alive.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(alive.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .groupBy(F.col("src").alias("node"))
            .agg(F.count("*").cast("bigint").alias("core_deg"))
        )
        alive = (
            deg.filter(F.col("core_deg") >= k)
            .select("node")
            .localCheckpoint(eager=True)
        )
    return deg.join(alive, "node", "left_semi").select(
        F.col("node").alias("host"), "core_deg"
    )


def kcore_sql(edges_sql: str, k: int, iterations: int) -> str:
    """DuckDB mirror — the identical peel unrolled as CTE stages."""
    stages = [
        f"e AS ({edges_sql})",
        "und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e)",
        "a0 AS (SELECT DISTINCT src AS node FROM und)",
    ]
    for i in range(iterations):
        stages.append(
            f"d{i} AS (SELECT u.src AS node, "
            f"CAST(count(*) AS BIGINT) AS core_deg FROM und u "
            f"JOIN a{i} s ON u.src = s.node "
            f"JOIN a{i} t ON u.dst = t.node GROUP BY 1)"
        )
        stages.append(
            f"a{i + 1} AS (SELECT node FROM d{i} WHERE core_deg >= {k})"
        )
    last = iterations - 1
    return (
        "WITH " + ", ".join(stages)
        + f" SELECT d.node AS host, d.core_deg FROM d{last} d "
        f"JOIN a{iterations} a ON d.node = a.node"
    )


def opic_importance(edges: DataFrame, iterations: int = 5) -> DataFrame:
    """OPIC — On-line Page Importance Computation (Abiteboul, Preda &
    Cobena, WWW 2003), batch-synchronous form: the importance signal
    real crawlers (including the original Xyleme crawler the paper
    describes) maintain WHILE crawling, because unlike PageRank it
    needs no convergence loop over the full graph before being
    useful. Every node starts with cash 1/N; each round every node
    distributes its cash equally over its out-edges (dangling cash
    redistributes uniformly — the paper's virtual page), and banks
    the distributed amount into its history. Importance after T
    rounds = history / T (total cash is conserved at 1, so total
    banked history is exactly T).

    Scale shape mirrors :func:`host_rank`: per round ONE join of the
    slim (host, cash) relation against the static precomputed
    edge-fraction relation + ONE map-side-combinable sum, dangling
    mass as an in-plan 1-row broadcast, state localCheckpointed.
    Returns (host, importance) rounded to 6 decimals.
    """
    nodes = (
        edges.select(F.col("src").alias("host"))
        .unionByName(edges.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("importance", F.lit(0.0).cast("double"))
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    frac = (
        edges.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("f"))
        .localCheckpoint(eager=True)
    )
    state = nodes.select(
        "host", F.lit(1.0 / n).alias("cash"), F.lit(0.0).alias("hist")
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        inflow = (
            frac.join(state, frac["src"] == state["host"])
            .select(
                F.col("dst").alias("host"),
                (F.col("cash") * F.col("f")).alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("inflow"))
        )
        dangling = state.join(
            out_deg, state["host"] == out_deg["src"], "left_anti"
        ).agg(F.coalesce(F.sum("cash"), F.lit(0.0)).alias("_dm"))
        state = (
            state.join(inflow, "host", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "host",
                (
                    F.coalesce("inflow", F.lit(0.0))
                    + F.col("_dm") / F.lit(float(n))
                ).alias("cash"),
                (F.col("hist") + F.col("cash")).alias("hist"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select(
        "host", F.round(F.col("hist") / iterations, 6).alias("importance")
    )


def opic_importance_sql(edges_sql: str, iterations: int = 5) -> str:
    """The identical recurrence unrolled as chained CTEs."""
    parts = [
        f"""WITH edges AS MATERIALIZED ({edges_sql}),
    nodes AS MATERIALIZED (SELECT DISTINCT host FROM (
        SELECT src AS host FROM edges UNION SELECT dst FROM edges)),
    nn AS (SELECT count(*) AS n FROM nodes),
    out_deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
    frac AS (SELECT e.src, e.dst, 1.0 / o.deg AS f
             FROM edges e JOIN out_deg o ON e.src = o.src),
    s0 AS (SELECT host, 1.0 / (SELECT n FROM nn) AS cash,
                  0.0 AS hist FROM nodes)"""
    ]
    prev = "s0"
    for i in range(1, iterations + 1):
        parts.append(
            f"""d{i} AS (SELECT coalesce(sum(s.cash), 0.0) AS m FROM {prev} s
        ANTI JOIN out_deg o ON s.host = o.src),
    s{i} AS (
      SELECT n.host,
             coalesce(c.inflow, 0.0)
             + (SELECT m FROM d{i}) / (SELECT n FROM nn) AS cash,
             s.hist + s.cash AS hist
      FROM nodes n
      JOIN {prev} s ON n.host = s.host
      LEFT JOIN (
        SELECT f.dst AS host, sum(s.cash * f.f) AS inflow
        FROM frac f JOIN {prev} s ON f.src = s.host GROUP BY 1) c
      ON n.host = c.host)"""
        )
        prev = f"s{i}"
    return (
        ",\n    ".join(parts)
        + f"\n    SELECT host, round(hist / {iterations}, 6) AS importance"
        f" FROM {prev}"
    )


def scc_bowtie(edges: DataFrame, pivot, iterations: int) -> DataFrame:
    """Bow-tie decomposition around a pivot (Broder et al., "Graph
    structure in the Web", WWW 2000 — THE web-graph structure paper):
    forward-backward reachability classifies every host as ``scc``
    (reaches AND is reached by the pivot — the giant strongly
    connected core), ``in`` (reaches the core only), ``out`` (reached
    from it only), or ``other`` (tendrils + disconnected). The
    forward/backward closures grow by one BFS level per iteration —
    callers pick ``iterations`` >= the graph diameter and pin the
    fixpoint in tests.

    Scale shape: each level is ONE semi-join of the edge list against
    the slim frontier set + a distinct-union — the Yan et al.
    forward-backward SCC primitive; no per-node state beyond
    membership.
    """
    und_fwd = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    fwd = und_fwd.select(F.lit(pivot).alias("host")).limit(1)
    bwd = fwd
    for _ in range(iterations):
        fwd = (
            fwd.unionByName(
                und_fwd.join(
                    fwd.withColumnRenamed("host", "src"), "src", "left_semi"
                ).select(F.col("dst").alias("host"))
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        bwd = (
            bwd.unionByName(
                und_fwd.join(
                    bwd.withColumnRenamed("host", "dst"), "dst", "left_semi"
                ).select(F.col("src").alias("host"))
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
    nodes = (
        und_fwd.select(F.col("src").alias("host"))
        .unionByName(und_fwd.select(F.col("dst").alias("host")))
        .distinct()
    )
    f = fwd.withColumn("_f", F.lit(1))
    b = bwd.withColumn("_b", F.lit(1))
    return nodes.join(f, "host", "left").join(b, "host", "left").select(
        "host",
        F.when(F.col("_f").isNotNull() & F.col("_b").isNotNull(), "scc")
        .when(F.col("_b").isNotNull(), "in")
        .when(F.col("_f").isNotNull(), "out")
        .otherwise("other")
        .alias("cls"),
    )


def scc_bowtie_sql(edges_sql: str, pivot_sql: str, iterations: int) -> str:
    """DuckDB mirror — the two closures unrolled level by level."""
    stages = [
        f"e AS MATERIALIZED ({edges_sql})",
        f"f0 AS (SELECT {pivot_sql} AS host)",
        f"b0 AS (SELECT {pivot_sql} AS host)",
    ]
    for i in range(iterations):
        stages.append(
            f"f{i + 1} AS (SELECT host FROM f{i} UNION "
            f"SELECT e.dst FROM e JOIN f{i} x ON e.src = x.host)"
        )
        stages.append(
            f"b{i + 1} AS (SELECT host FROM b{i} UNION "
            f"SELECT e.src FROM e JOIN b{i} x ON e.dst = x.host)"
        )
    k = iterations
    return (
        "WITH " + ", ".join(stages) + f""",
    nodes AS (SELECT DISTINCT host FROM (
        SELECT src AS host FROM e UNION SELECT dst FROM e))
    SELECT * FROM (
      SELECT n.host AS host,
             CASE WHEN f.host IS NOT NULL AND b.host IS NOT NULL THEN 'scc'
                  WHEN b.host IS NOT NULL THEN 'in'
                  WHEN f.host IS NOT NULL THEN 'out'
                  ELSE 'other' END AS cls
      FROM nodes n
      LEFT JOIN f{k} f ON n.host = f.host
      LEFT JOIN b{k} b ON n.host = b.host) q"""
    )


def anf_exact(edges: DataFrame, radius: int) -> DataFrame:
    """Exact neighborhood function N(v, r) = |{u : dist(v, u) <= r}|
    (Palmer, Gibbons & Faloutsos, "ANF: a fast and scalable tool for
    data mining in massive graphs", KDD 2002 — the exact arm). The
    web-graph use: per-host reach profiles (how much of the web a
    host can touch in r clicks) feeding crawl prioritization and
    spam/mirror forensics.

    Semi-naive expansion: per hop ONE equi-join of the slim
    (node, member) reach relation against the edge list plus ONE
    distinct (shuffle on the pair key); the per-radius counts are
    map-side-combinable groupBys. The reach relation is
    O(sum of ball sizes) — this is the verify/oracle arm; the scale
    arm is :func:`anf_hyperball` (constant per-node state, the
    Boldi–Vigna register-merge form).

    Returns (host, ball_1, .., ball_radius), balls including the
    host itself.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    reach = nodes.select(
        "node", F.col("node").alias("member")
    ).localCheckpoint(eager=True)
    counts = None
    for r in range(1, radius + 1):
        hop = reach.join(e, reach["member"] == e["src"]).select(
            reach["node"], e["dst"].alias("member")
        )
        reach = (
            reach.unionByName(hop).distinct().localCheckpoint(eager=True)
        )
        c = reach.groupBy("node").agg(
            F.count("*").cast("bigint").alias(f"ball_{r}")
        )
        counts = c if counts is None else counts.join(c, "node")
    return counts.select(
        F.col("node").alias("host"),
        *[f"ball_{r}" for r in range(1, radius + 1)],
    )


def anf_exact_sql(edges_sql: str, radius: int) -> str:
    """DuckDB mirror — the identical semi-naive expansion unrolled."""
    stages = [
        f"e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "n AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "r0 AS (SELECT node, node AS member FROM n)",
    ]
    for r in range(1, radius + 1):
        stages.append(
            f"r{r} AS (SELECT node, member FROM r{r - 1} UNION "
            f"SELECT p.node, e.dst FROM r{r - 1} p JOIN e ON p.member = e.src)"
        )
        stages.append(
            f"c{r} AS (SELECT node, CAST(count(*) AS BIGINT) AS ball_{r} "
            f"FROM r{r} GROUP BY node)"
        )
    joins = " ".join(
        f"JOIN c{r} ON c1.node = c{r}.node" for r in range(2, radius + 1)
    )
    balls = ", ".join(f"ball_{r}" for r in range(1, radius + 1))
    return f"WITH {', '.join(stages)} SELECT c1.node AS host, {balls} FROM c1 {joins}"


def anf_hyperball(
    edges: DataFrame, radius: int, log2m: int = 6
) -> DataFrame:
    """HyperBall (Boldi & Vigna, "In-core computation of geometric
    centralities with HyperBall", ICDMW 2013; HyperANF, WWW 2011):
    one HyperLogLog counter per node, grown by register merges along
    edges — regs(v) <- elementwise-max(regs(v), regs(u)) for every
    v->u. Per iteration: ONE equi-join of the (node, reg, mr)
    register relation against the edge list + ONE groupBy(node, reg)
    max — per-node state is m registers REGARDLESS of ball size,
    which is the whole point vs :func:`anf_exact`'s O(n * ball)
    relation at web scale.

    Returns (host, est): estimated |ball(host, radius)|. Accuracy is
    the HLL bound (~1.04/sqrt(m)); pinned against anf_exact in
    tests/test_anf.py, not oracle-gated (the gate is the exact arm).
    """
    m = 1 << log2m
    budget = 32 - log2m
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    h = F.xxhash64(F.col("node")).bitwiseAND(F.lit((1 << 32) - 1))
    v = F.floor(h / m).cast("long")
    rho = F.when(v >= (1 << (budget - 1)), F.lit(1))
    for r in range(2, budget + 1):
        rho = rho.when(v >= (1 << (budget - r)), F.lit(r))
    rho = rho.otherwise(F.lit(budget + 1))
    regs = nodes.select(
        "node", (h % m).cast("int").alias("reg"), rho.alias("mr")
    ).localCheckpoint(eager=True)
    for _ in range(radius):
        pulled = e.join(regs, e["dst"] == regs["node"]).select(
            e["src"].alias("node"), regs["reg"], regs["mr"]
        )
        regs = (
            regs.unionByName(pulled)
            .groupBy("node", "reg")
            .agg(F.max("mr").alias("mr"))
            .localCheckpoint(eager=True)
        )
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(
        log2m, 0.7213 / (1 + 1.079 / m)
    )
    agg = regs.groupBy("node").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mr"))).alias("s_present"),
        F.count("*").alias("n_present"),
    )
    s = F.col("s_present") + (F.lit(m) - F.col("n_present"))
    zeros = F.lit(m) - F.col("n_present")
    raw = F.lit(alpha * m * m) / s
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(F.col("node").alias("host"), F.round(est, 4).alias("est"))


def ktruss(edges: DataFrame, k: int, iterations: int) -> DataFrame:
    """k-truss decomposition by synchronous support peeling (Cohen,
    "Trusses: cohesive subgraphs for social network analysis", NSA
    tech report 2008): repeat ``iterations`` times — compute each
    surviving edge's SUPPORT (triangles through it) over the current
    edge set, drop edges with support < k-2. Where k-core bounds a
    node's neighbor count, k-truss demands the neighbors actually
    interlock — the tighter mirror-ring/link-farm detector, immune
    to hub-and-spoke inflation (a star has huge cores but no
    triangles at all).

    Scale shape per iteration: the edge relation stays slim (u, v);
    support is ONE wedge equi-join (edge side joined twice against
    the doubled adjacency on the shared endpoint key) + ONE
    map-side-combinable count groupBy — no node-iterator wedge
    blowup beyond the join's own key distribution, and the corpus
    is long gone before the first iteration. Callers pick
    ``iterations`` >= the peel depth and pin fixpoint in tests.

    Returns the surviving edges as (u, v, support) with u < v.
    """
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    cur = und
    sup = None
    for _ in range(iterations):
        adj = cur.select(
            F.col("u").alias("s"), F.col("v").alias("d")
        ).unionByName(
            cur.select(F.col("v").alias("s"), F.col("u").alias("d"))
        )
        sup = (
            cur.join(
                adj.select(F.col("s").alias("u"), F.col("d").alias("w1")),
                "u",
            )
            .join(
                adj.select(F.col("s").alias("v"), F.col("d").alias("w1")),
                ["v", "w1"],
            )
            .groupBy("u", "v")
            .agg(F.count("*").cast("bigint").alias("support"))
        )
        cur = (
            sup.filter(F.col("support") >= k - 2)
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    return sup.join(cur, ["u", "v"], "left_semi").select(
        "u", "v", "support"
    )


def ktruss_sql(edges_sql: str, k: int, iterations: int) -> str:
    """DuckDB mirror — the identical peel unrolled as CTE stages."""
    stages = [
        f"raw AS ({edges_sql})",
        "e0 AS (SELECT DISTINCT least(src, dst) AS u, "
        "greatest(src, dst) AS v FROM raw WHERE src <> dst)",
    ]
    for i in range(iterations):
        stages.append(
            f"adj{i} AS (SELECT u AS s, v AS d FROM e{i} "
            f"UNION ALL SELECT v, u FROM e{i})"
        )
        stages.append(
            f"s{i} AS (SELECT e.u, e.v, CAST(count(*) AS BIGINT) "
            f"AS support FROM e{i} e "
            f"JOIN adj{i} a1 ON a1.s = e.u "
            f"JOIN adj{i} a2 ON a2.s = e.v AND a2.d = a1.d "
            f"GROUP BY e.u, e.v)"
        )
        stages.append(
            f"e{i + 1} AS (SELECT u, v FROM s{i} WHERE support >= {k - 2})"
        )
    last = iterations - 1
    return (
        "WITH " + ", ".join(stages)
        + f" SELECT s.u AS u, s.v AS v, s.support FROM s{last} s "
        f"JOIN e{iterations} f ON s.u = f.u AND s.v = f.v"
    )
