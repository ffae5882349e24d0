"""Spatial near-duplicate pairing — integer grid bucketing with
9-cell neighbor expansion, the geo form of the LSH-then-verify shape.

The reference crawler extracts lat/lng per restaurant page
(`cards.py` F4 patterns; reference e.g. `kyoto.py:46-82` pulls
coordinates from map URLs); a multi-source corpus then has to decide
"same shop, two sources" — a SPATIAL near-dup join. At web scale an
all-pairs distance comparison is quadratic; the standard fix is grid
bucketing (a fixed-radius near-neighbor join): hash every point to a
threshold-sized cell, expand ONE side to its 3x3 cell neighborhood,
equi-join on cell id, then confirm with the exact distance — every
pair within the threshold shares at least one of the 9 cells, so
recall is complete, and the join only compares points in adjacent
cells, never across the corpus.

Coordinates ride as integer MICRODEGREES and the confirm is integer
squared Euclidean — all exactly representable, so Spark and the
DuckDB oracle agree to the bit (no haversine trig whose libm ulps
differ across engines; at shop-dedup radii the planar approximation
is exact enough and the CONTRACT is the bucketing, not the metric).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PACK = 1 << 21  # cell key = cx * _PACK + cy (coords nonnegative)


def grid_near_pairs(recs: DataFrame, threshold: int) -> DataFrame:
    """recs(rec_id, lat_u, lng_u) -> (rec_a, rec_b, dist2) for every
    unordered pair with squared distance < threshold^2.

    Scale shape: ONE shuffle equi-join on the cell key (the expanded
    side is 9 slim rows per record), exact confirm only on
    co-bucketed candidates; no cartesian, no window over the corpus.
    """
    t = int(threshold)
    cx = F.floor(F.col("lat_u") / t).cast("long")
    cy = F.floor(F.col("lng_u") / t).cast("long")
    home = recs.select(
        F.col("rec_id").alias("rec_b"),
        F.col("lat_u").alias("lat_b"),
        F.col("lng_u").alias("lng_b"),
        (cx * _PACK + cy).alias("cell"),
    )
    cells9 = F.array(
        *[
            (cx + dx) * _PACK + (cy + dy)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    expanded = recs.select(
        F.col("rec_id").alias("rec_a"),
        F.col("lat_u").alias("lat_a"),
        F.col("lng_u").alias("lng_a"),
        F.explode(cells9).alias("cell"),
    )
    d2 = (F.col("lat_a") - F.col("lat_b")) * (
        F.col("lat_a") - F.col("lat_b")
    ) + (F.col("lng_a") - F.col("lng_b")) * (F.col("lng_a") - F.col("lng_b"))
    return (
        expanded.join(home, "cell")
        .filter(F.col("rec_a") < F.col("rec_b"))
        .filter(d2 < t * t)
        .select(
            "rec_a", "rec_b", d2.cast("bigint").alias("dist2")
        )
    )


def grid_near_pairs_sql(recs_sql: str, threshold: int) -> str:
    """DuckDB mirror — deliberately the INDEPENDENT all-pairs
    algorithm (fine at oracle scale): any bucketing defect (missed
    neighbor cell, double-counted pair, boundary-crossing twin)
    diverges from it."""
    t = int(threshold)
    return f"""
    WITH r AS ({recs_sql})
    SELECT a.rec_id AS rec_a, b.rec_id AS rec_b,
           CAST((a.lat_u - b.lat_u) * (a.lat_u - b.lat_u)
              + (a.lng_u - b.lng_u) * (a.lng_u - b.lng_u) AS BIGINT)
             AS dist2
    FROM r a JOIN r b ON a.rec_id < b.rec_id
    WHERE (a.lat_u - b.lat_u) * (a.lat_u - b.lat_u)
        + (a.lng_u - b.lng_u) * (a.lng_u - b.lng_u) < {t * t}
    """


def dbscan(
    recs: DataFrame, eps: int, min_pts: int
) -> DataFrame:
    """DBSCAN (Ester, Kriegel, Sander & Xu, KDD 1996) at web-corpus
    scale, composed entirely from bucketed primitives:

    1. eps-neighbor pairs via :func:`grid_near_pairs` (grid-bucketed,
       never all-pairs — the index DBSCAN assumes, in join form);
    2. CORE points = neighbor count + 1 (self) >= min_pts — one
       map-side-combinable groupBy over the symmetrized pairs;
    3. clusters = connected components over core-core pairs through
       textdedup.dedup_clusters (pointer-doubling min-label,
       O(log diameter) shuffles); singleton cores keep themselves
       via planted self-pairs;
    4. BORDER points attach to the MIN cluster id among their core
       neighbors (plain DBSCAN is assignment-order-dependent here —
       the min rule makes it deterministic, which a value-hash gate
       and any retry/replay contract require);
    5. everything else is NOISE (cluster_id -1).

    Returns (rec_id, role, cluster_id).
    """
    from . import textdedup as _td

    pairs = grid_near_pairs(recs, eps).persist()
    sym = pairs.select(
        F.col("rec_a").alias("rec"), F.col("rec_b").alias("nb")
    ).unionByName(
        pairs.select(F.col("rec_b").alias("rec"), F.col("rec_a").alias("nb"))
    )
    ncnt = sym.groupBy("rec").agg(F.count("*").alias("nbrs"))
    core = (
        recs.select(F.col("rec_id").alias("rec"))
        .join(ncnt, "rec", "left")
        .select(
            "rec",
            (F.coalesce(F.col("nbrs"), F.lit(0)) + 1 >= min_pts).alias(
                "is_core"
            ),
        )
        .persist()
    )
    core_ids = core.filter("is_core").select("rec")
    core_pairs = (
        pairs.join(
            core_ids.withColumnRenamed("rec", "rec_a"), "rec_a", "left_semi"
        )
        .join(
            core_ids.withColumnRenamed("rec", "rec_b"), "rec_b", "left_semi"
        )
        .select(F.col("rec_a").alias("doc_a"), F.col("rec_b").alias("doc_b"))
        .unionByName(
            core_ids.select(
                F.col("rec").alias("doc_a"), F.col("rec").alias("doc_b")
            )
        )
    )
    comp = _td.dedup_clusters(core_pairs).select(
        F.col("doc_id").alias("rec"), "cluster_id"
    )
    border = (
        sym.join(core_ids.withColumnRenamed("rec", "nb"), "nb", "left_semi")
        .join(comp.withColumnRenamed("rec", "nb"), "nb")
        .groupBy("rec")
        .agg(F.min("cluster_id").alias("b_cluster"))
    )
    return (
        core.join(comp, "rec", "left")
        .join(border, "rec", "left")
        .select(
            F.col("rec").alias("rec_id"),
            F.when(F.col("is_core"), F.lit("core"))
            .when(F.col("b_cluster").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce(
                F.when(F.col("is_core"), F.col("cluster_id")).otherwise(
                    F.col("b_cluster")
                ),
                F.lit(-1).cast("long"),
            ).alias("cluster_id"),
        )
    )


def dbscan_sql(recs_sql: str, eps: int, min_pts: int) -> str:
    """DuckDB mirror — the INDEPENDENT all-pairs DBSCAN (neighbor
    counts by cross join, components by recursive CTE), so any grid
    or propagation defect in the Spark arm diverges."""
    from . import textdedup as _td

    e2 = eps * eps
    core_pairs = f"""
      SELECT a.rec_id AS doc_a, b.rec_id AS doc_b
      FROM r a JOIN r b ON a.rec_id < b.rec_id
      WHERE (a.lat_u - b.lat_u) * (a.lat_u - b.lat_u)
          + (a.lng_u - b.lng_u) * (a.lng_u - b.lng_u) < {e2}
        AND a.rec_id IN (SELECT rec_id FROM core)
        AND b.rec_id IN (SELECT rec_id FROM core)
      UNION ALL
      SELECT rec_id, rec_id FROM core
    """
    comp_sql = _td.dedup_clusters_sql(core_pairs)
    # dedup_clusters_sql opens its own WITH RECURSIVE — inline it as
    # a subquery instead of a CTE to keep one statement
    return f"""
    WITH r AS MATERIALIZED ({recs_sql}),
    n AS (
      SELECT a.rec_id, count(*) AS cnt
      FROM r a JOIN r b ON
        (a.lat_u - b.lat_u) * (a.lat_u - b.lat_u)
        + (a.lng_u - b.lng_u) * (a.lng_u - b.lng_u) < {e2}
      GROUP BY 1),
    core AS (SELECT rec_id FROM n WHERE cnt >= {min_pts}),
    comp AS ({comp_sql}),
    border AS (
      SELECT a.rec_id, min(c.cluster_id) AS b_cluster
      FROM r a JOIN r b ON
        (a.lat_u - b.lat_u) * (a.lat_u - b.lat_u)
        + (a.lng_u - b.lng_u) * (a.lng_u - b.lng_u) < {e2}
        AND a.rec_id <> b.rec_id
      JOIN core k ON b.rec_id = k.rec_id
      JOIN comp c ON c.doc_id = b.rec_id
      WHERE a.rec_id NOT IN (SELECT rec_id FROM core)
      GROUP BY 1)
    SELECT r.rec_id AS rec_id,
           CASE WHEN k.rec_id IS NOT NULL THEN 'core'
                WHEN bd.b_cluster IS NOT NULL THEN 'border'
                ELSE 'noise' END AS role,
           coalesce(CASE WHEN k.rec_id IS NOT NULL THEN c.cluster_id
                ELSE bd.b_cluster END, -1) AS cluster_id
    FROM r
    LEFT JOIN core k ON r.rec_id = k.rec_id
    LEFT JOIN comp c ON r.rec_id = c.doc_id
    LEFT JOIN border bd ON r.rec_id = bd.rec_id
    """
