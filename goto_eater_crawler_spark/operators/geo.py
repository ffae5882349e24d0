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
