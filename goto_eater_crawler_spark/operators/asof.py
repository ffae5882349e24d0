"""As-of (most-recent-prior) join — the temporal lookup a crawl /
training-data pipeline needs constantly: "attach the latest robots
snapshot / host state / price as of each event's timestamp".

The reference has no temporal join (its closest analogue is the
meta-threaded token hop, scripts/hokkaido.py:48-81: a later request
consuming the most recent earlier response's state); this is the
relational generalization.

Spark has no ASOF JOIN operator, and the naive formulations are
scale-traps: a theta join ``l.ts >= r.ts`` is a quadratic
nested-loop per key, and a windowed subquery per left row recomputes
the right scan. The scalable shape is the UNION-MERGE: tag both
sides, union, ONE hash shuffle by key + ONE sort by (ts, side), then
``last(value, ignorenulls=True)`` over the running frame carries the
most recent right payload forward into each left row. Cost at 100 TB:
one shuffle of each side on the join key, no row multiplication, no
per-key quadratic — identical to a sort-merge join's movement.

DuckDB's native ``ASOF LEFT JOIN`` is the oracle, so the semantics
(match = greatest right.ts <= left.ts, inclusive) are pinned against
an independent implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload: list[str],
    prefix: str = "matched_",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``ts`` <= the left row's ``ts`` within the same ``key``
    (inclusive as-of semantics; null payload when no prior right row).

    ``right`` must be unique per (key, ts) — pre-aggregate it if not;
    this is what makes the operator (and any as-of join) well-defined.
    Left columns are preserved; right payload columns arrive as
    ``prefix + ts`` and ``prefix + col``.
    """
    r_struct = F.struct(
        F.col(ts).alias(ts), *[F.col(c).alias(c) for c in payload]
    )
    r2 = right.select(
        F.col(key),
        F.col(ts),
        r_struct.alias("_r"),
        F.lit(0).alias("_side"),
    )
    null_r = F.lit(None).cast(
        r2.schema["_r"].dataType.simpleString()
    )
    l2 = left.select(
        "*", null_r.alias("_r"), F.lit(1).alias("_side")
    )
    # right rows sort BEFORE left rows at equal ts -> inclusive match
    merged = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(
        "_m", F.last("_r", ignorenulls=True).over(w)
    )
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"_m.{ts}").alias(f"{prefix}{ts}")
    ] + [F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in payload]
    return carried.filter(F.col("_side") == 1).select(*out_cols)
