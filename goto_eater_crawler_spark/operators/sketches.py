"""Bounded-memory frequency sketching: distributed Misra-Gries heavy
hitters (Misra & Gries 1982; merge analysis per Agarwal et al.,
"Mergeable Summaries", PODS 2012 — public papers).

The crawl analogue: finding hot hosts / hot URL prefixes in a 10^10-row
fetch log without a full-width groupBy. The scale shape:

- stage 1 (no shuffle): each partition folds its rows into a
  Misra-Gries summary of at most ``capacity`` counters inside ONE
  mapInPandas pass — bounded memory regardless of partition size,
  vectorized per Arrow batch (value_counts), per-batch fold into the
  running dict.
- stage 2 (tiny shuffle): only the summaries shuffle — O(partitions x
  capacity) rows, not O(rows) — then one groupBy merges them: summed
  counts are within [true - sum(decrements), true], so each
  partition also emits its total decrement and the merge carries the
  global ``max_err`` alongside every estimate.
- exactness contract: a partition that never decrements (fewer than
  ``capacity`` distinct keys) reports err 0; when every partition
  reports 0 the counts are EXACT — the oracle gate runs in that
  regime, the pytest covers the lossy regime against brute force.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_fold(counters: dict, decrement: list[int], vals, cnts, capacity: int):
    """Fold a (value, count) batch into the MG counter dict."""
    for v, c in zip(vals, cnts):
        c = int(c)
        if v in counters:
            counters[v] += c
        elif len(counters) < capacity:
            counters[v] = c
        else:
            # decrement-all by the largest amount that keeps the
            # invariant: min(batch count, smallest counter)
            m = min(counters.values())
            d = min(c, m)
            decrement[0] += d
            for k in list(counters):
                counters[k] -= d
                if counters[k] == 0:
                    del counters[k]
            if c - d > 0:
                counters[v] = c - d


def mg_summaries(df: DataFrame, key_col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: (key, cnt) counter rows
    plus one (null, decrement) row per partition carrying its total
    decrement mass. The key keeps its source type (long ids, string
    hosts — round 4: the crawl loop's hot-host metric runs this over
    the host column directly)."""
    key_type = df.schema[key_col].dataType.simpleString()
    if key_type not in ("bigint", "int", "string"):
        # integral ids widen losslessly; anything exotic must be keyed
        # explicitly by the caller
        key_type = "bigint"
        df = df.select(F.col(key_col).cast("long").alias(key_col))
    elif key_type == "int":
        key_type = "bigint"
        df = df.select(F.col(key_col).cast("long").alias(key_col))

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        decrement = [0]
        for pdf in batches:
            vc = pdf[key_col].value_counts()
            _mg_fold(counters, decrement, vc.index, vc.to_numpy(), capacity)
        out = pd.DataFrame(
            {"key": list(counters.keys()), "cnt": list(counters.values())}
        )
        err = pd.DataFrame({"key": [None], "cnt": [decrement[0]]})
        yield pd.concat([out, err], ignore_index=True)

    return df.select(F.col(key_col).alias(key_col)).mapInPandas(
        summarize, schema=f"key {key_type}, cnt long"
    )


def heavy_hitters(
    df: DataFrame, key_col: str, k: int, capacity: int = 256
) -> DataFrame:
    """Top-k keys by (lower-bound) count with the global error bound:
    (key, n, max_err). n is exact when max_err == 0."""
    summ = mg_summaries(df, key_col, capacity)
    err = summ.filter(F.col("key").isNull()).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("max_err")
    )
    merged = (
        summ.filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.sum("cnt").alias("n"))
    )
    return (
        merged.crossJoin(F.broadcast(err))  # 1-row error bound stays in-plan
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(k)
        .select(F.col("key").alias(key_col), "n", "max_err")
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct counting (Flajolet, Fusy, Gandouet, Meunier,
# AofA 2007 — public paper). The 10^10-frontier cardinality counter:
# per-partition registers fold map-side, only (register, max_rho)
# rows — at most m per partition — reach the shuffle, and register
# relations MERGE by groupBy-max (associative + idempotent, the same
# retry-safety class as the bloom's bitwise OR).
#
# Everything is engine-agnostic on purpose: the hash is the corpus's
# Knuth multiplicative hash mod 2^32 (a bijection for keys < 2^32, so
# no collisions at test scale), and rho comes from an integer CASE
# chain over power-of-two thresholds — no float log2 at bit
# boundaries — so DuckDB can run the IDENTICAL sketch and the oracle
# gate checks the approximation algorithm itself, not just its output
# envelope.
# ---------------------------------------------------------------------------

_HLL_A = 2654435761  # Knuth multiplicative constant (2^32 / phi)
_HLL_ALPHA = {4: 0.673, 5: 0.697, 6: 0.709}  # standard alpha_m


def hll_registers(df: DataFrame, key_col: str, log2m: int = 6) -> DataFrame:
    """(reg, mr) register rows: max rank per register. Mergeable by
    groupBy(reg).max(mr)."""
    m = 1 << log2m
    budget = 32 - log2m
    h = (F.col(key_col).cast("long") * F.lit(_HLL_A)) % F.lit(1 << 32)
    reg = (h % m).cast("int")
    v = F.floor(h / m).cast("long")
    rho = F.when(v >= (1 << (budget - 1)), F.lit(1))
    for r in range(2, budget + 1):
        rho = rho.when(v >= (1 << (budget - r)), F.lit(r))
    rho = rho.otherwise(F.lit(budget + 1))
    return (
        df.select(reg.alias("reg"), rho.alias("rho"))
        .groupBy("reg")
        .agg(F.max("rho").alias("mr"))
    )


def hll_estimate(registers: DataFrame, log2m: int = 6) -> DataFrame:
    """One row (est): the HLL estimator with the small-range
    (linear-counting) correction."""
    m = 1 << log2m
    alpha = _HLL_ALPHA[log2m]
    agg = registers.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mr"))).alias("s_present"),
        F.count("*").alias("n_present"),
    )
    s = F.col("s_present") + (F.lit(m) - F.col("n_present"))  # absent: 2^0
    zeros = F.lit(m) - F.col("n_present")
    raw = F.lit(alpha * m * m) / s
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(F.round(est, 4).alias("est"))


def hll_sql(table: str, key_expr: str, log2m: int = 6) -> str:
    """DuckDB mirror of hll_registers + hll_estimate as a scalar
    subquery expression (SELECT ... AS est)."""
    m = 1 << log2m
    alpha = _HLL_ALPHA[log2m]
    budget = 32 - log2m
    cases = " ".join(
        f"WHEN v >= {1 << (budget - r)} THEN {r}" for r in range(1, budget + 1)
    )
    return f"""
    (SELECT round(
        CASE WHEN ({alpha} * {m} * {m}) / s <= {2.5 * m} AND zeros > 0
             THEN {float(m)} * ln({float(m)} / zeros)
             ELSE ({alpha} * {m} * {m}) / s END, 4)
     FROM (
       SELECT sum(power(2.0, -mr)) + ({m} - count(*)) AS s,
              CAST({m} - count(*) AS DOUBLE) AS zeros
       FROM (
         SELECT reg, max(rho) AS mr FROM (
           SELECT CAST(h % {m} AS INT) AS reg,
                  CASE {cases} ELSE {budget + 1} END AS rho
           FROM (SELECT ({key_expr} * {_HLL_A}) % {1 << 32} AS h,
                        CAST(floor((({key_expr} * {_HLL_A}) % {1 << 32}) / {m}) AS BIGINT) AS v
                 FROM {table}))
         GROUP BY reg)))
    """


# --- Count-Min sketch (Cormode & Muthukrishnan 2005, public paper) ---------
# Fixed pairwise-independent hash family over a Mersenne prime so the
# DuckDB oracle can restate every bucket assignment arithmetically.

_CM_P = 2147483647  # 2^31 - 1
_CM_A = (3, 5, 7, 11)
_CM_B = (17, 29, 41, 53)


def cm_sketch(df: DataFrame, key_col: str, width: int = 64,
              depth: int = 4) -> DataFrame:
    """Count-Min sketch of a NUMERIC key column -> (r, bucket, cnt).

    Scale shape (contrast mg_summaries' Python fold): fully native —
    explode each row into its ``depth`` (row, bucket) cells, then ONE
    groupBy count. Partial aggregation collapses every partition to
    at most depth*width cells before the shuffle, so the exchanged
    volume is O(partitions * depth * width) regardless of row count,
    and the whole job stays JVM-side."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("r"),
                (
                    (F.lit(_CM_A[i]) * F.col(key_col) + F.lit(_CM_B[i]))
                    % _CM_P
                    % width
                ).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("h"))
        .groupBy(
            F.col("h.r").alias("r"), F.col("h.bucket").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_estimate(sketch: DataFrame, probes: DataFrame, key_col: str,
                width: int = 64, depth: int = 4) -> DataFrame:
    """Point-query the sketch for each probe key: est = min over hash
    rows of the addressed cell (missing cell -> 0). The probe
    relation is tiny, so its exploded cells broadcast into the join
    against the (already small) sketch; one groupBy min finishes."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("r"),
                (
                    (F.lit(_CM_A[i]) * F.col(key_col) + F.lit(_CM_B[i]))
                    % _CM_P
                    % width
                ).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    addressed = probes.select(
        F.col(key_col), F.explode(cells).alias("h")
    ).select(key_col, F.col("h.r").alias("r"), F.col("h.bucket").alias("bucket"))
    return (
        F.broadcast(addressed)
        .join(sketch, ["r", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def cm_sql(table: str, key_expr: str, probe_n: int, width: int = 64,
           depth: int = 4) -> str:
    """The identical sketch + point queries restated in SQL: same
    hash family, same cells, same min — plus the exact counts the
    estimates must dominate."""
    hashes = ", ".join(
        f"({i}, {_CM_A[i]}, {_CM_B[i]})" for i in range(depth)
    )
    return f"""
    WITH hashes(r, a, b) AS (VALUES {hashes}),
    sketch AS (
      SELECT h.r,
             ((h.a * {key_expr} + h.b) % {_CM_P}) % {width} AS bucket,
             count(*) AS cnt
      FROM {table} t CROSS JOIN hashes h GROUP BY 1, 2),
    probes AS (SELECT unnest(range({probe_n})) AS key),
    est AS (
      SELECT p.key, min(coalesce(s.cnt, 0)) AS est
      FROM probes p CROSS JOIN hashes h
      LEFT JOIN sketch s
        ON s.r = h.r
       AND s.bucket = ((h.a * p.key + h.b) % {_CM_P}) % {width}
      GROUP BY 1),
    exact AS (
      SELECT {key_expr} AS key, count(*) AS exact
      FROM {table} t WHERE {key_expr} < {probe_n} GROUP BY 1)
    SELECT e.key, CAST(e.est AS BIGINT) AS est,
           CAST(coalesce(x.exact, 0) AS BIGINT) AS exact
    FROM est e LEFT JOIN exact x USING (key)
    """


# ---------------------------------------------------------------------------
# KLL-style mergeable quantile sketch (Karnin, Lang, Liberty, FOCS
# 2016 — public paper), completing the sketch family (MG heavy
# hitters, HLL distinct, Count-Min point queries, KLL quantiles: the
# four summaries a 10^10-row profiling pass actually needs).
#
# Variant notes (honesty contract, the MG/CMS pattern): uniform
# per-level compactor capacity (the MRL-style simplification of
# KLL's geometrically-shrinking capacities) and a DETERMINISTIC
# alternating compaction offset per level instead of a random coin —
# sweep-compactor style — so task retries and the DuckDB-side oracle
# reproduce the sketch bit-for-bit. In the ≤capacity regime no
# compaction fires, every item survives at weight 1, and the rank
# rule below is EXACT — that is the oracle-gated regime; the
# approximate regime is pytest-gated against true ranks.
#
# Scale shape: one mapInPandas pass builds per-partition compactor
# summaries — only O(cap · log(n/cap)) (level, value) rows per
# partition reach the shuffle; the final combine is a single tiny
# reduce (the standard sketch-aggregation shape, same as MG's merge),
# and quantile extraction is one cumsum window over the merged
# summary rows, never over the data.
# ---------------------------------------------------------------------------


def _kll_compact(levels: dict, cap: int, coins: dict) -> None:
    """Compact any over-full level: sort, promote alternating items
    at doubled weight (weight mass is conserved exactly — an odd
    leftover stays at its level)."""
    while True:
        for lvl in sorted(levels):
            buf = levels[lvl]
            if len(buf) < cap:
                continue
            buf.sort()
            leftover = None
            if len(buf) % 2:
                leftover = buf.pop()  # deterministic hold-back
            off = coins.get(lvl, 0)
            coins[lvl] = off ^ 1
            promoted = buf[off::2]
            levels[lvl] = [leftover] if leftover is not None else []
            levels.setdefault(lvl + 1, []).extend(promoted)
            break
        else:
            return


def kll_summaries(df: DataFrame, value_col: str, cap: int = 256) -> DataFrame:
    """Per-partition KLL compactor summaries: (level, value) rows;
    weight of a row is 2^level implicitly."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        levels: dict = {0: []}
        coins: dict = {}
        for pdf in batches:
            for v in pdf[value_col]:
                levels[0].append(int(v))
                if len(levels[0]) >= cap:
                    _kll_compact(levels, cap, coins)
        out_lvl, out_val = [], []
        for lvl, buf in levels.items():
            out_lvl.extend([lvl] * len(buf))
            out_val.extend(buf)
        yield pd.DataFrame({"level": out_lvl, "value": out_val})

    return df.select(F.col(value_col).cast("long").alias(value_col)).mapInPandas(
        summarize, schema="level int, value long"
    )


def kll_merge(summaries: DataFrame, cap: int = 256) -> DataFrame:
    """Merge per-partition summaries into one sketch: concatenate
    level buffers, re-compact. The input is already sketch-sized, so
    the single final task is the standard sketch reduce."""

    def combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        levels: dict = {}
        coins: dict = {}
        for pdf in batches:
            for lvl, v in zip(pdf["level"], pdf["value"]):
                levels.setdefault(int(lvl), []).append(int(v))
        _kll_compact(levels, cap, coins)
        out_lvl, out_val = [], []
        for lvl, buf in levels.items():
            out_lvl.extend([lvl] * len(buf))
            out_val.extend(buf)
        yield pd.DataFrame({"level": out_lvl, "value": out_val})

    return summaries.coalesce(1).mapInPandas(
        combine, schema="level int, value long"
    )


def kll_quantiles(sketch: DataFrame, qs: list[float]) -> DataFrame:
    """Quantile extraction by the explicit rank rule: value(q) = the
    smallest sketch value whose cumulative weight >= ceil(q * W).
    The only float op is the single q*W multiply inside ceil — the
    oracle restates the identical expression, so both engines compute
    the same IEEE double and the same integer rank boundary."""
    from pyspark.sql import Window

    spark = sketch.sparkSession
    weighted = sketch.select(
        "value", F.expr("shiftleft(1L, level)").alias("wt")
    )
    # bounded: the compacted sketch carries O(k log(n/k)) rows by
    # construction — lit(0) partition states that in the plan
    w = Window.partitionBy(F.lit(0)).orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = weighted.select(
        "value", F.sum("wt").over(w).alias("cw")
    ).crossJoin(F.broadcast(weighted.agg(F.sum("wt").alias("w_total"))))
    probes = spark.createDataFrame([(float(q),) for q in qs], "q double")
    return (
        F.broadcast(probes)
        .crossJoin(cum)  # |qs| x sketch-size rows, both tiny
        .filter(
            F.col("cw") >= F.ceil(F.col("q") * F.col("w_total")).cast("long")
        )
        .groupBy("q")
        .agg(
            F.min("value").alias("value"),
            F.max("w_total").alias("total_weight"),
        )
        .orderBy("q")
    )
