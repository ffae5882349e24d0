"""Registered-domain (pay-level-domain) extraction — public-suffix
longest-match as a broadcast dim join.

A production crawler groups per-host state (politeness budgets, spam
scoring, crawl-budget allocation) by REGISTERED domain, not raw host:
``a.shop.example.co.jp`` and ``b.example.co.jp`` belong to the same
owner ``example.co.jp``. The Public Suffix List semantics (publicly
documented at publicsuffix.org; Mozilla's algorithm) are
longest-match: the registrable domain is the matching public suffix
plus the single label to its left.

Spark-first shape (no UDF, corpus never collected):

* candidate suffixes of each host — its last 1..K label runs — are
  generated with native array expressions (``slice``/``array_join``),
* matched against the suffix dim via ONE broadcast equi-join (the
  real PSL is ~9k rules — a classic broadcast dim at any scale),
* the longest match per host wins via a ``max_by`` aggregation keyed
  by the host (hash agg with map-side partial — no window sort),
* hosts matching no rule fall back to their last 2 labels (the PSL
  default "*" rule: unknown TLDs are treated as single-label
  suffixes).

Wildcard (``*.ck``) and exception (``!www.ck``) PSL rules are out of
scope here (the dim is exact-match); the reference crawler's
allowed_domains scoping (operators/politeness.py offsite_split) never
needed them either.

Reference analogue: the per-prefecture crawler pins one registered
domain per source (SURVEY.md §2 P4); at web scale the same scoping
decision must be computed per discovered host, which is this operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# a deterministic sandbox-sized suffix dim for tests/gates; a real
# deployment broadcasts the full PSL snapshot instead
DEFAULT_SUFFIXES = [
    "jp", "com", "org", "io", "co.jp", "ne.jp", "ac.uk", "com.au",
]


def suffix_dim(spark, suffixes: list[str] | None = None) -> DataFrame:
    rows = [(s, s.count(".") + 1) for s in (suffixes or DEFAULT_SUFFIXES)]
    return spark.createDataFrame(rows, "suffix string, n_labels int")


def _last_labels(labels: Column, k: int) -> Column:
    """The suffix made of the last ``k`` labels, '' when too short."""
    return F.when(
        F.size(labels) > k,  # need at least one label LEFT of the suffix
        F.array_join(F.slice(labels, -k, k), "."),
    ).otherwise(F.lit(""))


def registered_domain(
    hosts: DataFrame,
    suffixes: DataFrame,
    host_col: str = "host",
    max_suffix_labels: int = 2,
) -> DataFrame:
    """hosts(host, ...) -> (host, registered_domain).

    Distinct hosts only is the caller's choice; the op is a projection
    + one broadcast join + one hash agg either way.
    """
    labels = F.split(F.col(host_col), r"\.")
    cands = hosts.select(
        host_col,
        F.posexplode(
            F.array(
                *[_last_labels(labels, k) for k in range(1, max_suffix_labels + 1)]
            )
        ).alias("k0", "cand"),
    )
    # '' candidates (host too short for that suffix length) are kept:
    # they match no dim row and land on the fallback path, so a
    # single-label host still yields an output row
    matched = (
        cands.join(
            F.broadcast(suffixes), cands["cand"] == suffixes["suffix"], "left"
        )
        # longest matching suffix wins; NULL n_labels (no match) loses
        # to any match via coalesce(-1)
        .groupBy(host_col)
        .agg(
            F.max_by(
                "suffix", F.coalesce("n_labels", F.lit(-1))
            ).alias("best_suffix"),
            F.max(F.coalesce("n_labels", F.lit(-1))).alias("best_n"),
        )
    )
    labels_m = F.split(F.col(host_col), r"\.")
    n = F.size(labels_m)
    # registrable = best suffix plus one label left of it; PSL default
    # rule (no match): unknown TLD acts as a 1-label suffix -> last 2
    fallback_k = F.least(F.lit(2), n)
    reg_k = F.when(F.col("best_n") > 0, F.col("best_n") + 1).otherwise(
        fallback_k
    )
    return matched.select(
        host_col,
        F.array_join(F.slice(labels_m, -reg_k, reg_k), ".").alias(
            "registered_domain"
        ),
    )
