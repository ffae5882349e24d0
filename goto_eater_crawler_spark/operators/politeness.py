"""Politeness: robots filtering + per-host crawl-delay quota.

The reference enforces politeness through Scrapy's machinery:
``ROBOTSTXT_OBEY = True`` (settings.py:21), strictly serial per-domain
fetching (``CONCURRENT_REQUESTS_PER_DOMAIN = 1``, settings.py:34) and
per-request delays (``DOWNLOAD_DELAY = 3`` default settings.py:32,
per-spider overrides 1.0-4.0 s, SURVEY.md §2.9 T1).

In a batch engine the *semantic* equivalent is a per-round budget:
with round wall-clock budget ``T`` and a host's crawl delay ``d``, the
host may fetch ``max(1, floor(T / d))`` URLs per round, in a defined
serial order (priority desc, depth asc, canonical_url asc — the
engine's deterministic stand-in for Scrapy's per-host FIFO). That is a
rank-per-host window (SURVEY.md §2.4 A6 / §2.5 W1).

Scale note (hot hosts — e.g. the 32k-page host modeled on
tokyo_gnavi.py:26): the window needs all of a host's frontier rows in
one partition. Quotas are small (<= T/d), so we first cut each host
down to its quota *within each partition* (partial top-k inside
``mapInPandas`` would also work; we use a two-phase window: local
rank over a salted repartition, then the exact window over the
survivors, at most ``quota x n_salts`` rows per host).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CRAWL_DELAY = 3.0  # reference settings.py:32

def _order():
    """The per-host serial fetch order — the engine's deterministic
    stand-in for Scrapy's FIFO-per-domain queue."""
    return [
        F.col("priority").desc(),
        F.col("depth").asc(),
        F.col("canonical_url").asc(),
    ]


def domains_dim(spark, domains_map: dict[str, tuple[str, ...]]) -> DataFrame:
    """(src, domain) dim rows from a source->allowed_domains map,
    pinned to JVM-resident blocks. Build ONCE per crawl (the engine
    does, like the robots dim): a createDataFrame(list)-backed plan
    re-evaluates its python parallelize lineage on every broadcast —
    once per round — and the worker stalls dwarf the broadcast."""
    rows = [(src, d) for src, ds in domains_map.items() for d in ds]
    return spark.createDataFrame(rows, "src string, domain string").localCheckpoint(
        eager=True
    )


def offsite_split(
    frontier: DataFrame, domains: dict[str, tuple[str, ...]] | DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Split frontier into (in_scope, offsite) by each source's
    ``allowed_domains`` — Scrapy's OffsiteMiddleware semantics
    (every spider declares allowed_domains, e.g. tochigi.py:16; the
    engine's per-source scope comes from registry.allowed_domains_map).

    A host is in scope when it equals an allowed domain or is a
    subdomain of one. The (source, domain) dim is tiny (49 sources x
    a few domains) — broadcast; the equi key is source, the subdomain
    test a residual predicate, so the frontier is never shuffled.
    ``domains``: a pre-pinned :func:`domains_dim` DataFrame (the
    per-round path), or a raw map (convenience; pinned here).
    """
    dims = (
        domains
        if isinstance(domains, DataFrame)
        else domains_dim(frontier.sparkSession, domains)
    )
    cond = (frontier["source"] == dims["src"]) & (
        (frontier["host"] == dims["domain"])
        | frontier["host"].endswith(F.concat(F.lit("."), dims["domain"]))
    )
    in_scope = frontier.join(F.broadcast(dims), cond, "left_semi")
    offsite = frontier.join(F.broadcast(dims), cond, "left_anti")
    return in_scope, offsite


def _robots_rules_col(arr_col: str):
    """array<string> of RFC 9309 path patterns -> array<struct<pat,
    len>>: ``pat`` is the SQL LIKE translation (``*`` -> ``%``,
    trailing ``$`` drops the implicit prefix wildcard, LIKE metas
    escaped with the default backslash), ``len`` the original pattern
    length (the RFC's specificity measure). Computed ONCE per dim row
    before the broadcast — the per-frontier-row work is only the LIKE
    matches."""

    def to_struct(p):
        anchored = p.endswith("$")
        body = F.when(anchored, p.substr(F.lit(1), F.length(p) - 1)).otherwise(p)
        esc = F.replace(body, F.lit("\\"), F.lit("\\\\"))
        esc = F.replace(esc, F.lit("%"), F.lit("\\%"))
        esc = F.replace(esc, F.lit("_"), F.lit("\\_"))
        wild = F.replace(esc, F.lit("*"), F.lit("%"))
        pat = F.when(anchored, wild).otherwise(F.concat(wild, F.lit("%")))
        return F.struct(pat.alias("pat"), F.length(p).alias("len"))

    return F.transform(F.coalesce(F.col(arr_col), F.array()), to_struct)


def robots_split(frontier: DataFrame, robots: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split frontier into (allowed, robots_dropped).

    RFC 9309 §2.2.2 semantics (round 4 — matching the reference's
    scrapy/Protego stack, which supports path wildcards): rule paths
    may contain ``*`` (any octet sequence) and a trailing ``$``
    (end-of-path anchor); among ALL matching allow and disallow rules
    the LONGEST pattern wins, with allow winning length ties. Rules
    are translated to SQL LIKE patterns on the dim side (one
    Catalyst transform per host row, before the broadcast), so the
    per-row hot path stays whole-stage-codegen LIKE matching — no
    Python, no regex compilation per row.
    Robots is a per-host dim table — broadcast, never shuffled.

    Path extraction is a regexp, NOT parse_url: parse_url is
    interpreted (java.net.URI per row) and an order of magnitude
    slower in this per-round hot filter.
    """
    rb = robots.withColumn(
        "_rdis", _robots_rules_col("disallow_prefixes")
    ).withColumn("_rall", _robots_rules_col("allow_prefixes"))
    path = F.regexp_extract(F.col("canonical_url"), r"^[a-z]+://[^/?#]*([^?#]*)", 1)
    joined = frontier.join(F.broadcast(rb), "host", "left").withColumn(
        "_path", F.when(path.isNull() | (path == ""), "/").otherwise(path)
    )

    def best(col: str):
        # longest matching pattern's length, -1 if none (NULL array —
        # host absent from the dim — aggregates to NULL, coalesced to
        # "not blocked" by the caller)
        return F.expr(
            f"aggregate(filter({col}, r -> _path LIKE r.pat), "
            "cast(-1 as int), (a, r) -> greatest(a, r.len))"
        )

    blocked = F.coalesce(best("_rdis") > best("_rall"), F.lit(False))
    keep_cols = frontier.columns
    return (
        joined.filter(~blocked).select(*keep_cols),
        joined.filter(blocked).select(*keep_cols),
    )


def with_crawl_delay(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    delays = robots.select("host", "crawl_delay")
    return frontier.join(F.broadcast(delays), "host", "left").withColumn(
        "crawl_delay", F.coalesce(F.col("crawl_delay"), F.lit(DEFAULT_CRAWL_DELAY))
    )


def quota_split(
    frontier_with_delay: DataFrame,
    round_budget: float,
    n_salts: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Split a round's frontier into (selected, deferred) by per-host
    quota. ``selected`` carries ``rank_in_host`` (1-based serial order
    within the host — the engine's crawl-order contract W1/W3).
    """
    quota = F.greatest(
        F.lit(1), F.floor(F.lit(round_budget) / F.col("crawl_delay"))
    ).cast("int")

    # phase 1 — salted partial top-k: bound any single host's row
    # count per partition before the exact window (hot-host skew kill,
    # north_rule "salted repartition-by-host"). Rows pruned here are
    # deferred by construction (> quota rows rank below them in the
    # same host), so deferral needs NO anti-join — just rank filters.
    salt = F.pmod(F.xxhash64(F.col("canonical_url"), F.lit(7)), F.lit(n_salts))
    local_rank = F.row_number().over(
        Window.partitionBy(F.col("host"), salt).orderBy(*_order())
    )
    staged = frontier_with_delay.withColumn("_lrank", local_rank)
    pruned_out = staged.filter(F.col("_lrank") > quota)

    # phase 2 — exact per-host serial rank over the survivors
    # (<= quota * n_salts rows per host, skew bounded).
    rank = F.row_number().over(Window.partitionBy("host").orderBy(*_order()))
    ranked = (
        staged.filter(F.col("_lrank") <= quota)
        .withColumn("rank_in_host", rank)
        .drop("_lrank")
    )
    selected = ranked.filter(F.col("rank_in_host") <= quota)
    deferred = (
        ranked.filter(F.col("rank_in_host") > quota)
        .drop("rank_in_host")
        .unionByName(pruned_out.drop("_lrank"))
        .drop("crawl_delay")
    )
    return selected.drop("crawl_delay"), deferred


def priority_col(host_rank=None, depth=None):
    """Frontier priority = host_rank x W - depth (north_rule O3)."""
    hr = host_rank if host_rank is not None else F.lit(1.0)
    d = depth if depth is not None else F.col("depth")
    return (hr * F.lit(100.0) - d).cast("double")
