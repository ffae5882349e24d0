"""Registered-domain (pay-level-domain) extraction — public-suffix
longest-match as a broadcast dim join.

A production crawler groups per-host state (politeness budgets, spam
scoring, crawl-budget allocation) by REGISTERED domain, not raw host:
``a.shop.example.co.jp`` and ``b.example.co.jp`` belong to the same
owner ``example.co.jp``. The Public Suffix List semantics (publicly
documented at publicsuffix.org; Mozilla's algorithm) are
longest-match: the registrable domain is the matching public suffix
plus the single label to its left, with two special rule forms:

* wildcard rules (``*.ck``): any single label in the ``*`` position
  is part of the public suffix — ``foo.bar.ck`` registers as
  ``foo.bar.ck``'s last three labels;
* exception rules (``!www.ck``): cancel a wildcard — the prevailing
  exception has its leftmost label removed to form the public suffix,
  so ``www.ck`` itself is the registrable domain.

Exception beats wildcard beats longer-normal beats shorter-normal
(PSL spec: exceptions prevail outright; otherwise most labels wins).

Spark-first shape (no UDF, corpus never collected):

* candidate forms of each host — its last 1..K label runs, each in
  exact (``b.ck``), wildcard (``*.ck``) and exception (``!b.ck``)
  spelling — are generated with native array expressions
  (``slice``/``array_join``/``posexplode``),
* matched against the rule dim via ONE broadcast equi-join on the
  LITERAL rule string (the real PSL is ~9k rules — a classic
  broadcast dim at any scale),
* the prevailing rule per host wins via a ``max_by`` aggregation
  keyed by the host (hash agg with map-side partial — no window
  sort), priority = n_labels + a large exception bonus,
* hosts matching no rule fall back to their last 2 labels (the PSL
  default "*" rule: unknown TLDs are treated as single-label
  suffixes).

One documented divergence from Mozilla: a host that IS a public
suffix (``co.jp``, or ``b.ck`` under ``*.ck``) has no registrable
domain per the PSL; this operator falls back to the default rule's
last-2 labels (never NULL) so downstream per-domain grouping always
has a key.

Reference analogue: the per-prefecture crawler pins one registered
domain per source (SURVEY.md §2 P4); at web scale the same scoping
decision must be computed per discovered host, which is this operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# a deterministic sandbox-sized rule dim for tests/gates; a real
# deployment broadcasts the full PSL snapshot instead. Rules use the
# PSL's literal syntax: plain, "*." wildcard, "!" exception.
DEFAULT_SUFFIXES = [
    "jp", "com", "org", "io", "co.jp", "ne.jp", "ac.uk", "com.au",
    "*.ck", "!www.ck",
]

_EXCEPTION_BONUS = 1_000_000  # exceptions prevail over any label count


def suffix_dim(spark, suffixes: list[str] | None = None) -> DataFrame:
    """PSL rules -> (rule, n_labels, reg_k, priority).

    ``n_labels`` counts the rule's labels (``*`` counts — ``*.ck`` has
    2); ``reg_k`` is the registrable-domain label count a prevailing
    match implies (suffix + 1 for normal/wildcard; n_labels for an
    exception, whose leftmost label is removed to form the suffix);
    ``priority`` implements exception > most-labels.
    """
    rows = []
    for s in suffixes or DEFAULT_SUFFIXES:
        is_exc = s.startswith("!")
        n = s.lstrip("!").count(".") + 1
        reg_k = n if is_exc else n + 1
        prio = n + (_EXCEPTION_BONUS if is_exc else 0)
        rows.append((s, n, reg_k, prio))
    return spark.createDataFrame(
        rows, "rule string, n_labels int, reg_k int, priority int"
    )


def _last_labels(labels: Column, k: int, *, allow_equal: bool) -> Column:
    """The suffix made of the last ``k`` labels, '' when the host is
    too short. ``allow_equal`` admits a host exactly k labels long
    (exception rules match the whole host; normal/wildcard rules need
    one label LEFT of the suffix to register)."""
    ok = F.size(labels) >= k if allow_equal else F.size(labels) > k
    return F.when(ok, F.array_join(F.slice(labels, -k, k), ".")).otherwise(
        F.lit("")
    )


def registered_domain(
    hosts: DataFrame,
    suffixes: DataFrame,
    host_col: str = "host",
    max_suffix_labels: int = 2,
) -> DataFrame:
    """hosts(host, ...) -> (host, registered_domain).

    Distinct hosts only is the caller's choice; the op is a projection
    + one broadcast join + one hash agg either way.

    ``max_suffix_labels`` must be >= the longest rule's n_labels
    (2 covers the gate dim; the real PSL needs 5).
    """
    labels = F.split(F.col(host_col), r"\.")
    cand_forms: list[Column] = []
    for k in range(1, max_suffix_labels + 1):
        exact = _last_labels(labels, k, allow_equal=False)
        # normal rule "b.ck": literal tail, one label left required
        cand_forms.append(exact)
        # exception rule "!www.ck": whole-host match allowed (reg_k
        # == n_labels, nothing left of the suffix is needed)
        whole = _last_labels(labels, k, allow_equal=True)
        cand_forms.append(
            F.when(whole != "", F.concat(F.lit("!"), whole)).otherwise(
                F.lit("")
            )
        )
        # wildcard rule "*.ck" (k labels incl. the *): host tail =
        # [any-label, last k-1 labels], one label left of the FULL
        # k-label suffix required -> size > k
        if k >= 2:
            tail = F.when(
                F.size(labels) > k,
                F.array_join(F.slice(labels, -(k - 1), k - 1), "."),
            ).otherwise(F.lit(""))
            cand_forms.append(
                F.when(tail != "", F.concat(F.lit("*."), tail)).otherwise(
                    F.lit("")
                )
            )
    cands = hosts.select(
        host_col, F.posexplode(F.array(*cand_forms)).alias("k0", "cand")
    )
    # '' candidates (host too short for that form) are kept: they
    # match no dim row and land on the fallback path, so a
    # single-label host still yields an output row
    matched = (
        cands.join(
            F.broadcast(suffixes), cands["cand"] == suffixes["rule"], "left"
        )
        # prevailing rule: exception first, then most labels; no match
        # loses to any match via coalesce(-1)
        .groupBy(host_col)
        .agg(
            F.max_by(
                "reg_k", F.coalesce("priority", F.lit(-1))
            ).alias("best_reg_k"),
            F.max(F.coalesce("priority", F.lit(-1))).alias("best_prio"),
        )
    )
    labels_m = F.split(F.col(host_col), r"\.")
    n = F.size(labels_m)
    # PSL default rule (no match): unknown TLD acts as a 1-label
    # suffix -> last 2; a prevailing rule may still imply more labels
    # than the host has (whole-host exception) -> clamp to n
    fallback_k = F.least(F.lit(2), n)
    reg_k = F.when(
        F.col("best_prio") > 0, F.least(F.col("best_reg_k"), n)
    ).otherwise(fallback_k)
    return matched.select(
        host_col,
        F.array_join(F.slice(labels_m, -reg_k, reg_k), ".").alias(
            "registered_domain"
        ),
    )


def cidr_rules(spark) -> "DataFrame":
    """The planted CIDR policy dim: /8 blocks for first octets 0 and
    16 (plus never-matching 64/128 — absent labels prove the match is
    selective), /16 blocks nested inside 16.0.0.0/8, /24 blocks
    nested inside 16.0.0.0/16 — so longest-prefix is load-bearing
    three levels deep. ~14 rows; always broadcast."""
    rows = (
        [(8, a << 24, f"net8-{a}") for a in (0, 16, 64, 128)]
        + [(16, (16 << 24) | (b << 16), f"net16-16-{b}") for b in range(8)]
        + [(24, (16 << 24) | (0 << 16) | (c << 8), f"net24-16-0-{c}") for c in range(4)]
    )
    return spark.createDataFrame(rows, "plen int, net long, label string")


CIDR_RULES_SQL = """
    SELECT 8 AS plen, CAST(a.x AS BIGINT) * 16777216 AS net,
           'net8-' || CAST(a.x AS VARCHAR) AS label
    FROM (VALUES (0), (16), (64), (128)) AS a(x)
    UNION ALL
    SELECT 16, CAST(16 * 16777216 + b.i * 65536 AS BIGINT),
           'net16-16-' || CAST(b.i AS VARCHAR)
    FROM unnest(range(8)) AS b(i)
    UNION ALL
    SELECT 24, CAST(16 * 16777216 + c.i * 256 AS BIGINT),
           'net24-16-0-' || CAST(c.i AS VARCHAR)
    FROM unnest(range(4)) AS c(i)
"""


def cidr_longest_match(ips: "DataFrame", rules: "DataFrame") -> "DataFrame":
    """Longest-prefix CIDR match — the IP-policy join every crawler
    runs (per-network politeness tiers, geo/ASN segmentation, abuse
    blocklists; BGP's own forwarding rule). With a FIXED prefix-length
    set the scale-right plan is NOT a range join: each ip expands to
    one candidate row per prefix length (ip >> (32 - len)), equi-joins
    the broadcast rules dim on (plen, net-prefix), and the longest
    match wins by a packed-integer max — one broadcast join, zero
    shuffles of the event stream beyond the final label rollup.
    Unmatched ips keep the 'none' label (the left-join default
    policy), so coverage is visible in the output.

    Input: (ip long). Output: (label, n_events) per winning label.
    """
    from pyspark.sql import functions as F

    plens = [r.plen for r in rules.select("plen").distinct().collect()]
    cand = ips.select(
        "ip",
        F.explode(F.array(*[F.lit(p) for p in sorted(plens)])).alias("plen"),
    )
    scale = F.pow(F.lit(2.0), (F.lit(32) - F.col("plen"))).cast("long")
    cand = cand.withColumn(
        "pref", (F.col("ip") / scale).cast("long") * scale
    )
    hit = cand.join(
        F.broadcast(rules),
        (cand["plen"] == rules["plen"]) & (cand["pref"] == rules["net"]),
    ).select("ip", rules["plen"].alias("mlen"), "label")
    best = hit.groupBy("ip").agg(F.max_by("label", "mlen").alias("label"))
    return (
        ips.join(best, "ip", "left")
        .select(F.coalesce("label", F.lit("none")).alias("label"))
        .groupBy("label")
        .agg(F.count("*").cast("bigint").alias("n_events"))
    )


def cidr_longest_match_sql(ips_sql: str, rules_sql: str) -> str:
    """DuckDB mirror — identical candidate expansion and packed max."""
    return f"""
    WITH ips AS ({ips_sql}),
    rules AS ({rules_sql}),
    plens AS (SELECT DISTINCT plen FROM rules),
    cand AS (
      SELECT i.ip, p.plen,
             (i.ip // CAST(pow(2, 32 - p.plen) AS BIGINT))
               * CAST(pow(2, 32 - p.plen) AS BIGINT) AS pref
      FROM ips i, plens p),
    hit AS (
      SELECT c.ip, r.plen AS mlen, r.label
      FROM cand c JOIN rules r ON c.plen = r.plen AND c.pref = r.net),
    best AS (
      SELECT ip, arg_max(label, mlen) AS label FROM hit GROUP BY ip)
    SELECT coalesce(b.label, 'none') AS label,
           CAST(count(*) AS BIGINT) AS n_events
    FROM ips i LEFT JOIN best b ON i.ip = b.ip
    GROUP BY 1
    """


# ---------------------------------------------------------------------------
# Typosquat detection — FastSS deletion-neighborhood edit-distance join
# ---------------------------------------------------------------------------

TYPOSQUAT_BRANDS = [
    "searchhub.com", "shopmart.net", "newsdaily.org", "mailbox.io",
    "streamly.tv", "socialite.app", "travelkit.co", "bankfort.com",
]

TYPOSQUAT_BRANDS_SQL = (
    "SELECT * FROM (VALUES "
    + ", ".join(f"('{b}')" for b in TYPOSQUAT_BRANDS)
    + ") AS b(brand)"
)


def typosquat_brands(spark) -> "DataFrame":
    return spark.createDataFrame(
        [(b,) for b in TYPOSQUAT_BRANDS], "brand string"
    )


_DELETION_VARIANTS = (
    "array_union(array({c}), transform(sequence(1, length({c})), "
    "i -> concat(substring({c}, 1, i - 1), substring({c}, i + 1, 1000))))"
)


def typosquat_match(domains: "DataFrame", brands: "DataFrame") -> "DataFrame":
    """Edit-distance<=1 join of a domain corpus against a brand dim
    WITHOUT an all-pairs comparison: the FastSS deletion-neighborhood
    signature join (Bocek, Hunt & Stiller, "Fast Similarity Search in
    Large Dictionaries", TR 2007; the same signature family as
    SymSpell). Each side expands to its 1-deletion variants (the
    string itself + every single-character deletion — native
    transform/sequence HOFs, JVM-side); candidates meet brands on
    variant EQUALITY via one broadcast equi-join (brand side is a
    classic small dim: |brands| * avg_len rows), then an exact
    levenshtein confirm keeps true distance <= 1 — the signature join
    admits distance-2 pairs (two different deletions colliding), so
    the verify step is load-bearing, exactly the LSH-then-verify
    shape of the near-dup family.

    Scale: the corpus side never self-joins and never broadcasts;
    per domain ~len(domain) slim (variant, domain) rows flow into a
    broadcast hash join, matched pairs (tiny) dedup with one shuffle.

    Returns (domain, brand, dist) for dist <= 1 pairs, one row per
    pair.

    Reference analogue: the reference canonicalizes/dedups source
    URLs per prefecture (`common/util.py` url cleanup); this is the
    adversarial-variant form of the same URL-identity problem at web
    scale.
    """
    cand = domains.select(
        "domain",
        F.explode(
            F.expr(_DELETION_VARIANTS.format(c="domain"))
        ).alias("variant"),
    )
    bvar = brands.select(
        "brand",
        F.explode(
            F.expr(_DELETION_VARIANTS.format(c="brand"))
        ).alias("variant"),
    )
    pairs = (
        cand.join(F.broadcast(bvar), "variant")
        .select("domain", "brand")
        .distinct()
    )
    return pairs.filter(
        F.levenshtein(F.col("domain"), F.col("brand")) <= 1
    ).select(
        "domain",
        "brand",
        F.levenshtein(F.col("domain"), F.col("brand"))
        .cast("int")
        .alias("dist"),
    )


def typosquat_match_sql(domains_sql: str, brands_sql: str) -> str:
    """DuckDB mirror — exact levenshtein against the brand dim (the
    all-pairs form is fine at oracle scale; the Spark arm must agree
    while never materializing the cross product)."""
    return f"""
    SELECT d.domain, b.brand,
           CAST(levenshtein(d.domain, b.brand) AS INT) AS dist
    FROM (SELECT DISTINCT domain FROM ({domains_sql})) d
    JOIN ({brands_sql}) b ON levenshtein(d.domain, b.brand) <= 1
    """
