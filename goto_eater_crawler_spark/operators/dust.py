"""DUST rule mining — learn URL rewrite rules from duplicate content.

"Different URLs with Similar Text" (Bar-Yossef, Keidar, Schonfeld,
WWW 2007): a crawler that has fetched the same content under two URL
spellings can LEARN the rewrite rule (``/index.html`` → ``''``,
``?utm=feed`` → ``''``, ``www.`` insertion, session-id params …) and
apply it to the frontier — at 100 TB the win is not dedup after the
fetch but never fetching the alias at all. The reference hand-pins
per-source URL quirks (registry replace tables, sources/registry.py);
DUST is the corpus-scale generalization: the rules are MINED.

Pipeline (all relational until the last string step):

1. duplicate-content URL pairs — an equi-join on the content key
   (the exact-dedup hash join, operators/textdedup.py machinery); at
   gate scale the synth plants one alias per selected document, so
   the content key is unique per doc_id by construction and the join
   shape is identical;
2. rule extraction per pair — longest common prefix, then longest
   common suffix of the remainders (maximal prefix FIRST, the
   deterministic tie-break): the differing middles (alpha, beta)
   are the candidate substitution, ordered alpha < beta so the rule
   is direction-normalized; a tight Arrow-batched string step —
   pairs are slim (two URLs), the corpus never enters;
3. support aggregation — one map-side-combinable groupBy(alpha,
   beta).count(); rules below the support threshold are noise (the
   unique-session-id class) and are dropped — this filter is
   load-bearing, the synth plants a per-doc-unique param class that
   MUST disappear.

Honesty note (oracle): the driver oracle states the planted rule
classes closed-form (each transform class yields one constant rule
whose support is the class count — derived by hand in
tests/test_dust.py and the SQL); the LCP/LCS extraction itself is
additionally pinned by unit tests on hostile pairs (shared digits,
overlapping prefix/suffix claims, multi-byte UTF-8).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def extract_rule(u1: str, u2: str) -> tuple[str, str]:
    """(alpha, beta) for a URL pair: maximal common prefix first,
    then maximal common suffix of the remainders; the differing
    middles, direction-normalized (alpha <= beta)."""
    n = min(len(u1), len(u2))
    p = 0
    while p < n and u1[p] == u2[p]:
        p += 1
    r1, r2 = u1[p:], u2[p:]
    m = min(len(r1), len(r2))
    s = 0
    while s < m and r1[len(r1) - 1 - s] == r2[len(r2) - 1 - s]:
        s += 1
    a = r1[: len(r1) - s]
    b = r2[: len(r2) - s]
    return (a, b) if a <= b else (b, a)


def dust_rules(
    pairs: DataFrame, min_support: int = 2,
    u1: str = "url_a", u2: str = "url_b",
) -> DataFrame:
    """(alpha, beta, support) from duplicate-content URL pairs.
    Input: one row per unordered pair of URLs serving identical
    content. Scale shape: the extraction is one narrow Arrow stage
    over slim pair rows; support is one combinable shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            alphas, betas = [], []
            for a, b in zip(pdf[u1], pdf[u2]):
                al, be = extract_rule(str(a), str(b))
                alphas.append(al)
                betas.append(be)
            yield pd.DataFrame({"alpha": alphas, "beta": betas})

    rules = pairs.select(u1, u2).mapInPandas(
        batches, schema="alpha string, beta string"
    )
    return (
        rules.groupBy("alpha", "beta")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )


# ------------------------------------------------- gate-scale synth
def canonical_url_col(doc_id: Column) -> Column:
    """The corpus URL convention shared with the WARC gates
    (plans/queries.py::q_warc_ingest oracle)."""
    return F.concat(
        F.lit("https://w"), (doc_id % 7).cast("string"),
        F.lit(".example.test/doc/"), doc_id.cast("string"),
    )


def synth_alias_pairs(docs: DataFrame) -> DataFrame:
    """(doc_id, url_a, url_b) — per document, the canonical URL plus
    ONE planted alias serving the same content:

    - doc_id % 4 == 1 → directory-index alias  (… + '/index.html');
    - doc_id % 4 == 2 → tracking-param alias   (… + '?utm=feed');
    - doc_id % 4 == 3 → www-host alias         (https://www.<host>…);
    - doc_id % 4 == 0 → per-doc-unique session param ('?sid=<id>'):
      every pair mines a DIFFERENT rule, so the support filter must
      drop the whole class — the planted hard-negative.
    """
    d = F.col("doc_id")
    u = canonical_url_col(d)
    alias = (
        F.when(d % 4 == 1, F.concat(u, F.lit("/index.html")))
        .when(d % 4 == 2, F.concat(u, F.lit("?utm=feed")))
        .when(
            d % 4 == 3,
            F.concat(
                F.lit("https://www.w"), (d % 7).cast("string"),
                F.lit(".example.test/doc/"), d.cast("string"),
            ),
        )
        .otherwise(F.concat(u, F.lit("?sid="), d.cast("string")))
    )
    return docs.select(
        "doc_id", u.alias("url_a"), alias.alias("url_b")
    )


def dust_rules_sql() -> str:
    """Closed-form oracle: each planted transform class mines ONE
    constant rule with support = class count; the sid class mines
    per-doc-unique rules (support 1 each) and is dropped by the
    threshold. The www rule's middles are ('', 'ww.w'): LCP stops
    at 'https://w', and the alias remainder is exactly 'ww.w' +
    canonical remainder, so the suffix pass swallows everything
    after it (derived in tests/test_dust.py)."""
    return """
    SELECT alpha, beta, support FROM (
      SELECT '' AS alpha, '/index.html' AS beta,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM documents WHERE doc_id % 4 = 1
      UNION ALL
      SELECT '', '?utm=feed', CAST(COUNT(*) AS BIGINT)
      FROM documents WHERE doc_id % 4 = 2
      UNION ALL
      SELECT '', 'ww.w', CAST(COUNT(*) AS BIGINT)
      FROM documents WHERE doc_id % 4 = 3
    ) WHERE support >= 2
    ORDER BY alpha, beta
    """
