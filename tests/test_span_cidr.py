"""T5 span corruption + CIDR longest-prefix match.

Pins: span accounting against a pure-python reference mask (windows,
hash offsets, tail clipping), length-budget identities; CIDR three-
level longest-prefix wins, never-matching rules stay absent, and the
'none' bucket covers exactly the unmatched ips.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from goto_eater_crawler_spark.operators.domains import (
    cidr_longest_match,
    cidr_rules,
)
from goto_eater_crawler_spark.operators.packing import span_corruption

CHUNK, SPAN = 20, 3


def _reference(doc_id: int, n_tokens: int):
    n_spans = n_corr = 0
    for w in range((n_tokens - 1) // CHUNK + 1):
        off = (doc_id * 2654435761 + w * 40503) % (CHUNK - SPAN + 1)
        c = max(0, min(SPAN, n_tokens - (w * CHUNK + off)))
        n_spans += 1 if c > 0 else 0
        n_corr += c
    return n_spans, n_corr


def test_span_corruption_matches_reference(spark):
    docs = [(i, " ".join(f"t{j}" for j in range(n)))
            for i, n in enumerate([1, 2, 19, 20, 21, 39, 40, 61, 100])]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in span_corruption(d).collect()}
    for i, text in docs:
        n = len(text.split(" "))
        n_spans, n_corr = _reference(i, n)
        r = got[i]
        assert (r["n_spans"], r["n_corrupted"]) == (n_spans, n_corr), (i, n)
        # length-budget identities: kept + sentinels / corrupted +
        # sentinels + EOS
        assert r["input_len"] == n - n_corr + n_spans
        assert r["target_len"] == n_corr + n_spans + 1


def test_cidr_three_level_longest_prefix(spark):
    # 16.0.0.5 -> /24 rule 0; 16.0.1.5 -> /16 rule 0 (no /24 for .1);
    # 16.9.0.1 -> /8 (no /16 for second octet 9); 17.0.0.1 -> none;
    # 64.0.0.1 -> net8-64 (planted never-match octets are 64/128 for
    # the GATE's ip synth, but they do match when fed directly)
    def ip(a, b, c, d):
        return (a << 24) | (b << 16) | (c << 8) | d

    ips = spark.createDataFrame(
        [(ip(16, 0, 0, 5),), (ip(16, 0, 9, 5),), (ip(16, 1, 0, 1),),
         (ip(16, 9, 0, 1),), (ip(17, 0, 0, 1),), (ip(0, 3, 2, 1),)],
        "ip long",
    )
    got = {r["label"]: r["n_events"]
           for r in cidr_longest_match(ips, cidr_rules(spark)).collect()}
    assert got == {
        "net24-16-0-0": 1,   # three levels deep, /24 beats /16 beats /8
        "net16-16-0": 1,     # 16.0.9.x: inside /16 but third octet > 3
        "net16-16-1": 1,
        "net8-16": 1,        # second octet 9: only the /8 matches
        "none": 1,           # 17.x matches nothing
        "net8-0": 1,
    }


def test_cidr_gate_ip_synth_never_hits_dead_rules(spark):
    # the gate synthesizes first octets 0..31 only: the planted
    # 64/128 rules must not appear
    e = spark.range(0, 2000).select(
        (
            (F.col("id") % 32) * 16777216
            + (F.col("id") * 2654435761) % 16777216
        ).cast("long").alias("ip")
    )
    labels = {r["label"]
              for r in cidr_longest_match(e, cidr_rules(spark)).collect()}
    assert "net8-64" not in labels and "net8-128" not in labels
    assert "none" in labels and "net8-16" in labels
