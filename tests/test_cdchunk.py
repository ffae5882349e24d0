"""Content-defined chunking (storage_cdc_chunks gate)."""

from __future__ import annotations

import random

from goto_eater_crawler_spark.operators import cdchunk as cd


def direct_bounds(text: str) -> list[int]:
    """The oracle's O(len*W) definition: boundary at i (1-indexed,
    i >= W) iff the polynomial hash of the trailing W chars is
    0 mod D."""
    out = []
    for i in range(cd.WINDOW, len(text) + 1):
        h = 0
        for ch in text[i - cd.WINDOW : i]:
            h = (h * 31 + ord(ch)) & ((1 << 20) - 1)
        if h % cd.DIVISOR == 0:
            out.append(i)
    return out


def ref_chunks(text: str) -> list[tuple[int, int, int, int]]:
    if not text:
        return []
    ends = direct_bounds(text)
    if not ends or ends[-1] != len(text):
        ends = ends + [len(text)]
    rows = []
    start = 0
    for k, end in enumerate(ends, 1):
        h = 0
        for ch in text[start:end]:
            h = (h * 31 + ord(ch)) & ((1 << 40) - 1)
        rows.append((k, start, end - start, h))
        start = end
    return rows


def test_rolling_fold_matches_direct_definition(spark):
    """The engine's O(len) Rabin-Karp rolling hash must equal the
    direct window-hash definition on arbitrary text — including
    texts shorter than the window and boundary-at-end cases.
    One Spark job over 40 seeded-random texts."""
    rng = random.Random(42)
    texts = [
        (i, "".join(rng.choice("abcdefgh ") for _ in range(rng.randint(0, 300))))
        for i in range(40)
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got: dict[int, list] = {}
    for r in cd.chunk_rows(df).orderBy("doc_id", "chunk_idx").collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_start"], r["chunk_len"], r["chunk_fp"])
        )
    for i, text in texts:
        assert got.get(i, []) == ref_chunks(text), f"doc {i}: {text!r}"


def test_chunk_edges(spark):
    texts = [
        (0, ""),  # no rows
        (1, "abc"),  # shorter than window -> one whole-doc chunk
        (2, "x" * cd.WINDOW),  # exactly one window
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    rows = cd.chunk_rows(df).orderBy("doc_id", "chunk_idx").collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 0 not in by_doc
    assert [
        (r["chunk_start"], r["chunk_len"]) for r in by_doc[1]
    ] == [(0, 3)]
    # chunk lens partition the doc
    assert sum(r["chunk_len"] for r in by_doc[2]) == cd.WINDOW


def test_boundaries_realign_after_insertion(spark):
    """The content-defined property: prepending bytes shifts early
    boundaries but the chunk STARTING at a later boundary keeps its
    fingerprint — the dedup win a fixed-size splitter cannot give."""
    base = "the quick brown fox jumps over the lazy dog " * 8
    edited = "INSERTED PREFIX " + base
    df = spark.createDataFrame(
        [(0, base), (1, edited)], ["doc_id", "text"]
    )
    rows = cd.chunk_rows(df).collect()
    fps = {0: set(), 1: set()}
    for r in rows:
        fps[r["doc_id"]].add(r["chunk_fp"])
    shared = fps[0] & fps[1]
    # at least one full chunk survives the edit verbatim
    assert shared, "no chunk fingerprint survived the insertion"
