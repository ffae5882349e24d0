"""goto_eater_crawler_spark — a PySpark-native distributed crawl engine.

A from-scratch reimplementation of the capabilities of
terukizm/goto-eater-crawler (reference at /root/reference, read-only):
its per-prefecture fetch -> parse -> extract loop re-expressed as a
distributed URL-frontier + fetch scheduler over tables of
Common-Crawl-style web pages ``(url, warc_ts, html, text, lang)``.

Layout
------
- ``functions/``  pure column-level functions (URL canonicalization,
  text normalization, text statistics) — native Spark expressions
  wherever possible, Arrow-batched pandas UDFs otherwise.
- ``sources/``    deterministic synthetic web generator (the stand-in
  for the reference's HTTP layer + filesystem cache,
  reference settings.py:90-94), seed/robots tables, CSV sink.
- ``operators/``  fetch join, extraction UDF families, bloom-partition
  URL-seen set, politeness quota, text dedup (exact/MinHash/SimHash),
  similarity search, multimodal plumbing.
- ``plans/``      the driver-side crawl round loop with checkpoint /
  resume / lineage counters, plus the relational query inventory.
- ``streaming/``  Structured Streaming variants (windowed counters).

Everything here is public-API PySpark (DataFrame/SQL + Arrow UDFs);
no RDD hot paths, no per-row Python UDFs.
"""

__version__ = "0.1.0"
