"""Structured Streaming surface of the engine.

The crawl loop itself is deliberately batch rounds (SURVEY.md §2.9:
checkpoint/resume determinism + politeness budgets fit batch better
than a continuous query), but two jobs around the crawl ARE streams:

- :mod:`ingest` — monitoring a continuously-landing pages table
  (Common-Crawl-style WARC ingest): watermarked tumbling-window
  counts per (window, lang) and per-host rates.
- :mod:`seen_stream` — a streaming URL-seen filter: per-host
  ``applyInPandasWithState`` keeping the seen-hash set in the state
  store, emitting only first-seen URLs; state survives restarts via
  the streaming checkpoint.
"""
