"""Item text normalization — byte-identical to the reference pipeline.

The reference normalizes every scraped item in one pipeline
(goto_eat_scrapy/pipelines.py:10-40):

- ``normalize_text`` (pipelines.py:10-17): strip HTML tags
  (w3lib.html.remove_tags), delete line-break characters
  (``"".join(text.splitlines())``), then ``strip()``. Applied to
  ``shop_name, address, opening_hours, closing_day``
  (pipelines.py:31-33).
- plain ``strip()`` for ``genre_name, area_name, tel, zip_code,
  official_page`` (pipelines.py:36-38).
- ``detail_page, provided_lat, provided_lng`` untouched.

w3lib's remove_tags with no tag filters reduces to removing every
``</?([^ >/]+).*?>`` match (DOTALL, case-insensitive) — re-implemented
here from the documented public behavior; golden pinned by the
reference's own inline assert (pipelines.py:53-54):
``"山下<br>町12-12\\r\\n  一二三ビル1F" -> "山下町12-12  一二三ビル1F"``.

Spark side: one vectorized pandas-str pass per column — no per-row
Python, the regexes run inside pandas' C engine over Arrow batches.
"""

from __future__ import annotations

import re

import pandas as pd

# w3lib.html.remove_tags(text) semantics with no keep/which_ones.
_TAG_RE = re.compile(r"</?([^ >/]+).*?>", re.DOTALL | re.IGNORECASE)

# str.splitlines() boundaries — "".join(s.splitlines()) removes each.
_LINE_BREAK_RE = re.compile("[\n\r\v\f\x1c\x1d\x1e\x85\u2028\u2029]")

# Field groups exactly as pipelines.py:31-38.
NORMALIZE_FIELDS = ["shop_name", "address", "opening_hours", "closing_day"]
STRIP_FIELDS = ["genre_name", "area_name", "tel", "zip_code", "official_page"]


def normalize_text(text: str | None) -> str | None:
    """Reference pipelines.py:10-17, byte-identical (falsy passthrough
    included)."""
    if not text:
        return text
    text = _TAG_RE.sub("", text)
    text = "".join(text.splitlines())
    return text.strip()


def normalize_item(item: dict) -> dict:
    """Reference pipelines.py:28-40 over a plain dict (oracle side)."""
    out = dict(item)
    for attr in NORMALIZE_FIELDS:
        if out.get(attr):
            out[attr] = normalize_text(out[attr])
    for attr in STRIP_FIELDS:
        if out.get(attr):
            out[attr] = out[attr].strip()
    return out


# ---------------------------------------------------------------------------
# Vectorized (pandas) implementations — used inside Arrow UDF batches
# ---------------------------------------------------------------------------


def normalize_text_series(s: pd.Series) -> pd.Series:
    """Vectorized normalize_text. Preserves the reference's falsy
    passthrough: None stays None, "" stays ""."""
    mask = s.notna() & (s != "")
    out = s.copy()
    t = s[mask].str.replace(_TAG_RE, "", regex=True)
    t = t.str.replace(_LINE_BREAK_RE, "", regex=True)
    out[mask] = t.str.strip()
    return out


def strip_series(s: pd.Series) -> pd.Series:
    mask = s.notna() & (s != "")
    out = s.copy()
    out[mask] = s[mask].str.strip()
    return out


def normalize_items_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Apply the full pipeline to an extracted-items pandas batch."""
    for attr in NORMALIZE_FIELDS:
        if attr in pdf:
            pdf[attr] = normalize_text_series(pdf[attr])
    for attr in STRIP_FIELDS:
        if attr in pdf:
            pdf[attr] = strip_series(pdf[attr])
    return pdf
