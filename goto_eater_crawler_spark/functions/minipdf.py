"""Minimal PDF writer + structural text extractor (pure Python).

Replaces the round-1 pseudo-PDF stub for family ``pdf_tabula`` with
REAL PDF bytes: the writer emits a valid uncompressed PDF 1.4 document
(catalog / page tree / per-page content streams with BT..ET text
operators / font resource / xref table / trailer), and the reader
recovers per-page text by walking the ACTUAL structure — startxref →
xref offsets → trailer /Root → /Pages /Kids order → each page's
/Contents stream via /Length — then tokenizing the text operators
(``Tm`` absolute positioning + ``Tj`` show-text, with PDF literal
string escapes) and clustering glyph runs into table rows by their y
coordinate, cells ordered by x. This is the same recover-rows-from-
positioned-text problem tabula's lattice mode solves for the reference
(tokyo.py:54-62); the subset is minimal but the container is genuine —
any standards-conforming PDF reader can open the writer's output.

No external libraries; intentionally small. Not a general PDF parser:
it supports what the writer (and any similarly plain generator) emits
— uncompressed streams, literal strings, one content stream per page.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

PAGE_W, PAGE_H = 595, 842
ROW_H = 16
TOP_Y = 800
LEFT_X = 40


def _esc(s: str) -> bytes:
    out = []
    for ch in s:
        if ch in "\\()":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out).encode("utf-8")


def _content_stream(rows: list[list[str]], col_xs: list[int]) -> bytes:
    ops = [b"BT", b"/F1 10 Tf"]
    for r, row in enumerate(rows):
        y = TOP_Y - r * ROW_H
        for c, cell in enumerate(row):
            if cell is None or cell == "":
                continue  # empty cell -> no glyph run at that position
            x = col_xs[c] if c < len(col_xs) else LEFT_X + c * 110
            ops.append(b"1 0 0 1 %d %d Tm" % (x, y))
            ops.append(b"(" + _esc(cell) + b") Tj")
    ops.append(b"ET")
    return b"\n".join(ops)


def write_pdf(pages: list[list[list[str]]], col_xs: list[int] | None = None) -> bytes:
    """Serialize pages of table rows (lists of cell strings) into a
    valid single-font uncompressed PDF."""
    col_xs = col_xs or [LEFT_X + i * 110 for i in range(8)]
    objects: list[bytes] = []  # 1-indexed object bodies (sans obj header)

    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # obj 1
    objects.append(  # obj 2
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, rows in enumerate(pages):
        page_num = 3 + 2 * i
        stream = _content_stream(rows, col_xs)
        objects.append(  # page object
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}] "
                f"/Contents {page_num + 1} 0 R "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>"
            ).encode()
        )
        objects.append(  # content stream object
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_off = len(buf)
    buf += b"xref\n0 %d\n" % (len(objects) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_off)
    )
    return bytes(buf)


# ---------------------------------------------------------------------------
# reader (structural: xref -> page tree -> content streams)
# ---------------------------------------------------------------------------

_REF_RE = re.compile(rb"(\d+) 0 R")
_TM_RE = re.compile(rb"1 0 0 1 (-?\d+) (-?\d+) Tm")


def _read_obj(body: bytes, offset: int) -> bytes:
    m = re.compile(rb"\d+ 0 obj\n").match(body, offset)
    if not m:
        raise ValueError(f"no object at xref offset {offset}")
    end = body.index(b"\nendobj", m.end())
    return body[m.end(): end]


def _dict_ref(obj: bytes, key: bytes) -> int:
    m = re.search(re.escape(key) + rb"\s+(\d+) 0 R", obj)
    if not m:
        raise ValueError(f"missing {key!r}")
    return int(m.group(1))


def _unescape_literal(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        b = raw[i]
        if b == 0x5C and i + 1 < len(raw):  # backslash
            out.append(raw[i + 1])
            i += 2
        else:
            out.append(b)
            i += 1
    return out.decode("utf-8")


def _stream_text_cells(stream: bytes) -> list[tuple[int, int, str]]:
    """(y, x, text) glyph runs from a content stream: track Tm
    positions, collect literal-string Tj operands (escape-aware)."""
    cells = []
    pos = 0
    x = y = 0
    while pos < len(stream):
        m_tm = _TM_RE.match(stream, pos)
        if m_tm:
            x, y = int(m_tm.group(1)), int(m_tm.group(2))
            pos = m_tm.end()
            continue
        if stream[pos] == 0x28:  # '(' — literal string
            j = pos + 1
            depth = 1
            while j < len(stream) and depth:
                if stream[j] == 0x5C:
                    j += 2
                    continue
                if stream[j] == 0x28:
                    depth += 1
                elif stream[j] == 0x29:
                    depth -= 1
                j += 1
            raw = stream[pos + 1: j - 1]
            after = stream[j: j + 4]
            if b"Tj" in after:
                cells.append((y, x, _unescape_literal(raw)))
            pos = j
            continue
        pos += 1
    return cells


def _cells_to_rows(cells: list[tuple[int, int, str]]) -> list[list[tuple[int, str]]]:
    """Cluster glyph runs into rows by y (descending = top-first),
    cells ordered by x; each cell keeps its x for column mapping."""
    by_y: dict[int, list[tuple[int, str]]] = {}
    for y, x, text in cells:
        by_y.setdefault(y, []).append((x, text))
    return [
        sorted(by_y[y]) for y in sorted(by_y, reverse=True)
    ]


def extract_text_rows(body: bytes) -> list[list[list[tuple[int, str]]]]:
    """Pages of rows of (x, text) cells, recovered via the xref walk."""
    if not body.startswith(b"%PDF"):
        raise ValueError("not a PDF body")
    tail = body.rstrip()
    m = re.search(rb"startxref\s+(\d+)\s*%%EOF$", tail)
    if not m:
        raise ValueError("no startxref")
    xref_off = int(m.group(1))
    xm = re.compile(rb"xref\n0 (\d+)\n").match(body, xref_off)
    if not xm:
        raise ValueError("bad xref table")
    n = int(xm.group(1))
    entries = body[xm.end(): xm.end() + 20 * n]
    offsets = [int(entries[i * 20: i * 20 + 10]) for i in range(n)]
    trailer_at = body.index(b"trailer", xref_off)
    root_num = _dict_ref(body[trailer_at:], b"/Root")
    catalog = _read_obj(body, offsets[root_num])
    pages_obj = _read_obj(body, offsets[_dict_ref(catalog, b"/Pages")])
    kids_m = re.search(rb"/Kids \[([^\]]*)\]", pages_obj)
    page_nums = [int(g) for g in _REF_RE.findall(kids_m.group(1))]
    pages = []
    for pn in page_nums:
        page = _read_obj(body, offsets[pn])
        cont = _read_obj(body, offsets[_dict_ref(page, b"/Contents")])
        lm = re.search(rb"/Length (\d+)", cont)
        start = cont.index(b"stream\n") + len(b"stream\n")
        stream = cont[start: start + int(lm.group(1))]
        pages.append(_cells_to_rows(_stream_text_cells(stream)))
    return pages
