"""PDF 1.5 cross-reference STREAMS + object streams — own walk.

minipdf handles the classic `xref` table (PDF 1.4, the reference's
fixture PDFs — hyogo.py's table PDFs decode through it). Modern web
PDFs overwhelmingly use PDF 1.5+ compressed cross-references, which
change the structural walk completely (ISO 32000-1 §7.5.8, §7.5.7):

* the cross-reference is itself a STREAM object (/Type /XRef) whose
  data is fixed-width binary rows (/W [w1 w2 w3]) — type 0 = free,
  type 1 = direct offset, type 2 = (object-stream number, index);
* the row data is FlateDecode'd and then run BACKWARDS through the
  PNG **Up predictor** (/DecodeParms /Predictor 12 /Columns n): each
  stored row is the byte-wise delta against the previous row — skip
  the predictor and every offset after row 1 is garbage;
* non-stream objects (catalog, page tree, pages) live INSIDE an
  object stream (/Type /ObjStm): a Flate'd container whose header
  is N (objnum, offset) integer pairs followed by the serialized
  objects — type-2 xref entries index into it.

The reader shares the Tj/Tm content-stream grammar with minipdf
(same glyph-run extraction), so the only new surface is the
structural walk — which is the point.
"""

from __future__ import annotations

import re
import zlib

from . import minipdf


def _png_up_encode(rows: list[bytes]) -> bytes:
    out = bytearray()
    prev = bytes(len(rows[0])) if rows else b""
    for row in rows:
        out.append(2)  # filter type: Up
        out += bytes((a - b) & 0xFF for a, b in zip(row, prev))
        prev = row
    return bytes(out)


def _png_up_decode(data: bytes, columns: int) -> list[bytes]:
    stride = columns + 1
    if len(data) % stride:
        raise ValueError("predictor data not a whole number of rows")
    rows = []
    prev = bytes(columns)
    for i in range(0, len(data), stride):
        ftype = data[i]
        if ftype != 2:
            raise ValueError(f"unsupported PNG filter {ftype}")
        row = bytes(
            (a + b) & 0xFF for a, b in zip(data[i + 1 : i + stride], prev)
        )
        rows.append(row)
        prev = row
    return rows


def write_pdf15(
    pages: list[list[list[str]]], col_xs: list[int] | None = None
) -> bytes:
    """Assemble a PDF 1.5 file: content streams as Flate stream
    objects, catalog/pages/page dicts packed into ONE object stream,
    and an Up-predicted cross-reference stream."""
    col_xs = col_xs or [minipdf.LEFT_X + c * 110 for c in range(8)]
    n_pages = len(pages)
    # object numbers: 1 catalog, 2 pages, 3..2+n page dicts,
    # then content streams, then ObjStm, then XRef stream
    first_content = 3 + n_pages
    objstm_num = first_content + n_pages
    xref_num = objstm_num + 1

    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    packed: list[tuple[int, bytes]] = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (
            2,
            f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
        ),
    ]
    for i in range(n_pages):
        packed.append(
            (
                3 + i,
                (
                    f"<< /Type /Page /Parent 2 0 R /Contents "
                    f"{first_content + i} 0 R >>"
                ).encode(),
            )
        )

    buf = bytearray(b"%PDF-1.5\n")
    offsets: dict[int, int] = {}

    for i, page in enumerate(pages):
        raw = minipdf._content_stream(page, col_xs)
        flate = zlib.compress(raw, 6)
        num = first_content + i
        offsets[num] = len(buf)
        buf += (
            f"{num} 0 obj\n<< /Length {len(flate)} "
            "/Filter /FlateDecode >>\nstream\n"
        ).encode()
        buf += flate
        buf += b"\nendstream\nendobj\n"

    # object stream
    body = bytearray()
    pairs = []
    for num, objbytes in packed:
        pairs.append(f"{num} {len(body)}")
        body += objbytes + b"\n"
    header = (" ".join(pairs) + "\n").encode()
    stm = zlib.compress(header + bytes(body), 6)
    offsets[objstm_num] = len(buf)
    buf += (
        f"{objstm_num} 0 obj\n<< /Type /ObjStm /N {len(packed)} "
        f"/First {len(header)} /Length {len(stm)} "
        "/Filter /FlateDecode >>\nstream\n"
    ).encode()
    buf += stm
    buf += b"\nendstream\nendobj\n"

    # xref stream: W = [1 4 2]; rows for objects 0..xref_num
    xref_off = len(buf)
    offsets[xref_num] = xref_off
    w1, w2, w3 = 1, 4, 2
    rows = []
    for num in range(xref_num + 1):
        if num == 0:
            t, f2, f3 = 0, 0, 0xFFFF
        elif num in offsets:
            t, f2, f3 = 1, offsets[num], 0
        else:  # packed into the object stream
            idx = next(
                i for i, (n, _) in enumerate(packed) if n == num
            )
            t, f2, f3 = 2, objstm_num, idx
        rows.append(
            t.to_bytes(w1, "big")
            + f2.to_bytes(w2, "big")
            + f3.to_bytes(w3, "big")
        )
    columns = w1 + w2 + w3
    xdata = zlib.compress(_png_up_encode(rows), 6)
    buf += (
        f"{xref_num} 0 obj\n<< /Type /XRef /Size {xref_num + 1} "
        f"/W [{w1} {w2} {w3}] /Root 1 0 R "
        f"/DecodeParms << /Predictor 12 /Columns {columns} >> "
        f"/Filter /FlateDecode /Length {len(xdata)} >>\nstream\n"
    ).encode()
    buf += xdata
    buf += b"\nendstream\nendobj\n"
    buf += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(buf)


_STREAM_RE = re.compile(rb"stream\r?\n", re.S)


def _read_stream_obj(body: bytes, offset: int) -> tuple[bytes, bytes]:
    """(dict bytes, DECODED stream bytes) of the object at offset."""
    m = re.compile(rb"\d+ 0 obj\s*").match(body, offset)
    if not m:
        raise ValueError(f"no object at offset {offset}")
    dstart = m.end()
    sm = _STREAM_RE.search(body, dstart)
    if not sm:
        raise ValueError("object has no stream")
    dct = body[dstart : sm.start()]
    lm = re.search(rb"/Length\s+(\d+)", dct)
    if not lm:
        raise ValueError("stream without /Length")
    data = body[sm.end() : sm.end() + int(lm.group(1))]
    if b"/FlateDecode" in dct:
        data = zlib.decompress(data)
    return dct, data


def extract_text_rows(body: bytes) -> list[list[list[tuple[int, str]]]]:
    """Pages of rows of (x, text) cells via the 1.5 structural walk:
    startxref -> XRef STREAM (inflate + Up predictor) -> typed
    entries -> catalog/pages out of the OBJECT STREAM -> Flate'd
    content streams -> shared glyph-run grammar."""
    tail = body[-200:]
    m = re.search(rb"startxref\s+(\d+)\s*%%EOF\s*$", tail)
    if not m:
        raise ValueError("no startxref")
    xref_off = int(m.group(1))
    xdct, xdata = _read_stream_obj(body, xref_off)
    if b"/Type /XRef" not in xdct:
        raise ValueError("startxref does not point at an XRef stream")
    wm = re.search(rb"/W\s*\[\s*(\d+)\s+(\d+)\s+(\d+)\s*\]", xdct)
    sm = re.search(rb"/Size\s+(\d+)", xdct)
    rm = re.search(rb"/Root\s+(\d+)\s+0\s+R", xdct)
    if not (wm and sm and rm):
        raise ValueError("XRef stream missing /W, /Size or /Root")
    w1, w2, w3 = (int(x) for x in wm.groups())
    size = int(sm.group(1))
    root_num = int(rm.group(1))
    pm = re.search(rb"/Predictor\s+(\d+)\s*/Columns\s+(\d+)", xdct)
    if pm:
        pred, columns = int(pm.group(1)), int(pm.group(2))
        if pred != 12:
            raise ValueError(f"unsupported predictor {pred}")
        if columns != w1 + w2 + w3:
            raise ValueError("predictor columns != row width")
        rows = _png_up_decode(xdata, columns)
    else:
        stride = w1 + w2 + w3
        rows = [
            xdata[i : i + stride] for i in range(0, len(xdata), stride)
        ]
    if len(rows) != size:
        raise ValueError("xref row count != /Size")

    entries = []
    for row in rows:
        t = int.from_bytes(row[:w1], "big") if w1 else 1
        f2 = int.from_bytes(row[w1 : w1 + w2], "big")
        f3 = int.from_bytes(row[w1 + w2 :], "big")
        entries.append((t, f2, f3))

    objstm_cache: dict[int, list[bytes]] = {}

    def load_objstm(num: int) -> list[bytes]:
        if num not in objstm_cache:
            t, off, _ = entries[num]
            if t != 1:
                raise ValueError("object stream must be a direct object")
            dct, data = _read_stream_obj(body, off)
            if b"/ObjStm" not in dct:
                raise ValueError("type-2 entry points outside an ObjStm")
            nm = re.search(rb"/N\s+(\d+)", dct)
            fm = re.search(rb"/First\s+(\d+)", dct)
            n, first = int(nm.group(1)), int(fm.group(1))
            header = data[:first].split()
            objs = []
            for i in range(n):
                off_i = int(header[2 * i + 1])
                end_i = (
                    int(header[2 * i + 3]) if i + 1 < n else len(data) - first
                )
                objs.append(data[first + off_i : first + end_i])
            objstm_cache[num] = objs
        return objstm_cache[num]

    def get_obj(num: int) -> bytes:
        t, f2, f3 = entries[num]
        if t == 1:
            m2 = re.compile(rb"\d+ 0 obj\s*").match(body, f2)
            if not m2:
                raise ValueError(f"no object at offset {f2}")
            end = body.index(b"endobj", m2.end())
            return body[m2.end() : end]
        if t == 2:
            return load_objstm(f2)[f3]
        raise ValueError(f"object {num} is free")

    catalog = get_obj(root_num)
    pg = re.search(rb"/Pages\s+(\d+)\s+0\s+R", catalog)
    pages_obj = get_obj(int(pg.group(1)))
    kids = re.search(rb"/Kids\s*\[([^\]]*)\]", pages_obj)
    kid_nums = [int(x) for x in re.findall(rb"(\d+)\s+0\s+R", kids.group(1))]
    out = []
    for kn in kid_nums:
        page = get_obj(kn)
        cm = re.search(rb"/Contents\s+(\d+)\s+0\s+R", page)
        t, off, _ = entries[int(cm.group(1))]
        if t != 1:
            raise ValueError("content stream must be a direct object")
        _, stream = _read_stream_obj(body, off)
        cells = minipdf._stream_text_cells(stream)
        out.append(minipdf._cells_to_rows(cells))
    return out
