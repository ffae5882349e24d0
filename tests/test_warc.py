"""WARC codec + ingestion source: byte round-trip, the Common-Crawl
per-record-gzip layout, spec variants (WARC 1.1 angle-bracket URIs),
and hostile inputs (torn records, missing Content-Length, non-response
record types) — the minipdf/miniwav test discipline applied to the
ISO 28500 container."""

from __future__ import annotations

import gzip

from goto_eater_crawler_spark.functions import miniwarc


def _pages(n=5):
    return [
        (
            f"https://h{i}.example.test/p/{i}",
            f"2021-03-{i + 1:02d}T08:30:00Z",
            f"<html><body>doc {i} あ</body></html>".encode(),
        )
        for i in range(n)
    ]


def test_roundtrip_plain():
    blob = miniwarc.write_warc(_pages())
    recs = miniwarc.parse_warc(blob)
    assert len(recs) == 5
    for i, r in enumerate(recs):
        assert r.rec_type == "response"
        assert r.target_uri == f"https://h{i}.example.test/p/{i}"
        assert r.date == f"2021-03-{i + 1:02d}T08:30:00Z"
        assert r.http_status == 200
        assert r.http_content_type == "text/html; charset=utf-8"
        assert r.http_body == f"<html><body>doc {i} あ</body></html>".encode()


def test_roundtrip_gzipped_members():
    # Common Crawl layout: one gzip member per record, concatenated
    blob = miniwarc.write_warc(_pages(), gzipped=True)
    assert blob[:2] == b"\x1f\x8b"
    recs = miniwarc.parse_warc(blob)
    assert [r.target_uri for r in recs] == [p[0] for p in _pages()]
    assert all(r.http_status == 200 for r in recs)


def test_warc11_angle_bracket_uri():
    rec = miniwarc.write_record(
        "response",
        miniwarc.http_response_payload(b"x"),
        target_uri="https://a.test/",
    ).replace(
        b"WARC-Target-URI: https://a.test/",
        b"WARC-Target-URI: <https://a.test/>",
    )
    (r,) = miniwarc.parse_warc(rec)
    assert r.target_uri == "https://a.test/"


def test_non_response_records_parsed_with_type():
    info = miniwarc.write_record(
        "warcinfo", b"robots: classic\r\n", content_type="application/warc-fields"
    )
    req = miniwarc.write_record(
        "request",
        b"GET / HTTP/1.1\r\nHost: a.test\r\n\r\n",
        target_uri="https://a.test/",
        content_type="application/http; msgtype=request",
    )
    resp = miniwarc.write_record(
        "response",
        miniwarc.http_response_payload(b"body"),
        target_uri="https://a.test/",
    )
    recs = miniwarc.parse_warc(info + req + resp)
    assert [r.rec_type for r in recs] == ["warcinfo", "request", "response"]
    assert recs[2].http_body == b"body"


def test_torn_record_resync():
    """A record missing Content-Length is skipped; the walk resyncs to
    the next WARC/ marker and the following record still parses."""
    good = miniwarc.write_record(
        "response",
        miniwarc.http_response_payload(b"ok"),
        target_uri="https://good.test/",
    )
    torn = b"WARC/1.0\r\nWARC-Type: response\r\nNo-Length: x\r\n\r\n"
    recs = miniwarc.parse_warc(torn + good)
    assert [r.target_uri for r in recs] == ["https://good.test/"]
    # leading garbage before the first marker is also skipped
    recs2 = miniwarc.parse_warc(b"garbage bytes" + good)
    assert [r.target_uri for r in recs2] == ["https://good.test/"]


def test_payload_containing_marker_not_resplit():
    body = b"fake embedded\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nstill body"
    rec = miniwarc.write_record(
        "response",
        miniwarc.http_response_payload(body),
        target_uri="https://m.test/",
    )
    recs = miniwarc.parse_warc(rec)
    assert len(recs) == 1
    assert recs[0].http_body == body


def test_spark_warc_pages_source(spark):
    """mapInPandas 1->many expansion: blobs in, one row per response
    record out, with status/mime/body columns."""
    from goto_eater_crawler_spark.sources import warc as warcsrc

    blob_plain = miniwarc.write_warc(_pages(3))
    blob_gz = miniwarc.write_warc(_pages(5)[3:], gzipped=True)
    df = spark.createDataFrame(
        [(0, bytearray(blob_plain)), (1, bytearray(blob_gz))],
        "file_id long, data binary",
    )
    rows = warcsrc.warc_pages(df).orderBy("url").collect()
    assert [r["url"] for r in rows] == [p[0] for p in _pages(5)]
    assert all(r["http_status"] == 200 for r in rows)
    assert bytes(rows[0]["html"]).startswith(b"<html>")
    assert rows[0]["warc_ts"].month == 3


def test_roundtrip_property_fuzz():
    """Hypothesis: arbitrary bodies (including CRLF runs, WARC/ marker
    bytes, empty) and url/date variations round-trip byte-exactly,
    plain and gzipped."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    body = st.binary(min_size=0, max_size=300)
    seg = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789-._~/", min_size=1, max_size=30
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(seg, body), min_size=1, max_size=5), st.booleans())
    def prop(pages, gz):
        pages = [
            (f"https://fz.test/{i}/{p}", f"2022-02-{(i % 27) + 1:02d}T00:00:00Z", b)
            for i, (p, b) in enumerate(pages)
        ]
        recs = miniwarc.parse_warc(miniwarc.write_warc(pages, gzipped=gz))
        assert [(r.target_uri, r.date, r.http_body) for r in recs] == pages

    prop()


def test_warc_zst_roundtrip():
    """.warc.zst profile: per-record REAL libzstd frames, decoded by
    the engine's own RFC 8878 walk under the WARC parser."""
    from goto_eater_crawler_spark.functions import miniwarc

    pages = [
        (f"https://h{i}.test/p/{i}", f"2021-06-{i + 1:02d}T12:00:00Z",
         (f"body {i} " * 50).encode())
        for i in range(5)
    ]
    blob = miniwarc.write_warc(pages, compression="zstd")
    assert blob[:4] == b"\x28\xb5\x2f\xfd"
    recs = miniwarc.parse_warc(blob)
    assert [r.target_uri for r in recs] == [p[0] for p in pages]
    assert [r.http_body for r in recs] == [p[2] for p in pages]
    assert all(r.http_status == 200 for r in recs)


def test_warc_unknown_compression_rejected():
    from goto_eater_crawler_spark.functions import miniwarc

    try:
        miniwarc.write_warc([], compression="brotli")
        assert False, "should raise"
    except ValueError:
        pass
