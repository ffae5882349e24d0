"""Avro OCF codec (functions/miniavro.py) — Avro 1.11 spec.

No Avro library exists in this sandbox, so the encoder is pinned by
the SPEC'S OWN published vectors (the zigzag table from the Avro
specification's binary-encoding section) and hostile structural
cases; the deflate path is pinned against REAL zlib output.
"""

from __future__ import annotations

import pytest
from hypothesis import given
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import miniavro

SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
    ],
}


def test_zigzag_spec_vectors():
    # the table published in the Avro spec (binary encoding, long)
    import io

    vectors = {
        0: b"\x00",
        -1: b"\x01",
        1: b"\x02",
        -2: b"\x03",
        2: b"\x04",
        -64: b"\x7f",
        64: b"\x80\x01",
        8192: b"\x80\x80\x01",
        -8193: b"\x81\x80\x01",
    }
    for n, enc in vectors.items():
        out = io.BytesIO()
        miniavro.write_long(n, out)
        assert out.getvalue() == enc, n
        got, pos = miniavro.read_long(enc, 0)
        assert (got, pos) == (n, len(enc))


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_long_roundtrip(n):
    import io

    out = io.BytesIO()
    miniavro.write_long(n, out)
    got, _ = miniavro.read_long(out.getvalue(), 0)
    assert got == n


def _recs(n):
    return [
        {"a": i * 1000 - 7, "s": f"s{i}-é", "d": i / 8.0, "b": i % 3 == 0}
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip_multi_block(codec):
    recs = _recs(100)
    blob = miniavro.write_ocf(
        recs, SCHEMA, codec=codec, sync=b"\x42" * 16, records_per_block=16
    )
    schema, got = miniavro.read_ocf(blob)
    assert schema == SCHEMA
    assert got == recs
    assert blob[:4] == b"Obj\x01"


def test_sync_corruption_detected():
    blob = bytearray(
        miniavro.write_ocf(_recs(40), SCHEMA, sync=b"\x42" * 16, records_per_block=8)
    )
    # flip a byte inside the SECOND block's trailing sync marker
    idx = blob.index(b"\x42" * 16, 5)  # first sync (header)
    idx = blob.index(b"\x42" * 16, idx + 16)  # block 1 sync
    idx = blob.index(b"\x42" * 16, idx + 16)  # block 2 sync
    blob[idx + 3] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        miniavro.read_ocf(bytes(blob))


def test_deterministic_output():
    a = miniavro.write_ocf(_recs(10), SCHEMA, sync=b"\x01" * 16)
    b = miniavro.write_ocf(_recs(10), SCHEMA, sync=b"\x01" * 16)
    assert a == b


def test_unsupported_type_rejected():
    bad = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": {"type": "array", "items": "long"}}],
    }
    with pytest.raises(ValueError, match="primitive"):
        miniavro.write_ocf([{"x": [1]}], bad)


def test_empty_file_roundtrip():
    blob = miniavro.write_ocf([], SCHEMA, sync=b"\x00" * 16)
    _, got = miniavro.read_ocf(blob)
    assert got == []
