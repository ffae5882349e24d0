"""functions/minico — ICO container walk contracts."""

from __future__ import annotations

import struct

import pytest

from goto_eater_crawler_spark.functions import minico as m


def test_roundtrip_mixed_payloads():
    blob = m.write_ico([(16, 16, "bmp"), (32, 64, "png")])
    got = m.parse_ico(blob)
    assert [(e["width"], e["height"], e["kind"]) for e in got] == [
        (16, 16, "bmp"),
        (32, 64, "png"),
    ]


def test_zero_means_256():
    blob = m.write_ico([(256, 256, "png")])
    # the directory byte really is 0 on the wire
    assert blob[6] == 0 and blob[7] == 0
    got = m.parse_ico(blob)
    assert (got[0]["width"], got[0]["height"]) == (256, 256)


def test_bmp_height_doubling_undone():
    blob = m.write_ico([(8, 10, "bmp")])
    # embedded BITMAPINFOHEADER stores 20
    off = struct.unpack_from("<I", blob, 6 + 12)[0]
    assert struct.unpack_from("<i", blob, off + 8)[0] == 20
    assert m.parse_ico(blob)[0]["height"] == 10


def test_declared_vs_embedded_mismatch_rejected():
    blob = bytearray(m.write_ico([(16, 16, "png")]))
    blob[6] = 17  # corrupt declared width
    with pytest.raises(m.IcoError):
        m.parse_ico(bytes(blob))


def test_not_ico_rejected():
    with pytest.raises(m.IcoError):
        m.parse_ico(b"\x00\x00\x02\x00\x01\x00" + b"\x00" * 16)  # CUR


def test_payload_overrun_rejected():
    blob = m.write_ico([(16, 16, "bmp")])
    with pytest.raises(m.IcoError):
        m.parse_ico(blob[:-4])
