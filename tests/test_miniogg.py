"""functions/miniogg — page walk, lacing, CRC contracts."""

from __future__ import annotations

import pytest

from goto_eater_crawler_spark.functions import miniogg as m


def _blob(**kw):
    defaults = dict(
        serial=7,
        channels=2,
        rate=44100,
        data_packets=[b"a" * 300, b"b" * 260, b"c" * 10],
        granule_per_page=1024,
    )
    defaults.update(kw)
    return m.write_ogg_vorbis(**defaults)


def test_roundtrip():
    got = m.parse_ogg(_blob())
    assert got == {
        "serial": 7,
        "channels": 2,
        "rate": 44100,
        "n_pages": 3,  # BOS + [p0,p1] + [p2]
        "n_packets": 4,
        "last_granule": 2048,
    }


def test_crc_detects_single_bit_flip_anywhere():
    blob = bytearray(_blob())
    for pos in (30, len(blob) // 2, len(blob) - 1):
        bad = bytearray(blob)
        bad[pos] ^= 0x01
        with pytest.raises(m.OggError):
            m.parse_ogg(bytes(bad))


def test_packet_length_multiple_of_255_needs_terminating_zero():
    # a 510-byte packet laces as [255, 255, 0]; dropping the 0 rule
    # would merge it with the next packet.
    got = m.parse_ogg(_blob(data_packets=[b"x" * 510, b"y" * 300]))
    assert got["n_packets"] == 3
    assert m._lacing([510]) == bytes([255, 255, 0])


def test_lost_capture_rejected():
    blob = bytearray(_blob())
    blob[0:4] = b"XggS"
    with pytest.raises(m.OggError):
        m.parse_ogg(bytes(blob))


def test_truncated_body_rejected():
    blob = _blob()
    with pytest.raises(m.OggError):
        m.parse_ogg(blob[:-3])


def test_ogg_crc_spec_vector():
    # independent property: table-driven CRC == bitwise long division
    def bitwise(data: bytes) -> int:
        r = 0
        for byte in data:
            r ^= byte << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF \
                    if r & 0x80000000 else (r << 1) & 0xFFFFFFFF
        return r

    for payload in (b"", b"OggS", bytes(range(100))):
        assert m.ogg_crc(payload) == bitwise(payload)


def test_first_packet_must_be_vorbis_id():
    page = m.write_page(1, 0, 0, [b"\x01notvorbis"], bos=True)
    with pytest.raises(m.OggError):
        m.parse_ogg(page)
