"""functions/minix509 — DER/X.509 structural contracts."""

from __future__ import annotations

import pytest
from hypothesis import given
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import minix509 as x


def _cert(**kw):
    defaults = dict(
        serial=42,
        issuer_cn="ca",
        subject_cn="host",
        not_before="210101000000Z",
        not_after="220101000000Z",
        is_ca=False,
    )
    defaults.update(kw)
    return x.write_cert(**defaults)


def test_roundtrip_fields():
    got = x.parse_cert(_cert(serial=129, is_ca=True, subject_cn="h7"))
    assert got["serial"] == 129
    assert got["subject_cn"] == "h7"
    assert got["is_ca"] is True
    assert got["version"] == 3


@given(st.integers(0, 1 << 62))
def test_der_integer_roundtrip_and_sign_pad(v):
    enc = x.der_int(v)
    got, end = x.read_int(enc, 0)
    assert got == v and end == len(enc)
    raw = enc[2:]
    # X.690 §8.3.2: top bit of the magnitude must not read as sign
    assert not raw[0] & 0x80 or v == 0


def test_sign_pad_is_load_bearing():
    # 128 needs the 0x00 pad; 127 must not have one (minimal DER)
    assert x.der_int(128) == b"\x02\x02\x00\x80"
    assert x.der_int(127) == b"\x02\x01\x7f"
    with pytest.raises(x.DerError):
        x.read_int(b"\x02\x02\x00\x7f", 0)  # non-minimal


def test_long_form_length_rules():
    payload = bytes(200)
    enc = x.tlv(0x04, payload)
    assert enc[1] == 0x81 and enc[2] == 200
    tag, s, e = x.read_tlv(enc, 0)
    assert (tag, e - s) == (0x04, 200)
    # long form used for a short length is non-minimal -> rejected
    with pytest.raises(x.DerError):
        x.read_tlv(b"\x04\x81\x05" + bytes(5), 0)


def test_truncation_rejected_everywhere():
    blob = _cert()
    for cut in (1, 10, len(blob) // 2, len(blob) - 1):
        with pytest.raises(x.DerError):
            x.parse_cert(blob[:cut])


def test_ca_flag_lives_two_parse_levels_deep():
    ca, leaf = _cert(is_ca=True), _cert(is_ca=False)
    assert x.parse_cert(ca)["is_ca"] is True
    assert x.parse_cert(leaf)["is_ca"] is False
    # the two differ only inside the extension OCTET STRING
    assert len(ca) == len(leaf)


def test_spki_forces_long_form():
    # the fake key is >127 bytes, so SOME header in every cert uses
    # the long form — corrupting a long-form length byte must fail
    blob = bytearray(_cert())
    # the outer SEQUENCE is > 255 bytes -> its own header is long
    # form (0x82 + two length bytes)
    assert blob[1] in (0x81, 0x82)
    blob[2] ^= 0x40  # corrupt the long-form length
    with pytest.raises(x.DerError):
        x.parse_cert(bytes(blob))
