"""minidns (RFC 1035) wire-walk contracts: compression pointers
(including mid-name targets), loop/forward-pointer rejection,
truncation sweep, typed RDATA walks."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import minidns


def _simple(d: int = 7) -> bytes:
    return minidns.encode_response(
        txn_id=d,
        qname="www.h1.example.org",
        answers=[
            ("www.h1.example.org", minidns.TYPE_CNAME, 3600,
             "edge1.cdn.example.net"),
            ("edge1.cdn.example.net", minidns.TYPE_A, 300, "10.0.0.1"),
            ("edge1.cdn.example.net", minidns.TYPE_A, 300, "10.0.0.2"),
        ],
    )


def test_roundtrip_cname_chain():
    m = minidns.decode_message(_simple())
    assert m["qname"] == "www.h1.example.org"
    assert m["rcode"] == 0 and m["qr"] and m["aa"]
    assert [rr["type"] for rr in m["answers"]] == ["CNAME", "A", "A"]
    assert m["answers"][0]["rdata"] == "edge1.cdn.example.net"
    assert m["answers"][1]["name"] == "edge1.cdn.example.net"
    assert m["answers"][2]["rdata"] == "10.0.0.2"


def test_compression_is_emitted_and_shrinks_the_message():
    buf = _simple()
    # answer owner names and the repeated cdn suffix must be pointers
    assert any(b & 0xC0 == 0xC0 for b in buf)
    # uncompressed lower bound: every name spelled out in full
    names = ["www.h1.example.org"] * 2 + ["edge1.cdn.example.net"] * 3
    uncompressed = sum(len(n) + 2 for n in names)
    compressed_names = len(buf) - 12 - 4 - 3 * 10
    assert compressed_names < uncompressed - 30


def test_mid_name_pointer_target_decodes():
    # hand-build: question www.a.example.org, answer owner is a
    # pointer to the 'a.example.org' SUFFIX inside the question name
    # (offset 12 + 4 = label 'a'), type A
    w = bytearray()
    w += struct.pack(">6H", 1, 0x8180, 1, 1, 0, 0)
    qname_off = len(w)
    for lb in (b"www", b"a", b"example", b"org"):
        w += bytes([len(lb)]) + lb
    w += b"\x00"
    w += struct.pack(">2H", 1, 1)
    w += struct.pack(">H", 0xC000 | (qname_off + 4))  # -> 'a.example.org'
    w += struct.pack(">2HIH", 1, 1, 60, 4) + bytes([10, 1, 2, 3])
    m = minidns.decode_message(bytes(w))
    assert m["answers"][0]["name"] == "a.example.org"
    assert m["answers"][0]["rdata"] == "10.1.2.3"


def test_pointer_loop_rejected():
    w = bytearray()
    w += struct.pack(">6H", 1, 0x8180, 1, 0, 0, 0)
    # name at offset 12 is a pointer to itself
    w += struct.pack(">H", 0xC000 | 12)
    w += struct.pack(">2H", 1, 1)
    with pytest.raises(ValueError, match="forward|loop"):
        minidns.decode_message(bytes(w))


def test_forward_pointer_rejected():
    w = bytearray()
    w += struct.pack(">6H", 1, 0x8180, 1, 0, 0, 0)
    w += struct.pack(">H", 0xC000 | 20)  # points PAST itself
    w += struct.pack(">2H", 1, 1)
    w += b"\x00" * 8
    with pytest.raises(ValueError, match="forward"):
        minidns.decode_message(bytes(w))


def test_reserved_label_flag_bits_rejected():
    w = bytearray()
    w += struct.pack(">6H", 1, 0x8180, 1, 0, 0, 0)
    w += bytes([0x80]) + b"\x00"  # 0b10 flag: reserved
    w += struct.pack(">2H", 1, 1)
    with pytest.raises(ValueError, match="reserved"):
        minidns.decode_message(bytes(w))


def test_truncation_sweep_never_misdecodes():
    buf = _simple()
    for cut in range(len(buf)):
        with pytest.raises(ValueError):
            minidns.decode_message(buf[:cut])


def test_trailing_garbage_rejected():
    with pytest.raises(ValueError, match="trailing"):
        minidns.decode_message(_simple() + b"\x00")


def test_label_too_long_rejected_on_encode():
    with pytest.raises(ValueError, match="label too long"):
        minidns.encode_response(txn_id=1, qname="a" * 64 + ".org")


def test_nxdomain_soa_negative_cache():
    buf = minidns.encode_response(
        txn_id=9,
        qname="gone.example.org",
        rcode=3,
        authority=[
            ("example.org", minidns.TYPE_SOA, 3600,
             ("ns1.example.org", "hostmaster.example.org",
              2026082001, 7200, 900, 86400, 120)),
        ],
    )
    m = minidns.decode_message(buf)
    assert m["rcode"] == 3 and not m["answers"]
    soa = m["authority"][0]
    assert soa["type"] == "SOA"
    assert soa["rdata"][0] == "ns1.example.org"
    assert soa["rdata"][2] == 2026082001 and soa["rdata"][6] == 120


def test_txt_mx_aaaa_rdata_walks():
    buf = minidns.encode_response(
        txn_id=2,
        qname="example.org",
        qtype=minidns.TYPE_TXT,
        answers=[
            ("example.org", minidns.TYPE_TXT, 60, ["v=spf1 -all", "x"]),
            ("example.org", minidns.TYPE_MX, 60, (10, "mx.example.org")),
            ("example.org", minidns.TYPE_AAAA, 60, bytes(range(16))),
        ],
    )
    m = minidns.decode_message(buf)
    assert m["answers"][0]["rdata"] == ["v=spf1 -all", "x"]
    assert m["answers"][1]["rdata"] == (10, "mx.example.org")
    assert m["answers"][2]["rdata"] == bytes(range(16)).hex()


_label = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=12
).filter(lambda s: not s.startswith("-"))
_name = st.lists(_label, min_size=1, max_size=5).map(".".join)


@settings(max_examples=60, deadline=None)
@given(
    qname=_name,
    targets=st.lists(_name, min_size=0, max_size=4),
    ttl=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_roundtrip_property(qname, targets, ttl):
    answers = [(qname, minidns.TYPE_NS, ttl, t) for t in targets]
    buf = minidns.encode_response(txn_id=5, qname=qname, answers=answers)
    m = minidns.decode_message(buf)
    assert m["qname"] == qname
    assert [rr["rdata"] for rr in m["answers"]] == targets
    assert all(rr["ttl"] == ttl for rr in m["answers"])
