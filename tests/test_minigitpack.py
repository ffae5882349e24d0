"""minigitpack contracts: the three encodings + integrity checks."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import minigitpack as gp


def _pack():
    base = b"hello world, this is the base object content"
    delta = gp.make_delta(
        base,
        base[:6] + b"NEW" + base[6:],
        [("copy", 0, 6), ("insert", b"NEW"), ("copy", 6, len(base) - 6)],
    )
    return base, gp.build_pack(
        [
            (gp.OBJ_BLOB, base, None),
            (gp.OBJ_COMMIT, b"tree abc\n", None),
            (gp.OBJ_BLOB, delta, 0),
        ]
    )


def test_roundtrip_with_delta_resolution():
    base, pack = _pack()
    m = gp.read_pack(pack)
    assert m["n_objects"] == 3
    assert m["objects"][0]["data"] == base
    assert m["objects"][1]["type"] == gp.OBJ_COMMIT
    assert m["objects"][2]["from_delta"]
    assert m["objects"][2]["type"] == gp.OBJ_BLOB  # inherits base type
    assert m["objects"][2]["data"] == base[:6] + b"NEW" + base[6:]


def test_ofs_encoding_plus_one_rule():
    # git's own boundary: offset 128 encodes as 0x80 0x00 (NOT the
    # plain-varint 0x81 0x00); a LEB-style reader would mis-decode
    assert gp._ofs_encode(128) == b"\x80\x00"
    assert gp._ofs_decode(b"\x80\x00", 0)[0] == 128
    # 2-byte max: (0x7f+1)<<7 | 0x7f = 16511
    assert gp._ofs_decode(b"\xff\x7f", 0)[0] == 16511


@settings(max_examples=150, deadline=None)
@given(off=st.integers(min_value=1, max_value=2**28))
def test_ofs_roundtrip_property(off):
    assert gp._ofs_decode(gp._ofs_encode(off), 0)[0] == off


@settings(max_examples=100, deadline=None)
@given(size=st.integers(min_value=0, max_value=2**30))
def test_entry_header_roundtrip(size):
    raw = gp._entry_header(gp.OBJ_BLOB, size)
    t, s, pos = gp._read_entry_header(raw, 0)
    assert (t, s, pos) == (gp.OBJ_BLOB, size, len(raw))


def test_trailer_sha_verified():
    _, pack = _pack()
    bad = bytearray(pack)
    bad[13] ^= 1  # flip a byte inside the first entry
    with pytest.raises(ValueError, match="SHA-1"):
        gp.read_pack(bytes(bad))


def test_delta_size_mismatch_rejected():
    base = b"0123456789"
    delta = bytearray(
        gp.make_delta(base, base[:5], [("copy", 0, 5)])
    )
    delta[1] = 9  # lie about the target size
    with pytest.raises(ValueError, match="size mismatch"):
        gp.apply_delta(base, bytes(delta))


def test_delta_copy_overrun_rejected():
    base = b"0123"
    # hand-build: src=4, tgt=8, copy off=0 size=8
    delta = bytes([4, 8, 0x90, 8])
    with pytest.raises(ValueError, match="overruns"):
        gp.apply_delta(base, delta)


def test_delta_against_wrong_base_rejected():
    base = b"0123456789"
    delta = gp.make_delta(base, base[:5], [("copy", 0, 5)])
    with pytest.raises(ValueError, match="source size"):
        gp.apply_delta(base + b"x", delta)


def test_forward_delta_base_rejected():
    # OFS_DELTA pointing at itself (rel 0 impossible; rel beyond
    # start -> base_off negative, not a prior entry)
    base = b"abc"
    delta = gp.make_delta(base, base, [("copy", 0, 3)])
    out = bytearray(b"PACK" + struct.pack(">II", 2, 1))
    out += gp._entry_header(gp.OBJ_OFS_DELTA, len(delta))
    out += gp._ofs_encode(1000)  # far before the pack start
    out += zlib.compress(delta, 6)
    out += hashlib.sha1(bytes(out)).digest()
    with pytest.raises(ValueError, match="prior entry"):
        gp.read_pack(bytes(out))


@settings(max_examples=60, deadline=None)
@given(
    data=st.binary(min_size=1, max_size=120),
    cut=st.integers(min_value=0, max_value=119),
    ins=st.binary(min_size=1, max_size=20),
)
def test_delta_roundtrip_property(data, cut, ins):
    cut = min(cut, len(data))
    target = data[:cut] + ins + data[cut:]
    ops = []
    if cut:
        ops.append(("copy", 0, cut))
    ops.append(("insert", ins))
    if cut < len(data):
        ops.append(("copy", cut, len(data) - cut))
    delta = gp.make_delta(data, target, ops)
    assert gp.apply_delta(data, delta) == target
