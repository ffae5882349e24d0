"""minisst (LevelDB block-based SSTable) — format rules + tampering
rejections + hypothesis roundtrip."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import minisst
from goto_eater_crawler_spark.functions.minisnappy import crc32c, mask_crc


def _pairs(n, pre="k"):
    return [
        (f"{pre}{i:05d}".encode(), f"v{i}".encode()) for i in range(n)
    ]


def test_roundtrip_multi_block():
    p = _pairs(30)
    m = minisst.parse_sst(minisst.build_sst(p))
    assert m["pairs"] == p
    assert m["n_blocks"] == 4
    assert m["n_compressed"] == 2  # every other block snappy'd
    # 3 full blocks of 8 (2 restarts each) + last block of 6 (2)
    assert m["n_restarts"] == 8


def test_prefix_compression_is_real():
    # long shared prefixes must shrink the file vs no sharing
    p = [(b"commonprefix/" + bytes([65 + i]), b"v") for i in range(8)]
    blob = minisst.build_sst(p, compress_every=10**9)
    assert len(blob) < sum(len(k) + len(v) for k, v in p) + 200
    assert minisst.parse_sst(blob)["pairs"] == p


def test_builder_rejects_unsorted():
    with pytest.raises(minisst.SstError, match="ascend"):
        minisst.build_sst([(b"b", b""), (b"a", b"")])


def test_bad_magic_rejected():
    blob = bytearray(minisst.build_sst(_pairs(5)))
    blob[-1] ^= 0xFF
    with pytest.raises(minisst.SstError, match="magic"):
        minisst.parse_sst(bytes(blob))


def test_crc_tamper_rejected():
    blob = bytearray(minisst.build_sst(_pairs(20)))
    blob[3] ^= 0x01  # flip a byte inside the first data block
    with pytest.raises(minisst.SstError, match="crc"):
        minisst.parse_sst(bytes(blob))


def test_unmasked_crc_rejected():
    # a writer that stores the RAW crc32c (mask skipped) must fail:
    # rebuild the first block trailer with the unmasked value
    p = _pairs(5)
    blob = bytearray(minisst.build_sst(p, compress_every=10**9))
    block = minisst._build_block(p, 4)
    raw = crc32c(block + b"\x00")
    assert mask_crc(raw) != raw
    blob[len(block) + 1 : len(block) + 5] = struct.pack("<I", raw)
    with pytest.raises(minisst.SstError, match="crc"):
        minisst.parse_sst(bytes(blob))


def test_nonzero_shared_at_restart_rejected():
    # hand-build a block whose single restart entry claims shared=2
    bad = (
        minisst.put_varint(2)
        + minisst.put_varint(1)
        + minisst.put_varint(0)
        + b"x"
        + struct.pack("<I", 0)
        + struct.pack("<I", 1)
    )
    with pytest.raises(minisst.SstError, match="restart"):
        minisst._block_entries(bad)


def test_truncated_footer_rejected():
    with pytest.raises(minisst.SstError, match="footer"):
        minisst.parse_sst(b"short")


def test_varint_roundtrip_leb128():
    # little-endian 7-bit: 300 = 0xAC 0x02 (opposite of QUIC's BE)
    assert minisst.put_varint(300) == b"\xac\x02"
    assert minisst.get_varint(b"\xac\x02", 0) == (300, 2)
    with pytest.raises(minisst.SstError, match="truncated"):
        minisst.get_varint(b"\xac", 0)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.binary(min_size=1, max_size=20),
                  st.binary(max_size=30)),
        min_size=1, max_size=40, unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=6),
)
def test_roundtrip_fuzz(items, block_entries, restart_interval):
    pairs = sorted(items, key=lambda t: t[0])
    blob = minisst.build_sst(
        pairs,
        block_entries=block_entries,
        restart_interval=restart_interval,
    )
    assert minisst.parse_sst(blob)["pairs"] == pairs
