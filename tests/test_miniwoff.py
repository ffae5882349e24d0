"""miniwoff (WOFF 1.0) container contracts."""

from __future__ import annotations

import struct
import zlib

import pytest

from goto_eater_crawler_spark.functions import miniwoff as wf


def _font():
    return wf.build_woff(
        [
            (b"cmap", b"abcabcabc" * 30),
            (b"glyf", bytes(range(256))[:50]),
            (b"name", b"Family Name " * 8),
        ],
        wf.FLAVOR_TTF,
    )


def test_roundtrip_and_compression_rule():
    m = wf.read_woff(_font())
    assert m["flavor"] == "ttf" and m["n_tables"] == 3
    by_tag = {t["tag"]: t for t in m["tables"]}
    assert by_tag["cmap"]["compressed"]
    assert not by_tag["glyf"]["compressed"]  # high entropy stays raw
    assert by_tag["name"]["compressed"]
    assert by_tag["cmap"]["data"] == b"abcabcabc" * 30


def test_checksum_verified():
    blob = bytearray(_font())
    # flip a byte inside the RAW glyf table's stored data (directory
    # entry 1 gives its offset; padding bytes would not be read)
    off = struct.unpack_from(">I", blob, 44 + 20 + 4)[0]
    blob[off] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        wf.read_woff(bytes(blob))


def test_total_sfnt_size_verified():
    blob = bytearray(_font())
    struct.pack_into(">I", blob, 16, 99999)
    with pytest.raises(ValueError, match="totalSfntSize"):
        wf.read_woff(bytes(blob))


def test_file_length_verified():
    blob = _font()
    with pytest.raises(ValueError, match="length"):
        wf.read_woff(blob + b"\x00")


def test_comp_exceeding_orig_rejected():
    blob = bytearray(_font())
    # claim compLength = origLength + 1 on the RAW glyf table (its
    # stored data is followed by more file, so no overrun fires
    # first)
    entry = 44 + 20
    olen = struct.unpack_from(">I", blob, entry + 12)[0]
    struct.pack_into(">I", blob, entry + 8, olen + 1)
    with pytest.raises(ValueError, match="compLength"):
        wf.read_woff(bytes(blob))


def test_cff_flavor():
    m = wf.read_woff(
        wf.build_woff([(b"CFF ", b"x" * 40)], wf.FLAVOR_CFF)
    )
    assert m["flavor"] == "cff"
    assert m["tables"][0]["tag"] == "CFF "


def test_sfnt_checksum_is_padded_be_u32_sum():
    data = b"\x01\x00\x00\x00\x02"  # pads to 8 bytes
    assert wf._checksum(data) == 0x01000000 + 0x02000000


def test_decompressed_length_must_match_orig():
    blob = bytearray(_font())
    # shrink origLength of the compressed cmap by 1
    olen = struct.unpack_from(">I", blob, 44 + 12)[0]
    struct.pack_into(">I", blob, 44 + 12, olen - 1)
    with pytest.raises(ValueError):
        wf.read_woff(bytes(blob))
