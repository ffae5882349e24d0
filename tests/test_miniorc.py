"""miniorc: own ORC protobuf footer walk vs real files written by
pyarrow's Apache ORC writer, across all four supported codecs."""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.orc as orc
import pytest

from goto_eater_crawler_spark.functions import miniorc


def _blob(table, compression="UNCOMPRESSED", **kw):
    buf = io.BytesIO()
    orc.write_table(table, buf, compression=compression, **kw)
    return buf.getvalue()


_T = pa.table(
    {
        "a": pa.array([1, 2, 3, None, -7], pa.int64()),
        "b": pa.array([1.5, 2.5, -0.25, 3.5, 0.0], pa.float64()),
        "s": pa.array(["x", "yy", "zzz", "a", None], pa.string()),
    }
)


@pytest.mark.parametrize(
    "comp", ["UNCOMPRESSED", "ZLIB", "SNAPPY", "ZSTD", "LZ4"]
)
def test_footer_stats_match_data_all_codecs(comp):
    ft = miniorc.parse_orc_tail(_blob(_T, comp))
    assert ft.num_rows == 5
    assert ft.column_names == ["a", "b", "s"]
    assert ft.column_kinds == ["STRUCT", "LONG", "DOUBLE", "STRING"]
    assert ft.compression == ("NONE" if comp == "UNCOMPRESSED" else comp)
    a, b, s = ft.statistics[1], ft.statistics[2], ft.statistics[3]
    # int stats are ZIGZAG sint64 — negatives are the load-bearing case
    assert (a.minimum, a.maximum, a.total, a.num_values, a.has_null) == (
        -7, 3, -1, 4, True,
    )
    assert (b.minimum, b.maximum, b.total) == (-0.25, 3.5, 7.25)
    # string sum = total value bytes
    assert (s.minimum, s.maximum, s.total, s.num_values) == ("a", "zzz", 7, 4)


def test_footer_matches_pyarrow_reader_metadata():
    blob = _blob(_T, "ZLIB")
    ours = miniorc.parse_orc_tail(blob)
    theirs = orc.ORCFile(io.BytesIO(blob))
    assert ours.num_rows == theirs.nrows
    assert len(ours.stripes) == theirs.nstripes
    assert ours.compression == theirs.compression
    assert sum(s.num_rows for s in ours.stripes) == theirs.nrows


def test_multi_stripe_counts():
    # stripe splits track UNCOMPRESSED buffer size — sequential ints
    # RLE away to nothing, so use incompressible values
    import random

    rng = random.Random(7)
    n = 120_000
    # 40-bit values: still incompressible, but the int64 SUM cannot
    # overflow (the writer drops IntegerStatistics.sum on overflow)
    vals = [rng.getrandbits(40) for _ in range(n)]
    big = pa.table(
        {
            "a": pa.array(vals, pa.int64()),
            "s": pa.array(["%032x" % rng.getrandbits(128) for _ in range(n)]),
        }
    )
    blob = _blob(big, "UNCOMPRESSED", stripe_size=1024 * 1024)
    ft = miniorc.parse_orc_tail(blob)
    assert ft.num_rows == n
    assert len(ft.stripes) > 1
    assert sum(s.num_rows for s in ft.stripes) == n
    assert ft.statistics[1].minimum == min(vals)
    assert ft.statistics[1].maximum == max(vals)
    assert ft.statistics[1].total == sum(vals)


def test_tail_slice_is_sufficient():
    # the ranged-GET contract: only the tail bytes are needed
    blob = _blob(_T, "ZSTD")
    full = miniorc.parse_orc_tail(blob)
    # a generous tail window (footer + postscript + len byte)
    tail = blob[-1024:] if len(blob) > 1024 else blob
    again = miniorc.parse_orc_tail(tail)
    assert again.num_rows == full.num_rows
    assert [s.minimum for s in again.statistics] == [
        s.minimum for s in full.statistics
    ]


def test_bad_magic_and_truncation_raise():
    blob = bytearray(_blob(_T, "ZLIB"))
    with pytest.raises(miniorc.OrcError):
        miniorc.parse_orc_tail(b"\x00\x01\x02\x03")
    ps_len = blob[-1]
    blob[-2] ^= 0xFF  # corrupt inside the postscript
    with pytest.raises(miniorc.OrcError):
        miniorc.parse_orc_tail(bytes(blob))
    assert ps_len > 0


def test_zigzag_and_varint_primitives():
    assert miniorc._zigzag(0) == 0
    assert miniorc._zigzag(1) == -1
    assert miniorc._zigzag(2) == 1
    assert miniorc._zigzag(4294967294) == 2147483647
    data = bytes([0xAC, 0x02])  # 300
    assert miniorc._uvarint(data, 0) == (300, 2)
    with pytest.raises(miniorc.OrcError):
        miniorc._uvarint(bytes([0x80] * 11), 0)
