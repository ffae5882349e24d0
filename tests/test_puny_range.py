"""minipuny (RFC 3492) + HTTP range-reassembly contracts."""

from __future__ import annotations

import codecs

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import minipuny as pc


# RFC 3492 §7.1 official vectors (code points from the RFC)
_RFC_VECTORS = [
    # (A) Arabic (Egyptian)
    (
        [0x0644, 0x064A, 0x0647, 0x0645, 0x0627, 0x0628, 0x062A, 0x0643,
         0x0644, 0x0645, 0x0648, 0x0634, 0x0639, 0x0631, 0x0628, 0x064A,
         0x061F],
        "egbpdaj6bu4bxfgehfvwxn",
    ),
    # (B) Chinese (simplified)
    (
        [0x4ED6, 0x4EEC, 0x4E3A, 0x4EC0, 0x4E48, 0x4E0D, 0x8BF4, 0x4E2D,
         0x6587],
        "ihqwcrb4cv8a8dqg056pqjye",
    ),
    # (K) Japanese: 3<nen>B<gumi><kinpachi><sensei>
    (
        [0x0033, 0x5E74, 0x0042, 0x7D44, 0x91D1, 0x516B, 0x5148, 0x751F],
        "3B-ww4c5e180e575a65lsy2b",
    ),
    # (L) Maji<de>Koi<suru>5<byou><mae>
    (
        [0x004D, 0x0061, 0x006A, 0x0069, 0x3067, 0x004B, 0x006F, 0x0069,
         0x3059, 0x308B, 0x0035, 0x79D2, 0x524D],
        "MajiKoi5-783gue6qz075azm5e",
    ),
]


@pytest.mark.parametrize("cps,expected", _RFC_VECTORS)
def test_rfc3492_vectors_encode(cps, expected):
    s = "".join(chr(c) for c in cps)
    # RFC vectors show mixed-case basic cps; encoding preserves them
    assert pc.encode(s).lower() == expected.lower()
    assert pc.decode(expected) == s


def test_decode_case_insensitive_digits():
    assert pc.decode("EGBPDAJ6BU4BXFGEHFVWXN") == pc.decode(
        "egbpdaj6bu4bxfgehfvwxn"
    )


def test_all_basic_label():
    assert pc.encode("plain") == "plain-"
    assert pc.decode("plain-") == "plain"


def test_overflow_rejected():
    with pytest.raises(ValueError):
        pc.decode("99999999999")


@settings(max_examples=150, deadline=None)
@given(
    s=st.text(
        alphabet="abzXY09-üéñ日本語アднщλπ", min_size=1, max_size=16
    )
)
def test_stdlib_parity_property(s):
    try:
        std = codecs.encode(s, "punycode").decode("ascii")
    except UnicodeError:
        return
    assert pc.encode(s) == std
    assert pc.decode(std) == s


def test_range_overlap_mismatch_raises(spark):
    from goto_eater_crawler_spark.operators import transfer as tx

    # build a payload with conflicting overlap bytes by hand
    bd = tx._RANGE_BOUNDARY

    def part(a, b, total, body):
        return (
            b"--" + bd + b"\r\n"
            b"Content-Type: text/plain\r\n"
            + f"Content-Range: bytes {a}-{b}/{total}\r\n".encode()
            + b"\r\n" + body + b"\r\n"
        )

    good = part(0, 4, 8, b"ABCDE") + part(3, 7, 8, b"DEFGH") + (
        b"--" + bd + b"--\r\n"
    )
    bad = part(0, 4, 8, b"ABCDE") + part(3, 7, 8, b"XYFGH") + (
        b"--" + bd + b"--\r\n"
    )
    df_good = spark.createDataFrame(
        [(1, bytearray(good))], "doc_id long, payload binary"
    )
    row = tx.range_reassemble(df_good).collect()[0]
    assert row.complete and row.body == "ABCDEFGH" and row.received == 8
    df_bad = spark.createDataFrame(
        [(1, bytearray(bad))], "doc_id long, payload binary"
    )
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        tx.range_reassemble(df_bad).collect()
    assert "overlap mismatch" in str(ei.value)


def test_range_gap_flags_incomplete(spark):
    from goto_eater_crawler_spark.operators import transfer as tx

    docs = spark.createDataFrame(
        [(5,), (7,)], "doc_id long"
    )  # 5 -> gap arm, 7 -> out-of-order full arm
    rows = {
        r.doc_id: r
        for r in tx.range_reassemble(tx.synth_range_parts(docs)).collect()
    }
    assert not rows[5].complete and rows[5].body == "-"
    assert rows[5].received < rows[5].total
    assert rows[7].complete
    assert rows[7].body == "PAYLOAD-7-" * (2 + 7 % 3)
