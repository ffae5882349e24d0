"""Mini-chardet contract: deterministic detection of the four
wild-Japanese-web encodings, the EUC-read-as-SJIS artifact class
(halfwidth-katakana penalty), ASCII/ISO-2022 escape handling, and
strict transcode-to-UTF-8 round trips.

Reference analogue: scrapy TextResponse.encoding resolves every
response's charset before the reference's parse_* callbacks run;
this operator is that stage made explicit for raw-bytes re-ingest.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goto_eater_crawler_spark.functions import charsetdetect as cd

_JP = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x3041, max_codepoint=0x3093),
        st.characters(min_codepoint=0x30A1, max_codepoint=0x30F3),
        st.sampled_from("、。日本語東京大阪店営業時間 0123abc"),
    ),
    min_size=8,
    max_size=120,
)


@given(_JP, st.sampled_from(cd.TRIAL_CODECS + ("iso-2022-jp",)))
@settings(max_examples=120, deadline=None)
def test_detect_japanese_roundtrip(text, enc):
    try:
        data = text.encode(enc)
    except UnicodeEncodeError:
        return  # char outside JIS X 0208 for the legacy codec
    got = cd.detect_charset(data)
    if all(b < 0x80 for b in data) and enc != "iso-2022-jp":
        assert got == "ascii"
        return
    assert got == enc
    cs, out = cd.transcode_utf8(data)
    assert cs == got and out == text


def test_euc_vs_sjis_disambiguation():
    # the classic artifact: EUC-JP bytes whose trail bytes land in
    # 0xA1-0xDF decode strictly under Shift_JIS as halfwidth
    # katakana — scoring must reject that reading. Hiragana
    # U+3041..U+307E map to EUC 0xA4 0xA1..0xDE: every byte is a
    # valid SJIS single-byte char, so the stream is truly ambiguous.
    text = "".join(chr(0x3041 + k) for k in range(0x3E))
    euc = text.encode("euc_jp")
    misread = euc.decode("shift_jis")  # strictly decodable
    assert all(0xFF61 <= ord(c) <= 0xFF9F for c in misread)
    assert cd.detect_charset(euc) == "euc_jp"
    sjis = text.encode("shift_jis")
    assert cd.detect_charset(sjis) == "shift_jis"


def test_ascii_and_escape_paths():
    assert cd.detect_charset(b"") == "ascii"
    assert cd.detect_charset(b"hello, world\n") == "ascii"
    assert cd.detect_charset("漢字".encode("iso-2022-jp")) == "iso-2022-jp"


def test_binary_raises_on_transcode():
    blob = bytes([0x82, 0x00, 0xFE, 0xFF, 0x80, 0x81]) * 3
    assert cd.detect_charset(blob) == "binary"
    with pytest.raises(UnicodeDecodeError):
        cd.transcode_utf8(blob)


def test_synth_class_deterministic():
    # the oracle-gated synth class end to end (operators/charset.py)
    rnd = random.Random(1)
    for _ in range(50):
        d = rnd.randrange(0, 10_000)
        n = 20 + d % 31
        text = "".join(
            chr(0x3042 + (7 * d + 13 * k) % 81) for k in range(n)
        )
        enc = ("utf-8", "shift_jis", "euc_jp", "iso-2022-jp")[d % 4]
        cs, out = cd.transcode_utf8(text.encode(enc))
        assert cs == enc and out == text
        assert len(out.encode("utf-8")) == 3 * n


def test_nfkc_synth_closed_form():
    # mirrors operators/charset.synth_mixed_width_docs +
    # nfkc_normalize_sql: the oracle's reconstruction must equal
    # Python's NFKC for the synth class
    import unicodedata

    for d in (0, 1, 6, 41, 997, 12345):
        m, n = 5 + d % 7, 3 + d % 5
        a = "".join(chr(0xFF01 + (3 * d + 5 * j) % 94) for j in range(m))
        c = "".join(chr(0x3042 + (d + k) % 81) for k in range(n))
        raw = a + "　ｶﾞ①㍿" + c
        norm = unicodedata.normalize("NFKC", raw)
        exp = "".join(
            chr(0x21 + (3 * d + 5 * j) % 94) for j in range(m)
        ) + " ガ1株式会社" + c
        assert norm == exp
        assert len(raw) == m + 5 + n and len(norm) == m + 7 + n
        assert sum(1 for ch in norm if ord(ch) < 0x80) == m + 2


def test_idn_to_ascii():
    from goto_eater_crawler_spark.operators.charset import (
        SYNTH_IDN_HOSTS,
        idn_to_ascii,
    )

    for raw, expect in SYNTH_IDN_HOSTS:
        assert idn_to_ascii(raw) == expect
        # idempotent on the ASCII image
        assert idn_to_ascii(expect) == expect
    assert idn_to_ascii("MiXeD.Example.COM") == "mixed.example.com"


@given(st.binary(max_size=400))
@settings(max_examples=150, deadline=None)
def test_detect_total_on_arbitrary_bytes(blob):
    # the detector is a total function: any byte string classifies
    # without raising, and non-'binary' verdicts strictly decode
    cs = cd.detect_charset(blob)
    assert cs in ("ascii", "binary", "iso-2022-jp", "utf-8", "euc_jp",
                  "shift_jis")
    if cs == "binary":
        with pytest.raises(UnicodeDecodeError):
            cd.transcode_utf8(blob)
    else:
        got, text = cd.transcode_utf8(blob)
        assert got == cs and isinstance(text, str)
