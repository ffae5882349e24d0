"""Charset detection + transcode for crawled Japanese-web content.

The reference crawls 49 Japanese prefecture sites where scrapy's
response machinery resolves each page's encoding (HTTP header /
meta tag / chardet fallback) before any spider code runs
(scrapy TextResponse.encoding; the reference relies on it in every
parse_* callback).  A 100 TB webtext pipeline re-ingesting raw
fetched bytes needs the same step as an explicit operator: the
Japanese web is the canonical hard case (UTF-8, Shift_JIS, EUC-JP
and ISO-2022-JP all in active use).

``detect_charset`` is a deterministic mini-chardet over stdlib
codecs only:

1. escape-sequence scan: ISO-2022-JP announces itself with ESC
   sequences inside 7-bit data;
2. pure-ASCII short circuit;
3. strict trial decode of utf-8 / euc_jp / shift_jis, scored by the
   fraction of plausible text (ASCII printables + CJK blocks +
   fullwidth forms), with the classic misread artifacts penalized:
   halfwidth katakana (what EUC-JP looks like when read as
   Shift_JIS) and C1 controls.  Ties break by trial order, so the
   cascade is fully deterministic.

Scoring rather than first-success ordering is what makes the
detector honest on real bytes: most EUC-JP documents ALSO decode
strictly under Shift_JIS (as halfwidth-katakana soup), so a
first-success cascade is order-dependent; the artifact penalty is
the standard statistical-chardet trick reduced to its deterministic
core.
"""

from __future__ import annotations

TRIAL_CODECS = ("utf-8", "euc_jp", "shift_jis")


def _plausibility(text: str) -> float:
    """Score decoded text: plausible-char fraction minus artifact
    penalties, in [-5, 1]."""
    if not text:
        return 0.0
    good = 0
    half_kata = 0
    bad = 0
    for ch in text:
        cp = ord(ch)
        if 0xFF61 <= cp <= 0xFF9F:  # halfwidth katakana: misread smell
            half_kata += 1
        elif (
            0x20 <= cp < 0x7F
            or cp in (0x09, 0x0A, 0x0D)
            or 0x3000 <= cp <= 0x30FF  # CJK punct, hiragana, katakana
            or 0x4E00 <= cp <= 0x9FFF  # CJK unified ideographs
            or 0xFF01 <= cp <= 0xFF60  # fullwidth forms
        ):
            good += 1
        elif cp < 0x20 or 0x7F <= cp <= 0x9F:  # C0/C1 controls
            bad += 1
    n = len(text)
    return (good - 2 * half_kata - 4 * bad) / n


def detect_charset(data: bytes) -> str:
    """Detected charset name: 'ascii', 'iso-2022-jp', 'utf-8',
    'euc_jp', 'shift_jis', or 'binary' when nothing decodes."""
    if not data:
        return "ascii"
    if all(b < 0x80 for b in data):
        if b"\x1b$" in data or b"\x1b(" in data:
            try:
                data.decode("iso-2022-jp")
                return "iso-2022-jp"
            except UnicodeDecodeError:
                pass  # broken escape: still 7-bit, decode as ascii
        return "ascii"
    best_name, best_score = None, 0.0
    for name in TRIAL_CODECS:
        try:
            text = data.decode(name)
        except (UnicodeDecodeError, ValueError):
            continue
        score = _plausibility(text)
        if best_name is None or score > best_score:
            best_name, best_score = name, score
    return best_name if best_name is not None else "binary"


def transcode_utf8(data: bytes) -> tuple[str, str]:
    """(detected_charset, utf-8 text).  'binary' payloads raise
    UnicodeDecodeError like a strict decode would."""
    cs = detect_charset(data)
    if cs == "binary":
        raise UnicodeDecodeError(
            "charsetdetect", data, 0, 1, "no trial codec decodes"
        )
    if cs == "ascii":
        return cs, data.decode("ascii")
    return cs, data.decode(cs)
