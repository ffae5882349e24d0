"""Charset detection / transcode operators for raw fetched bytes.

The reference's scrapy stack resolves every response's encoding
before spider callbacks run (TextResponse.encoding — header, meta
tag, then chardet); these operators give the 100 TB re-ingest
pipeline the same stage as an explicit, testable Spark operator over
a (doc_id, payload binary) relation: detect the charset with the
deterministic mini-chardet in functions/charsetdetect.py, transcode
to UTF-8, and report per-doc stats the DuckDB oracle can state
closed-form.

Scale shape: one Arrow-batched Python stage (mapInPandas — codec
work is genuinely Python), no shuffle: detection and transcode are
row-local, so the operator pipelines with the scan and any
downstream native exprs stay WholeStageCodegen.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions import charsetdetect

#: doc_id % 4 -> the encoding the synthesizer writes
SYNTH_ENCODINGS = ("utf-8", "shift_jis", "euc_jp", "iso-2022-jp")


def synth_encoded_docs(docs: DataFrame, mod: int = 5) -> DataFrame:
    """(doc_id, payload) — deterministic Japanese text (hiragana run,
    JIS X 0208 row 4 so every trial codec can represent it) encoded
    in one of the four wild-web encodings by doc_id:

    - n = 20 + d % 31 chars, char k = chr(0x3042 + (7d + 13k) % 81)
    - encoding = SYNTH_ENCODINGS[d % 4]

    Every property of the decoded text (char count, code-point sum,
    UTF-8 byte length = 3n) is closed-form in doc_id."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 20 + d % 31
                text = "".join(
                    chr(0x3042 + (7 * d + 13 * k) % 81) for k in range(n)
                )
                ids.append(d)
                payloads.append(text.encode(SYNTH_ENCODINGS[d % 4]))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, payload binary")
    )


def charset_transcode_stats(raw: DataFrame) -> DataFrame:
    """(doc_id, payload) -> (doc_id, charset, n_chars, cp_sum,
    utf8_len): detect, transcode to UTF-8, and report the decoded
    char count, code-point sum, and re-encoded UTF-8 byte length.
    Undetectable payloads yield charset='binary' with null stats."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "charset": [], "n_chars": [],
                "cp_sum": [], "utf8_len": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                try:
                    cs, text = charsetdetect.transcode_utf8(bytes(payload))
                except UnicodeDecodeError:
                    out["charset"].append("binary")
                    out["n_chars"].append(None)
                    out["cp_sum"].append(None)
                    out["utf8_len"].append(None)
                    continue
                out["charset"].append(cs)
                out["n_chars"].append(len(text))
                out["cp_sum"].append(sum(map(ord, text)))
                out["utf8_len"].append(len(text.encode("utf-8")))
            yield pd.DataFrame(out)

    return raw.select("doc_id", "payload").mapInPandas(
        batches,
        schema=(
            "doc_id long, charset string, n_chars long, "
            "cp_sum long, utf8_len long"
        ),
    )


def charset_transcode_sql(mod: int = 5) -> str:
    """Closed-form oracle for
    charset_transcode_stats(synth_encoded_docs): detection must name
    exactly the encoding the synthesizer chose, and the decoded text
    stats are pure functions of doc_id (hiragana is 3 UTF-8 bytes
    per char)."""
    return f"""
    SELECT doc_id,
           CASE doc_id % 4 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'shift_jis'
                WHEN 2 THEN 'euc_jp' ELSE 'iso-2022-jp' END AS charset,
           CAST(20 + doc_id % 31 AS BIGINT) AS n_chars,
           (SELECT CAST(SUM(12354 + (7 * doc_id + 13 * u.k) % 81) AS BIGINT)
            FROM (SELECT unnest(range(20 + doc_id % 31)) AS k) u) AS cp_sum,
           CAST(3 * (20 + doc_id % 31) AS BIGINT) AS utf8_len
    FROM documents WHERE doc_id % {mod} = 0
    """


def synth_mixed_width_docs(docs: DataFrame, mod: int = 6) -> DataFrame:
    """(doc_id, raw) — deterministic Japanese-web text with the
    classic width/compatibility mess NFKC exists for: a fullwidth
    ASCII run (chars 0xFF01 + (3d + 5j) % 94, m = 5 + d % 7 of
    them), then ideographic space + halfwidth katakana with dakuten
    (``ｶﾞ``) + circled digit ``①`` + square ligature ``㍿``, then an
    unchanged hiragana run (chr(0x3042 + (d + k) % 81),
    n = 3 + d % 5).  The NFKC image of every segment is closed-form
    in doc_id (fullwidth -> cp - 0xFEE0; the fixed middle becomes
    ``' ガ1株式会社'``; hiragana is NFKC-invariant)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, raws = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                a = "".join(
                    chr(0xFF01 + (3 * d + 5 * j) % 94)
                    for j in range(5 + d % 7)
                )
                c = "".join(
                    chr(0x3042 + (d + k) % 81) for k in range(3 + d % 5)
                )
                ids.append(d)
                raws.append(a + "　ｶﾞ①㍿" + c)
            yield pd.DataFrame({"doc_id": ids, "raw": raws})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, raw string")
    )


def nfkc_normalize_stats(df: DataFrame, col: str = "raw") -> DataFrame:
    """NFKC-normalize a text column (the standard Japanese-webtext
    width/compatibility fold: fullwidth ASCII -> ASCII, halfwidth
    katakana + dakuten -> composed katakana, compatibility
    ligatures expanded) and report per-row stats: (doc_id,
    normalized, n_in, n_out, n_ascii, cp_sum).  Row-local Python
    stage (unicodedata is genuinely Python); no shuffle."""
    import unicodedata

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "normalized": [], "n_in": [], "n_out": [],
                "n_ascii": [], "cp_sum": [],
            }
            for doc_id, raw in zip(pdf["doc_id"], pdf[col]):
                norm = unicodedata.normalize("NFKC", str(raw))
                out["doc_id"].append(int(doc_id))
                out["normalized"].append(norm)
                out["n_in"].append(len(str(raw)))
                out["n_out"].append(len(norm))
                out["n_ascii"].append(
                    sum(1 for ch in norm if ord(ch) < 0x80))
                out["cp_sum"].append(sum(map(ord, norm)))
            yield pd.DataFrame(out)

    return df.select("doc_id", col).mapInPandas(
        batches,
        schema=(
            "doc_id long, normalized string, n_in long, n_out long, "
            "n_ascii long, cp_sum long"
        ),
    )


# NFKC image of the fixed middle segment '　ｶﾞ①㍿' -> ' ガ1株式会社'
_NFKC_MID_CPSUM = 0x20 + 0x30AC + 0x31 + 0x682A + 0x5F0F + 0x4F1A + 0x793E
_NFKC_MID_STR = " ガ1株式会社"


def nfkc_normalize_sql(mod: int = 6) -> str:
    """Closed-form oracle for
    nfkc_normalize_stats(synth_mixed_width_docs): the normalized
    string and every stat are pure functions of doc_id, including
    the normalized text itself (DuckDB chr()/string_agg over a
    range rebuilds both variable runs)."""
    return f"""
    SELECT doc_id,
           (SELECT string_agg(chr(CAST(33 + (3 * doc_id + 5 * u.j) % 94 AS INTEGER)), ''
                              ORDER BY u.j)
            FROM (SELECT unnest(range(5 + doc_id % 7)) AS j) u)
           || '{_NFKC_MID_STR}' ||
           (SELECT string_agg(chr(CAST(12354 + (doc_id + u.k) % 81 AS INTEGER)), ''
                              ORDER BY u.k)
            FROM (SELECT unnest(range(3 + doc_id % 5)) AS k) u)
             AS normalized,
           CAST((5 + doc_id % 7) + 5 + (3 + doc_id % 5) AS BIGINT) AS n_in,
           CAST((5 + doc_id % 7) + 7 + (3 + doc_id % 5) AS BIGINT) AS n_out,
           CAST((5 + doc_id % 7) + 2 AS BIGINT) AS n_ascii,
           (SELECT CAST(SUM(33 + (3 * doc_id + 5 * u.j) % 94) AS BIGINT)
            FROM (SELECT unnest(range(5 + doc_id % 7)) AS j) u)
           + {_NFKC_MID_CPSUM} +
           (SELECT CAST(SUM(12354 + (doc_id + u.k) % 81) AS BIGINT)
            FROM (SELECT unnest(range(3 + doc_id % 5)) AS k) u)
             AS cp_sum
    FROM documents WHERE doc_id % {mod} = 0
    """


# --- IDN host canonicalization ---------------------------------------------
# Japanese-web URLs carry internationalized hostnames; the frontier's
# canonical URL identity must fold them to punycode (RFC 3490 IDNA,
# via the stdlib codec) or the same host crawls twice under two
# spellings.

#: doc_id % 4 -> the hostname the synthesizer writes (3 IDN + 1 pure
#: ASCII control), with their RFC 3490 ToASCII images for the oracle
SYNTH_IDN_HOSTS = (
    ("グルメ.example.jp", "xn--qck4e3a.example.jp"),
    ("東京.example.jp", "xn--1lqs71d.example.jp"),
    ("ラーメン屋.test", "xn--4dkp5a8a7137b.test"),
    ("plain.example.com", "plain.example.com"),
)


def idn_to_ascii(host: str) -> str:
    """RFC 3490 ToASCII per label (stdlib idna codec). The stdlib
    fast-path skips nameprep for pure-ASCII labels, so case-fold
    those explicitly (hostnames compare case-insensitively,
    RFC 4343)."""
    return ".".join(
        (lbl.lower() if lbl.isascii() else
         lbl.encode("idna").decode("ascii"))
        for lbl in host.split(".")
    )


def synth_idn_urls(docs: DataFrame, mod: int = 7) -> DataFrame:
    """(doc_id, url) — https URLs whose hostname cycles through
    SYNTH_IDN_HOSTS by doc_id % 4, path /doc/{doc_id}."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, urls = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ids.append(d)
                urls.append(
                    f"https://{SYNTH_IDN_HOSTS[d % 4][0]}/doc/{d}"
                )
            yield pd.DataFrame({"doc_id": ids, "url": urls})

    return (
        docs.filter(f"doc_id % {mod} = 0")
        .select("doc_id")
        .mapInPandas(batches, schema="doc_id long, url string")
    )


def idn_canonicalize(urls: DataFrame, col: str = "url") -> DataFrame:
    """(doc_id, url) -> (doc_id, url_ascii, host_ascii, changed):
    fold the hostname to its IDNA ASCII form, leaving scheme and
    path untouched. Row-local Python stage (the punycode codec is
    genuinely Python), no shuffle."""
    from urllib.parse import urlsplit, urlunsplit

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "url_ascii": [], "host_ascii": [],
                   "changed": []}
            for doc_id, url in zip(pdf["doc_id"], pdf[col]):
                parts = urlsplit(str(url))
                host = idn_to_ascii(parts.hostname or "")
                netloc = host
                if parts.port is not None:
                    netloc = f"{host}:{parts.port}"
                fixed = urlunsplit(
                    (parts.scheme, netloc, parts.path, parts.query,
                     parts.fragment)
                )
                out["doc_id"].append(int(doc_id))
                out["url_ascii"].append(fixed)
                out["host_ascii"].append(host)
                out["changed"].append(fixed != str(url))
            yield pd.DataFrame(out)

    return urls.select("doc_id", col).mapInPandas(
        batches,
        schema=(
            "doc_id long, url_ascii string, host_ascii string, "
            "changed boolean"
        ),
    )


def idn_canonicalize_sql(mod: int = 7) -> str:
    """Closed-form oracle for idn_canonicalize(synth_idn_urls): the
    four hostnames' ToASCII images are fixed public constants of the
    RFC 3490 algorithm."""
    case_host = " ".join(
        f"WHEN {i} THEN '{ascii_h}'"
        for i, (_, ascii_h) in enumerate(SYNTH_IDN_HOSTS)
    )
    return f"""
    SELECT doc_id,
           'https://' || CASE doc_id % 4 {case_host} END
             || '/doc/' || CAST(doc_id AS VARCHAR) AS url_ascii,
           CASE doc_id % 4 {case_host} END AS host_ascii,
           doc_id % 4 <> 3 AS changed
    FROM documents WHERE doc_id % {mod} = 0
    """


# ---------------------------------------------------------------------------
# Punycode (RFC 3492) — the OWN bootstring walk under the IDN fold
# above (which uses the stdlib codec); xn-- labels decode back to
# unicode through functions/minipuny's adaptive-bias decoder.
# ---------------------------------------------------------------------------

PUNY_CHARS = ["é", "ü", "ñ", "日", "本", "ア"]


def synth_puny_labels(docs: "DataFrame") -> "DataFrame":
    """(doc_id, ascii_label) — xn-- hostname labels whose unicode
    form mixes basic and extended code points; odd docs carry TWO
    extended cps so insertion order and bias adaptation do real
    work."""
    import pandas as pd

    from ..functions import minipuny

    def batches(it):
        for pdf in it:
            ids, labels = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                uni = f"p{d % 3}" + PUNY_CHARS[d % 6]
                if d % 2:
                    uni += "m" + PUNY_CHARS[(d + 1) % 6]
                uni += f"s{d % 5}"
                ids.append(d)
                labels.append("xn--" + minipuny.encode(uni))
            yield pd.DataFrame({"doc_id": ids, "ascii_label": labels})

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, ascii_label string"
    )


def puny_decode(labels: "DataFrame") -> "DataFrame":
    """(doc_id, ascii_label) -> decoded unicode label + basic/
    extended code-point counts, through the OWN RFC 3492 decoder.
    One Arrow map stage, no shuffle."""
    import pandas as pd

    from ..functions import minipuny

    def parse(it):
        for pdf in it:
            rows = []
            for d, lbl in zip(pdf["doc_id"], pdf["ascii_label"]):
                if not lbl.startswith("xn--"):
                    raise ValueError(f"not an IDNA label: {lbl!r}")
                uni = minipuny.decode(lbl[4:])
                rows.append(
                    (
                        int(d),
                        uni,
                        sum(1 for c in uni if ord(c) < 128),
                        sum(1 for c in uni if ord(c) >= 128),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "uni_label", "n_basic", "n_extended"],
            )

    return labels.mapInPandas(
        parse,
        schema=(
            "doc_id long, uni_label string, n_basic int, n_extended int"
        ),
    )
