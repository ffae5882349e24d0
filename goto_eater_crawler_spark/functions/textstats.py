"""Text analysis over the ``documents`` table — language ID heuristic,
quality scoring, token counting, document fingerprinting.

All pure native column expressions (WholeStageCodegen end to end); each
has an exactly-equivalent SQL form used by the DuckDB oracle, so the
two engines agree bit-for-bit. These are the per-document map stages a
100 TB training-data pipeline runs before dedup/filtering; at scale
they pipeline with the parquet scan — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# language markers: tiny per-language stopword lists; prediction =
# argmax of marker hit counts with a deterministic tie order.
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "nicht"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
    "zh": ["的", "是", "了"],
}
_TIE_ORDER = ["en", "de", "fr", "es", "zh"]


def token_count_col(text: Column) -> Column:
    """Whitespace token count. '' -> 1 ([''] after split) to stay
    aligned with DuckDB string_split_regex semantics."""
    return F.size(F.split(F.trim(text), r"\s+"))


def token_count_sql(expr: str) -> str:
    return f"len(string_split_regex(trim({expr}), '\\s+'))"


def _marker_count(text: Column, word: str) -> Column:
    # occurrences of ' word ' in ' text ' via length/replace arithmetic
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def _marker_count_sql(expr: str, word: str) -> str:
    padded = f"(' ' || lower({expr}) || ' ')"
    needle = f" {word} "
    return (
        f"CAST((length({padded}) - length(replace({padded}, '{needle}', '')))"
        f" / {len(needle)} AS INT)"
    )


def lang_score_col(text: Column, lang: str) -> Column:
    s = None
    for w in LANG_MARKERS[lang]:
        c = _marker_count(text, w)
        s = c if s is None else s + c
    return s


def lang_pred_col(text: Column) -> Column:
    """argmax over language marker scores, ties by _TIE_ORDER; 'und'
    when every score is zero."""
    scores = {lang: lang_score_col(text, lang) for lang in _TIE_ORDER}
    best = None
    for lang in _TIE_ORDER:
        cond = None
        for other in _TIE_ORDER:
            if other == lang:
                continue
            op = (
                scores[lang] >= scores[other]
                if _TIE_ORDER.index(other) > _TIE_ORDER.index(lang)
                else scores[lang] > scores[other]
            )
            cond = op if cond is None else (cond & op)
        cond = cond & (scores[lang] > 0)
        best = (
            F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
        )
    return best.otherwise(F.lit("und"))


def lang_pred_sql(expr: str) -> str:
    score = {
        lang: "(" + " + ".join(_marker_count_sql(expr, w) for w in LANG_MARKERS[lang]) + ")"
        for lang in _TIE_ORDER
    }
    whens = []
    for lang in _TIE_ORDER:
        conds = []
        for other in _TIE_ORDER:
            if other == lang:
                continue
            cmp = ">=" if _TIE_ORDER.index(other) > _TIE_ORDER.index(lang) else ">"
            conds.append(f"{score[lang]} {cmp} {score[other]}")
        conds.append(f"{score[lang]} > 0")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " ELSE 'und' END"


def quality_score_col(text: Column) -> Column:
    """Length/punctuation/digit heuristics -> 0-100 quality score.
    Same arithmetic as :func:`quality_score_sql` (rounded to 4)."""
    n_chars = F.length(text)
    n_tokens = token_count_col(text).cast("double")
    stripped_punct = F.regexp_replace(text, r"[^\w\s]", "")
    punct_ratio = (n_chars - F.length(stripped_punct)) / n_chars
    stripped_digit = F.regexp_replace(text, r"[0-9]", "")
    digit_ratio = (n_chars - F.length(stripped_digit)) / n_chars
    avg_tok = n_chars / n_tokens
    score = (
        F.least(n_tokens / F.lit(2.0), F.lit(40.0))
        + F.least(avg_tok * 4, F.lit(30.0))
        - punct_ratio * 50
        - digit_ratio * 50
        + F.lit(30.0)
    )
    return F.round(F.greatest(F.least(score, F.lit(100.0)), F.lit(0.0)), 4)


def quality_score_sql(expr: str) -> str:
    n_chars = f"length({expr})"
    n_tokens = f"CAST({token_count_sql(expr)} AS DOUBLE)"
    punct = f"(({n_chars} - length(regexp_replace({expr}, '[^\\w\\s]', '', 'g'))) / {n_chars})"
    digit = f"(({n_chars} - length(regexp_replace({expr}, '[0-9]', '', 'g'))) / {n_chars})"
    avg_tok = f"({n_chars} / {n_tokens})"
    score = (
        f"(least({n_tokens} / 2.0, 40.0) + least({avg_tok} * 4, 30.0)"
        f" - {punct} * 50 - {digit} * 50 + 30.0)"
    )
    return f"round(greatest(least({score}, 100.0), 0.0), 4)"


ALPHA_FRAC_MIN = 0.8
WORDS_MIN, WORDS_MAX = 20, 100000
MEAN_LEN_MIN, MEAN_LEN_MAX = 2.0, 12.0
DISTINCT_FRAC_MIN = 0.2
STOP_SET = ("the", "a", "of", "and")
STOP_MIN = 1


def gopher_rules_cols(text: Column) -> list[tuple[str, Column]]:
    """Gopher-style document-quality RULES (Rae et al. 2021, table A1
    adapted): each a named boolean, plus the conjunction ``keep`` —
    the gate a training pipeline filters on (distinct from the scalar
    quality score: rules are auditable per-document reasons).

    All native Column expressions (split / size / array_distinct /
    filter / aggregate) — WholeStageCodegen end to end, no Python.
    """
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    n = F.size(toks).cast("double")
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    ).cast("double")
    mean_len = total_len / n
    alpha_frac = (
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double") / n
    )
    distinct_frac = F.size(F.array_distinct(toks)).cast("double") / n
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*STOP_SET))
    )
    rules = [
        ("r_word_count", (n >= WORDS_MIN) & (n <= WORDS_MAX)),
        ("r_mean_word_len", (mean_len >= MEAN_LEN_MIN) & (mean_len <= MEAN_LEN_MAX)),
        ("r_alpha_frac", alpha_frac >= ALPHA_FRAC_MIN),
        ("r_repetition", distinct_frac >= DISTINCT_FRAC_MIN),
        ("r_stopwords", n_stop >= STOP_MIN),
    ]
    keep = None
    for _, c in rules:
        keep = c if keep is None else keep & c
    return rules + [("keep", keep)]


def gopher_rules_sql(expr: str) -> list[tuple[str, str]]:
    toks = f"string_split_regex(trim(lower({expr})), '\\s+')"
    n = f"CAST(len({toks}) AS DOUBLE)"
    total_len = f"CAST(list_sum(list_transform({toks}, t -> length(t))) AS DOUBLE)"
    mean_len = f"({total_len} / {n})"
    alpha = f"(CAST(len(list_filter({toks}, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE) / {n})"
    distinct = f"(CAST(len(list_distinct({toks})) AS DOUBLE) / {n})"
    stops = ", ".join(f"'{s}'" for s in STOP_SET)
    n_stop = f"len(list_filter({toks}, t -> t IN ({stops})))"
    rules = [
        ("r_word_count", f"({n} >= {WORDS_MIN} AND {n} <= {WORDS_MAX})"),
        (
            "r_mean_word_len",
            f"({mean_len} >= {MEAN_LEN_MIN} AND {mean_len} <= {MEAN_LEN_MAX})",
        ),
        ("r_alpha_frac", f"({alpha} >= {ALPHA_FRAC_MIN})"),
        ("r_repetition", f"({distinct} >= {DISTINCT_FRAC_MIN})"),
        ("r_stopwords", f"({n_stop} >= {STOP_MIN})"),
    ]
    keep = " AND ".join(c for _, c in rules)
    return rules + [("keep", f"({keep})")]


# PII-style redaction: conservative email + JP-phone patterns. Kept
# deliberately simple (true PII detection is a model problem); the
# point is the OPERATOR shape — masking is a pure regexp_replace
# chain, WholeStageCodegen end to end, byte-identical to the SQL
# mirror, with the redaction count derivable from length deltas.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"0\d{1,4}-\d{1,4}-\d{3,4}"
EMAIL_MASK = "<EMAIL>"
PHONE_MASK = "<PHONE>"


def redact_pii_col(text: Column) -> Column:
    return F.regexp_replace(
        F.regexp_replace(text, _EMAIL_RE, EMAIL_MASK), _PHONE_RE, PHONE_MASK
    )


def redact_pii_sql(expr: str) -> str:
    return (
        f"regexp_replace(regexp_replace({expr}, '{_EMAIL_RE}', '{EMAIL_MASK}', 'g'),"
        f" '{_PHONE_RE}', '{PHONE_MASK}', 'g')"
    )


def pii_counts_col(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) found — via regexp_count (native)."""
    return (
        F.regexp_count(text, F.lit(_EMAIL_RE)),
        F.regexp_count(text, F.lit(_PHONE_RE)),
    )


def pii_counts_sql(expr: str) -> tuple[str, str]:
    return (
        f"len(regexp_extract_all({expr}, '{_EMAIL_RE}'))",
        f"len(regexp_extract_all({expr}, '{_PHONE_RE}'))",
    )


def fingerprint_col(text: Column) -> Column:
    """Document fingerprint: md5 of casefolded, whitespace-collapsed,
    punctuation-stripped text — the exact-dedup key."""
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(text), r"[^\w\s]", ""), r"\s+", " ")
    )
    return F.md5(norm)


def fingerprint_sql(expr: str) -> str:
    norm = (
        f"trim(regexp_replace(regexp_replace(lower({expr}), '[^\\w\\s]', '', 'g'),"
        f" '\\s+', ' ', 'g'))"
    )
    return f"md5({norm})"


# BPE-ish pre-tokenization count: word runs / digit runs / punctuation
# runs (the GPT-2 pre-tokenizer shape, lookahead-free so the SAME
# pattern executes identically under Java regex (Spark) and RE2
# (DuckDB) — RE2 has no lookahead, so the original GPT-2 trailing-
# space case is deliberately omitted). Whitespace itself is not a
# token. ASCII classes only: engine-agnostic by construction; CJK
# text lumps per non-ASCII run, which is the documented approximation.
BPE_PATTERN = r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+)"


def bpe_token_count_col(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), 1))


def bpe_token_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{BPE_PATTERN}', 1))"


# ---------------------------------------------------------------------------
# BPE merge APPLICATION (the encode step; bpe_pair_counts gates the
# train step's pair statistics). A fixed learned-merge table applied
# in priority order over sentinel-delimited char-spaced words —
# Sennrich 2016's apply loop re-expressed as a chain of literal
# string replaces so the WHOLE pipeline stays inside WholeStageCodegen
# (no UDF, no explode): lower -> word split -> per-word char spacing
# -> 12 sequential ' a b '->' ab ' replaces -> token count, all in
# array HOFs. Documented variant semantics: each merge is ONE
# left-to-right non-overlapping replace pass (an immediately adjacent
# re-occurrence whose leading space was consumed by the previous
# match is skipped, unlike Sennrich's lookaround regex — RE2 has no
# lookarounds, so the oracle could not express that form); Java
# (Spark) and DuckDB replace() share these semantics exactly, so the
# two engines agree by construction.
# ---------------------------------------------------------------------------

BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("o", "n"),
    ("e", "r"), ("r", "e"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("an", "d"), ("e", "s"),
]


def _bpe_word_tokens(word: Column) -> Column:
    # "hello" -> " h e l l o " -> merges -> token count
    spaced = F.concat(F.lit(" "), F.regexp_replace(word, "(.)", "$1 "))
    for a, b in BPE_MERGES:
        spaced = F.replace(spaced, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
    t = F.trim(spaced)
    return F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1


def bpe_apply_cols(text: Column) -> tuple:
    """(n_words, n_bpe_tokens) after applying BPE_MERGES to every
    ASCII-letter word of ``text``."""
    words = F.filter(
        F.split(F.regexp_replace(F.lower(text), "[^a-z]+", " "), " "),
        lambda w: F.length(w) > 0,
    )
    n_words = F.size(words)
    n_tokens = F.aggregate(
        F.transform(words, _bpe_word_tokens),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return n_words.cast("bigint"), n_tokens


def bpe_apply_sql(expr: str) -> tuple:
    """DuckDB mirror of :func:`bpe_apply_cols` -> (n_words_sql,
    n_bpe_tokens_sql)."""
    spaced = "' ' || regexp_replace(w, '(.)', '\\1 ', 'g')"
    merged = spaced
    for a, b in BPE_MERGES:
        merged = f"replace({merged}, ' {a} {b} ', ' {a}{b} ')"
    tok = (f"length(trim({merged}))"
           f" - length(replace(trim({merged}), ' ', '')) + 1")
    words = (f"list_filter(string_split(regexp_replace(lower({expr}),"
             f" '[^a-z]+', ' ', 'g'), ' '), w -> length(w) > 0)")
    n_words = f"CAST(len({words}) AS BIGINT)"
    # list_sum(NULL/[]) is NULL in DuckDB; Spark's aggregate zero is 0
    n_tokens = (f"CAST(coalesce(list_sum(list_transform({words},"
                f" w -> {tok})), 0) AS BIGINT)")
    return n_words, n_tokens
