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


# ---------------------------------------------------------------------------
# WordPiece greedy longest-match encode (Wu et al. 2016; the BERT
# tokenizer's apply step — max-munch over a fixed vocab with distinct
# word-start and continuation ("##x") piece classes, whole-word [UNK]
# on any unmatched position). The BPE gates cover merge-table apply /
# training; WordPiece pins the OTHER production tokenizer family,
# whose defect mode is picking a shorter match when a longer piece
# exists. Both engines run the IDENTICAL integer fold over character
# positions (Spark F.aggregate / DuckDB list_reduce) with the state
# (failed, next_pos, n_tokens) bit-packed into one BIGINT — the
# cross-engine float rule trivially holds (no doubles anywhere).
# ---------------------------------------------------------------------------

# start pieces include prefix chains (win < wind < window, st < so <
# sort < stream ...) so a wrong greedy order CHANGES token counts;
# 'q' is absent from both classes, so corpus words containing q
# ("query") hit the whole-word [UNK] path non-vacuously.
WP_START: tuple[str, ...] = (
    "stream", "window", "table", "value", "batch", "scan", "sort",
    "wind", "win", "the", "tab", "val", "bat", "st", "so",
) + tuple(c for c in "abcdefghijklmnoprstuvwxyz")
WP_CONT: tuple[str, ...] = (
    "ream", "art", "ow", "ue", "le", "ch", "er",
) + tuple(c for c in "abcdefghijklmnoprstuvwxyz")

_WP_POS_BITS = 20
_WP_POS_MASK = (1 << _WP_POS_BITS) - 1
_WP_INIT = 1 << _WP_POS_BITS  # failed=0, next_pos=1, n_tokens=0


def _wp_by_len(pieces: tuple[str, ...]) -> list[tuple[int, list[str]]]:
    out: dict[int, list[str]] = {}
    for p in pieces:
        out.setdefault(len(p), []).append(p)
    return sorted(out.items(), reverse=True)


def wordpiece_cols(text: Column) -> tuple[Column, Column, Column]:
    """(n_words, n_tokens, n_unk_words) for WordPiece greedy
    longest-match over the fixed WP_START/WP_CONT vocab. Fully
    JVM-side: words split natively, the per-word max-munch fold is an
    F.aggregate over character positions whose match test is a
    literal isin() when-chain (Catalyst In over a codegen'd
    substring) — no UDF, no explode, no shuffle; at 100 TB this
    pipelines with the parquet scan like the BPE apply gate."""
    words = F.filter(
        F.split(F.lower(text), "[^a-z]+"), lambda x: F.length(x) > 0
    )

    def longest(w: Column, g: Column) -> Column:
        def chain(pieces: tuple[str, ...]) -> Column:
            c = None
            for length, ps in _wp_by_len(pieces):
                cond = w.substr(g, F.lit(length)).isin(*ps)
                c = F.when(cond, length) if c is None else c.when(
                    cond, length
                )
            return c.otherwise(F.lit(0))

        return F.when(g == 1, chain(WP_START)).otherwise(chain(WP_CONT))

    def word_state(w: Column) -> Column:
        def step(s: Column, g: Column) -> Column:
            failed = F.shiftright(s, 2 * _WP_POS_BITS)
            pos = F.shiftright(s, _WP_POS_BITS).bitwiseAND(
                F.lit(_WP_POS_MASK)
            )
            n = s.bitwiseAND(F.lit(_WP_POS_MASK))
            glong = g.cast("long")
            length = longest(w, glong).cast("long")
            matched = F.shiftleft(pos + length, _WP_POS_BITS).bitwiseOR(
                n + 1
            )
            fail = F.lit(1 << (2 * _WP_POS_BITS)).cast("long").bitwiseOR(
                s.bitwiseAND(F.lit((1 << (2 * _WP_POS_BITS)) - 1))
            )
            return (
                F.when((failed == 1) | (glong != pos), s)
                .when(length > 0, matched)
                .otherwise(fail)
            )

        return F.aggregate(
            F.sequence(F.lit(1), F.length(w)),
            F.lit(_WP_INIT).cast("long"),
            step,
        )

    def word_tokens(w: Column) -> Column:
        s = word_state(w)
        failed = F.shiftright(s, 2 * _WP_POS_BITS)
        n = s.bitwiseAND(F.lit(_WP_POS_MASK))
        return F.when(failed == 1, F.lit(1).cast("long")).otherwise(n)

    def word_unk(w: Column) -> Column:
        return F.shiftright(word_state(w), 2 * _WP_POS_BITS)

    n_words = F.size(words).cast("long")
    n_tokens = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + word_tokens(w)
    )
    n_unk = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + word_unk(w)
    )
    return n_words, n_tokens, n_unk


def wordpiece_sql(expr: str) -> tuple[str, str, str]:
    """DuckDB mirror of :func:`wordpiece_cols`: the identical packed
    integer fold as a list_reduce over generate_series (initial
    accumulator prepended, DuckDB 1.0 two-arg form)."""
    words = (f"list_filter(string_split_regex(lower({expr}), "
             f"'[^a-z]+'), x -> length(x) > 0)")

    def sql_chain(pieces: tuple[str, ...]) -> str:
        whens = []
        for length, ps in _wp_by_len(pieces):
            lits = ", ".join(f"'{p}'" for p in ps)
            st = (f"((((s >> {_WP_POS_BITS}) & {_WP_POS_MASK}) "
                  f"+ {length}) << {_WP_POS_BITS}) "
                  f"| ((s & {_WP_POS_MASK}) + 1)")
            whens.append(
                f"WHEN substr(w, CAST(g AS INTEGER), {length}) "
                f"IN ({lits}) THEN {st}"
            )
        return " ".join(whens)

    fail = (f"(CAST(1 AS BIGINT) << {2 * _WP_POS_BITS}) "
            f"| (s & {(1 << (2 * _WP_POS_BITS)) - 1})")
    fold = (
        f"list_reduce(list_prepend(CAST({_WP_INIT} AS BIGINT), "
        f"generate_series(CAST(1 AS BIGINT), CAST(length(w) AS BIGINT))), "
        f"(s, g) -> CASE "
        f"WHEN (s >> {2 * _WP_POS_BITS}) = 1 "
        f"OR g <> ((s >> {_WP_POS_BITS}) & {_WP_POS_MASK}) THEN s "
        f"WHEN g = 1 THEN (CASE {sql_chain(WP_START)} "
        f"ELSE {fail} END) "
        f"ELSE (CASE {sql_chain(WP_CONT)} "
        f"ELSE {fail} END) END)"
    )
    tok = (f"(CASE WHEN (({fold}) >> {2 * _WP_POS_BITS}) = 1 THEN 1 "
           f"ELSE (({fold}) & {_WP_POS_MASK}) END)")
    unk = f"(({fold}) >> {2 * _WP_POS_BITS})"
    n_words = f"CAST(len({words}) AS BIGINT)"
    n_tokens = (f"CAST(coalesce(list_sum(list_transform({words}, "
                f"w -> {tok})), 0) AS BIGINT)")
    n_unk = (f"CAST(coalesce(list_sum(list_transform({words}, "
             f"w -> {unk})), 0) AS BIGINT)")
    return n_words, n_tokens, n_unk


def wordpiece_word_tokens(word: str) -> list[str]:
    """Pure-python reference tokenizer (test oracle for unit tests —
    NOT used by either engine): greedy longest match, '##'-prefixed
    continuations, whole-word [UNK]."""
    toks, pos, n = [], 0, len(word)
    while pos < n:
        pieces = WP_START if pos == 0 else WP_CONT
        best = None
        for cand in pieces:
            if word.startswith(cand, pos) and (
                best is None or len(cand) > len(best)
            ):
                best = cand
        if best is None:
            return ["[UNK]"]
        toks.append(best if pos == 0 else "##" + best)
        pos += len(best)
    return toks


# ---------------------------------------------------------------------------
# Unigram-LM tokenization (Kudo 2018 — the SentencePiece family):
# Viterbi MINIMUM-COST segmentation over a weighted vocab, the third
# production tokenizer family next to BPE (merge tables) and
# WordPiece (greedy max-munch). The defect max-munch cannot exhibit:
# the optimal path may SPLIT where a longer piece exists (tab+le = 7
# beats table = 8 below), so a greedy implementation fails this gate
# while passing text_wordpiece_encode. DP state is the last-L dp
# values as a plain integer array; both engines run the IDENTICAL
# fold (Spark F.aggregate over positions / DuckDB list_reduce over
# [i] singleton lists with a list accumulator — 1.0's two-arg form
# needs matching element/accumulator types). dp values encode
# (cost, n_tokens) as cost*1024 + n so the lexicographic tie-break
# (cheapest, then fewest tokens) is a single integer min; INF is a
# saturating sentinel. All integers — the cross-engine float rule.
# ---------------------------------------------------------------------------

UNI_PIECES: dict[str, int] = {
    # multi-char pieces engineered so Viterbi and greedy DIVERGE:
    # sort -> so+rt (6 < 7), table -> tab+le (7 < 8), value -> val+ue,
    # batch -> bat+ch, scan -> sc+an; but window/stream/the stay whole
    "window": 8, "stream": 8, "table": 8, "value": 8, "batch": 8,
    "merge": 8, "sort": 7, "scan": 7,
    "wind": 8, "tab": 4, "val": 4, "bat": 4, "win": 4,
    "the": 5, "so": 3, "rt": 3, "st": 3, "sc": 3, "an": 3,
    "le": 3, "ue": 3, "ch": 3, "me": 4, "ow": 4, "ream": 6,
}
for _c in "abcdefghijklmnoprstuvwxyz":  # no 'q': [UNK] path
    UNI_PIECES[_c] = 6

_UNI_MAXLEN = max(len(p) for p in UNI_PIECES)
_UNI_INF = 1_000_000_000
_UNI_NTOK_BITS = 10  # dp value = cost*1024 + n_tokens
UNK_COST = 64


def _uni_by_len() -> list[tuple[int, list[tuple[str, int]]]]:
    out: dict[int, list[tuple[str, int]]] = {}
    for p, c in sorted(UNI_PIECES.items()):
        out.setdefault(len(p), []).append((p, c))
    return sorted(out.items())


def unigram_cols(text: Column) -> tuple[Column, Column, Column, Column]:
    """(n_words, viterbi_cost, n_tokens, n_unk_words) for minimum-
    cost Unigram-LM segmentation. Fully JVM-side: per-word Viterbi as
    an F.aggregate whose accumulator is the last-L dp window (array
    shift via concat+slice, the cdchunk.py state pattern); piece
    lookup is a literal when-chain. No UDF, no shuffle."""
    words = F.filter(
        F.split(F.lower(text), "[^a-z]+"), lambda x: F.length(x) > 0
    )
    inf = F.lit(_UNI_INF).cast("long")

    def word_dp(w: Column) -> Column:
        def step(s: Column, i: Column) -> Column:
            cands = [inf]
            for length, pieces in _uni_by_len():
                piece_v = None
                for p, c in pieces:
                    cond = w.substr(i - (length - 1), F.lit(length)) == p
                    add = F.lit((c << _UNI_NTOK_BITS) + 1).cast("long")
                    piece_v = (
                        F.when(cond, add)
                        if piece_v is None
                        else piece_v.when(cond, add)
                    )
                piece_v = piece_v.otherwise(inf)
                cands.append(
                    F.when(
                        i >= length,
                        F.element_at(s, length) + piece_v,
                    ).otherwise(inf)
                )
            dp = F.least(*cands)
            return F.concat(
                F.array(dp), F.slice(s, 1, _UNI_MAXLEN - 1)
            )

        init = F.array(
            F.lit(0).cast("long"),
            *[inf for _ in range(_UNI_MAXLEN - 1)],
        )
        return F.element_at(
            F.aggregate(F.sequence(F.lit(1), F.length(w)), init, step), 1
        )

    def word_stats(w: Column) -> Column:
        v = word_dp(w)
        unk = (v >= inf).cast("long")
        cost = F.when(
            unk == 1, F.lit(UNK_COST).cast("long")
        ).otherwise(F.shiftright(v, _UNI_NTOK_BITS))
        ntok = F.when(unk == 1, F.lit(1).cast("long")).otherwise(
            v.bitwiseAND(F.lit((1 << _UNI_NTOK_BITS) - 1))
        )
        return F.struct(
            cost.alias("c"), ntok.alias("t"), unk.alias("u")
        )

    zero = F.lit(0).cast("long")
    acc = F.aggregate(
        words,
        F.struct(zero.alias("c"), zero.alias("t"), zero.alias("u")),
        lambda a, w: F.transform(F.array(word_stats(w)), lambda ws: F.struct(
            (a["c"] + ws["c"]).alias("c"),
            (a["t"] + ws["t"]).alias("t"),
            (a["u"] + ws["u"]).alias("u"),
        ))[0],
    )
    return (
        F.size(words).cast("long"),
        acc["c"],
        acc["t"],
        acc["u"],
    )


def unigram_sql(expr: str) -> tuple[str, str, str, str]:
    """DuckDB mirror of :func:`unigram_cols` — the identical dp fold;
    positions ride as [i] singleton lists so the list accumulator
    type-checks under 1.0's two-arg list_reduce."""
    words = (f"list_filter(string_split_regex(lower({expr}), "
             f"'[^a-z]+'), x -> length(x) > 0)")
    cands = [str(_UNI_INF)]
    for length, pieces in _uni_by_len():
        whens = " ".join(
            f"WHEN substr(w, CAST(x[1] AS INTEGER) - {length - 1}, "
            f"{length}) = '{p}' THEN {(c << _UNI_NTOK_BITS) + 1}"
            for p, c in pieces
        )
        cands.append(
            f"CASE WHEN x[1] >= {length} THEN s[{length}] + "
            f"(CASE {whens} ELSE {_UNI_INF} END) ELSE {_UNI_INF} END"
        )
    init = "[" + ", ".join(
        ["CAST(0 AS BIGINT)"] + [str(_UNI_INF)] * (_UNI_MAXLEN - 1)
    ) + "]"
    fold = (
        f"list_reduce(list_prepend({init}, "
        f"list_transform(generate_series(CAST(1 AS BIGINT), "
        f"CAST(length(w) AS BIGINT)), i -> [i])), "
        f"(s, x) -> list_prepend(least({', '.join(cands)}), "
        f"s[1:{_UNI_MAXLEN - 1}]))[1]"
    )
    unk = f"(CASE WHEN ({fold}) >= {_UNI_INF} THEN 1 ELSE 0 END)"
    cost = (f"(CASE WHEN ({fold}) >= {_UNI_INF} THEN {UNK_COST} "
            f"ELSE ({fold}) >> {_UNI_NTOK_BITS} END)")
    ntok = (f"(CASE WHEN ({fold}) >= {_UNI_INF} THEN 1 "
            f"ELSE ({fold}) & {(1 << _UNI_NTOK_BITS) - 1} END)")

    def summed(e: str) -> str:
        return (f"CAST(coalesce(list_sum(list_transform({words}, "
                f"w -> {e})), 0) AS BIGINT)")

    return (
        f"CAST(len({words}) AS BIGINT)",
        summed(cost),
        summed(ntok),
        summed(unk),
    )


def unigram_word_segment(word: str) -> tuple[int, int, int]:
    """Pure-python reference (unit-test oracle): (cost, n_tokens,
    unk) of the minimum-cost segmentation, ties broken by fewer
    tokens — the same lexicographic rule the packed dp encodes."""
    n = len(word)
    inf = (10**9, 10**9)
    dp: list[tuple[int, int]] = [(0, 0)] + [inf] * n
    for i in range(1, n + 1):
        best = inf
        for p, c in UNI_PIECES.items():
            ln = len(p)
            if ln <= i and word[i - ln : i] == p and dp[i - ln] != inf:
                cand = (dp[i - ln][0] + c, dp[i - ln][1] + 1)
                if cand < best:
                    best = cand
        dp[i] = best
    if dp[n] == inf:
        return UNK_COST, 1, 1
    return dp[n][0], dp[n][1], 0
