"""String-cleaning and flag expressions.

Reference: ``S/closures/UDFs.scala:11-87`` + ``S/closures/StringFunctions.scala``.
The reference implements these as row-at-a-time Scala UDFs; every one of them
is expressible as a native Column chain (regexp_replace / regexp_extract_all /
higher-order array functions), which keeps them inside Tungsten codegen — the
right call on a 100 TB text column.

Known deviation, deliberate: the reference's ``cleanCompanyUDF`` runs an
ASCII ``\\W+ -> space`` replace *before* its "CJK-aware" word extraction
(UDFs.scala:37-44), so CJK company names actually collapse to ``__empty`` —
the extraction regex (StringFunctions.scala:7) plainly intended to keep them.
We keep CJK characters through the whole chain.
"""

from __future__ import annotations

import functools
import operator
from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

# Unicode blocks from StringFunctions.scala:7 (Java regex syntax — Spark's
# regexp functions compile with java.util.regex, so these pass through).
_CJK = (
    r"\p{InHiragana}\p{InKatakana}\p{InBopomofo}"
    r"\p{InCJKCompatibilityIdeographs}\p{InCJKUnifiedIdeographs}"
)
WORD_PATTERN_ENG = r"\w\.\-_"
WORD_PATTERN_CJK = WORD_PATTERN_ENG + _CJK

EMPTY_SENTINEL = "__empty"

_TLDS = r"(?:com|net|org|io|co\.uk|co|eu|fr|de|ru)"
_LEGAL = r"(?:http|https|www|co ltd|pvt ltd|ltd|inc|llc)"


def _extract_words_joined(col: Column, pattern: str = WORD_PATTERN_CJK) -> Column:
    """``extractWordsIncludeCJK(...).mkString(" ")`` (StringFunctions.scala:13-19)."""
    return F.concat_ws(" ", F.regexp_extract_all(col, F.lit(f"([{pattern}]+)"), 1))


def _empty_sentinel(col: Column) -> Column:
    return F.when((col.isNull()) | (col == ""), F.lit(EMPTY_SENTINEL)).otherwise(col)


def clean_company(col: Column) -> Column:
    """Company-name normalizer (cleanCompanyUDF, UDFs.scala:32-46).

    lowercase → strip TLD tokens → strip 'formerly/previously/ex-' → strip
    punctuation → strip legal suffixes → word-extract (CJK kept) → __empty.
    """
    c = F.lower(col)
    c = F.regexp_replace(c, rf"\.?\b{_TLDS}\b", "")
    c = F.regexp_replace(c, r"\b(?:formerly|previously)\b|\bex-(?=\w)", "")
    c = F.regexp_replace(c, rf"[^\w{_CJK}]+", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    c = F.regexp_replace(c, rf"\b{_LEGAL}\b", "")
    return _empty_sentinel(_extract_words_joined(F.trim(c)))


def clean_email(col: Column) -> Column:
    """Email → domain (cleanEmailUDF, UDFs.scala:48-55): lowercase, take the
    part after '@'; no '@' → keep the input; blank → __empty."""
    c = F.lower(F.trim(col))
    domain = F.regexp_extract(c, rf"@([{WORD_PATTERN_ENG}]+)", 1)
    return _empty_sentinel(F.when(domain != "", domain).otherwise(c))


def clean_location(col: Column) -> Column:
    """Location normalizer (cleanLocationUDF, UDFs.scala:57-78).

    'City, Country' → City; strip punctuation; drop the literal word 'city';
    word-extract (CJK kept); __empty sentinel.
    """
    # Anchored: the reference's Scala `val pattern(city, _) = location` only
    # fires on a FULL-string match (unapplySeq anchors), so 'San Francisco,
    # CA' (space inside the city) falls through and keeps the whole string.
    city_pat = rf"^([{WORD_PATTERN_CJK}]+),\s*[{WORD_PATTERN_CJK}]+$"
    c = F.when(col.rlike(city_pat), F.regexp_extract(col, city_pat, 1)).otherwise(col)
    c = F.lower(c)
    c = F.regexp_replace(c, r"""[~!@#$^%&*()_+={}\[\]|;:"'<,>.?`/\\-]+""", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    c = F.regexp_replace(c, r"\bcity\b", "")
    return _empty_sentinel(_extract_words_joined(F.trim(c)))


def contains_any(col: Column, substrings: Iterable[str], lower: bool = False) -> Column:
    """1.0 if any literal substring occurs (containsAnyOfUDF, UDFs.scala:11-22)."""
    c = F.lower(col) if lower else col
    pred = functools.reduce(
        operator.or_, [c.contains(F.lit(s)) for s in substrings]
    )
    return F.when(pred, F.lit(1.0)).otherwise(F.lit(0.0))


def flag_any_like(col: Column, patterns: Iterable[str]) -> Column:
    """OR-folded LIKE flag (P7 idiom, S/UserProfileBuilder.scala:80-92):
    ``patterns.map(col.like).reduce(_ or _)`` as a 1.0/0.0 column."""
    pred = functools.reduce(operator.or_, [col.like(p) for p in patterns])
    return F.when(pred, F.lit(1.0)).otherwise(F.lit(0.0))


def null_flag(cols: Iterable[Column]) -> Column:
    """OR-folded isNull flag (user_has_null, S/UserProfileBuilder.scala:60-64)."""
    pred = functools.reduce(operator.or_, [c.isNull() for c in cols])
    return F.when(pred, F.lit(1.0)).otherwise(F.lit(0.0))


def lang_index_in_recent(repo_language: Column, recent_languages: Column) -> Column:
    """Index of the repo language in the user's recent-language list; miss →
    size+50 (repoLanguageIndexInUserRecentRepoLanguagesUDF, UDFs.scala:80-83).

    ``array_position`` is 1-based and the reference's ``indexOf`` is 0-based —
    subtract 1 on hit (SURVEY.md §7.4 off-by-one note).
    """
    pos = F.array_position(recent_languages, F.lower(repo_language))
    return F.when(pos > 0, (pos - 1).cast("int")).otherwise(
        (F.size(recent_languages) + 50).cast("int")
    )


def lang_count_in_recent(repo_language: Column, recent_languages: Column) -> Column:
    """Occurrence count of the repo language in the recent list
    (UDFs.scala:85-87) via higher-order ``filter`` — no UDF."""
    lang = F.lower(repo_language)
    return F.size(F.filter(recent_languages, lambda x: x == lang))


# --- PII scrub (training-data pipeline extension; not in the reference) ---
# Pattern syntax is deliberately restricted to the common subset of Java
# regex (Spark) and RE2 (DuckDB oracle): character classes, bounded
# repetition, \b word boundaries — no backrefs or lookaround, so both
# engines match identically and the redaction is replayable in the gate.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def redact_pii(col: Column) -> Column:
    """Replace emails, IPv4 addresses and international phone numbers with
    typed placeholder tokens — applied in PII_PATTERNS order (email first:
    its local part may contain digits a later pattern would mangle). One
    chained regexp_replace projection, JVM-side, no UDF."""
    out = col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(col: Column) -> list[Column]:
    """Match counts per PII class (before redaction), as one column each —
    the audit signal a scrub job reports alongside the cleaned text."""
    return [
        F.size(F.regexp_extract_all(col, F.lit(pattern), 0)).alias(f"n_{name}")
        for name, pattern, _ in PII_PATTERNS
    ]


# --- Markup extraction (training-data pipeline extension) -----------------
# The raw-crawl front door: before any hygiene stage can score or dedup a
# web document, the HTML shell has to come off. Same regex-subset
# discipline as PII_PATTERNS — (?is) inline flags, non-greedy repetition,
# NO backreferences (RE2 lacks them), so Spark and the DuckDB oracle
# match identically. Element-blind tag stripping (not a DOM parse — no
# parser dependency, no UDF); script/style/comment BODIES are dropped
# first because their content is code, not prose.

_MARKUP_BLOCK_PATTERNS: tuple[str, ...] = (
    r"(?is)<script\b[^>]*>.*?</script\s*>",
    r"(?is)<style\b[^>]*>.*?</style\s*>",
    r"(?s)<!--.*?-->",
)
_MARKUP_TAG_PATTERN = r"(?s)</?[A-Za-z!][^>]*>"
# Decode order matters: named/numeric entities FIRST, the ampersand
# escape LAST — else '&amp;lt;' would double-decode to '<'.
_MARKUP_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def strip_markup(col: Column) -> Column:
    """Plain text from HTML-ish markup: drop script/style/comment blocks
    (content and all), strip remaining tags to spaces, decode the six
    common entities, collapse whitespace. Tag stripping runs BEFORE
    entity decoding — the standard order, so text that merely *mentions*
    markup ('use &lt;p&gt; for paragraphs') keeps its escaped brackets
    as literal text instead of having them stripped as tags. One chained
    regexp_replace projection, JVM-side, no UDF — at 100 TB this is a
    map-only scan like redact_pii."""
    out = col
    for pattern in _MARKUP_BLOCK_PATTERNS:
        out = F.regexp_replace(out, pattern, " ")
    out = F.regexp_replace(out, _MARKUP_TAG_PATTERN, " ")
    for entity, repl in _MARKUP_ENTITIES:
        out = F.replace(out, F.lit(entity), F.lit(repl))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def strip_controls(col: Column) -> Column:
    """Remove ASCII control characters (``\\x00-\\x1f`` and DEL) — the
    crawl-hygiene step before any tokenization; embedded NULs and
    terminal-escape bytes are corpus poison. Explicit character class
    (not ``\\p{Cntrl}``) so the pattern means the same thing in Java
    regex and RE2 — the oracle replays it verbatim. Map-only, JVM-side."""
    return F.regexp_replace(col, r"[\x00-\x1f\x7f]", "")


def nfc_normalize(col: Column) -> Column:
    """Unicode NFC normalization (combining sequences → precomposed
    forms) via an Arrow-batched pandas UDF — the package's
    justified-UDF case (the jieba/Porter/multimodal precedent): Spark
    SQL has no normalization builtin, and byte-identical text is the
    precondition for every digest-keyed operator upstream
    (``exact_dedup`` hashes bytes — 'é' and 'e'+U+0301 are the same
    document and must hash the same). NULL passes through. Python's
    ``unicodedata`` and DuckDB's utf8proc both implement standard NFC,
    so the oracle's ``nfc_normalize`` matches exactly."""

    @F.pandas_udf("string")
    def _nfc(s):
        import unicodedata

        return s.map(
            lambda v: None if v is None else unicodedata.normalize("NFC", v)
        )

    return _nfc(col)


def markup_ratio_x10k(col: Column) -> Column:
    """Markup overhead per document, ×10⁴: chars removed by
    ``strip_markup`` over raw length (0 for empty input) — the
    boilerplate-heaviness signal a crawl-quality report keys on.
    Integer-scaled per the catalog's engine-portable convention."""
    raw_len = F.length(col)
    kept_len = F.length(strip_markup(col))
    return F.when(
        raw_len > 0,
        F.floor(
            (raw_len - kept_len).cast("double") / raw_len * 10000.0 + 0.5
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
