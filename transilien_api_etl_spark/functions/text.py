"""Text-analysis column expressions (SURVEY.md §3 F9; BASELINE.json mandate).

Pure DataFrame expressions for the hot path: tokenization, stopword/quality
ratios, shingling, and a stopword-scored language-ID heuristic. All stay
inside whole-stage codegen; the corpus-level aggregations built on them
(word counts, TF-IDF) are plain groupBys in plans/text_q.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword markers per language for the n-gram/stopword language-ID
# heuristic. Deliberately tiny: the heuristic is the operator; the lists are
# config.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "nicht"),
    "fr": ("le", "la", "les", "et", "ne"),
    "es": ("el", "los", "las", "y", "no"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokenize(text: Column) -> Column:
    """Whitespace tokenizer (documents.text is space-separated lowercase)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    """|tokens| without materializing the token array.

    For a single-space split, len(split(t)) ≡ (#spaces + 1) — including
    empty tokens from doubled/leading/trailing spaces — so counting via
    length arithmetic gives the identical value while skipping the per-row
    array allocation (~2× on a corpus-wide scan).
    """
    return (F.length(text) - F.length(F.replace(text, F.lit(" "), F.lit(""))) + 1).cast("long")


def stopword_count(tokens: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*stopwords))).cast("long")


def marker_score(tokens: Column, lang: str) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*LANG_MARKERS[lang]))).cast("long")


def predict_lang(tokens: Column) -> Column:
    """Argmax over per-language marker counts, deterministic ties.

    Tie semantics (what the branch conditions actually encode, and what
    any oracle twin must reproduce): a non-English language wins only by
    STRICTLY beating English ('en' is the prior — any tie with English
    returns 'en'); among the non-English languages ties break de ≥ fr ≥
    es. E.g. s_de == s_en > 0 → 'en'; s_de == s_fr > s_en → 'de'."""
    s_en = marker_score(tokens, "en")
    s_de = marker_score(tokens, "de")
    s_fr = marker_score(tokens, "fr")
    s_es = marker_score(tokens, "es")
    return (
        F.when((s_de > s_en) & (s_de >= s_fr) & (s_de >= s_es), F.lit("de"))
        .when((s_fr > s_en) & (s_fr >= s_es), F.lit("fr"))
        .when(s_es > s_en, F.lit("es"))
        .otherwise(F.lit("en"))
    )


def shingles(tokens: Column, n: int = 3, sep: str = " ") -> Column:
    """Word n-gram shingles as strings; empty array when len(tokens) < n.

    Guarded sequence: Spark's sequence(1, k) with k<1 would count DOWN
    (step auto-inference), so the when() guard is load-bearing.
    """
    k = F.size(tokens) - (n - 1)
    idx = F.sequence(F.lit(1), k)
    make = lambda i: F.concat_ws(  # noqa: E731
        sep, *[F.element_at(tokens, i + j) for j in range(n)]
    )
    return F.when(k >= 1, F.transform(idx, make)).otherwise(
        F.array().cast("array<string>")
    )


def portable_token_hash(t: Column) -> Column:
    """60-bit positive token hash both engines can compute identically:
    the first 15 hex chars of md5, parsed base-16. DuckDB twin:
    ``CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)`` — verified equal
    including UTF-8 multibyte and empty strings."""
    return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")


def rolling_hash_fingerprint(text: Column, modulus: int = 2**31 - 1) -> Column:
    """Deterministic document fingerprint: polynomial rolling hash over
    tokens, folded JVM-side (aggregate). Base 1000003, Mersenne modulus.
    Token hash is the md5-based :func:`portable_token_hash` (round 3 —
    was xxhash64, which DuckDB cannot reproduce), so the whole
    fingerprint is SQL-exact and the registered query carries a direct
    oracle instead of a rows-only check. Worst-case magnitude:
    acc·1000003 + h%M < 2³¹·2²⁰ + 2³¹ ≪ 2⁶³ — no overflow either engine."""
    tokens = tokenize(text)
    return F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 1000003 + portable_token_hash(t) % modulus) % modulus,
    )
