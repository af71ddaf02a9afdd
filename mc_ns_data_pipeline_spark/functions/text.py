"""Text-analysis expressions for large-scale training-data pipelines.

All pure Column expressions (JVM-side) — language ID, quality scoring,
token counting, fingerprinting, normalization, and shingling. Each has a
DuckDB-SQL twin in plans/extensions.py so the driver's oracle gate can
verify byte-identical semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A compact multilingual stopword/marker table for the n-gram language
# heuristic. Deterministic CASE-priority: zh (CJK chars) > en > es > de > fr.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "y", "en"),
    "de": ("der", "die", "und", "ist", "das"),
    "fr": ("le", "les", "et", "des", "une"),
}

EN_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

# BPE-ish tokenization: letter runs, digit runs, punctuation runs.
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"

PUNCT_CLASS = "[.,;:!?]"

CJK_PATTERN = "[\\u4e00-\\u9fff]"


def norm_text(c: Column) -> Column:
    """Canonical text normalization: lower, trim, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(c)), "\\s+", " ")


def words(c: Column) -> Column:
    """Split normalized text into words (single-space separated)."""
    return F.split(norm_text(c), " ")


def word_count(c: Column) -> Column:
    return F.size(words(c))


def bpe_token_count(c: Column) -> Column:
    """Count BPE-ish tokens (letter/digit/punct runs)."""
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PATTERN), F.lit(0)))


def marker_hits(c: Column, markers: tuple[str, ...]) -> Column:
    """How many words of the text are in the marker list."""
    return F.size(F.filter(words(c), lambda w: w.isin(*markers)))


def cjk_count(c: Column) -> Column:
    return F.size(F.regexp_extract_all(c, F.lit(CJK_PATTERN), F.lit(0)))


def predict_lang_from(ws: Column, raw: Column) -> Column:
    """Language CASE over a pre-split words array `ws` plus the raw
    string `raw` (for the CJK probe). Callers scoring more than one
    text per row should BIND `ws` to a real column first — the marker
    scores are lambda filters over `ws`, and Catalyst does not CSE
    subexpressions referenced inside lambda bodies (the
    shingles_from_words contract), so an unbound `words(text)` here is
    re-normalized and re-split once per language.
    """
    scores = {
        lang: F.size(F.filter(ws, lambda w: w.isin(*m)))
        for lang, m in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    expr = F.when(cjk_count(raw) > 0, F.lit("zh"))
    for lang in ("en", "es", "de", "fr"):
        expr = expr.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        )
    return expr.otherwise(F.lit("unknown"))


def predict_lang(c: Column) -> Column:
    """Marker-count language heuristic with fixed priority ordering.

    zh wins if any CJK character is present; otherwise the language with
    the strictly-highest marker count in priority order en>es>de>fr;
    'unknown' when all scores are zero.
    """
    return predict_lang_from(words(c), c)


def punct_count(c: Column) -> Column:
    return F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))


def stopword_count(c: Column) -> Column:
    return F.size(F.filter(words(c), lambda w: w.isin(*EN_STOPWORDS)))


def fingerprint_full(c: Column) -> Column:
    """Exact-dedup fingerprint: md5 of normalized text."""
    return F.md5(norm_text(c))


def fingerprint_bow(c: Column) -> Column:
    """Order-insensitive bag-of-words fingerprint."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(words(c)))))


def shingles_from_words(ws: Column, k: int = 3) -> Column:
    """Word k-gram shingles from a word-array column; the whole
    re-joined text when shorter than k (keeps short docs dedup-able).

    `ws` MUST be a *bound column reference* (select the word array into
    a column first), not a raw `words(text)` expression tree: Catalyst
    does not CSE subexpressions referenced inside lambda bodies, so an
    unbound tree re-normalizes and re-splits the full document once per
    gram element — O(len^2) regex work per doc (~10x slowdown measured).
    """
    idx = F.sequence(F.lit(0), F.size(ws) - k)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.get(ws, i + j) for j in range(k)]),
    )
    return F.when(F.size(ws) >= k, grams).otherwise(
        F.array(F.array_join(ws, " "))
    )


def ngrams_or_empty(ws: Column, k: int) -> Column:
    """Word k-grams, or an EMPTY array for docs shorter than k words.

    Unlike `shingles_from_words` (whose whole-text fallback keeps short
    docs dedup-able), repetition metrics want the true gram population,
    so short docs contribute zero grams. Same lambda-CSE contract: `ws`
    must be a bound column reference.
    """
    idx = F.sequence(F.lit(0), F.size(ws) - k)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.get(ws, i + j) for j in range(k)]),
    )
    return F.when(F.size(ws) >= k, grams).otherwise(
        F.array().cast("array<string>")
    )


def shingles(c: Column, k: int = 3) -> Column:
    """Word k-gram shingles straight from a text column.

    Convenience/compat form; hot paths should bind `words(c)` to a
    column and use `shingles_from_words` (see its lambda-CSE warning).
    """
    return shingles_from_words(words(c), k)


# PII scrubbing patterns (RE2/Java-compatible subset so the SQL oracle
# evaluates the identical regex): emails and NNN-NNN-NNNN phones.
EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_PATTERN = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"


def scrub_pii(c: Column) -> Column:
    """Redact emails then phones with typed placeholders."""
    scrubbed = F.regexp_replace(c, EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(scrubbed, PHONE_PATTERN, "<PHONE>")


def pii_counts(c: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) found in the text."""
    return (
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_PATTERN), F.lit(0))),
        F.size(F.regexp_extract_all(c, F.lit(PHONE_PATTERN), F.lit(0))),
    )


def hash_sample_bucket(key: Column, buckets: int = 100) -> Column:
    """Deterministic sampling bucket from md5(key) — reproducible across
    engines and runs, unlike rand()-based sampling. Keep rows where
    bucket < rate*buckets for a stable rate% sample."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10)
        .cast("long") % buckets
    )


