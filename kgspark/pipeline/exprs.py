"""Shared JVM-side column expressions for the reference's scalar text
rules — kept as built-in-function compositions so they run inside
whole-stage codegen (no Python in the hot path)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# reference entity_standardization.py:33
PRED_STOP_WORDS = ["a", "an", "the", "of", "with", "by", "to", "from", "in", "on", "for"]
# reference entity_standardization.py:88
NORM_STOP_WORDS = [
    "the", "a", "an", "of", "and", "or", "in", "on", "at", "to",
    "for", "with", "by", "as",
]


def words_of(col: Column) -> Column:
    """Python ``str.split()`` semantics: whitespace runs, no empties."""
    return F.filter(F.split(col, r"\s+"), lambda w: w != "")


def limit_predicate(col: Column, max_words: int = 3) -> Column:
    """Predicate 3-word limit with trailing-stopword drop
    (reference entity_standardization.py:14-38).  Returns the ORIGINAL
    string (original whitespace preserved) when within the limit."""
    ws = words_of(col)
    kept = F.slice(ws, 1, max_words)
    trimmed = F.when(
        F.lower(F.element_at(kept, max_words)).isin(PRED_STOP_WORDS),
        F.slice(kept, 1, max_words - 1),
    ).otherwise(kept)
    return F.when(F.size(ws) <= max_words, col).otherwise(F.array_join(trimmed, " "))


def norm_key(col: Column) -> Column:
    """Blocking key: lowercase, ``\\b\\w+\\b`` tokens, drop stopwords,
    rejoin (reference entity_standardization.py:84-90).  ``(?U)`` gives
    Java regex the same unicode word classes as Python ``\\w``."""
    toks = F.regexp_extract_all(F.lower(col), F.lit(r"(?U)\w+"), 0)
    return F.array_join(
        F.filter(toks, lambda t: ~t.isin(NORM_STOP_WORDS)), " "
    )


def word_set(col: Column) -> Column:
    """``set(x.split())`` as a deduplicated array."""
    return F.array_distinct(words_of(col))


def stem_set(col_words: Column) -> Column:
    """``{w[:4] for w in words if len(w) > 4}``
    (reference entity_standardization.py:148-149)."""
    return F.array_distinct(
        F.transform(
            F.filter(col_words, lambda w: F.length(w) > 4),
            lambda w: F.substring(w, 1, 4),
        )
    )


def longest_smallest(arr: Column) -> Column:
    """Pick the longest element; ties → lexicographically smallest
    (canonicalization D3 in tests/oracle/refsem.py)."""
    return F.aggregate(
        arr,
        F.lit(""),
        lambda acc, x: F.when(
            (F.length(x) > F.length(acc))
            | ((F.length(x) == F.length(acc)) & (x < acc)),
            x,
        ).otherwise(acc),
    )
