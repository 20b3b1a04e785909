"""Text-analysis primitives for large-scale training-data pipelines.

All native column expressions (split/filter/aggregate/regexp) so they
codegen JVM-side; every function has a DuckDB-mirrorable shape used by
the plans/extensions.py oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# BPE-ish token pattern: letter runs, digit runs, single punctuation.
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic.  Order matters: ties resolve by this priority.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
}

LANG_PRIORITY = ["en", "de", "es", "fr"]


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(text), "\\s+")


def token_count(text: Column) -> Column:
    return F.size(ws_tokens(text))


def regex_tokens(text: Column) -> Column:
    """BPE-ish regex tokenization (letters / digits / punct singles)."""
    return F.regexp_extract_all(text, F.lit(TOKEN_RE), 0)


def stopword_hits(tokens: Column, words: list[str]) -> Column:
    """How many tokens are in the given stopword list."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def mean_token_len(tokens: Column) -> Column:
    """Average token length: exact int sum / count, double division."""
    total = F.aggregate(tokens, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.size(tokens).cast("double")


def punct_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, "[A-Za-z0-9\\s]", ""))


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles: array of space-joined n-token windows.

    Documents shorter than n tokens yield an empty array (guarded:
    Spark's sequence(1, 0) would produce a *descending* [1, 0]).

    The token array is LET-BOUND via a single-element ``transform``
    (round 10): higher-order-function lambdas re-evaluate every outer
    expression they reference per element — the old form re-ran the
    full ``split`` of the text once per window, O(n_tokens^2) per
    document in the Generate/Project interpreted eval (jstack'd on
    dsir: every task pinned in StringSplit.nullSafeEval under
    ConcatWs.eval).  Binding the array as a lambda variable makes
    inner references O(1); values are unchanged.
    """
    toks = ws_tokens(F.lower(text))

    def _windows(t: Column) -> Column:
        m = F.size(t) - (n - 1)
        return F.when(
            m >= 1,
            F.transform(F.sequence(F.lit(1), m),
                        lambda i: F.concat_ws(" ", F.slice(t, i, n))),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(toks), _windows), 1)


def hash60(col: Column) -> Column:
    """Deterministic 60-bit positive integer hash from md5 (first 15 hex
    digits) — reproducible in any engine with md5, unlike engine-native
    hash() functions."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hash32(col: Column) -> Column:
    """32-bit variant for modular MinHash permutations (products with
    31-bit coefficients stay inside signed 64-bit)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


# DuckDB oracle fragments.
DUCK_HASH60 = "CAST(concat('0x', substr(md5({col}), 1, 15)) AS BIGINT)"
DUCK_HASH32 = "CAST(concat('0x', substr(md5({col}), 1, 8)) AS BIGINT)"
