"""Text-analysis column builders (north-star extensions, BASELINE.json).

Language-ID, quality scoring, token counting and fingerprinting for a
training-data pipeline over the `documents` table. Everything here is
native Column expressions (JVM-side, codegen-friendly) — no Python in
the hot path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language ID. Deliberately small + deterministic; real pipelines swap
# in fastText etc. outside the engine.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("de", "shi", "le", "zai", "he"),
}

TOKEN_PATTERN = r"\s+"


def token_count(text: Column) -> Column:
    """Whitespace token count. size(split(trim(text), '\\s+'))."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, TOKEN_PATTERN))
    )


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation."""
    n = F.length(text)
    punct = n - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n)


def stopword_hits(text: Column, words: tuple[str, ...]) -> Column:
    """How many occurrences of the given stopwords appear (word-bounded).

    Counts with \\b word-boundary regexes so adjacent occurrences all
    count ("the the the" -> 3) — the replace(' w ', ' ') trick
    undercounts because each replacement consumes the shared space.
    Oracle-checkable: DuckDB spells the same count as
    len(regexp_extract_all(text, '\\bw\\b')) (both engines' regex
    dialects agree on \\b).
    """
    lowered = F.lower(text)
    total = F.lit(0)
    for w in words:
        # re.escape keeps words with regex metacharacters ('c++',
        # 'a.b') from THROWING; the SQL mirror escapes the same way
        # (queries/nlp.py _lang_hits_sql). Note the \b contract:
        # words must start AND end with word characters, or the
        # boundary can't match ('c++' counts 0 — \b between '+' and
        # space never fires). Current stopword lists are alphabetic.
        total = total + F.regexp_count(lowered, F.lit(rf"\b{re.escape(w)}\b"))
    return total


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0, 1].

    Combines length saturation, punctuation sanity and mean word
    length — the shape of the Gopher/C4-style filters, reduced to
    engine-native expressions.
    """
    n_tok = token_count(text)
    mean_word_len = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(text, r"\s+", "")).cast("double") / n_tok
    )
    length_component = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    punct_component = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    wordlen_component = F.when(
        (mean_word_len >= 2.0) & (mean_word_len <= 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    return (length_component + punct_component + wordlen_component) / F.lit(3.0)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace/case-normalized text.

    Rolling-hash flavored content signature — two documents that differ
    only in spacing/case collide, which is the point for exact-ish
    dedup keys.
    """
    normalized = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))
    return F.md5(normalized)


def tokenize(text: Column) -> Column:
    """Lowercased whitespace tokens — the shingle input."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def shingles_from_tokens(tokens: Column, k: int = 3) -> Column:
    """Array of k-word shingles from a token-ARRAY column.

    PERFORMANCE CONTRACT: ``tokens`` must be a materialized column
    (bound attribute), not an inline ``split(...)`` expression. The
    lambda below references it k+2 times, and higher-order-function
    lambdas run interpreted — an inline split would re-tokenize the
    document O(k * n_shingles) times, turning a linear scan quadratic
    (measured 20s -> 2s on 5k docs when hoisted).
    """
    n = F.size(tokens)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n < k, F.array(F.concat_ws(" ", tokens))).otherwise(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(tokens, (i + j + 1).cast("int")) for j in range(k)],
            ),
        )
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Array of k-word shingles of a TEXT column (convenience form).

    Only for small/test use: the inline tokenization is re-evaluated
    per lambda reference (see shingles_from_tokens) — in query paths,
    materialize ``tokenize(text)`` with a select/withColumn first and
    call shingles_from_tokens on the bound column.
    """
    return shingles_from_tokens(tokenize(text), k)


# Rolling-hash fingerprint parameters. BASE/MOD are classic polynomial-
# hash constants; MOD ~2^30 keeps every intermediate (acc*BASE + h48,
# h48 < 2^48) far inside int64, so Spark and DuckDB fold identically.
ROLL_BASE = 31
ROLL_MOD = 1_000_000_007


def token_hash48(token: Column) -> Column:
    """48-bit integer hash of a token: first 12 hex chars of its md5.

    Slicing one digest (see queries/nlp.py on slice independence) keeps
    the hash deterministic and reproducible in any engine with md5 —
    no engine-specific hash() in the fingerprint.
    """
    return F.conv(
        F.substring(F.md5(token.cast("binary")), 1, 12), 16, 10
    ).cast("long")


def rolling_hash(tokens: Column, base: int = ROLL_BASE, mod: int = ROLL_MOD) -> Column:
    """Order-sensitive polynomial rolling hash of a token array:
    fold(acc -> (acc * base + hash(token)) % mod, init 0).

    Unlike the order-insensitive md5 fingerprint, two documents with
    the same words in different order get different fingerprints. One
    narrow pass per document, constant state — scale-safe.

    PERFORMANCE CONTRACT: ``tokens`` must be a materialized column
    (same reason as shingles_from_tokens).
    """
    hashes = F.transform(tokens, token_hash48)
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(base) + h) % F.lit(mod),
    )
