"""Portable deterministic hashing helpers.

Everything in the dedup / sampling / similarity stack that needs a
"random-looking" value derives it from md5, because md5 is bit-for-bit
identical in Spark (F.md5) and DuckDB (md5()) — that makes MinHash
signatures, deterministic samples and hash-based splits exactly
reproducible by the SQL oracle, unlike engine-native hash() functions
(Spark Murmur3 vs DuckDB's hash are incompatible) or RNG-based
sampling (SURVEY.md §7 risk 3: R/Spark RNG parity is impossible, so
the engine's samplers are hash-based by design).

At 100 TB md5 costs more than xxhash, but these operators hash short
strings (shingles, keys) — the scan still dominates. A faster
non-oracle variant can swap F.md5 for F.xxhash64 via the `hash_col`
hooks without touching operator logic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# Unit-separator (0x1f) keeps multi-column keys unambiguous: a printable
# separator like '|' would make ('a|b','c') and ('a','b|c') collide.
_SEP = "\x1f"


def md5_of(*cols: Column, salt: str = "") -> Column:
    """md5 hex digest of the 0x1f-joined columns (with optional salt).

    NULL columns map to a chr(0) sentinel BEFORE joining: concat_ws
    silently drops NULL arguments, so without the sentinel ('a',
    NULL), (NULL, 'a') and ('a',) would all hash identically — a
    deterministic key collision for any nullable key column (review
    r7). chr(0) cannot appear in a cast-to-string value, so the
    sentinel is unambiguous.

    DuckDB mirror: md5(concat_ws(chr(31), 'salt',
    COALESCE(CAST(c AS VARCHAR), chr(0)), ...)).
    """
    parts = [F.lit(salt)] if salt else []
    parts += [
        F.coalesce(c.cast("string"), F.lit("\x00")) for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def md5_sql(*exprs: str, salt: str = "") -> str:
    """The DuckDB SQL string mirroring md5_of over the same exprs."""
    parts = [f"'{salt}'"] if salt else []
    parts += [
        f"COALESCE(CAST({e} AS VARCHAR), chr(0))" for e in exprs
    ]
    return f"md5(concat_ws(chr(31), {', '.join(parts)}))"


def hex_threshold(fraction: float, digits: int = 13) -> str:
    """Hex string h such that P[substr(md5(x),1,digits) < h] = fraction.

    md5 hex chars are uniform, so comparing the hex PREFIX against a
    threshold string selects an exact fraction of rows — in any engine,
    with plain string comparison, no hex->int parsing (DuckDB has no
    conv()). fraction=0.75 -> 'c000000000000'.

    Only meaningful for fraction in [0, 1): at 1.0 the encoded value is
    digits+1 chars wide and the lexicographic prefix compare breaks, so
    callers must special-case it (hash_lt_fraction does).
    """
    if not 0.0 <= fraction < 1.0:
        raise ValueError(
            f"hex_threshold needs 0 <= fraction < 1, got {fraction}; "
            "handle fraction >= 1 as a constant-true predicate"
        )
    return format(int(fraction * 16**digits), f"0{digits}x")


def hash_lt_fraction(col: Column, fraction: float, digits: int = 13) -> Column:
    """True for a deterministic `fraction` of rows, keyed on md5(col).

    fraction >= 1 keeps everything and fraction <= 0 keeps nothing,
    rather than silently mis-comparing against an over-wide hex string.
    """
    if fraction >= 1.0:
        return F.lit(True)
    if fraction <= 0.0:
        return F.lit(False)
    return F.substring(col, 1, digits) < F.lit(hex_threshold(fraction, digits))
