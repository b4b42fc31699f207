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


def md5_of(*cols: Column, salt: str = "") -> Column:
    """md5 hex digest of the concatenated columns (with optional salt)."""
    parts = [F.lit(salt)] if salt else []
    parts += [c.cast("string") for c in cols]
    return F.md5(F.concat_ws("\x1f", *parts))


def hash_bucket(col: Column, n_buckets: int, salt: str = "") -> Column:
    """Deterministic bucket in [0, n_buckets) from a column value.

    Uses the first 8 hex chars of md5 -> 32-bit int -> mod. DuckDB
    equivalent:
      CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT) % n  -- via conv
    (the queries module emits the matching SQL).
    """
    h = F.conv(F.substring(md5_of(col, salt=salt), 1, 8), 16, 10).cast("bigint")
    return h % n_buckets


def hash_unit_interval(*cols: Column, salt: str = "") -> Column:
    """Deterministic pseudo-uniform double in [0, 1) from column values.

    Used by deterministic_sample / deterministic_split (SURVEY.md O4/O5)
    in place of rand(seed): same rows chosen on any engine, any
    partitioning, any cluster size — rand(seed) in Spark is
    partition-dependent and not reproducible by an external oracle.
    """
    h = F.conv(F.substring(md5_of(*cols, salt=salt), 1, 13), 16, 10).cast("double")
    return h / F.lit(float(16**13))
