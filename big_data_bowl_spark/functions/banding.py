"""Pigeonhole-band pair-emission helpers shared by the hamming
near-dup family (d06 simhash, mm15 image dhash).

Both queries bucket on fixed-width bit-bands of a single integer
fingerprint and emit bucket-local i<j pairs; a pair inside the
hamming threshold can agree on SEVERAL bands, so the same pair is
emitted once per agreeing band. Deduplicating those re-emissions
with a trailing ``.distinct()`` costs a hash aggregate keyed by
PAIR — in-memory state proportional to the candidate-pair space,
the shape the r15/r16 scale probes flagged (measured: 3.5 GB heap
and a 95M-row extra exchange at d06's 100x bucket-count probe).

Because the members' FULL fingerprints already ride in the bucket
(the hamming verify needs them), band agreement for ANY band is a
row-local bitwise recomputation — so each pair can be kept only in
its lowest agreeing band instead: every qualifying pair appears
exactly once by construction, no pair-keyed state, one less
exchange. d02 (minhash LSH) deliberately does NOT use this: its
band keys are md5 digests of signature slices that do not ride in
the bucket, so the equivalent check would put a ~15x payload on
the collect path — its output-pair-keyed spillable ``.distinct()``
is the adjudicated better trade (see nlp._pairs_from_bands).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def band_key(hash_col: Column, band: int, band_bits: int) -> Column:
    """Band `band`'s bucket key: bits [band*band_bits, (band+1)*band_bits)
    of the integer fingerprint — the same expression the banding
    explode uses, so the first-band check below can never drift from
    the bucketing itself."""
    return F.shiftright(hash_col, band * band_bits).bitwiseAND(
        F.lit((1 << band_bits) - 1)
    )


def first_agreeing_band_only(
    band_col: Column, hash_a: Column, hash_b: Column,
    n_bands: int, band_bits: int,
) -> Column:
    """Predicate: TRUE iff `band_col` is the LOWEST band on which the
    two fingerprints agree — i.e. no band jj < band_col also agrees.

    Applied to bucket-local pairs (which by construction agree on
    `band_col`), this keeps each qualifying pair exactly once across
    all its agreeing bands, replacing a pair-keyed ``.distinct()``
    with a row-local bitwise check.
    """
    keep = F.lit(True)
    for jj in range(n_bands - 1):
        agree = band_key(hash_a, jj, band_bits) == band_key(
            hash_b, jj, band_bits
        )
        keep = keep & ~((band_col > jj) & agree)
    return keep


def oversized_buckets(
    df: DataFrame, key_cols: Sequence[str], max_bucket: int
) -> DataFrame:
    """(key..., bucket_size) rows for buckets a `max_bucket` cap
    would drop — the audit companion of `drop_oversized_buckets`,
    mirroring extras.fuzzy_oversized_buckets / nlp.oversized_buckets:
    one count aggregation over the SAME bucket-member rows (bytes-
    bounded map-side state, never the member payloads), output
    bounded by the number of hot keys. Callers that cap MUST surface
    this table — silent truncation reads as full coverage. NULL keys
    are excluded to mirror the pair generators (SQL equi-join
    semantics never pair NULLs, and a NULL bucket would bypass the
    left_anti below anyway — the r16 fuzzy review finding)."""
    keyed = df
    for k in key_cols:
        keyed = keyed.where(F.col(k).isNotNull())
    return (
        keyed.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket)
    )


def drop_oversized_buckets(
    df: DataFrame, key_cols: Sequence[str], max_bucket: int
) -> DataFrame:
    """Pre-collect adversarial-skew cap for bucket-pair builders: drop
    every member row of buckets larger than `max_bucket` BEFORE the
    downstream `collect_list` sees them (VERDICT r16 item 1 — the
    `_fuzzy_blocked_pairs` r16 spelling, shared so the perceptual
    triad's builders cannot re-grow the post-collect cap the fuzzy
    family already fixed).

    The count pre-pass (the audit's own aggregation, so cap and audit
    cannot diverge) holds only per-key counts in map-side state; the
    hot-key list is bounded by construction (count > max_bucket can
    match at most rows/max_bucket keys) and broadcasts into a
    left_anti — after it, no reducer-side collect ever materializes a
    bucket larger than the cap, so reducer-resident state is
    <= max_bucket x payload on ANY corpus, including one with a
    planted viral key. NULL-keyed rows are dropped up front in the
    capped path (they carry no blocking information, never pair under
    SQL equi-join semantics, and would slip through the left_anti).
    """
    if max_bucket < 2:
        raise ValueError(
            f"max_bucket must be >= 2, got {max_bucket} — a cap "
            "below 2 drops every pair-generating bucket"
        )
    for k in key_cols:
        df = df.where(F.col(k).isNotNull())
    hot = oversized_buckets(df, key_cols, max_bucket).select(*key_cols)
    return df.join(F.broadcast(hot), list(key_cols), "left_anti")
