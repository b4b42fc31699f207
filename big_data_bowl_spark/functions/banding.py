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

from pyspark.sql import Column
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
