"""O4/O5: deterministic sampling and train/test splitting.

The reference seeds R's RNG (`set.seed(123); sample_n(1)`,
Tutorial.R:36-40; 75/25 index split, all coverages.R:193-199). R and
Spark RNGs can never agree, and Spark's rand(seed) is additionally
partition-layout-dependent — useless both for an external oracle and
for reproducibility across cluster sizes (SURVEY.md §7 risk 3).

These samplers therefore derive per-row uniforms from md5 of a key
column: fully deterministic on any engine, any partitioning, any
scale, and exactly reproducible by the DuckDB oracle. `randomSplit`
remains available for ML where statistical (not bitwise) behavior is
what matters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash_lt_fraction, md5_of


def deterministic_sample(
    df: DataFrame, key_cols: Sequence[str], n: int, salt: str = "123"
) -> DataFrame:
    """Exactly-n pseudo-random sample, stable across engines/partitionings.

    Orders by md5(key) and takes n — the hash order is the "shuffle".
    The global sort is fine because n is small (Spark plans
    orderBy+limit as TakeOrderedAndProject: per-partition top-n, then
    a driver merge of n*partitions rows — no full sort, no shuffle);
    don't use this to sample millions of rows (use a hash threshold
    filter instead — see deterministic_split).
    """
    h = md5_of(*[F.col(c) for c in key_cols], salt=salt)
    return df.orderBy(h.asc()).limit(n)


def deterministic_split(
    df: DataFrame,
    key_cols: Sequence[str],
    train_fraction: float = 0.75,
    salt: str = "123",
) -> tuple[DataFrame, DataFrame]:
    """Hash-threshold train/test split (reference's seeded 75/25, O5).

    A narrow filter on each side — no shuffle, no sort, scales to any
    size; the split is a pure function of the row key so it survives
    re-partitioning and incremental reloads (critical for training-
    data pipelines: a row never migrates between train and test).
    The threshold is a hex-string prefix compare (hashing.hex_threshold)
    so the DuckDB oracle reproduces the exact row assignment.
    """
    h = md5_of(*[F.col(c) for c in key_cols], salt=salt)
    is_train = hash_lt_fraction(h, train_fraction)
    train = df.filter(is_train)
    test = df.filter(~is_train)
    return train, test
