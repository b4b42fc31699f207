"""Z-order (Morton) clustering — the lakehouse data-layout operator
(Delta/Iceberg `OPTIMIZE ZORDER BY`, public docs/papers; Morton 1966).

A table sorted on ONE column prunes scans only for predicates on that
column. Interleaving the bits of several columns' rank codes into one
Morton key and range-partitioning + sorting on IT gives every
interleaved dimension partial locality: a small box predicate in any
of the dimensions touches a small fraction of the z-runs, so parquet
row-group min/max stats (or file-level stats in a table format) prune
on ALL of them. This module keeps the key computation declarative —
pure bitwise column expressions, whole-stage codegen, no UDF — so the
writer is just `repartitionByRange(z).sortWithinPartitions(z)`.

The mirrored DuckDB SQL (`zorder_sql`) makes the key oracle-exact:
both engines interleave identical integer codes with identical
shift/mask arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) integer codes by linear
    scaling over [lo, hi] (clamped), rounding half-up
    (floor(scaled + 0.5)). The code is a pure function of the value —
    no data-dependent quantiles, so the code of a row never depends on
    partitioning or on other rows."""
    if hi <= lo:
        raise ValueError(
            f"quantize needs lo < hi, got [{lo}, {hi}] — a degenerate "
            "range would divide by zero and emit NaN/null codes"
        )
    n = (1 << bits) - 1
    scaled = (col.cast("double") - lo) / (hi - lo) * n
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(float(n)))
    return F.floor(clamped + 0.5).cast("long")


def quantize_sql(expr: str, lo: float, hi: float, bits: int) -> str:
    if hi <= lo:
        raise ValueError(f"quantize_sql needs lo < hi, got [{lo}, {hi}]")
    n = (1 << bits) - 1
    return (
        f"CAST(floor(least(greatest((CAST({expr} AS DOUBLE) - {lo}) "
        f"/ ({hi} - {lo}) * {n}, 0.0), {float(n)}) + 0.5) AS BIGINT)"
    )


def interleave2(x: Column, y: Column, bits: int) -> Column:
    """Morton key of two `bits`-bit codes: x's bit i lands at 2i+1,
    y's at 2i — a fixed sum of shift/mask terms, fully codegen'd."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(1), 2 * i + 1)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(1), 2 * i)
        )
    return z


def interleave2_sql(x: str, y: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    z: Column,
    path: str,
    n_files: int = 16,
) -> None:
    """The layout writer: range-partition on the Morton key and sort
    inside each partition, so each output file (and each parquet
    row group within it) covers one contiguous z-run — the min/max
    stats any engine prunes with. Same mechanics as Delta's OPTIMIZE
    ZORDER rewrite, expressed with stock Spark operators."""
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
