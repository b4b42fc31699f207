"""Grouped fixed-width histograms — the density-estimation step of the
reference's ridgeline plot (all coverages.R:355-362: per-coverage EPA
densities over epa in (-2, 2)) as engine-side DATA.

geom_density_ridges is a kernel-density render of a per-group value
distribution; the distributed-engine analogue is a (group, bin) count
table: one filter + one hash aggregate, a single shuffle of
(group, bin)-sized partials — at 100 TB the map-side combine reduces
each partition to at most n_groups x nbins rows before anything moves.
The sink (sinks/viz.py save_ridgeline_html) draws the small result.

Bin arithmetic is floor((v - lo) / width) with width = (hi - lo) /
nbins inlined as one double literal, so Spark and DuckDB compute
bit-identical bin ids (same IEEE ops, same literals) and counts are
integers — the oracle is exact, no rounding policy needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# shared defaults for the registered a21 (batch) / t26 (streaming)
# histogram queries — same literals in both engines' bin arithmetic
HIST_LO, HIST_HI, HIST_NBINS = 0.0, 100.0, 40


def bin_exprs(value: Column, lo: float, hi: float, nbins: int):
    """(strict-range predicate, bin_idx LONG, bin_bounds) column
    pieces shared by the batch and streaming histogram spellings.

    `bin_bounds(idx)` maps a bin-index Column — typically the grouped
    output column, under WHATEVER name the caller aliased it — to its
    (bin_lo, bin_hi) edge Columns. Taking the caller's column instead
    of hardcoding F.col("bin_idx") removes the hidden alias contract
    (ADVICE r9): bounds are a pure function of the index they're
    handed, so a caller grouping under a different alias gets correct
    edges rather than an unresolved-column error (or a silent bind to
    an unrelated bin_idx).

    Raises ValueError on a degenerate range or bin count — silent
    division by zero here would emit NaN bin indices that groupBy
    collapses into one garbage bin (the zorder.py quantize guard,
    applied to binning)."""
    if hi <= lo:
        raise ValueError(f"histogram range is degenerate: [{lo}, {hi}]")
    if nbins <= 0:
        raise ValueError(f"nbins must be positive, got {nbins}")
    width = (hi - lo) / nbins
    v = value.cast("double")
    keep = (v > lo) & (v < hi)
    bin_idx = F.floor((v - F.lit(lo)) / F.lit(width)).cast("long")

    def bin_bounds(idx: Column) -> tuple[Column, Column]:
        return (
            F.lit(lo) + idx * F.lit(width),
            F.lit(lo) + (idx + 1) * F.lit(width),
        )

    return keep, bin_idx, bin_bounds


def grouped_histogram(
    df: DataFrame,
    group_col: str,
    value: Column,
    lo: float,
    hi: float,
    nbins: int,
) -> DataFrame:
    """(group, bin_idx, bin_lo, bin_hi, n) for values STRICTLY inside
    (lo, hi) — the reference filters epa > -2 AND epa < 2 with strict
    bounds (all coverages.R:356-357), so boundary values drop rather
    than landing in an edge bin. bin_idx = floor((v - lo) / width)."""
    if hi <= lo:
        raise ValueError(f"grouped_histogram needs lo < hi, got [{lo}, {hi}]")
    if nbins < 1:
        raise ValueError(f"nbins must be >= 1, got {nbins}")
    keep, bin_idx, bin_bounds = bin_exprs(value, lo, hi, nbins)
    bin_lo, bin_hi = bin_bounds(F.col("bin_idx"))
    return (
        df.filter(keep)
        .groupBy(F.col(group_col).alias("grp"), bin_idx.alias("bin_idx"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "grp",
            "bin_idx",
            bin_lo.alias("bin_lo"),
            bin_hi.alias("bin_hi"),
            "n",
        )
    )


def grouped_histogram_sql(
    table: str,
    group_expr: str,
    value_expr: str,
    lo: float,
    hi: float,
    nbins: int,
) -> str:
    """The DuckDB mirror: identical literals, identical IEEE bin
    arithmetic, integer counts — exact."""
    if hi <= lo:
        raise ValueError(f"histogram range is degenerate: [{lo}, {hi}]")
    if nbins <= 0:
        raise ValueError(f"nbins must be positive, got {nbins}")
    width = (hi - lo) / nbins
    return f"""
    SELECT {group_expr} AS grp,
           CAST(floor((CAST({value_expr} AS DOUBLE) - {lo!r}) / {width!r})
                AS BIGINT) AS bin_idx,
           {lo!r} + CAST(floor((CAST({value_expr} AS DOUBLE) - {lo!r})
                / {width!r}) AS BIGINT) * {width!r} AS bin_lo,
           {lo!r} + (CAST(floor((CAST({value_expr} AS DOUBLE) - {lo!r})
                / {width!r}) AS BIGINT) + 1) * {width!r} AS bin_hi,
           COUNT(*) AS n
    FROM {table}
    WHERE CAST({value_expr} AS DOUBLE) > {lo!r}
      AND CAST({value_expr} AS DOUBLE) < {hi!r}
    GROUP BY 1, 2
    """
