"""A3: grouped mode (most-frequent value) with a deterministic tie-break.

The reference computes per-group modal coverage with
`tail(names(sort(table(coverage))), 1)` (all coverages.R:313-315) —
R's sort is stable so ties resolve by factor order; we make the
tie-break explicit (highest count, then smallest value) so the result
is deterministic under any partitioning and reproducible by the SQL
oracle.

Plan shape: one partial+final count aggregation (map-side combine is
free from Catalyst) + one min_by aggregation over the small
(group, value, cnt) intermediate — two shuffles total, both on the
group key, so AQE can coalesce, and BOTH stages are partially
aggregable (the min_by pick reduces map-side too, where a row_number
window would have to shuffle and sort every distinct value). At
100 TB this beats collecting per-group value lists by orders of
magnitude: state per group is one row per *distinct* value, not per
input row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_mode(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str = "mode_value",
) -> DataFrame:
    """One row per group: the most frequent value of `value_col`.

    Ties break toward the smallest value (ORDER BY cnt DESC, value ASC),
    matching the oracle SQL emitted in queries.py.
    """
    counted = df.groupBy(*group_cols, value_col).agg(F.count(F.lit(1)).alias("cnt"))
    # min over (-cnt, value) == ORDER BY cnt DESC, value ASC LIMIT 1,
    # but as a partially-aggregable aggregate instead of a sort window;
    # backtick-quoted so names with spaces/reserved words parse (same
    # rule pivot.py applies)
    return counted.groupBy(*group_cols).agg(
        F.expr(
            f"min_by(`{value_col}`, struct(-cnt, `{value_col}`))"
        ).alias(out_col)
    )
