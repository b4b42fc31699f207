"""Ordered funnel attribution over an event log.

The product-analytics primitive: given an ordered list of step event
types, find for each user the earliest occurrence of step k that is
STRICTLY after their matched step k-1, and report how deep each user
got. The reference has no temporal operators (SURVEY.md §2.11); this
extends the events-table north star.

Scale design: ONE shuffle on the user key feeding a chain of Window
passes — one per step. The passes can't fuse (each step's min is
conditioned on the previous step's output) but they share the single
exchange and sort, so cost is O(steps x events) scan work with no
self-join explosion and one row of state per user. The final same-key
aggregation reuses the partitioning — no second exchange (verified in
the t15 plan audit: 1 exchange, len(steps) Window nodes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ordered_funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """One row per user: t_<step> timestamps (null once the funnel
    breaks) and funnel_depth = number of completed steps."""
    if not steps:
        raise ValueError("ordered_funnel needs at least one step")
    if len(set(steps)) != len(steps):
        # repeated step types would silently overwrite each other's
        # t_<step> column (withColumn replaces); re-entry funnels need
        # positional naming and a different matching rule — refuse
        # loudly rather than corrupt the depth computation
        raise ValueError("ordered_funnel steps must be unique")
    w = Window.partitionBy(user_col)
    out_cols = []
    df = events.select(user_col, type_col, ts_col)
    prev: str | None = None
    for step in steps:
        col = f"t_{step}"
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        df = df.withColumn(col, F.min(F.when(cond, F.col(ts_col))).over(w))
        out_cols.append(col)
        prev = col
    depth = F.lit(len(steps))
    for i, col in enumerate(reversed(out_cols)):
        depth = F.when(F.col(col).isNull(), len(steps) - 1 - i).otherwise(
            depth
        )
    # Marginal-then-aggregate: every window value is constant per user,
    # so first() per key collapses to one row without a join.
    return df.groupBy(user_col).agg(
        *[F.first(c).alias(c) for c in out_cols],
        F.first(depth).alias("funnel_depth"),
    )
