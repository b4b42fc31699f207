"""Distributed as-of join (backward or forward, inclusive).

Spark has no ASOF JOIN. Spelling it as an inequality join
(`l.ts >= r.ts` + pick-latest) plans as a broadcast-nested-loop —
O(n*m) work that falls over at scale. This operator implements the
distributed merge as-of instead: union both sides tagged, shuffle
ONCE on the equality keys, sort each partition by (ts, tag), and
carry the latest right-side row forward with a cumulative
last(ignorenulls) window. Linear per partition, one shuffle total —
the same plan shape a hand-written merge join would give.

Semantics match DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND
l.ts >= r.ts`: every left row gets the right row with the greatest
right-ts <= left-ts (ties inclusive), or NULLs when none precedes it.

The right side must be unique per (keys, ts) — pre-aggregate if it
isn't, otherwise "which tied row wins" is engine-dependent. Right
values are carried as ONE struct through the window so all attached
columns come from the SAME right row even when some are NULL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """Inclusive as-of join of `right` onto `left`.

    direction='backward' (default): greatest right-ts <= left-ts.
    direction='forward': smallest right-ts >= left-ts — the same merge
    with the partition sort reversed (descending ts), so the
    cumulative carry picks up the NEAREST FOLLOWING right row; cost
    and plan shape are identical.

    Output: all left columns, plus the matched right timestamp as
    `{right_ts}{suffix}` and every other right column under its own
    name (suffixed only on collision with a left column).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    rvals = [c for c in right.columns if c not in keys and c != right_ts]
    lcols = [c for c in left.columns if c not in keys]
    out_names = {
        c: c + suffix if c in left.columns else c for c in rvals
    }

    payload = F.struct(
        F.col(right_ts).alias("__mts"),
        *[F.col(c).alias(c) for c in rvals],
    )
    tagged_r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        payload.alias("__match"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__tag"),
    )
    tagged_l = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(None)
        .cast(tagged_r.schema["__match"].dataType)
        .alias("__match"),
        *lcols,
        F.lit(1).alias("__tag"),
    )
    # tag 0 sorts before tag 1 at equal __ts -> inclusive match in
    # either direction; forward just walks time backwards
    ts_order = (
        F.col("__ts").asc()
        if direction == "backward"
        else F.col("__ts").desc()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__match", ignorenulls=True).over(w)
    return (
        tagged_l.unionByName(tagged_r)
        .withColumn("__m", matched)
        .filter(F.col("__tag") == 1)
        .select(
            *keys,
            *lcols,
            F.col("__m.__mts").alias(right_ts + suffix),
            *[
                F.col(f"__m.{c}").alias(out_names[c])
                for c in rvals
            ],
        )
    )
