"""Scale-safe contiguous global row numbering.

``row_number() OVER (ORDER BY k)`` — the reference's zip/rowid idiom
(all coverages.R:300-306) — plans as Exchange SinglePartition + sort:
the WHOLE table funnels through one task. This operator produces the
identical contiguous 1-based ordinal with a two-phase rank:

1. Bucket each row by a DETERMINISTIC range function of the key:
   ``bucket = floor((k - min) / width)`` from a one-row min/max
   aggregate. (Deliberately NOT ``repartitionByRange`` +
   ``spark_partition_id``: Spark's RangePartitioner samples with a
   per-RDD-id seed, so boundaries can differ between the count action
   and the final action, corrupting the offsets — observed, not
   hypothetical.)
2. Count rows per bucket and collect the counts to the driver —
   ``n_buckets`` rows, a metadata-sized action (same legitimacy class
   as the k-means convergence scalar) — then prefix-sum into offsets.
3. ``row_number`` within each bucket (parallel WindowExec, one hash
   shuffle on the bucket id) + the bucket's broadcast offset.

Every stage is parallel and deterministic; cost is two scans of the
input (a map-side-combined count + the ranked pass) and ONE shuffle.
Buckets default to 4x parallelism so moderate key skew still spreads.

Caveats (documented contract):
- ``order_col`` must be numeric, non-null, and non-NaN (the
  reference's zip keys are). The contract is ENFORCED: a null or NaN
  key would silently floor to a null bucket and vanish at the inner
  join (and NaN poisons the min/max bounds), so the bounds aggregate
  also counts violations and raises — one extra column on an action
  the operator already runs (ADVICE r3).
- Pathologically skewed keys make value-width buckets uneven —
  for those, sample boundaries explicitly and pass them via
  ``boundaries``; the numbering logic is boundary-agnostic.
- With duplicate keys straddling a bucket edge, ties are numbered by
  bucket order — exactly as nondeterministic as row_number itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_row_number(
    df: DataFrame,
    order_col: str,
    out_col: str = "row_num",
    num_buckets: int | None = None,
    boundaries: "list[float] | None" = None,
) -> DataFrame:
    """Attach a contiguous 1-based global ordinal over `order_col`.

    Equivalent to ``ROW_NUMBER() OVER (ORDER BY order_col)`` but with
    no single-partition exchange anywhere in the plan.

    ``boundaries``: optional explicit sorted cut points (the skew
    escape hatch the module docstring promises): bucket(key) = number
    of boundaries <= key, giving len(boundaries)+1 buckets however
    the data is distributed — pass sampled quantiles for
    pathologically skewed keys instead of the default equal-width
    grid.
    """
    spark = df.sparkSession
    n = num_buckets or 4 * spark.sparkContext.defaultParallelism
    key = F.col(order_col).cast("double")
    lo, hi, n_rows, n_keys, n_nan = df.agg(
        F.min(order_col).cast("double"),
        F.max(order_col).cast("double"),
        F.count(F.lit(1)),
        F.count(order_col),
        F.sum(F.when(F.isnan(key), 1).otherwise(0)),
    ).collect()[0]
    if n_keys < n_rows or (n_nan or 0) > 0:
        raise ValueError(
            f"with_global_row_number: order_col {order_col!r} has "
            f"{n_rows - n_keys} null and {n_nan or 0} NaN values; the "
            "key must be numeric, non-null, non-NaN (nulls/NaNs would "
            "silently drop at the bucket join)"
        )
    if boundaries is not None:
        cuts = sorted(float(b) for b in boundaries)
        bucket = F.lit(0)
        for b in cuts:
            bucket = bucket + (key >= F.lit(b)).cast("int")
        bucket = bucket.cast("int")
    elif lo is None or hi is None or hi <= lo:
        # empty input or a single key value: one bucket is exact
        bucket = F.lit(0)
    else:
        width = (hi - lo) / n
        bucket = F.least(
            F.floor((F.col(order_col).cast("double") - F.lit(lo)) / width),
            F.lit(n - 1),
        ).cast("int")
    bucketed = df.withColumn("__bkt", bucket)
    counts = dict(bucketed.groupBy("__bkt").count().collect())
    offsets, acc = [], 0
    for b in sorted(counts):
        offsets.append((b, acc))
        acc += counts[b]
    off_df = spark.createDataFrame(
        offsets, "__bkt int, __offset long"  # explicit: offsets may be empty
    )
    w = Window.partitionBy("__bkt").orderBy(order_col)
    return (
        bucketed.join(F.broadcast(off_df), "__bkt")
        .withColumn(out_col, F.row_number().over(w) + F.col("__offset"))
        .drop("__bkt", "__offset")
    )
