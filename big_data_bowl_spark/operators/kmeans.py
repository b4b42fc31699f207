"""Distributed k-means (Lloyd's algorithm) over an array<double>
embedding column.

Each iteration is the declarative step proven by the
`v05_kmeans_step` oracle (queries/vectors.py): assign every vector to
its nearest centroid via argmin(||k||² − 2·c·k) over BROADCAST
centroids — a map-side `min_by`, never a corpus×k window — then
recompute centroids as element-wise means in long (cell, dim) form.

Scale notes (100 TB):
- Per-iteration cost: one corpus scan + one (cell, dim) aggregation
  whose output is k×dim rows. Centroids (k×dim doubles) always fit
  in a broadcast.
- Convergence is detected on max centroid displacement — one extra
  k×dim-row action per round, trivial next to the scan.
- `localCheckpoint` pins each round's centroids so round n doesn't
  re-evaluate rounds 1..n-1 (same discipline as
  operators/components.py).
- Empty cells keep their previous centroid (standard Lloyd fix).

The reference repo has no clustering; this backs the IVF ANN path
(v04) with trained, rather than sampled, coarse centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_fit(
    corpus: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    k: int = 8,
    max_iter: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """Run Lloyd's iterations until max centroid movement <= tol.

    Initial centroids are the k lowest-id vectors (deterministic).
    Returns DataFrame[cid, kv: array<double>, n_members].
    """
    vec = F.col(vec_col).cast("array<double>")
    corp = (
        corpus.select(F.col(id_col).alias("vid"), vec.alias("cv"))
        .where(F.col("cv").isNotNull())
        .localCheckpoint()  # scan input once, reuse every round
    )

    w0 = Window.orderBy("vid")
    cent = (
        corp.orderBy("vid")
        .limit(k)
        .select(
            (F.row_number().over(w0) - 1).alias("cid"),
            F.col("cv").alias("kv"),
        )
        .localCheckpoint()
    )
    for _ in range(max_iter):
        d = _dot(F.col("kv"), F.col("kv")) - 2.0 * _dot(
            F.col("cv"), F.col("kv")
        )
        assign = (
            corp.crossJoin(F.broadcast(cent))
            .select("vid", "cv", "cid", d.alias("d"))
            .groupBy("vid")
            .agg(
                F.expr("min_by(cid, struct(d, cid))").alias("cell"),
                F.first("cv").alias("cv"),
            )
        )
        dims = assign.select(
            "cell", F.posexplode("cv").alias("dim_idx", "val")
        )
        new_cent = (
            dims.groupBy("cell", "dim_idx")
            .agg(
                F.count(F.lit(1)).alias("n"),
                (F.sum("val") / F.count(F.lit(1))).alias("m"),
            )
            .groupBy("cell")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim_idx", "m"))
                ).alias("pairs"),
                # member count = the dim-0 row's count: every vector in
                # the cell contributes exactly one dim_idx==0 row, so
                # this stays exact even if arrays are ragged (where
                # first() over differing per-dim counts is arbitrary)
                F.max(
                    F.when(F.col("dim_idx") == 0, F.col("n"))
                ).alias("n_members"),
            )
            .select(
                F.col("cell").alias("cid"),
                F.transform(F.col("pairs"), lambda p: p["m"]).alias("kv"),
                "n_members",
            )
        )
        # empty cells keep their previous centroid
        stepped = (
            cent.alias("old")
            .join(new_cent.alias("new"), "cid", "left")
            .select(
                "cid",
                F.coalesce("new.kv", "old.kv").alias("kv"),
                F.coalesce("new.n_members", F.lit(0)).alias("n_members"),
                F.when(F.col("new.kv").isNull(), F.lit(0.0))
                .otherwise(
                    F.array_max(
                        F.zip_with(
                            "old.kv",
                            "new.kv",
                            lambda a, b: F.abs(a - b),
                        )
                    )
                )
                .alias("moved"),
            )
            .localCheckpoint()
        )
        max_move = stepped.agg(F.max("moved")).collect()[0][0]
        prev_cent = cent
        cent = stepped.select("cid", "kv", "n_members").localCheckpoint()
        # release superseded checkpoints (stepped fed cent, which is
        # now materialized; prev_cent fed stepped): without this a
        # long run pins O(iters x k x dim) storage (review r7). The
        # INITIAL cent may not be a checkpoint — unpersist is a no-op
        # on non-persisted frames.
        stepped.unpersist()
        prev_cent.unpersist()
        if max_move is not None and max_move <= tol:
            break
    return cent
