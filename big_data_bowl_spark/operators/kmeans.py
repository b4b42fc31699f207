"""Distributed k-means (Lloyd's algorithm) over an array<double>
embedding column.

Each iteration is the declarative step proven by the
`v05_kmeans_step` oracle (queries/vectors.py): assign every vector to
its nearest centroid via a per-row argmin EXPRESSION over the k
driver-side centroid literals — never a crossJoin, never a
corpus-sized shuffle — then recompute centroids as element-wise means
in long (cell, dim) form, whose partial aggregation combines
map-side to k x dim rows per task.

r13 rewrite (found by tools/shuffle_metrics.py): the previous
spelling assigned via corpus.crossJoin(broadcast(cent)) +
groupBy(vec_id).min_by — the min_by partials collapse the k-fold
explosion map-side, but the groupBy exchange still moved the ENTIRE
corpus, vectors included, once per iteration (~420 B/row measured).
Centroids are k x dim doubles — driver-side model state by any
honest reading (the convergence check already collected a scalar per
round) — so each round now collects the (cell, dim) aggregate
(k x dim rows, the same payload the old plan shuffled to build
`new_cent`) and embeds the updated centroids as one-parse SQL
literals in the next round's assignment (functions/sqltext.py
exactness contracts). This is how spark.ml's own KMeans iterates:
centers live on the driver, only sufficient statistics cross the
network. Per-iteration network cost: k x dim x n_tasks partial rows;
the corpus never leaves its partitions.

Scale notes (100 TB):
- Per-iteration cost: one corpus scan + one map-side-combined
  (cell, dim) aggregation; nothing data-sized shuffles.
- Convergence is detected on max centroid displacement, computed on
  the driver from the collected k x dim means.
- Empty cells keep their previous centroid (standard Lloyd fix).
- The corpus projection is localCheckpoint'd once so round n doesn't
  re-evaluate upstream lineage (same discipline as
  operators/components.py); a cluster deployment would persist or
  re-scan the lake instead.

The reference repo has no clustering; this backs the IVF ANN path
(v04) with trained, rather than sampled, coarse centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sqltext import nearest_cell_sql, sql_darr


def nearest_cell_expr(cv_name: str, cent_rows):
    """Column: argmin-distance cell id for `cv_name` over literal
    (cid, kv) centroid rows — ONE F.expr parse however many centroids
    (see functions/sqltext.nearest_cell_sql for the exactness and
    tie-break contract)."""
    return F.expr(nearest_cell_sql(cv_name, cent_rows))


def seed_centroid_rows(corp: DataFrame, k: int) -> list:
    """Deterministic seeds: the k lowest-id vectors, renumbered
    0..k-1 in id order. A k-row driver collect — model
    initialization, the same metadata class as the per-round
    centroid state."""
    rows = corp.orderBy("vid").limit(k).collect()
    return [(i, [float(x) for x in r["cv"]]) for i, r in enumerate(rows)]


def step_stats(corp: DataFrame, cent_rows) -> DataFrame:
    """One Lloyd step's sufficient statistics: assign by literal
    argmin (a projection — no join, no corpus shuffle), then the
    (cell, dim) member counts and mean components. The groupBy
    partial-aggregates map-side, so the only exchange carries
    k x dim rows per task."""
    assign = corp.select(
        nearest_cell_expr("cv", cent_rows).alias("cell"), "cv"
    )
    dims = assign.select(
        "cell", F.posexplode("cv").alias("dim_idx", "val")
    )
    return dims.groupBy("cell", "dim_idx").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("val") / F.count(F.lit(1))).alias("m"),
    )


def collect_step(corp: DataFrame, cent_rows) -> dict:
    """Run one step and collect its k x dim sufficient statistics:
    {cell: (n_members, [means by dim])}."""
    by_cell: dict = {}
    for r in step_stats(corp, cent_rows).collect():
        by_cell.setdefault(int(r["cell"]), {})[int(r["dim_idx"])] = (
            int(r["n"]),
            float(r["m"]),
        )
    return {
        cell: (
            dims[0][0],  # every member contributes one dim-0 row
            [dims[i][1] for i in range(len(dims))],
        )
        for cell, dims in by_cell.items()
    }


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

    cent = seed_centroid_rows(corp, k)
    members = {cid: 0 for cid, _ in cent}
    for _ in range(max_iter):
        stats = collect_step(corp, cent)
        new_cent, max_move = [], 0.0
        members = {}
        for cid, kv in cent:
            if cid in stats:
                n, means = stats[cid]
                max_move = max(
                    max_move,
                    max(abs(a - b) for a, b in zip(kv, means)),
                )
                new_cent.append((cid, means))
                members[cid] = n
            else:  # empty cell keeps its previous centroid
                new_cent.append((cid, kv))
                members[cid] = 0
        cent = new_cent
        if max_move <= tol:
            break

    spark = corpus.sparkSession
    vals = ",".join(
        f"({cid}, {sql_darr(kv)}, {members[cid]})" for cid, kv in cent
    )
    return spark.sql(
        f"SELECT CAST(cid AS INT) AS cid, kv, "
        f"CAST(n_members AS BIGINT) AS n_members "
        f"FROM (VALUES {vals}) AS t(cid, kv, n_members)"
    )
