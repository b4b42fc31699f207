"""Graph analytics over the near-dup similarity graph.

The reference has no graph operators; connected components
(operators/components.py, d05/v08) established the pair-graph story —
g01 adds the other canonical iterative graph algorithm, PageRank, as a
bounded-iteration Catalyst loop with a full value oracle.

Why PageRank on a dedup pipeline: on a near-duplicate similarity
graph, high-rank documents are the "canonical centers" of duplicate
neighborhoods — a principled keep-one choice (keep the most-linked
version) where d05 keeps min-id. The same loop shape (join + grouped
sum per round, lineage truncated per round) is the template for any
fixed-point iteration on edges — label propagation, HITS, harmonic
centrality.

Scale design:
- The symmetric edge table is hash-partitioned on the source key ONCE
  and localCheckpoint'd; every iteration's join then shuffles only the
  rank table (node-sized), never the edges (the classic distributed
  PageRank layout — edges dwarf nodes at 100 TB).
- Each iteration is one join + one grouped decimal sum (map-side
  combined). K iterations = K joins, no driver-side data.
- The only driver action is the node count (one scalar, like the
  k-means convergence check).

Float policy (queries/base.py): per-node contributions are decimal-
summed (order-independent across partitionings) and every rank is
rounded half-up to 12 decimals per iteration, so both engines iterate
over IDENTICAL values — the oracle is an exact value match, not a
tolerance check.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import rhu
from .base import register
from .nlp import _D02_ORACLE, d02_dedup_minhash_lsh

PR_ITERS = 5
PR_DAMPING = 0.85
PR_SCALE = 12  # rank rounding, digits


def _pr_oracle() -> str:
    """Unrolled K-iteration PageRank as chained CTEs on top of the d02
    candidate-pair chain (no recursive CTE: several engines disallow
    aggregation in the recursive term — unrolling is portable and the
    iteration count is a constant of the operator)."""

    def rhu12(expr: str) -> str:
        p = 10.0**PR_SCALE
        return f"floor(({expr}) * {p!r} + 0.5) / {p!r}"

    parts = [
        f"WITH cand AS ({_D02_ORACLE})",
        "sym AS (SELECT doc_a AS u, doc_b AS v FROM cand "
        "UNION SELECT doc_b, doc_a FROM cand)",
        "deg AS (SELECT u, COUNT(*) AS deg FROM sym GROUP BY u)",
        "nodes AS (SELECT DISTINCT u AS node FROM sym)",
        "nn AS (SELECT COUNT(*) AS c FROM nodes)",
        f"r0 AS (SELECT node, {rhu12('1.0 / (SELECT c FROM nn)')} AS rank "
        "FROM nodes)",
    ]
    for i in range(1, PR_ITERS + 1):
        update = (
            f"{1.0 - PR_DAMPING!r} / (SELECT c FROM nn) + {PR_DAMPING!r} * "
            f"CAST(SUM(CAST(r.rank / d.deg AS DECIMAL(38,{PR_SCALE + 3}))) "
            "AS DOUBLE)"
        )
        parts.append(
            f"r{i} AS (SELECT s.v AS node, {rhu12(update)} AS rank "
            f"FROM r{i - 1} r "
            "JOIN sym s ON s.u = r.node "
            "JOIN deg d ON d.u = r.node "
            "GROUP BY s.v)"
        )
    return (
        ", ".join(parts)
        + f" SELECT node AS doc_id, rank AS pagerank FROM r{PR_ITERS}"
    )


@register(
    "g01_pagerank_neardup",
    oracle=_pr_oracle(),
    note=f"G1 PageRank ({PR_ITERS} iterations, damping {PR_DAMPING}) "
    "over the symmetric d02 near-dup candidate graph: rank-weighted "
    "canonical-document selection, and the template for any "
    "fixed-point edge iteration. Edges are repartitioned on the "
    "source key once and checkpointed, so each iteration shuffles "
    "only the node-sized rank table; per-node sums are decimal "
    "(order-independent) and ranks round half-up to "
    f"{PR_SCALE} decimals per iteration — both engines iterate over "
    "identical values, making the oracle an exact match. The oracle "
    "unrolls the iterations as chained CTEs (portable — no "
    "aggregation-in-recursion).",
)
def g01_pagerank_neardup(spark: SparkSession, sf_dir: str):
    pairs = d02_dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    sym = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
        .distinct()
        # partition the (large) edge table on the join key ONCE; every
        # iteration's join reuses it and shuffles only the rank table
        .repartition("u")
        .localCheckpoint()
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    nodes = sym.select(F.col("u").alias("node")).distinct()
    n = nodes.count()  # one metadata-sized driver scalar (cf. k-means)

    ranks = nodes.withColumn("rank", rhu(F.lit(1.0) / n, PR_SCALE))
    teleport = (1.0 - PR_DAMPING) / n
    for _ in range(PR_ITERS):
        contrib = (
            sym.join(ranks, sym["u"] == ranks["node"])
            .join(deg, "u")
            .select(
                F.col("v"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
        )
        summed = contrib.groupBy("v").agg(
            F.sum(F.col("c").cast(f"decimal(38,{PR_SCALE + 3})"))
            .cast("double")
            .alias("s")
        )
        ranks = summed.select(
            F.col("v").alias("node"),
            rhu(F.lit(teleport) + PR_DAMPING * F.col("s"), PR_SCALE).alias(
                "rank"
            ),
        ).localCheckpoint()
    return ranks.select(
        F.col("node").alias("doc_id"), F.col("rank").alias("pagerank")
    )


LP_ROUNDS = 3


def _lp_oracle() -> str:
    """Unrolled synchronous label propagation: each round every node
    adopts its neighborhood's most frequent label (ties -> smallest
    label). Integer counts + deterministic tie-break = exact parity
    with no float policy needed."""
    parts = [
        f"WITH cand AS ({_D02_ORACLE})",
        "sym AS (SELECT doc_a AS u, doc_b AS v FROM cand "
        "UNION SELECT doc_b, doc_a FROM cand)",
        "l0 AS (SELECT DISTINCT u AS node, u AS label FROM sym)",
    ]
    for i in range(1, LP_ROUNDS + 1):
        parts.append(
            f"c{i} AS (SELECT s.v AS node, r.label, COUNT(*) AS n "
            f"FROM l{i - 1} r JOIN sym s ON s.u = r.node "
            "GROUP BY s.v, r.label)"
        )
        parts.append(
            f"l{i} AS (SELECT node, label FROM "
            f"(SELECT node, label, ROW_NUMBER() OVER ("
            "PARTITION BY node ORDER BY n DESC, label ASC) AS rk "
            f"FROM c{i}) WHERE rk = 1)"
        )
    return (
        ", ".join(parts)
        + f" SELECT node AS doc_id, label AS community FROM l{LP_ROUNDS}"
    )


@register(
    "g02_label_propagation",
    oracle=_lp_oracle(),
    note=f"G2 synchronous label propagation ({LP_ROUNDS} rounds) on the "
    "near-dup graph: each node adopts its neighborhood's most frequent "
    "label, ties to the smallest — community detection, the coarser "
    "complement to exact connected components (d05). Same edges-"
    "partitioned-once loop as g01; per-round work is one join + one "
    "integer count + a min_by pick (both map-side combinable). All "
    "arithmetic is integer with deterministic tie-breaks, so the "
    "unrolled-CTE oracle is exact by construction — no float policy "
    "involved.",
)
def g02_label_propagation(spark: SparkSession, sf_dir: str):
    pairs = d02_dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    sym = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
        .distinct()
        .repartition("u")
        .localCheckpoint()
    )
    labels = sym.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(LP_ROUNDS):
        counts = (
            sym.join(labels, sym["u"] == labels["node"])
            .groupBy(F.col("v"), F.col("label"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # most frequent neighborhood label, smallest label on ties:
        # min over the (-n, label) lexicographic struct — partially
        # aggregable, unlike a row_number window over all candidates
        labels = (
            counts.groupBy(F.col("v").alias("node"))
            .agg(
                F.expr("min_by(label, struct(-n, label))").alias("label")
            )
            .localCheckpoint()
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("community")
    )
