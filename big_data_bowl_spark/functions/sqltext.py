"""Exact-double SQL-text builders shared by the literal-model family.

The ANN/k-means operators embed driver-side model parameters (coarse
centroids, PQ codebooks, ADC LUTs) as one-parse SQL literals instead
of Py4J Column trees or broadcast DataFrames (the r13 v-family
rebuild; Column-API construction of these trees measured 0.7-1.8 s of
pure plan-build time — the m13/m11 r12 precedent). Two exactness
contracts make this safe:

- `sql_dlit` uses repr(): the shortest round-trip representation of a
  binary64, and Spark's string->double parse is exact, so the parsed
  value is bit-identical to the collected double (bare SQL numeric
  literals would parse as DECIMAL — hence the CAST).
- `sql_fold_dot` is the identical left-to-right zip_with/aggregate
  fold as functions' Column-side `_dot`, so a dot product computed
  over a literal array equals the one computed over the source column
  bit-for-bit (same IEEE op sequence over the same doubles).

Shared by queries/extras.py (IVF/PQ serving), queries/vectors.py
(v05/v06 Lloyd steps) and operators/kmeans.py (the iterative fit).
"""

from __future__ import annotations


def sql_dlit(x: float) -> str:
    return f"CAST('{x!r}' AS DOUBLE)"


def sql_darr(vals) -> str:
    return "array(" + ",".join(sql_dlit(x) for x in vals) + ")"


def sql_fold_dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def nearest_cell_sql(cv_name: str, cent_rows) -> str:
    """Nearest-centroid assignment as ONE per-row expression over
    literal centroids: argmin of d = dot(kv,kv) - 2*dot(cv,kv) with
    ties to the lowest cid — exactly min_by(cid, struct(d, cid)) from
    the broadcast crossJoin + groupBy(vec_id) spelling, minus the
    k-fold row explosion and the corpus-sized shuffle that groupBy
    paid (the whole corpus, WITH vectors, rode that exchange at
    ~420 B/row — tools/shuffle_metrics.py, r13). array_min compares
    (d, c) structs fieldwise: lowest distance, then lowest cid. The
    kv.kv term is folded over the literal array by the same sequence
    as the old column fold, so every d — and therefore every
    assignment — is bit-identical to the crossJoin spelling's."""
    if not cent_rows:
        raise ValueError(
            "nearest_cell_sql: no centroid rows — the corpus the "
            "seeds were drawn from is empty (an empty struct array "
            "would be malformed SQL, not an empty assignment)"
        )
    structs = ",".join(
        f"struct({sql_fold_dot(sql_darr(kv), sql_darr(kv))} - 2.0 * "
        f"{sql_fold_dot(cv_name, sql_darr(kv))} AS d, {cid} AS c)"
        for cid, kv in cent_rows
    )
    return f"array_min(array({structs})).c"
