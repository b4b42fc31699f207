"""Randomized cross-checks: Spark operators vs tiny pure-Python
reference implementations (union-find, nested-loop as-of). Fixed
seeds keep runs deterministic; sizes stay small because each example
is a full Spark job."""

from __future__ import annotations

import random

import pytest

from big_data_bowl_spark.operators.asof import asof_join
from big_data_bowl_spark.operators.components import connected_components


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in {x for e in edges for x in e}}


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_connected_components_matches_union_find(spark, seed):
    rng = random.Random(seed)
    n = 40
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(30)
    ]
    edges = [e for e in edges if e[0] != e[1]]
    expect = _uf_components(n, edges)
    got = {
        r["node"]: r["comp"]
        for r in connected_components(
            spark.createDataFrame(edges, "src long, dst long")
        ).collect()
    }
    assert got == expect


def _ref_asof(left, right):
    out = {}
    for k, eid, lts in left:
        best = None
        for rk, rts, val in right:
            if rk == k and rts <= lts and (best is None or rts > best[0]):
                best = (rts, val)
        out[eid] = best
    return out


@pytest.mark.parametrize("seed", [3, 9, 42])
def test_asof_join_matches_nested_loop(spark, seed):
    rng = random.Random(seed)
    left = [
        (rng.randrange(5), i, rng.randrange(100)) for i in range(60)
    ]
    # unique (key, ts) on the right, as the operator contract requires
    right_keys = {(rng.randrange(5), rng.randrange(100)) for _ in range(40)}
    right = [(k, ts, float(k * 1000 + ts)) for k, ts in right_keys]
    expect = _ref_asof(left, right)
    got = {
        r["event_id"]: (
            None if r["ts_r"] is None else (r["ts_r"], r["val"])
        )
        for r in asof_join(
            spark.createDataFrame(left, "k long, event_id long, ts long"),
            spark.createDataFrame(right, "k long, ts long, val double"),
            on="k",
        ).collect()
    }
    assert got == expect
