"""Measured shuffle-byte audit: what actually RIDES each exchange.

plan_audit.py counts exchanges and classifies their columns by NAME
(the wide-column audit); this tool WEIGHS them — after executing a
query it walks the final adaptive physical plan via Py4J and harvests
each node's SQLMetrics:

- per shuffle Exchange: records written, shuffle bytes written, and
  bytes/record — the number that decides whether a shuffle is "ids
  and digests" (tens of bytes) or "the corpus" (the 100 TB
  scale-killer the notes claim never happens);
- per BroadcastExchange: rows and dataSize — broadcasts must stay
  dimension-sized (they are cloned to every executor). CAVEAT: the
  dataSize metric reports the built HashedRelation's memory
  footprint, which is allocation-dominated at test scale — a ~1 MiB
  page floor for long-keyed relations, ~8 MiB initial map for
  string-keyed ones (d12's 200-row (band,bkey) delta reads 8.4 MB).
  Judge broadcasts by ROWS at test scale; dataSize only becomes
  informative well above those floors;
- spillSize summed over all nodes — memory-pressure canary (0 at
  test scale; a nonzero value at sf0.01 would flag an operator
  whose working set is data-sized where it shouldn't be).

The claims in PLANS.md's wide-column audit ("every keyed or broadcast
exchange registry-wide moves digests/ids only") are name-based; the
per-exchange bytes/record measured here verifies them by WEIGHT, and
tests/test_plans.py::test_digest_only_shuffles_stay_narrow pins the
ceiling for the pipelines whose notes make that claim explicitly.

Deliberate exceptions exist and are documented where they live: the
d03/n16 shingle-verify join shuffles shingle ARRAYS because scoring
candidate pairs IS the operator (a 100 TB deployment co-locates via
a bucketed shingle lake, queries/nlp.py); mm* pipelines move only
fingerprints because decode happens scan-side.

Usage:
    python tools/shuffle_metrics.py [--sf DIR] [--md] [names...]
(defaults to the flagship set below at sf0.01).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# The pipelines whose shuffle discipline carries the 100 TB design
# (SCALE.md "Shuffle discipline"), plus the trivial a01 as the
# map-side-combine reference reading.
DEFAULT_QUERIES = [
    "a01_grouped_sum",
    "e01_distance_at_anchor",
    "e03_field_control_season",
    "e04_corpus_curation",
    "e05_embedding_index_pipeline",
    "d02_dedup_minhash_lsh",
    "d11_canonical_survivor",
    "d12_incremental_lsh_maintenance",
    "dq01_column_profile",
    "j11b_fuzzy_capped_audit",
    "j13b_fuzzy_capped_audit",
    "m11_bagged_ensemble",
    "n09_vocab_topk",
    "v05_kmeans_step",
    "v06_kmeans_two_steps",
    "v10_ivfpq_topk",
    "v14_hybrid_rrf_search",
]


def _jmap_to_dict(m) -> dict:
    out = {}
    it = m.keys().iterator()
    while it.hasNext():
        k = it.next()
        out[k] = m.apply(k).value()
    return out


def walk_plan(jplan):
    """Yield every node of an executed SparkPlan exactly once,
    recursing through AQE wrappers (AdaptiveSparkPlanExec
    .executedPlan, QueryStageExec .plan) and subquery plans, which
    children() does not traverse. ReusedExchange is yielded (so the
    caller can count reuse) but not recursed — its subtree belongs to
    the original exchange."""
    seen = set()
    stack = [jplan]
    while stack:
        node = stack.pop()
        try:
            # SparkPlan.id is a unique per-node int in Spark 4
            jvm_id = int(node.id())
        except Exception:
            # Fallback for Spark versions without SparkPlan.id: a
            # fresh token, so nothing dedups. Over-visiting a shared
            # subtree double-COUNTS its metrics; any structural key
            # (semanticHash etc.) would instead collapse DISTINCT
            # but identical-shaped nodes and silently DROP metrics —
            # for an audit, over-count loud beats under-count quiet.
            # (Plans are trees plus ReusedExchange backstops, which
            # are never recursed, so no-dedup cannot loop.)
            jvm_id = object()
        if jvm_id in seen:
            continue
        seen.add(jvm_id)
        yield node
        name = node.nodeName()
        if name.startswith("ReusedExchange"):
            continue
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
        if ch.size() == 0:
            # AQE wrappers expose their subtree via accessor methods
            for attr in ("executedPlan", "plan", "child"):
                try:
                    sub = getattr(node, attr)()
                except Exception:
                    continue
                if sub is not None and hasattr(sub, "nodeName"):
                    stack.append(sub)
                    break
        try:
            sq = node.subqueries()
            for i in range(sq.size()):
                stack.append(sq.apply(i))
        except Exception:
            pass


def audit_executed(df) -> dict:
    """Harvest shuffle/broadcast/spill metrics from a DataFrame whose
    own QueryExecution has been executed (df.collect() first — the
    plan_audit convention; count() builds a different plan)."""
    return audit_jplan(df._jdf.queryExecution().executedPlan())


def audit_jplan(jplan) -> dict:
    """Harvest shuffle/broadcast/spill SQLMetrics from an executed
    JVM SparkPlan — shared by the batch audit (audit_executed) and
    the streaming micro-batch audit (--streaming walks the plans
    streaming/windows.LAST_EXEC_PLANS captured at drain end)."""
    shuffles, broadcasts = [], []
    spill = 0
    reused = 0
    for node in walk_plan(jplan):
        name = node.nodeName()
        if name.startswith("ReusedExchange"):
            reused += 1
            continue
        try:
            m = _jmap_to_dict(node.metrics())
        except Exception:
            continue
        spill += m.get("spillSize", 0)
        if name == "Exchange":
            rec = m.get("shuffleRecordsWritten", 0)
            by = m.get("shuffleBytesWritten", 0)
            shuffles.append(
                {
                    "records": rec,
                    "bytes": by,
                    "bytes_per_record": round(by / rec, 1) if rec else 0.0,
                }
            )
        elif name == "BroadcastExchange":
            broadcasts.append(
                {
                    "rows": m.get("numOutputRows", 0),
                    "data_size": m.get("dataSize", 0),
                }
            )
    return {
        "shuffles": shuffles,
        "broadcasts": broadcasts,
        "reused_exchanges": reused,
        "total_shuffle_bytes": sum(s["bytes"] for s in shuffles),
        "max_bytes_per_record": max(
            (s["bytes_per_record"] for s in shuffles), default=0.0
        ),
        "max_broadcast_bytes": max(
            (b["data_size"] for b in broadcasts), default=0
        ),
        "spill_bytes": spill,
    }


# The streaming registry (one availableNow drain each): weighed via
# the plans LAST_EXEC_PLANS captures at drain end. Same 256 B/rec
# discipline as the batch audit; the t21 stream-stream join and t12
# interval join shuffle event rows on BOTH sides of the join keys
# (that join IS the operator — events are ~60 B wide), everything
# else moves keyed aggregates/digests.
STREAMING_QUERIES = [
    "t07_streaming_tumbling",
    "t08_streaming_sessionization",
    "t11_streaming_dedup",
    "t12_streaming_interval_join",
    "t16_streaming_cdc_compaction",
    "t18_streaming_sliding",
    "t21_streaming_stream_stream_join",
    "t24_streaming_merge_sink",
    "t25_stateful_running_stats",
    "t25b_stateful_running_stats_us",
    "t26_streaming_histogram",
    "t29_streaming_topk",
    "t33_streaming_reach",
    "t34_stateful_type_counts",
    "t35_timer_closed_sessions",
    "e06_streaming_pipeline",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--md", action="store_true")
    ap.add_argument(
        "--streaming",
        action="store_true",
        help="weigh EVERY captured micro-batch plan of each "
        "streaming drain (streaming/windows.LAST_EXEC_PLANS) "
        "instead of batch query plans",
    )
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from big_data_bowl_spark.queries import REGISTRY
    from big_data_bowl_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    if args.streaming:
        from big_data_bowl_spark.streaming import windows as sw

        # plan capture is opt-in (ADVICE r14) — this tool reads the
        # per-batch plans, so it turns the poll+pin on for its drains
        sw.CAPTURE_EXEC_PLANS = True
        for name in args.queries or STREAMING_QUERIES:
            seen = len(sw.LAST_EXEC_PLANS)
            REGISTRY[name].fn(spark, args.sf).collect()
            for sink, plans, n_batches in sw.LAST_EXEC_PLANS[seen:]:
                if not plans:
                    a = {"error": "no micro-batch plans captured"}
                else:
                    # aggregate the per-batch audits: every batch's
                    # exchanges count, spill sums, ceilings are maxes
                    per = [audit_jplan(p) for p in plans.values()]
                    a = {
                        "shuffles": [
                            s for b in per for s in b["shuffles"]
                        ],
                        "broadcasts": [
                            x for b in per for x in b["broadcasts"]
                        ],
                        "reused_exchanges": sum(
                            b["reused_exchanges"] for b in per
                        ),
                        "total_shuffle_bytes": sum(
                            b["total_shuffle_bytes"] for b in per
                        ),
                        "max_bytes_per_record": max(
                            b["max_bytes_per_record"] for b in per
                        ),
                        "max_broadcast_bytes": max(
                            b["max_broadcast_bytes"] for b in per
                        ),
                        "spill_bytes": sum(
                            b["spill_bytes"] for b in per
                        ),
                        "batches_weighed": sorted(plans),
                    }
                a["query"] = name
                a["sink"] = sink
                a["n_batches"] = n_batches
                results.append(a)
                print(json.dumps(a))
    else:
        for name in args.queries or DEFAULT_QUERIES:
            df = REGISTRY[name].fn(spark, args.sf)
            df.collect()
            a = audit_executed(df)
            a["query"] = name
            results.append(a)
            print(json.dumps(a))

    if args.md:
        print()
        print(
            "| query | shuffles (records @ B/rec) | broadcasts "
            "(rows @ bytes) | total shuffle | spill |"
        )
        print("|---|---|---|---|---|")
        for a in results:
            if "error" in a:
                print(f"| {a['query']} | {a['error']} | | | |")
                continue
            label = a["query"]
            if "sink" in a:
                nw = len(a.get("batches_weighed", []))
                label += (
                    f" ({a['sink']}, {nw}/{a['n_batches']} "
                    "batches weighed)"
                )
            a = dict(a, query=label)
            sh = (
                "; ".join(
                    f"{s['records']:,} @ {s['bytes_per_record']}"
                    for s in a["shuffles"]
                )
                or "—"
            )
            bc = (
                "; ".join(
                    f"{b['rows']:,} @ {b['data_size']:,}"
                    for b in a["broadcasts"]
                )
                or "—"
            )
            print(
                f"| {a['query']} | {sh} | {bc} "
                f"| {a['total_shuffle_bytes']:,} B "
                f"| {a['spill_bytes']:,} B |"
            )


if __name__ == "__main__":
    main()
