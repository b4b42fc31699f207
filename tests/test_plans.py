"""Physical-plan regression guards.

These pin the plan properties the 100 TB design depends on — a
refactor that silently turns the as-of join into a nested loop or
un-broadcasts the dimension join should fail HERE, not in a cluster
bill. Plans are built at sf0.001 (plan shape is SF-independent)."""

from __future__ import annotations

import pytest

from big_data_bowl_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    return (
        REGISTRY[name]
        .fn(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_e01_broadcasts_dim_prunes_columns_pushes_filters(spark):
    plan = _plan(spark, "e01_distance_at_anchor")
    assert "BroadcastHashJoin" in plan  # customer dim side
    assert "PushedFilters: [IsNotNull" in plan
    # projection must reach the scan: fact scan reads only needed cols
    assert "l_comment" not in plan and "l_shipdate" not in plan


def test_t06_asof_join_is_merge_shaped_not_nested_loop(spark):
    plan = _plan(spark, "t06_asof_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan  # the cumulative carry-forward


def test_relational_core_has_no_nested_loop_joins(spark):
    # every J-family query except the intentional cross joins must
    # plan as hash or sort-merge joins
    for name in [
        "j01_inner_join_1key",
        "j02_inner_join_2keys",
        "j03_selfjoin_anchor_attach",
        "j04_left_outer_join",
        "j06_join_rowid",
        "j07_inner_join_merge",
        "j08_semijoin_scalar_subquery",
    ]:
        plan = _plan(spark, name)
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


@pytest.mark.parametrize(
    "name", ["n01_token_stats", "n02_quality_score", "p01_project"]
)
def test_narrow_queries_stay_shuffle_free(spark, name):
    plan = _plan(spark, name)
    assert "Exchange" not in plan, name


@pytest.mark.parametrize("name", ["w04_global_rowid", "j06_join_rowid"])
def test_global_rowid_has_no_single_partition_exchange(spark, name):
    # the two-phase rank (operators/rank.py) must never fall back to
    # the whole-table Exchange SinglePartition a global window plans as
    plan = _plan(spark, name)
    assert "SinglePartition" not in plan, name


def test_global_row_number_matches_naive_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from big_data_bowl_spark.operators.rank import with_global_row_number
    from big_data_bowl_spark.sources.io import load_table

    o = load_table(spark, SF, "orders").select("o_orderkey")
    fast = with_global_row_number(o, "o_orderkey", num_buckets=7)
    naive = o.select(
        "o_orderkey",
        F.row_number().over(Window.orderBy("o_orderkey")).alias("row_num"),
    )
    assert fast.exceptAll(naive).isEmpty() and naive.exceptAll(fast).isEmpty()


def test_viz_sink_matrix_and_guard(spark):
    import pytest

    from big_data_bowl_spark.queries import REGISTRY
    from big_data_bowl_spark.sinks.viz import (
        collect_for_viz,
        control_surface_matrix,
    )
    from big_data_bowl_spark.sources.io import load_table

    control = REGISTRY["e02_field_control"].fn(spark, SF)
    mat = control_surface_matrix(control)
    assert mat.shape == (54, 120)  # grid_y rows x grid_x cols
    assert ((mat.values >= 0) & (mat.values <= 1)).all()

    with pytest.raises(ValueError, match="max_rows"):
        collect_for_viz(load_table(spark, SF, "lineitem"), max_rows=10)


def test_monotonic_rowid_alternative_is_shuffle_free(spark):
    """The scale-preferred non-contiguous ordinal (the alternative the
    rank operator's docs point to): zero exchanges, globally unique."""
    from pyspark.sql import functions as F

    from big_data_bowl_spark.sources.io import load_table

    df = load_table(spark, SF, "orders").select(
        "o_orderkey", F.monotonically_increasing_id().alias("mid")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    n = df.count()
    assert df.select("mid").distinct().count() == n


def test_e03_window_exchange_is_elided_by_copartition(spark):
    """r5 optimization guard: the normalize window must NOT exchange
    the expanded players x grid surface — pre-partitioning the players
    side satisfies the window's clustering, so the only hash exchanges
    are the (tiny) players repartition and the final per-cell agg."""
    plan = _plan(spark, "e03_field_control_season")
    n_hash = plan.count("Exchange hashpartitioning")
    assert n_hash <= 2, f"expected <=2 hash exchanges, got {n_hash}"
    # the players-side partition: REPARTITION_BY_NUM since r17 (the
    # count is pinned so AQE's byte-targeted coalescing cannot
    # collapse the exchange feeding the 6480x grid expansion to one
    # partition; e2_control.player_influence documents the measurement)
    assert (
        "REPARTITION_BY_NUM" in plan or "REPARTITION_BY_COL" in plan
    )
    # the window runs directly over the (sorted) join output: no
    # ENSURE_REQUIREMENTS exchange keyed on the window partition col
    # may appear between the BNLJ and the Window
    bnlj_pos = plan.index("BroadcastNestedLoopJoin")
    win_pos = plan.index("Window")
    between = plan[min(win_pos, bnlj_pos): max(win_pos, bnlj_pos)]
    assert "ENSURE_REQUIREMENTS" not in between


def test_funnel_and_cdc_share_one_exchange(spark):
    """t15/d07: chained windows (and rank+lineage windows) must reuse
    one key exchange, and the final aggregation must not add another."""
    for name, max_ex in [
        ("t15_funnel_analysis", 1),
        ("d07_cdc_compaction", 1),
    ]:
        plan = _plan(spark, name)
        n = plan.count("Exchange hashpartitioning")
        assert n <= max_ex, f"{name}: {n} exchanges (max {max_ex})"


def test_m06_scores_all_splits_in_one_scan(spark):
    """r5 optimization guard: stump scoring must stay a single-scan
    conditional aggregation — no rows x candidates join expansion."""
    plan = _plan(spark, "m06_decision_stump")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_s11_orc_scan_pushes_filters_and_prunes(spark):
    """The ORC read path must carry the same scan machinery as
    parquet: a filter over the re-scanned sink reaches the ORC
    reader as PushedFilters, and the projection prunes columns."""
    from big_data_bowl_spark.queries import REGISTRY

    rt = REGISTRY["s11_orc_sink_roundtrip"].fn(spark, SF)
    plan = (
        rt.filter("n_items > 100")
        .select("l_returnflag", "n_items")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan = plan[plan.index("Scan orc"):]
    head = scan.splitlines()[0]
    assert "PushedFilters: [" in scan
    assert "GreaterThan(n_items,100)" in scan
    assert "sum_price" not in head  # pruned from ReadSchema


def test_aqe_splits_skewed_join_at_runtime(spark):
    """The session's AQE config must actually SPLIT a skewed join
    partition at runtime — the mechanism SCALE.md leans on for
    residual skew that salting (a08/s10) doesn't cover. Thresholds
    are lowered so local-scale data exhibits cluster-scale skew; the
    final adaptive plan must carry a skew=true sort-merge join and
    still produce exact results."""
    from pyspark.sql import functions as F

    overrides = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "100KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "100KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        # 98% of left rows share key 0 -> one monster partition
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") % 50 != 0, 0)
            .otherwise(F.col("id"))
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(0, 5_000).select(
            F.col("id").alias("k"), F.lit("r").alias("v")
        )
        j = left.join(right.hint("merge"), "k").select(
            F.length("pad").alias("n")
        )
        rows = len(j._jdf.queryExecution().executedPlan().executeCollect())
        # k=0 rows (392,000 via id%50!=0, plus id=0) all match right's
        # key 0; of the 7,999 distinct nonzero keys (50,100,...) only
        # the 99 below 5,000 exist in right -> 392,001 + 99
        assert rows == 392_100
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert plan.count("skew=true") >= 1
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_j13_deletion_keys_dedup_in_place_no_extra_shuffle(spark):
    """j13's per-doc key dedup must stay a row-local array_distinct —
    the dropDuplicates spelling it replaced compiled to an extra
    (doc, key) exchange plus two sorts of the 19x key table (measured
    as the plan's most expensive stage). Pin: no SortAggregate, no
    sort anywhere before the bucket groupBy, and exactly the two
    intended exchanges (bucket key, pair distinct)."""
    plan = _plan(spark, "j13_fuzzy_match_deletion_blocking")
    assert "SortAggregate" not in plan
    assert "CartesianProduct" not in plan
    # count unique exchange plan_ids (the AQE toString prints the tree
    # twice, so a raw substring count double-counts)
    import re

    ex = {
        m
        for m in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    }
    assert len(ex) == 2, ex  # bucket-key shuffle + pair-distinct shuffle


def test_d12_delta_join_is_equi_and_never_cartesian(spark):
    """d12's delta-vs-index candidate join must be a hash-keyed
    equi-join on (band, bkey) — never a cartesian or nested loop,
    which would be the all-pairs recompute the operator exists to
    avoid. Since r11 the delta side carries NO broadcast hint
    (ADVICE: a mandatory hint OOMs on backfill-sized deltas), so the
    static plan may read SortMergeJoin; AQE converts it to broadcast
    at runtime when the delta is small. What matters is the join is
    keyed, not its physical flavor."""
    plan = _plan(spark, "d12_incremental_lsh_maintenance")
    assert (
        "BroadcastHashJoin" in plan
        or "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_o13_cut_is_broadcast_scalar(spark):
    """o13's percentile cut must reach the split predicate as a
    broadcast single-row side — the grouped scan must not shuffle the
    events table to meet it."""
    plan = _plan(spark, "o13_temporal_split")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan  # the 1-row cut


def test_a09b_one_shuffle_serves_exact_and_approx(spark):
    """a09b computes exact percentile AND the percentile_approx sketch
    in ONE grouped aggregate — a second exchange would mean the swap
    costs an extra pass. The sketch family plans as
    ObjectHashAggregate (TypedImperativeAggregate), which is the
    map-side-combinable shape the 100 TB claim rests on."""
    import re

    plan = _plan(spark, "a09b_grouped_quantiles_approx")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ObjectHashAggregate" in plan
    ex = {
        m
        for m in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    }
    assert len(ex) == 1, ex  # the single l_returnflag shuffle


def test_m13_vote_plan_matches_m11_shape(spark):
    """m13's registered plan must stay join-free with metadata-sized
    exchanges — the approx trainer changes THRESHOLD VALUES, never
    the plan shape m11 froze.

    r17 shape: the ensemble's distributed work is ONE contingency-table
    scan inside the trainer — its own plan, audited directly through
    the impl's on_ct hook in the byte-ceiling test below (r18; the
    registered frame stopped carrying it, so the old wording's claim
    was vacuous); the REGISTERED DataFrame is the driver-
    derived confusion rollup (a local relation) plus m13's per-class
    invariant aggregate — at most one hash exchange, still no joins."""
    import re

    plan = _plan(spark, "m13_bagged_ensemble_approx")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" not in plan  # local relation -> agg
    ex = {
        m
        for m in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    }
    # at most the per-class rollup shuffle, nothing else
    assert len(ex) <= 1, ex


def test_aqe_skew_split_on_dq04s_measured_hot_key(spark):
    """VERDICT r10 item 7 (deepen): close the measure->handle loop on
    REAL data. dq04 profiles the corpus's join-key heavy hitters; this
    test takes its rank-1 key for events.event_type — measured, not
    planted — pads rows to cluster-scale bytes, joins events on that
    column under the same lowered AQE thresholds as the synthetic
    skew test, and asserts the final adaptive plan carries a
    skew=true split WITH exact results. The demonstration dq04's note
    promises ('the measurement that decides which keys need ... AQE
    skew-join handling') is thereby executed code, not prose."""
    from pyspark.sql import functions as F

    from big_data_bowl_spark.sources.io import load_table

    sf01 = "/root/testdata/sf0.01"
    prof = REGISTRY["dq04_key_skew_profile"].fn(spark, sf01).collect()
    hot = next(
        r
        for r in prof
        if r.key_col == "events.event_type" and r.rank == 1
    )
    # non-vacuous: the measured head key really is a heavy hitter
    assert hot.share >= 1.5 / 32  # heavier than a uniform 32-way split

    overrides = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "100KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "100KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        ev = load_table(spark, sf01, "events").select(
            "event_type", "event_id"
        )
        # pad to cluster-scale shuffle bytes (incompressible): the
        # local corpus is small, the skew RATIO is the real thing
        pad = F.concat(
            *[
                F.sha2(
                    F.concat(F.col("event_id").cast("string"), F.lit(i)),
                    512,
                )
                for i in range(4)
            ]
        )
        # round-robin fan-out first: AQE splits a skewed reduce
        # partition along MAPPER boundaries, and the single-file
        # local scan would otherwise feed the shuffle from one mapper
        # (nothing to split — at cluster scale the scan has thousands
        # of mappers and this is free)
        left = ev.select("event_type", pad.alias("pad")).repartition(16)
        # the dim is MATERIALIZED (metadata-sized collect):
        # OptimizeSkewedJoin pattern-matches SMJ(Sort+ShuffleRead,
        # Sort+ShuffleRead) — an aggregate between the right shuffle
        # and the join would opt the join out of skew handling
        types = [
            r.event_type
            for r in ev.select("event_type").distinct().collect()
        ]
        right = spark.createDataFrame(
            [(t_, 1) for t_ in types], "event_type string, v int"
        )
        j = left.join(right.hint("merge"), "event_type").select(
            F.length("pad").alias("n")
        )
        rows = len(j._jdf.queryExecution().executedPlan().executeCollect())
        assert rows == ev.count()  # dim is distinct: row-preserving
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert plan.count("skew=true") >= 1
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_d12_aqe_sizes_delta_join_small_vs_backfill(spark):
    """r12 (VERDICT r11 item 6): the r11 fix removed d12's mandatory
    broadcast hint, CLAIMING AQE would broadcast a day's-arrivals
    delta on its own and fall back to a shuffled join for a
    backfill-sized one. This probe proves the claim on the real
    pipeline: with the static planner forced to SMJ (static
    threshold -1) and the ADAPTIVE threshold set between the two
    delta sizes (64KB here — the 10MB default plays the same role at
    cluster scale), the executed final plan for the 10% delta carries
    a runtime-converted BroadcastHashJoin, while the backfill
    (delta == corpus, delta_mod=1) keeps every join sort-merge — no
    OOM-able broadcast of a corpus-sized side. Semantics pinned too:
    the backfill's pair set IS the full d02 candidate set."""
    from pyspark.sql import functions as F

    from big_data_bowl_spark.queries.nlp import (
        _minhash_bands,
        _pairs_from_bands,
        incremental_lsh_pairs,
    )
    from big_data_bowl_spark.queries.nlp import tf

    sf01 = "/root/testdata/sf0.01"
    # 64KB margin check (measured r12): the 10% delta broadcasts even
    # at a 24KB threshold and the backfill flips to broadcast only at
    # ~128KB, so the pin sits >=1.5x from both boundaries — testdata
    # regeneration would need to move band-row sizes >50% to flip it
    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "64KB",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)

        plans = {}
        rows = {}
        for mod in (10, 1):
            df = incremental_lsh_pairs(spark, sf01, mod)
            # collect() runs through the DataFrame's own lazy
            # queryExecution, so the adaptive plan we read below is
            # the finalized plan of THIS execution (verified:
            # isFinalPlan=true right after collect)
            qe = df._jdf.queryExecution()
            rows[mod] = {
                (r.doc_a, r.doc_b)
                for r in df.collect()
            }
            plans[mod] = qe.executedPlan().toString()

        assert "isFinalPlan=true" in plans[10]
        assert plans[10].count("BroadcastHashJoin") >= 1
        assert "isFinalPlan=true" in plans[1]
        assert plans[1].count("BroadcastHashJoin") == 0
        assert plans[1].count("SortMergeJoin") >= 1

        # backfill == full recompute: every d02 candidate pair has a
        # delta member when the delta is the whole corpus
        full = {
            (r.doc_a, r.doc_b)
            for r in _pairs_from_bands(
                _minhash_bands(tf(spark, sf01, "documents"))
            ).collect()
        }
        assert rows[1] == full
        assert rows[10] <= full
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_results_independent_of_shuffle_partition_count(spark, sf_dir):
    """r12: partition-count independence, TESTED instead of prose.
    SCALE.md's 1000-executor section claims `spark.sql.shuffle.
    partitions` is a knob, not a semantic: no operator may derive
    values from partitioning. The suite already exercises this
    implicitly (pytest sessions run 4 shuffle partitions, the oracle
    gate 32); this makes it explicit for the operators MOST at risk
    — global row ids, deterministic samples/splits/folds, collected
    arrays, LSH pair generation, CC labels, salted aggregation —
    by comparing full results at 4 vs 13 partitions."""
    from big_data_bowl_spark.queries import REGISTRY

    AT_RISK = [
        "w04_global_rowid",
        "o04_deterministic_sample",
        "o05_deterministic_split",
        "o12_kfold_assignment",
        "a13_collect_sorted_array",
        "d02_dedup_minhash_lsh",
        "d05_dedup_components",
        "a08_salted_grouped_sum",
        "n07_rolling_hash_fingerprint",
        # the r12 scan-fusion rewrites: lock in that fusing joins into
        # row-local projections / single-pass aggregations did not
        # introduce any partitioning sensitivity
        "e04_corpus_curation",
        "dq05_constraint_suite",
        "m09_feature_hashing",
        "v14_hybrid_rrf_search",
    ]

    def freeze(v):
        if isinstance(v, list):
            return tuple(freeze(x) for x in v)
        if isinstance(v, dict):
            return tuple(sorted((k, freeze(x)) for k, x in v.items()))
        return v

    def snap(name):
        rows = REGISTRY[name].fn(spark, sf_dir).collect()
        return sorted(tuple(freeze(v) for v in r) for r in rows)

    key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(key)
    try:
        results = {}
        for nparts in ("4", "13"):
            spark.conf.set(key, nparts)
            results[nparts] = {n: snap(n) for n in AT_RISK}
    finally:
        spark.conf.set(key, saved)
    for n in AT_RISK:
        assert results["4"][n] == results["13"][n], n
        assert results["4"][n], f"{n} returned no rows"


def test_fan_out_is_a_noop_on_well_partitioned_input(spark):
    """r12: the wide-column shuffle audit (PLANS.md) traced every hit
    to fan_out's test-scale compute redistribution (sources/io.py) —
    a round-robin of (doc_id, text) inserted because a small parquet
    file scans as ONE split. Its docstring claims the guard makes it
    a NO-OP at scale, where the scan already carries >= default-
    parallelism splits. This pins that claim: fan_out must not
    insert any Exchange on well-partitioned input (the 100 TB case),
    and must redistribute the single-split case (the test-scale
    case) without changing the row set."""
    from big_data_bowl_spark.sources.io import fan_out

    target = spark.sparkContext.defaultParallelism

    wide = spark.range(0, 1000).repartition(target + 3)
    out = fan_out(wide)
    assert out is wide  # guard short-circuits: no new plan node at all

    narrow = spark.range(0, 1000).coalesce(1)
    fanned = fan_out(narrow)
    assert fanned.rdd.getNumPartitions() == target
    assert sorted(r.id for r in fanned.collect()) == list(range(1000))


def test_unpartitioned_windows_sit_on_bounded_input(spark):
    """VERDICT r12 item 5: the three registry plans that legitimately
    contain an unpartitioned Window (a single-partition global sort)
    must keep their k-bound. For the limit-bounded sites the bound is
    visible in the physical plan as a TakeOrderedAndProject (or
    GlobalLimit) feeding each Window; m06's bound is its candidate-
    grid aggregate (9 rows = features x thresholds), asserted by
    cardinality. plan_audit.WINDOW_GLOBAL_ALLOWED mirrors this set —
    its sweep flags any OTHER query whose plan grows a global window,
    and tests/test_source_lints.py freezes the source sites."""
    # n09: one global window, fed by the top-k node
    plan = _plan(spark, "n09_vocab_topk")
    assert plan.count("windowspecdefinition") >= 1
    assert "TakeOrderedAndProject" in plan or "GlobalLimit" in plan

    # v14: three global windows; every rank pool passes a limit node
    plan = _plan(spark, "v14_hybrid_rrf_search")
    limits = plan.count("TakeOrderedAndProject") + plan.count(
        "GlobalLimit"
    )
    assert limits >= 2, plan  # bm25 arm + cosine arm pools

    # m06: the window input is the candidate aggregate — bounded by
    # the feature x threshold grid, never by rows. Execute the
    # pre-window stage shape check by cardinality: the gains frame
    # the stump ranks is single-digit rows at any SF.
    from big_data_bowl_spark.queries import REGISTRY

    n = REGISTRY["m06_decision_stump"].fn(spark, SF).count()
    assert n <= 1  # rk == 1 filter: the window ran over a tiny grid

    # and the audit's allowlist stays in lockstep with the lint's
    from tools.plan_audit import WINDOW_GLOBAL_ALLOWED

    assert WINDOW_GLOBAL_ALLOWED == {
        "n09_vocab_topk",
        "v14_hybrid_rrf_search",
        "m06_decision_stump",
        "t31_cumulative_reach",
        "t33_streaming_reach",
    }

    # t31/t33: the global running-sum window consumes the hourly
    # aggregate, never events — its input cardinality is the number
    # of distinct hours in the fixture's time range
    t31 = REGISTRY["t31_cumulative_reach"].fn(spark, SF)
    hours = t31.count()
    from big_data_bowl_spark.sources.io import load_table

    events = load_table(spark, SF, "events").count()
    assert hours < events / 10  # aggregate-sized, not data-sized


def test_rebuilt_ann_family_embeddings_scan_counts_hold(spark):
    """r13 rescan-watch adjudication (VERDICT r12 item 2): the v-ANN
    family was rebuilt around driver-side literal model parameters —
    coarse centroids, PQ codebook, per-query ADC LUTs and probe lists
    embedded as one-parse SQL text — so each SERVE plan touches the
    embeddings parquet a fixed, small number of times (training
    scans happen at index-build time, by design; the serve plan is
    what a query pays per request). These ceilings pin the measured
    wins (v04 4->1, v10 7->2, v11 6->2, v13 4->2 scans; walls in the
    PLANS.md adjudication): a refactor that re-derives index columns
    per arm would fail HERE as extra embeddings scans, not in a
    cluster bill. e05 joined the rebuild — its IVF assignment is a
    projection on the dedup survivors, not crossJoin+groupBy+join-
    back (which also re-derived the dedup chain twice)."""
    import contextlib
    import io

    from tools.plan_audit import audit

    for name, max_scans in [
        ("v04_ivf_topk", 1),
        ("v10_ivfpq_topk", 2),
        ("v11_ann_recall_audit", 2),
        ("v13_dim_truncation_recall", 2),
        ("e05_embedding_index_pipeline", 2),
    ]:
        df = REGISTRY[name].fn(spark, SF)
        # execute THIS df's QueryExecution so its adaptive plan
        # finalizes (the plan_audit convention)
        df.collect()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        a = audit(buf.getvalue())
        n = a["scan_tables"].get("embeddings", 0)
        assert n <= max_scans, (name, a["scan_tables"])


def test_digest_only_shuffles_stay_narrow(spark):
    """r13: the wide-column audit (PLANS.md) classifies exchange
    inputs by column NAME, which a derived alias escapes — e05's
    `cv` (the cast embedding array) rode two exchanges at ~405
    bytes/record until tools/shuffle_metrics.py weighed them. This
    pin verifies the "only ids and digests ride exchanges" claim by
    WEIGHT: for the pipelines whose notes make it, every shuffle
    exchange in the executed plan stays under 256 bytes/record —
    an embedding array (~520 B), a text column (KBs) or a shingle
    array would trip it immediately, while id+digest+scalar rows
    (measured 9-244 B/rec across the set at sf0.01) never approach
    it. j11b is pinned looser: its audit facet intentionally carries
    a bounded sample payload on bucket-count-sized rows."""
    from tools.shuffle_metrics import audit_executed

    for name, ceiling in [
        ("e01_distance_at_anchor", 256),
        ("e03_field_control_season", 256),
        ("e04_corpus_curation", 256),
        ("e05_embedding_index_pipeline", 256),
        ("d02_dedup_minhash_lsh", 256),
        ("d11_canonical_survivor", 256),
        ("d12_incremental_lsh_maintenance", 256),
        ("dq01_column_profile", 256),
        ("j13b_fuzzy_capped_audit", 256),
        ("n09_vocab_topk", 256),
        ("v05_kmeans_step", 256),
        ("v06_kmeans_two_steps", 256),
        ("v10_ivfpq_topk", 256),
        ("v14_hybrid_rrf_search", 256),
        ("j11b_fuzzy_capped_audit", 2048),
    ]:
        df = REGISTRY[name].fn(spark, SF)
        df.collect()
        a = audit_executed(df)
        assert a["max_bytes_per_record"] <= ceiling, (name, a)
        # and nothing spills at test scale — a nonzero spill here
        # means an operator's working set is data-sized where the
        # notes claim it is not
        assert a["spill_bytes"] == 0, (name, a)

    # m11's REGISTERED DataFrame is a driver-built local relation
    # since r17, so auditing it was vacuous (ADVICE r17): audit the
    # trainer's real distributed work — the contingency-table scan —
    # via the impl's on_ct hook instead. The descriptor rows are
    # 15 small ints + a count; anything payload-sized riding that
    # exchange trips the same 256 B/rec ceiling.
    from big_data_bowl_spark.queries.ml import _bagged_ensemble_impl

    captured = []
    _bagged_ensemble_impl(spark, SF, approx=False, on_ct=captured.append)
    assert len(captured) == 1  # the hook saw exactly the ct scan
    ct_df = captured[0]
    ct_df.collect()
    a = audit_executed(ct_df)
    assert a["max_bytes_per_record"] <= 256, ("m11 contingency scan", a)
    assert a["spill_bytes"] == 0, ("m11 contingency scan", a)
