"""Non-vacuous guards for threshold queries (VERDICT r2 #5).

v03 / d02 / d03 pass their oracles trivially when both engines return
0 rows — a regression that empties the candidate buckets would hide
behind a 0=0 match at small SF. These tests plant unmistakable
near-duplicates in synthetic `embeddings` / `documents` parquet tables
and assert the planted pairs actually surface, exercising the SAME
registered query functions end-to-end (they only see `sf_dir`).
"""

from __future__ import annotations

import math
import random

import pytest

from big_data_bowl_spark.queries import REGISTRY


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """A fake sf_dir holding planted near-dups.

    embeddings: 40 well-spread random vectors + 3 planted pairs whose
    members differ by a tiny perturbation (cosine ~ 0.9999).
    documents: 40 distinct random-word docs + 3 planted pairs sharing
    all but one word of a 40-word text.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("planted_sf")
    rng = random.Random(42)
    dim = 16

    vecs, ids = [], []
    for i in range(40):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        vecs.append([x / n for x in v])
        ids.append(i)
    for j in range(3):  # planted: 100+j ~ 200+j
        v = [rng.gauss(0, 1) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        v = [x / n for x in v]
        w = list(v)
        w[0] += 1e-3  # tiny nudge -> cosine ~ 1
        ids += [100 + j, 200 + j]
        vecs += [v, w]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([0] * len(ids), pa.int32()),
            }
        ),
        str(out / "embeddings.parquet"),
    )

    words = [f"w{k}" for k in range(500)]
    texts, dids = [], []
    for i in range(40):
        texts.append(" ".join(rng.choice(words) for _ in range(40)))
        dids.append(i)
    for j in range(3):
        base = [rng.choice(words) for _ in range(40)]
        near = list(base)
        near[20] = "CHANGED"
        dids += [100 + j, 200 + j]
        texts += [" ".join(base), " ".join(near)]
    # exact-duplicate pair for the simhash hamming query (identical
    # text -> identical simhash -> hamming 0, unconditionally)
    twin = " ".join(rng.choice(words) for _ in range(40))
    dids += [300, 400]
    texts += [twin, twin]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(dids, pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(dids)),
                "source": pa.array(["planted"] * len(dids)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(out / "documents.parquet"),
    )
    return str(out)


def _planted_found(rows, a_col, b_col):
    pairs = {(min(r[a_col], r[b_col]), max(r[a_col], r[b_col])) for r in rows}
    return {(100 + j, 200 + j) for j in range(3)} <= pairs


def test_v03_bucketed_cosine_finds_planted_pairs(spark, planted_dir):
    rows = REGISTRY["v03_bucketed_cosine_neardup"].fn(
        spark, planted_dir
    ).collect()
    assert _planted_found(rows, "vec_a", "vec_b"), rows


def test_d02_minhash_lsh_finds_planted_pairs(spark, planted_dir):
    rows = REGISTRY["d02_dedup_minhash_lsh"].fn(spark, planted_dir).collect()
    assert _planted_found(rows, "doc_a", "doc_b"), rows


def test_d03_jaccard_verify_scores_planted_pairs_high(spark, planted_dir):
    rows = REGISTRY["d03_ngram_jaccard_verify"].fn(
        spark, planted_dir
    ).collect()
    assert _planted_found(rows, "doc_a", "doc_b"), rows
    planted = [
        r
        for r in rows
        if (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
        in {(100 + j, 200 + j) for j in range(3)}
    ]
    # one changed word in 40 kills at most k=3 consecutive shingles
    assert all(r["jaccard"] > 0.7 for r in planted), planted


def test_d06_simhash_finds_planted_exact_dup(spark, planted_dir):
    rows = REGISTRY["d06_simhash_neardup"].fn(spark, planted_dir).collect()
    pairs = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b)): r.hamming
        for r in rows
    }
    assert pairs.get((300, 400)) == 0, pairs


def test_v04_ivf_recall_vs_brute_force(spark):
    """ANN quality guard (VERDICT r3 #4): IVF top-k must recall >= 0.9
    of the exact brute-force top-k at sf0.1.

    v04 is oracle-exact on its FIXED probe set, so a silently bad
    nprobe/centroid configuration would stay green forever — the
    oracle re-computes the same approximation. This test pins the
    approximation against ground truth (v01, exact) on the largest
    local SF so cell population is realistic; it catches any change
    to NLIST/NPROBE/centroid seeding that degrades retrieval quality.
    """
    import os

    sf_big = "/root/testdata/sf0.1"
    if not os.path.isdir(sf_big):  # pragma: no cover - driver env has it
        pytest.skip("sf0.1 testdata not present")
    from big_data_bowl_spark.queries.extras import IVF_TOPK

    brute = REGISTRY["v01_cosine_topk"].fn(spark, sf_big).collect()
    ivf = REGISTRY["v04_ivf_topk"].fn(spark, sf_big).collect()
    truth: dict = {}
    for r in brute:
        if r.rn <= IVF_TOPK:
            truth.setdefault(r.query_id, set()).add(r.cand_id)
    got: dict = {}
    for r in ivf:
        got.setdefault(r.query_id, set()).add(r.cand_id)
    # score only the queries v04 answers (v01 serves a superset)
    recalls = {
        q: len(truth[q] & cands) / len(truth[q]) for q, cands in got.items()
    }
    assert recalls, "IVF returned no queries"
    mean_recall = sum(recalls.values()) / len(recalls)
    assert mean_recall >= 0.9, recalls
    # per-query floor (VERDICT r6 item 3): no single query may fall
    # below 0.8 — the mean alone can hide one badly-served query
    assert min(recalls.values()) >= 0.8, recalls

    # the audit query itself must report the same floor at sf0.01,
    # the driver-gate SF (the round-6 config left one query at 0.6)
    audit = REGISTRY["v11_ann_recall_audit"].fn(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert audit and min(r.recall for r in audit) >= 0.8, audit
    assert sum(r.recall for r in audit) / len(audit) >= 0.9, audit


def test_round6_audits_are_nonvacuous(spark):
    """The round-6 audit/threshold queries must produce REAL signal
    on the actual testdata, not trivially-empty or trivially-passing
    results: the recall audit sees at least one imperfect query, the
    constraint suite has a failing expectation, the anti join is a
    non-empty proper subset, decontamination flags something, and
    the triangle count finds at least one triangle."""
    sf = "/root/testdata/sf0.01"

    recall = REGISTRY["v11_ann_recall_audit"].fn(spark, sf).collect()
    assert recall and any(r.recall < 1.0 for r in recall)
    assert any(r.recall > 0.0 for r in recall)

    dq = {
        r.constraint_name: r
        for r in REGISTRY["dq05_constraint_suite"].fn(spark, sf).collect()
    }
    assert dq["lineitem_tax_le_5pct"].n_violations > 0
    assert dq["orders_key_unique"].n_violations == 0

    anti = REGISTRY["j10_anti_join"].fn(spark, sf)
    n_anti = anti.count()
    from big_data_bowl_spark.sources.io import load_table
    n_orders = load_table(spark, sf, "orders").count()
    assert 0 < n_anti < n_orders

    decon = REGISTRY["n19_benchmark_decontamination"].fn(spark, sf)
    flags = decon.groupBy("contaminated").count().collect()
    got = {r.contaminated: r['count'] for r in flags}
    assert got.get(True, 0) > 0 and got.get(False, 0) > 0

    tri = REGISTRY["g04_triangle_count"].fn(spark, sf).collect()
    assert sum(r.n_triangles for r in tri) > 0


def test_sketches_show_real_behavior(spark):
    """a17's Count-Min must actually collide (some over-estimates)
    while never under-estimating; a18's Bloom filter must show a
    positive false-positive rate with ZERO false negatives (the
    structural guarantee join pruning depends on)."""
    sf = "/root/testdata/sf0.01"

    cms = REGISTRY["a17_count_min_sketch"].fn(spark, sf).collect()
    assert cms
    assert all(r.never_underestimates for r in cms)
    assert any(r.cms_est > r.exact_n for r in cms)

    bloom = REGISTRY["a18_bloom_filter_audit"].fn(spark, sf).collect()[0]
    assert bloom.n_false_neg == 0
    assert bloom.n_false_pos > 0
    assert 0.0 < bloom.fp_rate < 0.5
    assert 0 < bloom.n_members < bloom.n_probes


def test_d11_survivor_is_best_member(spark, sf_dir):
    """d11: every survivor belongs to its cluster and is the
    (longest, then smallest-id) member; n_members matches d05."""
    from big_data_bowl_spark.queries import REGISTRY
    from big_data_bowl_spark.sources.io import load_table

    labels = {
        r.doc_id: r.canonical_id
        for r in REGISTRY["d05_dedup_components"].fn(spark, sf_dir).collect()
    }
    chars = {
        r.doc_id: r.n_chars
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    clusters: dict = {}
    for doc, canon in labels.items():
        clusters.setdefault(canon, []).append(doc)
    want = {
        canon: (
            min(members, key=lambda d: (-chars[d], d)),
            len(members),
        )
        for canon, members in clusters.items()
        if len(members) > 1
    }
    got = {
        r.canonical_id: (r.survivor_id, r.n_members)
        for r in REGISTRY["d11_canonical_survivor"].fn(spark, sf_dir).collect()
    }
    assert got == want
    for canon, (survivor, _) in got.items():
        assert labels[survivor] == canon
