"""Unit tests for functions/text.py and functions/rounding.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_bowl_spark.functions.rounding import rhu
from big_data_bowl_spark.functions.text import (
    fingerprint,
    punct_ratio,
    quality_score,
    stopword_hits,
    token_count,
    word_shingles,
)


def vals(spark, texts, col_builder, name="v"):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r[name] for r in df.select(col_builder(F.col("text")).alias(name)).collect()]


def test_token_count(spark):
    assert vals(spark, ["a b  c", "  ", "", "one"], token_count) == [3, 0, 0, 1]


def test_punct_ratio(spark):
    got = vals(spark, ["abcd", "a.b!", ""], punct_ratio)
    assert got[0] == 0.0
    assert got[1] == pytest.approx(0.5)
    assert got[2] == 0.0


def test_stopword_hits_counts_adjacent(spark):
    # the VERDICT-flagged case: non-overlapping replace undercounts
    # "the the the" as 2; word-boundary counting must say 3
    col = lambda c: stopword_hits(c, ("the", "and"))
    assert vals(spark, ["the the the", "The and THE", "lathe", ""], col) == [
        3,
        3,  # case-insensitive
        0,  # 'lathe' has no word-bounded 'the'
        0,
    ]


def test_fingerprint_normalizes_space_and_case(spark):
    got = vals(spark, ["Hello  World", "hello world", "helloworld"], fingerprint)
    assert got[0] == got[1]
    assert got[0] != got[2]


def test_word_shingles(spark):
    got = vals(spark, ["a b c d", "a b"], lambda c: word_shingles(c, 3))
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == ["a b"]  # shorter than k -> whole text as one shingle


def test_quality_score_bounds(spark):
    texts = ["", "word " * 200, "!!!???...", "normal sentence here"]
    for v in vals(spark, texts, quality_score):
        assert 0.0 <= v <= 1.0


def test_rhu_tie_rounds_consistently(spark):
    # the e02 regression: the double nearest 0.5000000625 must round
    # to 0.500000062 (its true binary value is below the decimal tie),
    # matching floor(x*1e9+0.5)/1e9 in ANY engine
    df = spark.range(1).select(
        rhu(F.lit(0.5000000625)).alias("a"),
        rhu(F.lit(1.23456789449)).alias("b"),
        rhu(F.lit(-0.5000000625)).alias("c"),
    )
    r = df.collect()[0]
    # the product 0.5000000625*1e9 is 500000062.49999994 in IEEE
    # doubles, so +0.5 floors DOWN — and does so in every engine
    assert r.a == 0.500000062
    assert r.b == 1.234567894
    assert r.c == -0.500000062


def test_rolling_hash_order_sensitive(spark):
    from big_data_bowl_spark.functions.text import (
        ROLL_MOD,
        rolling_hash,
        tokenize,
    )

    df = spark.createDataFrame(
        [("a b c",), ("c b a",), ("a b c",), ("",)], "text string"
    ).select(tokenize(F.col("text")).alias("tok"))
    got = [r.fp for r in df.select(rolling_hash(F.col("tok")).alias("fp")).collect()]
    assert got[0] == got[2]          # deterministic
    assert got[0] != got[1]          # order matters (unlike md5-of-sorted)
    assert all(0 <= v < ROLL_MOD for v in got)


def test_bpe_merge_replace_semantics_planted(spark, tmp_path):
    """Pins the BPE merge primitive on the overlap cases where greedy
    left-to-right non-overlapping replace is the defining choice:
    'aaaa' under merge (a,a) becomes (aa)(aa), 'aaa' becomes (aa)(a)
    — and both engines (Spark replace, DuckDB replace) agree, which
    is what makes the n20/n21 oracles sound. Also trains on a planted
    corpus where the winning merges are known by construction."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_bowl_spark.queries import REGISTRY
    from big_data_bowl_spark.queries.nlp import N_BPE_MERGES

    # doc 0 (the only sampled doc at BPE_SAMPLE_MOD=5): 'aaaa bb'
    # round 0: (a,a) wins with 3 overlapping counts -> 'aa aa b b'
    # round 1: pairs (aa,aa)=1, (aa,_)=1, (_,b)=1, (b,b)=1 -> tie on
    # count, lexicographic tie-break picks (_,b)
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["aaaa bb", "aaaa bb"]),
            "source": pa.array(["x", "x"]),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    train = {
        r.step: (r.left_sym, r.right_sym, r.pair_count)
        for r in REGISTRY["n20_bpe_train"].fn(spark, sf).collect()
    }
    assert len(train) == N_BPE_MERGES
    # round 0: COUNTING sees 3 overlapping (a,a) pairs in 'aaaa'...
    assert train[0] == ("a", "a", 3)
    # ...but the merge APPLIES non-overlapping: 'aaaa' -> (aa)(aa),
    # so round 1 is an all-count-1 tie broken lexicographically:
    # '_' < 'aa' < 'b'
    assert train[1] == ("_", "b", 1)
    # rounds 2-4 zip the doc up by the same tie-break: from
    # [aa, aa, _b, b] the '_'-prefixed pairs sort first. Round 3's
    # winner is the run-merge canary: it is (aa, _bb) ONLY if round 0
    # merged 'aaaa' into (aa)(aa) like reference BPE — a replace that
    # consumes the shared boundary under-merges to (aa)(a)(a) and
    # surfaces (a, _bb) here instead.
    assert train[2] == ("_b", "b", 1)  # -> [aa, aa, _bb]
    assert train[3] == ("aa", "_bb", 1)  # -> [aa, aa_bb]
    assert train[4] == ("aa", "aa_bb", 1)  # -> [aaaa_bb]
    # round 5: single token left, no pairs -> deterministic sentinel
    assert train[5] == ("", "", 0)

    tok = {
        r.doc_id: (r.n_tokens, r.n_chars)
        for r in REGISTRY["n21_bpe_tokenize"].fn(spark, sf).collect()
    }
    # both docs identical text -> identical tokenization; chars = 7;
    # the 5 real merges collapse the whole doc into one token
    assert tok[0] == tok[1] == (1, 7)

    # DuckDB agrees end-to-end on the planted corpus
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'documents.parquet'}')"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            REGISTRY["n21_bpe_tokenize"].oracle
        ).fetchall()
    }
    assert want == tok


def test_bpe_letterless_documents_cross_engine(spark, tmp_path):
    """A document whose normalized text is EMPTY (digits/punctuation
    only) must tokenize identically in Spark and DuckDB: Spark's
    substring with a negative length yields '' while DuckDB's substr
    would yield the whole string unless clamped — the oracle clamps
    with GREATEST, and this planted corpus pins the agreement."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_bowl_spark.queries import REGISTRY

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            # doc 0 trains (BPE_SAMPLE_MOD); doc 1 is LETTERLESS
            "text": pa.array(["abab abab", "1234 !?", "abab"]),
            "source": pa.array(["x", "x", "x"]),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    tok = {
        r.doc_id: (r.n_tokens, r.n_chars)
        for r in REGISTRY["n21_bpe_tokenize"].fn(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'documents.parquet'}')"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            REGISTRY["n21_bpe_tokenize"].oracle
        ).fetchall()
    }
    assert want == tok
    # the letterless doc is present and agreed on in both engines
    assert 1 in tok

    train_spark = {
        r.step: (r.left_sym, r.right_sym, r.pair_count)
        for r in REGISTRY["n20_bpe_train"].fn(spark, sf).collect()
    }
    # align columns: oracle rows are (step, left, right, merged, count)
    train_duck = {
        r[0]: (r[1], r[2], r[4])
        for r in con.execute(REGISTRY["n20_bpe_train"].oracle).fetchall()
    }
    assert train_duck == train_spark


def test_token_stats_empty_and_whitespace_docs_cross_engine(
    spark, tmp_path
):
    """Empty and whitespace-only documents must agree cross-engine:
    DuckDB's split of a trimmed empty string has length 1 where Spark
    counts 0 tokens, so the n01/n02 oracles guard the empty case and
    both sides emit NULL (not a division) for tokenless means
    (review r7)."""
    import duckdb
    import math
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_bowl_spark.queries import REGISTRY

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["", "   ", "two words", "!!!"]),
            "source": pa.array(["x"] * 4),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'documents.parquet'}')"
    )

    n01 = {
        r.doc_id: (r.n_tokens, r.mean_word_len)
        for r in REGISTRY["n01_token_stats"].fn(spark, sf).collect()
    }
    assert n01[0] == (0, None) and n01[1] == (0, None)
    assert n01[2] == (2, 4.0)
    want = {
        r[0]: (r[1], r[3])
        for r in con.execute(REGISTRY["n01_token_stats"].oracle).fetchall()
    }
    assert want == n01

    n02 = {
        r.doc_id: r.quality
        for r in REGISTRY["n02_quality_score"].fn(spark, sf).collect()
    }
    want02 = {
        r[0]: r[1]
        for r in con.execute(REGISTRY["n02_quality_score"].oracle).fetchall()
    }
    assert set(n02) == set(want02)
    for k in n02:
        assert n02[k] is not None and not math.isnan(n02[k]), k
        assert n02[k] == want02[k], k


def test_n23_pmi_matches_python_counts(spark, sf_dir):
    """n23's PMI values equal ln(N * c_ab / (c_a * c_b)) computed from
    Python set counting over the same tokenized documents."""
    import math

    from big_data_bowl_spark.queries import REGISTRY
    from big_data_bowl_spark.queries.nlp import PMI_MIN_CO
    from big_data_bowl_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    term_sets = {
        r.doc_id: set(r.text.strip().lower().split()) for r in docs
    }
    n_docs = len(term_sets)
    df: dict = {}
    co: dict = {}
    for terms in term_sets.values():
        ts = sorted(terms)
        for tk in ts:
            df[tk] = df.get(tk, 0) + 1
        for i, a in enumerate(ts):
            for b in ts[i + 1 :]:
                co[(a, b)] = co.get((a, b), 0) + 1

    want = {
        pair: (n, math.log(n_docs * n / (df[pair[0]] * df[pair[1]])))
        for pair, n in co.items()
        if n >= PMI_MIN_CO
    }
    got = {
        (r.term_a, r.term_b): (r.n_co, r.pmi)
        for r in REGISTRY["n23_pmi_cooccurrence"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for pair, (n, pmi) in want.items():
        assert got[pair][0] == n
        assert abs(got[pair][1] - pmi) < 1e-8, pair


def test_n24_calibration_matches_python_reference(spark, sf_dir):
    """n24's calibration table recomputed in pure Python (hashlib md5,
    same 4-hex-slice minhash, same 3-word shingles, same banding) must
    match the Spark result bin for bin — proving both the estimator
    arithmetic and the candidate set, independent of either engine."""
    import hashlib
    from collections import defaultdict
    from decimal import Decimal

    import pyarrow.parquet as pq

    from big_data_bowl_spark.queries import REGISTRY
    from big_data_bowl_spark.queries.nlp import (
        LSH_BANDS,
        LSH_ROWS,
        MINHASH_H,
        SHINGLE_K,
    )

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))

    def shingles(text: str) -> list[str]:
        toks = text.strip().lower().split()
        if len(toks) < SHINGLE_K:
            return [" ".join(toks)]
        return [
            " ".join(toks[i : i + SHINGLE_K])
            for i in range(len(toks) - SHINGLE_K + 1)
        ]

    sig = {}
    sh_sets = {}
    for did, text in docs.items():
        sh = shingles(text)
        sh_sets[did] = set(sh)
        hh = [hashlib.md5(s.encode()).hexdigest() for s in sh]
        sig[did] = [
            min(h[i * 4 : i * 4 + 4] for h in hh) for i in range(MINHASH_H)
        ]

    buckets = defaultdict(list)
    for did, m in sig.items():
        for b in range(LSH_BANDS):
            key = (b, "|".join([str(b)] + m[b * LSH_ROWS : (b + 1) * LSH_ROWS]))
            buckets[key].append(did)
    cand = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))

    def rhu9(x: float) -> Decimal:
        import math

        return Decimal(math.floor(x * 1e9 + 0.5)) / Decimal(10**9)

    want = defaultdict(lambda: [0, Decimal(0)])
    for a, b in cand:
        k = sum(sig[a][i] == sig[b][i] for i in range(MINHASH_H))
        inter = len(sh_sets[a] & sh_sets[b])
        union = len(sh_sets[a] | sh_sets[b])
        want[k][0] += 1
        want[k][1] += rhu9(inter / union)
    got = {
        r.n_agree: (r.n_pairs, r.est_similarity, r.sum_jaccard)
        for r in REGISTRY["n24_minhash_calibration"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(want) and got
    for k, (n, s) in want.items():
        gn, gest, gsum = got[k]
        assert gn == n
        assert gest == k / MINHASH_H
        assert abs(gsum - float(s)) < 1e-9
