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
