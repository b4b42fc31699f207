"""E3 ML queries (SURVEY.md §2.10, all coverages.R:186-231).

The feature table itself is SQL-expressible and oracle-checked
(m00). The RF stages are not — they get rows-only checks, with the
pytest accuracy-floor test (tests/test_ml.py) guarding learnability:
the label is a deterministic function of one feature, so a correct
pipeline must score near-perfectly on held-out rows.

The fitted model is memoized per sf_dir so the m01/m02/m04 queries
(which the driver calls back-to-back) train once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml.coverage import confusion_matrix, feature_importances, train_eval
from .base import dsum, dsum_sql, register, t

FEATURE_COLS = ["n_lines", "sum_qty", "sum_price", "max_disc", "n_parts"]

_FEATURES_SQL = f"""
  SELECT l_orderkey,
         COUNT(*) AS n_lines,
         SUM(l_quantity) AS sum_qty,
         {dsum_sql('l_extendedprice')} AS sum_price,
         MAX(l_discount) AS max_disc,
         COUNT(DISTINCT l_partkey) AS n_parts,
         CASE WHEN SUM(l_quantity) > 150 THEN 'large'
              WHEN SUM(l_quantity) > 75 THEN 'medium'
              ELSE 'small' END AS label
  FROM lineitem
  GROUP BY l_orderkey
"""


def order_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order feature table + deterministic label.

    The label is a pure function of sum_qty (a feature), making the
    task separable — the reference's analogue is the engineered
    defender-position features feeding the coverage label
    (all coverages.R:186-206). sum(l_quantity) is integral, so the
    double sum is exact; sum_price uses the decimal-sum policy.
    """
    li = t(spark, sf_dir, "lineitem")
    sum_qty = F.sum("l_quantity")
    return li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        sum_qty.alias("sum_qty"),
        dsum(F.col("l_extendedprice")).alias("sum_price"),
        F.max("l_discount").alias("max_disc"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.when(sum_qty > 150, "large")
        .when(sum_qty > 75, "medium")
        .otherwise("small")
        .alias("label"),
    )


_CACHE: dict[str, tuple] = {}


def _fitted(spark: SparkSession, sf_dir: str):
    if sf_dir not in _CACHE:
        feats = order_features(spark, sf_dir)
        _CACHE[sf_dir] = train_eval(
            feats, FEATURE_COLS, label_col="label", id_cols=["l_orderkey"]
        )
    return _CACHE[sf_dir]


@register(
    "m00_ml_feature_table",
    oracle=_FEATURES_SQL,
    note="E3 feature engineering (all coverages.R:118-152 shape): one "
    "grouped aggregation builds every model input — a single shuffle on "
    "the training key, no row explosion.",
)
def m00_ml_feature_table(spark, sf_dir):
    return order_features(spark, sf_dir)


@register(
    "m01_rf_train_confusion",
    oracle=None,
    note="M1+M3: RandomForest fit (seed 222, all coverages.R:201-206) + "
    "confusion matrix on the held-out 25% (:209-214). Not "
    "SQL-expressible; accuracy floor guarded by tests/test_ml.py.",
)
def m01_rf_train_confusion(spark, sf_dir):
    _model, scored, _acc = _fitted(spark, sf_dir)
    return confusion_matrix(scored, label_col="label")


@register(
    "m02_rf_predict_counts",
    oracle=None,
    note="M2: model.transform over the held-out set, predicted-class "
    "counts — scoring is a narrow map (model broadcast), scales to any "
    "table size.",
)
def m02_rf_predict_counts(spark, sf_dir):
    _model, scored, _acc = _fitted(spark, sf_dir)
    return (
        scored.groupBy(F.col("predicted_label").alias("prediction"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("prediction")
    )


@register(
    "m04_rf_feature_importances",
    oracle=None,
    note="M4: per-feature Gini importances (all coverages.R:217-227); "
    "tiny driver-side vector re-exposed as rows.",
)
def m04_rf_feature_importances(spark, sf_dir):
    model, _scored, _acc = _fitted(spark, sf_dir)
    imps = feature_importances(model, FEATURE_COLS)
    return spark.createDataFrame(
        [(f, round(v, 6)) for f, v in imps], "feature string, importance double"
    )


@register(
    "m05_random_split_counts",
    oracle=None,
    note="M5: Spark-native seeded randomSplit 75/25 (all coverages."
    "R:193-199). Statistically seeded but partition-dependent, hence "
    "rows-only; the bit-deterministic alternative is o05 (hash split).",
)
def m05_random_split_counts(spark, sf_dir):
    feats = order_features(spark, sf_dir)
    train, test = feats.randomSplit([0.75, 0.25], seed=123)
    return spark.createDataFrame(
        [("train", train.count()), ("test", test.count())],
        "split string, n long",
    )
