"""E3 ML accuracy-floor test (SURVEY.md §5: the reference's
confusionMatrix check, all coverages.R:209-214, as an assertion).

The label is a deterministic function of one feature (sum_qty
thresholds), so a correctly-wired pipeline must separate the classes
near-perfectly on held-out rows; a broken assembler/indexer/seed
plumbs through as chance-level accuracy.
"""

from __future__ import annotations

from big_data_bowl_spark.ml.coverage import confusion_matrix
from big_data_bowl_spark.queries.ml import FEATURE_COLS, order_features


def test_rf_accuracy_floor(spark, sf_dir):
    feats = order_features(spark, sf_dir)
    from big_data_bowl_spark.ml.coverage import train_eval

    model, scored, acc = train_eval(
        feats, FEATURE_COLS, label_col="label", id_cols=["l_orderkey"]
    )
    assert acc >= 0.9, f"separable label should score >=0.9, got {acc}"


def test_confusion_matrix_shape(spark, sf_dir):
    feats = order_features(spark, sf_dir)
    from big_data_bowl_spark.ml.coverage import train_eval

    _model, scored, _acc = train_eval(
        feats, FEATURE_COLS, label_col="label", id_cols=["l_orderkey"]
    )
    cm = confusion_matrix(scored, label_col="label")
    rows = cm.collect()
    labels = {"large", "medium", "small"}
    assert {r.label for r in rows} <= labels
    assert {r.prediction for r in rows} <= labels
    # diagonal dominates: correct cells outnumber off-diagonal ones
    diag = sum(r.n for r in rows if r.label == r.prediction)
    off = sum(r.n for r in rows if r.label != r.prediction)
    assert diag > off
