"""ML operators (SURVEY.md §2.10): the reference's random-forest
coverage-classification surface re-expressed as a pyspark.ml Pipeline."""

from .coverage import (  # noqa: F401
    confusion_matrix,
    feature_importances,
    rf_pipeline,
    train_eval,
)
