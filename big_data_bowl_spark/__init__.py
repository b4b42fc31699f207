"""big_data_bowl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference (`tejseth/Big-Data-Bowl`, three R/dplyr
analysis scripts) as a Spark-first engine: every relational verb,
window computation, pivot, sampling step, groupby-apply and ML stage
the reference exercises is available here as a composable DataFrame
operator, planned by Catalyst and executed by Tungsten, plus the
large-scale training-data-pipeline extensions (dedup, similarity
search, text analysis, event-time windows) the reference's single-
process design could never reach.

Layout
------
- ``session``    : SparkSession builder (AQE on, sane shuffle sizing)
- ``sources``    : parquet/CSV loaders for the star schema + generated tables
- ``functions``  : scalar column-expression builders (geometry, text, hashing)
- ``operators``  : DataFrame->DataFrame operators (mode, pivot, dedup, ANN, ...)
- ``plans``      : the reference's three end-to-end pipelines (E1/E2/E3)
- ``ml``         : pyspark.ml coverage-classification pipeline
- ``streaming``  : event-time windows (batch + Structured Streaming)
- ``queries``    : the driver-facing registry (query fn + DuckDB oracle SQL)
"""

__version__ = "0.1.0"
