"""Driver contract for the spark-graft builder (PySpark target).

Re-exports the big_data_bowl_spark query registry: every entry in
``queries()`` is one operator row from SURVEY.md §2 (or a north-star
extension) with, where SQL-expressible, a DuckDB oracle in
``oracle_sql()`` that reproduces the Spark result bit-for-bit (see
big_data_bowl_spark/queries/base.py for the float-determinism policy).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_bowl_spark.queries import oracle_sql as _oracle_sql
from big_data_bowl_spark.queries import queries as _queries
from big_data_bowl_spark.queries.core import e01_distance_at_anchor

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: pipeline E1 (Tutorial.R:125-203)
    condensed onto the star schema — scan -> broadcast joins ->
    standardize -> window-broadcast anchor -> filter -> distance."""
    return e01_distance_at_anchor(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for non-SQL-expressible ops)."""
    return _oracle_sql()
