"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 for the
driver's DuckDB side-by-side check at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (revenue-by-nation, TPC-H Q5 shape) on sf0.001."""
    from trike_spark.queries.relational import q5_revenue_by_nation

    return q5_revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from trike_spark.registry import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from trike_spark.registry import oracle_sql as _oracle_sql

    return _oracle_sql()
