"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator suite from
``elusion_spark.suite`` (each oracle is ANSI SQL DuckDB runs on the same
parquet views; rows-only entries omit the oracle).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1-style pricing summary (filter → group →
    7 aggregates → order) on /root/testdata/sf0.001 — non-empty at every
    scale factor (q03's HAVING threshold empties it below sf0.01)."""
    from elusion_spark.suite import QUERIES

    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from elusion_spark.suite import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from elusion_spark.suite import ORACLES

    return dict(ORACLES)
