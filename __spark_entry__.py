"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash).  The real registry lives in
``basin_climbing_data_pipeline_spark.registry``; this module is a thin shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from basin_climbing_data_pipeline_spark import registry  # noqa: E402
from basin_climbing_data_pipeline_spark.session import tune_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (net revenue by month × category + share-of-month) on
    /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    return registry.REGISTRY["revenue_by_month_category"][0](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
