"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; each ``queries()[name]``
runs at sf=0.01 and is compared against ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Implementations live in ``hpctoolkit_dataframe_spark/queries/`` — each
registry entry pairs the Spark DataFrame implementation with its
deterministic DuckDB oracle (see that package's docstring for the
cross-engine determinism rules).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from hpctoolkit_dataframe_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: greedy hot-path descent over the CCT built from
    the region>nation>customer>order>lineitem hierarchy at sf0.001."""
    return REGISTRY["cct_hot_path"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.sql for name, q in REGISTRY.items() if q.sql is not None}
