"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``databricks_spark_sql_challenge1_spark`` (see
SURVEY.md §2 for the operator inventory each query covers).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Python workers spawned by the JVM resolve module-level kernel functions
# (codecs, parsers referenced from mapInPandas closures) by importing this
# package — make the repo importable for them regardless of the harness's
# cwd/sys.path by exporting it on PYTHONPATH before the first job launches
# a worker (workers inherit the driver process environment).
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)
if _REPO_DIR not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _REPO_DIR + os.pathsep + os.environ.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (ref #5, top_abandoned_products) on sf0.001."""
    from databricks_spark_sql_challenge1_spark.operators.abandonment import (
        top_abandoned_products,
    )

    return top_abandoned_products(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+extensions).

    Ordered by ``registry.DRIVER_PRIORITY``: the driver verifies the first 50
    entries, so queries needing fresh CORRECTNESS rows lead (see QUERIES.md
    §driver-window for the per-round coverage accounting).
    """
    import databricks_spark_sql_challenge1_spark.operators  # noqa: F401  (registers)
    from databricks_spark_sql_challenge1_spark.registry import ordered_queries

    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted → rows-only check)."""
    import databricks_spark_sql_challenge1_spark.operators  # noqa: F401  (registers)
    from databricks_spark_sql_challenge1_spark.registry import ordered_oracles

    return ordered_oracles()
