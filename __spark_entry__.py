"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``databricks_spark_sql_challenge1_spark`` (see
SURVEY.md §2 for the operator inventory each query covers).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


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
