"""The complete reference pipeline as one composition — the notebook's
cross-cell dataflow (SURVEY.md §3.3: ingest → sanity counts → destructive
clean → analytics → materialized marts → export) reproduced end-to-end on
the fixture tables, so a user of the reference can run the whole flow with
one call.

Stages map 1:1 to reference cells:
  1. ingest       (ref ``py:51-91``)  — parquet/CSV → working copies + views
  2. sanity       (ref ``py:112-153``) — the count cross-checks
  3. clean        (ref ``py:162-166``) — filter + self-overwrite (S10)
  4. analytics    (ref ``py:180-439``) — the ranking/trend queries
  5. marts        (ref ``py:449-515``) — calendar marts materialized
  6. export       (ref ``py:531-546``) — denormalized top-50 to pipe TXT
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

import databricks_spark_sql_challenge1_spark.operators  # noqa: F401  (registers queries)
from databricks_spark_sql_challenge1_spark.catalog import load_table
from databricks_spark_sql_challenge1_spark.registry import QUERIES
from databricks_spark_sql_challenge1_spark.sources.export import export_as_txt
from databricks_spark_sql_challenge1_spark.sources.overwrite import staged_overwrite

ANALYTICS_QUERIES = (
    "top_abandoned_products",
    "top_abandoned_pairs",
    "abandonment_mom_increase",
    "abandonment_yoy_increase",
    "nations_by_customer",
    "nations_by_supplier",
    "nations_by_expr_key",
    "launch_month_orders",
    "launch_year_orders",
)


@dataclass
class PipelineResult:
    sanity: dict[str, list] = field(default_factory=dict)
    cleaned_rows: int = 0
    analytics: dict[str, int] = field(default_factory=dict)
    marts: dict[str, int] = field(default_factory=dict)
    export_path: str = ""


def run_reference_pipeline(
    spark: SparkSession, sf_dir: str, work_dir: str
) -> PipelineResult:
    """Run the full analog pipeline; returns counts per stage.

    ``work_dir`` receives the working copy of orders (the destructive clean
    stage overwrites it, S10) and the final export — the read-only fixture
    dir is never touched.
    """
    from pyspark.sql import functions as F

    res = PipelineResult()

    # 1. ingest: working copy of the destructively-cleaned table
    orders_path = os.path.join(work_dir, "orders_work")
    load_table(spark, sf_dir, "orders").write.mode("overwrite").parquet(orders_path)

    # 2. sanity counts (ref #1-#3)
    for name in ("count_distinct_orders", "orders_no_price", "valid_orders"):
        res.sanity[name] = [tuple(r) for r in QUERIES[name](spark, sf_dir).collect()]

    # 3. destructive clean (ref #4 + S10) on the working copy
    from databricks_spark_sql_challenge1_spark.operators.abandonment import (
        NO_PRICE_THRESHOLD,
    )

    cleaned = spark.read.parquet(orders_path).where(
        F.col("o_totalprice") >= NO_PRICE_THRESHOLD
    )
    staged_overwrite(spark, cleaned, orders_path)
    res.cleaned_rows = spark.read.parquet(orders_path).count()

    # 4. analytics suite
    for name in ANALYTICS_QUERIES:
        res.analytics[name] = QUERIES[name](spark, sf_dir).count()

    # 5. marts (materialized into work_dir as parquet)
    for name in ("abandonment_by_month", "abandonment_by_day"):
        mart = QUERIES[name](spark, sf_dir)
        mart.write.mode("overwrite").parquet(os.path.join(work_dir, name))
        res.marts[name] = spark.read.parquet(os.path.join(work_dir, name)).count()

    # 6. export (ref #14 + S8/S9)
    export_df = QUERIES["order_export_denorm"](spark, sf_dir)
    res.export_path = export_as_txt(
        export_df, os.path.join(work_dir, "export"), filename="orders", delimiter="|"
    )
    return res
