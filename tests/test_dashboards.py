"""Dashboard composition + mart materialization (reference §4.1
architecture: widgets re-scan persisted marts)."""

from __future__ import annotations

from databricks_spark_sql_challenge1_spark.operators.dashboards import (
    dashboard_by_day,
    dashboard_by_month,
    materialize_marts,
)
from tests.conftest import SF_DIR


def test_dashboards_compose(spark):
    day = dashboard_by_day(spark, SF_DIR)
    month = dashboard_by_month(spark, SF_DIR)
    assert len(day) == 4 and len(month) == 4
    n_days = {name: df.count() for name, df in day.items()}
    assert len(set(n_days.values())) == 1  # all four widgets cover same days
    assert all(df.count() == 12 for df in month.values())  # 12-month window


def test_materialize_marts(spark):
    materialize_marts(spark, SF_DIR, database="marts_test")
    month = spark.table("marts_test.abandonment_analytics_month")
    day = spark.table("marts_test.abandonment_analytics_day")
    assert month.count() == 12
    assert day.count() >= 60  # ~3 calendar months of days
    spark.sql("DROP TABLE marts_test.abandonment_analytics_month")
    spark.sql("DROP TABLE marts_test.abandonment_analytics_day")
    spark.sql("DROP DATABASE marts_test")
