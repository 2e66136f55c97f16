"""The reference's 2 dashboards / 8 widget queries (``dbc:cmd3-5,8-10,35-36``,
``dbc:dashboards[0-1]``): each widget is a ``WITH q AS (<mart>) SELECT key,
SUM(metric) GROUP BY key`` re-aggregation over the month/day marts —
faithfully reproduced per metric (SURVEY.md §2.9 Q2).

The reference materializes the marts first so widgets re-scan small tables
(§4.1); ``materialize_marts`` provides that step, while the registered
widget queries recompute from base tables so the DuckDB oracle can replay
them without shared state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_spark_sql_challenge1_spark.operators import marts
from databricks_spark_sql_challenge1_spark.registry import query
from databricks_spark_sql_challenge1_spark.sources.ingest import save_table

_MONTH_MART_SQL = (
    """
WITH anchor AS (SELECT max(o_orderdate) AS t FROM orders),
"""
    + marts._VIEWS_SQL
    + """
SELECT concat(CAST(year(cal.calendar_date) AS VARCHAR), '-',
              lpad(CAST(month(cal.calendar_date) AS VARCHAR), 2, '0')) AS year_month,
"""
    + marts._METRICS_SQL
    + """
FROM cal
LEFT JOIN ca ON cal.calendar_date = ca.d
LEFT JOIN ia ON ca.d = ia.d
WHERE cal.calendar_date >= (SELECT CAST(date_trunc('month', t - INTERVAL 11 MONTH) AS DATE) FROM anchor)
  AND cal.calendar_date <= (SELECT CAST(t AS DATE) FROM anchor)
GROUP BY year_month
"""
)

_DAY_MART_SQL = (
    """
WITH anchor AS (SELECT max(o_orderdate) AS t FROM orders),
"""
    + marts._VIEWS_SQL
    + """
SELECT cal.calendar_date AS date,
"""
    + marts._METRICS_SQL
    + """
FROM cal
LEFT JOIN ca ON cal.calendar_date = ca.d
LEFT JOIN ia ON ca.d = ia.d
WHERE cal.calendar_date >= (SELECT CAST(date_trunc('month', t - INTERVAL 2 MONTH) AS DATE) FROM anchor)
  AND cal.calendar_date <= (SELECT CAST(t AS DATE) FROM anchor)
GROUP BY cal.calendar_date
"""
)

_METRIC_CASTS = {
    "total_abandoned_orders": "CAST(SUM(total_abandoned_orders) AS BIGINT)",
    "total_value_orders": "ROUND(CAST(SUM(total_value_orders) AS DOUBLE), 2)",
    "total_abandoned_items": "ROUND(CAST(SUM(total_abandoned_items) AS DOUBLE), 2)",
    "total_value_items": "ROUND(CAST(SUM(total_value_items) AS DOUBLE), 2)",
}


def _widget(mart_fn, mart_sql: str, key: str, metric: str):
    """Build one widget: WITH q AS (mart) SELECT key, SUM(metric) GROUP BY key."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        mart = mart_fn(spark, sf_dir)
        agg = F.sum(metric)
        if metric != "total_abandoned_orders":
            agg = F.round(agg, 2)
        return (
            mart.groupBy(key)
            .agg(agg.alias(metric))
            .orderBy(F.col(key).asc())
        )

    oracle = f"""
WITH q AS ({mart_sql})
SELECT {key}, {_METRIC_CASTS[metric]} AS {metric}
FROM q GROUP BY {key} ORDER BY {key} ASC
"""
    return fn, oracle


_WIDGET_SPECS = [
    ("widget_day_value_items", marts.abandonment_by_day, _DAY_MART_SQL, "date", "total_value_items"),       # dbc:cmd3
    ("widget_day_orders", marts.abandonment_by_day, _DAY_MART_SQL, "date", "total_abandoned_orders"),       # dbc:cmd4
    ("widget_day_items", marts.abandonment_by_day, _DAY_MART_SQL, "date", "total_abandoned_items"),         # dbc:cmd5
    ("widget_day_value_orders", marts.abandonment_by_day, _DAY_MART_SQL, "date", "total_value_orders"),     # dbc:cmd36
    ("widget_month_value_items", marts.abandonment_by_month, _MONTH_MART_SQL, "year_month", "total_value_items"),    # dbc:cmd8
    ("widget_month_orders", marts.abandonment_by_month, _MONTH_MART_SQL, "year_month", "total_abandoned_orders"),    # dbc:cmd9
    ("widget_month_items", marts.abandonment_by_month, _MONTH_MART_SQL, "year_month", "total_abandoned_items"),      # dbc:cmd10
    ("widget_month_value_orders", marts.abandonment_by_month, _MONTH_MART_SQL, "year_month", "total_value_orders"),  # dbc:cmd35
]

for _name, _mart_fn, _sql, _key, _metric in _WIDGET_SPECS:
    _fn, _oracle = _widget(_mart_fn, _sql, _key, _metric)
    _fn.__name__ = _name
    query(_name, oracle=_oracle)(_fn)


def materialize_marts(spark: SparkSession, sf_dir: str, database: str = "marts") -> None:
    """Reference architecture (§4.1): persist the marts so dashboards re-scan
    small tables instead of recomputing the base aggregation."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    save_table(marts.abandonment_by_month(spark, sf_dir), f"{database}.abandonment_analytics_month")
    save_table(marts.abandonment_by_day(spark, sf_dir), f"{database}.abandonment_analytics_day")


def dashboard_by_day(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Dashboard 'Abandonment analytics by day' (dbc:dashboards[0], 4 widgets)."""
    from databricks_spark_sql_challenge1_spark.registry import QUERIES

    return {
        n: QUERIES[n](spark, sf_dir)
        for n in ("widget_day_value_items", "widget_day_orders",
                  "widget_day_items", "widget_day_value_orders")
    }


def dashboard_by_month(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Dashboard 'Abandonment analytics by month' (dbc:dashboards[1])."""
    from databricks_spark_sql_challenge1_spark.registry import QUERIES

    return {
        n: QUERIES[n](spark, sf_dir)
        for n in ("widget_month_value_items", "widget_month_orders",
                  "widget_month_items", "widget_month_value_orders")
    }
