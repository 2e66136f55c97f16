"""Reference queries #9-#11: "top states with most abandoned carts" analogs.

Shape (ref ``py:296-350``): a grouped subquery (abandoned facts LEFT JOIN an
address hop, grouped on the region key) FULL JOINed onto the dimension, then
SUM + ORDER. The FULL JOIN deliberately keeps dimension rows with no facts —
their SUM is NULL, not 0 (SURVEY.md §2.13 gotcha 5).

Fixture analog: nation plays "state". The fact side is restricted to the
anchor-1-month window so some nations genuinely have no matching facts
(FIXTURES.md: 2001-07 covers 23/25 nations) and the NULL-sum path is
exercised. #9 hops orders→customer, #10 hops lineitem→supplier (the
"delivery" variant), #11 uses an expression join key (J5) like the
reference's zip-code CONCAT join (``py:343``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_spark_sql_challenge1_spark.catalog import last_order_datetime, load_table
from databricks_spark_sql_challenge1_spark.functions.datetime import shift_months
from databricks_spark_sql_challenge1_spark.registry import query

_WINDOW_FILTER_SQL = """
      AND year(o.o_orderdate) = (SELECT year(t - INTERVAL 1 MONTH) FROM anchor)
      AND month(o.o_orderdate) = (SELECT month(t - INTERVAL 1 MONTH) FROM anchor)
"""


def _open_orders_last_month(spark, sf_dir) -> DataFrame:
    anchor = last_order_datetime(spark, sf_dir)
    y1, m1 = shift_months(anchor, -1)
    return load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderstatus") == "O")
        & (F.year("o_orderdate") == y1)
        & (F.month("o_orderdate") == m1)
    )


def _rank_nations(sub: DataFrame, nation: DataFrame, key_col: str) -> DataFrame:
    """FULL JOIN dim + SUM + ORDER (NULL sums survive; DESC → NULLS LAST both
    engines, explicit anyway)."""
    return (
        sub.join(nation, sub[key_col] == nation["n_nationkey"], "full")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum("cnt").alias("total_abandoned_orders"))
        .orderBy(
            F.col("total_abandoned_orders").desc_nulls_last(),
            F.col("nation").asc_nulls_first(),
        )
    )


@query(
    "nations_by_customer",
    oracle="""
WITH anchor AS (SELECT max(o_orderdate) AS t FROM orders),
sub AS (
    SELECT c.c_nationkey AS k, COUNT(DISTINCT o.o_orderkey) AS cnt
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'O'
"""
    + _WINDOW_FILTER_SQL
    + """
    GROUP BY c.c_nationkey
)
SELECT n.n_name AS nation, CAST(SUM(sub.cnt) AS BIGINT) AS total_abandoned_orders
FROM sub FULL JOIN nation n ON sub.k = n.n_nationkey
GROUP BY n.n_name
ORDER BY total_abandoned_orders DESC NULLS LAST, nation ASC NULLS FIRST
""",
)
def nations_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref #9 (``py:296-308``): rank by the customer (payment-address) hop."""
    customer = load_table(spark, sf_dir, "customer")
    sub = (
        _open_orders_last_month(spark, sf_dir)
        .join(customer, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.countDistinct("o_orderkey").alias("cnt"))
    )
    nation = load_table(spark, sf_dir, "nation")
    return _rank_nations(sub, nation, "k")


@query(
    "nations_by_supplier",
    oracle="""
WITH anchor AS (SELECT max(o_orderdate) AS t FROM orders),
sub AS (
    SELECT s.s_nationkey AS k, COUNT(DISTINCT o.o_orderkey) AS cnt
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE o.o_orderstatus = 'O'
"""
    + _WINDOW_FILTER_SQL
    + """
    GROUP BY s.s_nationkey
)
SELECT n.n_name AS nation, CAST(SUM(sub.cnt) AS BIGINT) AS total_abandoned_orders
FROM sub FULL JOIN nation n ON sub.k = n.n_nationkey
GROUP BY n.n_name
ORDER BY total_abandoned_orders DESC NULLS LAST, nation ASC NULLS FIRST
""",
)
def nations_by_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref #10 (``py:317-329``): same shape via the supplier ("delivery") hop."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    sub = (
        _open_orders_last_month(spark, sf_dir)
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"), "left")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.countDistinct("o_orderkey").alias("cnt"))
    )
    nation = load_table(spark, sf_dir, "nation")
    return _rank_nations(sub, nation, "k")


@query(
    "nations_by_expr_key",
    oracle="""
WITH anchor AS (SELECT max(o_orderdate) AS t FROM orders),
sub AS (
    SELECT c.c_nationkey AS k, COUNT(DISTINCT o.o_orderkey) AS cnt
    FROM orders o
    LEFT JOIN customer c
      ON concat('Customer#', lpad(CAST(o.o_custkey AS VARCHAR), 9, '0')) = c.c_name
    WHERE o.o_orderstatus = 'O'
"""
    + _WINDOW_FILTER_SQL
    + """
    GROUP BY c.c_nationkey
)
SELECT n.n_name AS nation, CAST(SUM(sub.cnt) AS BIGINT) AS total_abandoned_orders
FROM sub FULL JOIN nation n ON sub.k = n.n_nationkey
GROUP BY n.n_name
ORDER BY total_abandoned_orders DESC NULLS LAST, nation ASC NULLS FIRST
""",
)
def nations_by_expr_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref #11 (``py:338-350``): expression join key (J5).

    The reference joins on ``CONCAT(LEFT(zip,5),'-',RIGHT(zip,3)) =
    p_postalcode``; the fixture analog reconstructs ``c_name`` from
    ``o_custkey`` (``'Customer#' || lpad(custkey, 9, '0')``) — an equi join
    after expression evaluation, exactly like the original. Catalyst still
    plans this as a hash join on the computed key.
    """
    customer = load_table(spark, sf_dir, "customer")
    expr_key = F.concat(
        F.lit("Customer#"), F.lpad(F.col("o_custkey").cast("string"), 9, "0")
    )
    sub = (
        _open_orders_last_month(spark, sf_dir)
        .join(customer, expr_key == F.col("c_name"), "left")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.countDistinct("o_orderkey").alias("cnt"))
    )
    nation = load_table(spark, sf_dir, "nation")
    return _rank_nations(sub, nation, "k")
