"""Salted aggregation must be exactly equal to the direct aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_spark_sql_challenge1_spark.catalog import load_table
from databricks_spark_sql_challenge1_spark.functions.skew import (
    salted_count_distinct,
    salted_sum,
)
from tests.conftest import SF_DIR


def _as_map(rows, key, val):
    return {r[key]: r[val] for r in rows}


def test_salted_count_distinct_equals_direct(spark):
    lineitem = load_table(spark, SF_DIR, "lineitem")
    direct = _as_map(
        lineitem.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect(),
        "l_returnflag",
        "n",
    )
    salted = _as_map(
        salted_count_distinct(lineitem, ["l_returnflag"], "l_orderkey").collect(),
        "l_returnflag",
        "distinct_l_orderkey",
    )
    assert salted == direct


def test_salted_sum_equals_direct(spark):
    orders = load_table(spark, SF_DIR, "orders")
    direct = _as_map(
        orders.groupBy("o_orderstatus")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("s"))
        .collect(),
        "o_orderstatus",
        "s",
    )
    salted = {
        k: round(v, 2)
        for k, v in _as_map(
            salted_sum(orders, ["o_orderstatus"], "o_totalprice").collect(),
            "o_orderstatus",
            "sum_o_totalprice",
        ).items()
    }
    assert salted == direct


def test_approx_count_distinct_tolerance(spark):
    """The 100 TB dashboard path: approx_count_distinct within 5% of exact."""
    orders = load_table(spark, SF_DIR, "orders")
    exact = orders.agg(F.countDistinct("o_orderkey").alias("n")).first()["n"]
    approx = orders.agg(
        F.approx_count_distinct("o_orderkey", rsd=0.02).alias("n")
    ).first()["n"]
    assert abs(approx - exact) / exact < 0.05


def test_salted_flagship_equals_direct(spark):
    """The registered salted variant must reproduce the direct flagship
    exactly — including the hot NULL-partkey group the right join creates."""
    from databricks_spark_sql_challenge1_spark.operators.abandonment import (
        top_abandoned_products,
        top_abandoned_products_salted,
    )

    direct = [tuple(r) for r in top_abandoned_products(spark, SF_DIR).collect()]
    salted = [
        tuple(r) for r in top_abandoned_products_salted(spark, SF_DIR).collect()
    ]
    assert salted == direct
