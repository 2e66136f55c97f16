"""Bucketed co-located joins: same results, no Exchange on the join path."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_spark_sql_challenge1_spark.catalog import load_table
from databricks_spark_sql_challenge1_spark.plans.explain import simple_plan
from databricks_spark_sql_challenge1_spark.sources.bucketing import (
    bucket_fact_tables,
    bucketed_join,
)
from tests.conftest import SF_DIR


def test_bucketed_join_is_shuffle_free_and_correct(spark):
    bucket_fact_tables(spark, SF_DIR, database="bucketed_test", n_buckets=8)
    try:
        # disable AQE broadcast conversion so the bucketed SMJ path is what
        # gets planned (at real scale neither side broadcasts anyway)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = bucketed_join(spark, database="bucketed_test")
        plan = simple_plan(df)
        assert "Exchange" not in plan.split("HashAggregate")[-1], plan
        # full plan: the only allowed exchange is the final aggregation's —
        # the join itself must read bucketed scans directly
        join_part = plan.split("SortMergeJoin")[-1]
        assert "Exchange" not in join_part, plan

        # correctness vs the unbucketed join
        expected = (
            load_table(spark, SF_DIR, "lineitem")
            .join(
                load_table(spark, SF_DIR, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderkey")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.round(F.sum("l_extendedprice"), 2).alias("order_line_value"),
            )
        )
        got = {tuple(r) for r in df.collect()}
        want = {tuple(r) for r in expected.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS bucketed_test.orders")
        spark.sql("DROP TABLE IF EXISTS bucketed_test.lineitem")
        spark.sql("DROP DATABASE IF EXISTS bucketed_test")
