"""Semantic-gotcha micro-tests (SURVEY.md §2.13): tiny hand-built DataFrames
with exact expected rows, pinning the NULL/outer-join behaviors the big
queries depend on."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_right_join_null_extension_survives_where_on_right(spark):
    """Gotcha 2: predicate on the preserved side keeps null-extended rows →
    a NULL group must appear in the aggregation."""
    entries = spark.createDataFrame(
        [Row(order=1, product=10)], "order long, product long"
    )
    carts = spark.createDataFrame(
        [Row(pk=1, status="O"), Row(pk=2, status="O")], "pk long, status string"
    )
    out = (
        entries.join(carts, entries.order == carts.pk, "right")
        .where(F.col("status") == "O")
        .groupBy("product")
        .agg(F.countDistinct("pk").alias("n"))
        .collect()
    )
    assert {(r["product"], r["n"]) for r in out} == {(10, 1), (None, 1)}


def test_null_sum_groups_survive_full_join(spark):
    """Gotcha 5: SUM over a FULL-JOIN-missed dimension row is NULL, not 0."""
    facts = spark.createDataFrame([Row(k=1, cnt=5)], "k long, cnt long")
    dim = spark.createDataFrame(
        [Row(k=1, name="A"), Row(k=2, name="B")], "k long, name string"
    )
    out = (
        facts.join(dim, facts.k == dim.k, "full")
        .groupBy("name")
        .agg(F.sum("cnt").alias("total"))
        .collect()
    )
    got = {(r["name"], r["total"]) for r in out}
    assert got == {("A", 5), ("B", None)}


def test_null_keys_do_not_match_in_equi_join(spark):
    """Gotcha in #7/#8: NULL partkeys on both sides must NOT join."""
    a = spark.createDataFrame([Row(k=None, v=1)], "k long, v long")
    b = spark.createDataFrame([Row(k=None, w=2)], "k long, w long")
    out = a.join(b, a.k == b.k, "left").collect()
    assert len(out) == 1 and out[0]["w"] is None


def test_pair_canonicalization_mirrors_dedupe(spark):
    """Gotcha 6 / W1: mirrored product pairs collapse to one canonical row
    with the same count."""
    from pyspark.sql.window import Window

    grouped = spark.createDataFrame(
        [Row(p1=1, p2=2, n=7), Row(p1=2, p2=1, n=7)], "p1 long, p2 long, n long"
    )
    w = Window.partitionBy(F.least("p1", "p2"), F.greatest("p1", "p2")).orderBy(
        "p1", "p2"
    )
    out = (
        grouped.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") == 1)
        .collect()
    )
    assert len(out) == 1 and (out[0]["p1"], out[0]["p2"]) == (1, 2)


def test_coalesce_after_outer_join(spark):
    """Gotcha 3/A11: COALESCE(x, 0) maps only join-missed NULLs to 0."""
    cur = spark.createDataFrame([Row(k=1, c=3), Row(k=2, c=4)], "k long, c long")
    prev = spark.createDataFrame([Row(k=1, c=1)], "k long, c long")
    out = (
        cur.alias("a")
        .join(prev.alias("b"), F.col("a.k") == F.col("b.k"), "left")
        .select(
            F.col("a.k").alias("k"),
            (F.col("a.c") - F.coalesce(F.col("b.c"), F.lit(0))).alias("inc"),
        )
        .collect()
    )
    assert {(r["k"], r["inc"]) for r in out} == {(1, 2), (2, 4)}


def test_incremental_merge_equals_direct_aggregation(spark):
    """The IVM invariant: merging the batch partial into the snapshot
    partial must equal aggregating the full table directly."""
    from pyspark.sql import functions as F

    from databricks_spark_sql_challenge1_spark.catalog import load_table
    from databricks_spark_sql_challenge1_spark.operators.analytics_ext import (
        orders_incremental_merge,
    )
    from tests.conftest import SF_DIR

    merged = {
        (r["o_month"], r["n_orders"], r["total_value"])
        for r in orders_incremental_merge(spark, SF_DIR).collect()
    }
    direct = {
        (r["o_month"], r["n_orders"], r["total_value"])
        for r in load_table(spark, SF_DIR, "orders")
        .groupBy(F.trunc("o_orderdate", "month").alias("o_month"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
        .collect()
    }
    assert merged and merged == direct
