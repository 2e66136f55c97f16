"""Facade API + differential property test (random predicates run through
both engines — catches SQL-dialect drift the fixed queries can't)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from databricks_spark_sql_challenge1_spark.engine import Engine
from tests.conftest import ORACLE_SF_DIR, SF_DIR


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark, SF_DIR)


def test_engine_query_and_names(engine):
    assert "top_abandoned_products" in Engine.names()
    df = engine.query("top_abandoned_products")
    assert df.count() > 0
    assert Engine.oracle("top_abandoned_products") is not None
    assert Engine.oracle("streaming_user_state") is None


def test_engine_unknown_query_suggests(engine):
    with pytest.raises(KeyError, match="top_abandoned_products"):
        engine.query("top_abandonned_products")


def test_engine_sql_api(engine):
    """The reference's spark.sql(...) usage pattern works verbatim."""
    df = engine.sql(
        """
        SELECT l.l_partkey AS partkey, COUNT(DISTINCT o.o_orderkey) AS n
        FROM lineitem l RIGHT JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'O'
        GROUP BY l.l_partkey ORDER BY n DESC LIMIT 5
        """
    )
    assert df.count() == 5


def test_engine_table_and_views(engine):
    assert engine.table("nation").count() == 25
    engine.register_views()
    assert engine.spark.sql("SELECT COUNT(*) FROM nation").first()[0] == 25


@given(
    threshold=st.integers(min_value=1000, max_value=400000),
    status=st.sampled_from(["O", "F", "P"]),
)
@settings(max_examples=10, deadline=None)
def test_differential_filter_counts(spark_global, duck_global, threshold, status):
    """Random (threshold, status) predicates agree across engines."""
    spark_df = (
        spark_global.read.parquet(f"{ORACLE_SF_DIR}/orders.parquet")
        .where(
            (F.col("o_totalprice") >= threshold)
            & (F.col("o_orderstatus") == status)
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("o_custkey").alias("c"),
        )
    )
    got = tuple(spark_df.first())
    want = duck_global.execute(
        f"SELECT COUNT(*), COUNT(DISTINCT o_custkey) FROM "
        f"'{ORACLE_SF_DIR}/orders.parquet' "
        f"WHERE o_totalprice >= {threshold} AND o_orderstatus = '{status}'"
    ).fetchone()
    assert got == tuple(want)


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


@pytest.fixture(scope="module")
def duck_global():
    con = duckdb.connect()
    yield con
    con.close()
