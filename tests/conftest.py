"""Shared fixtures: one SparkSession per test session + a DuckDB oracle
comparator that mimics the driver's check (row-count + column names +
order-insensitive values)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from databricks_spark_sql_challenge1_spark.session import get_spark

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
ORACLE_SF_DIR = os.environ.get("ORACLE_SF_DIR", SF_DIR)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("challenge1-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{ORACLE_SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0/0.0 and represent at a fixed precision
        return f"{v + 0.0:.9g}"
    return str(v) if v is not None else None


def normalize_rows(cols, rows):
    """Sort columns by name, then rows by rendered values (None first)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [
        tuple(_normalize_cell(r[i]) for i in order)
        for r in rows
    ]
    out.sort(key=lambda row: tuple((v is not None, v or "") for v in row))
    return [cols[i] for i in order], out


def compare_with_oracle(spark_df, duck_con, oracle_sql: str):
    """Return (ok, message) comparing a Spark result with DuckDB output."""
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]
    res = duck_con.execute(oracle_sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row-count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    _, s_norm = normalize_rows(spark_cols, spark_rows)
    _, d_norm = normalize_rows(duck_cols, duck_rows)
    if s_norm != d_norm:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
        ][:5]
        return False, f"value mismatch (first diffs): {diffs}"
    return True, "ok"
