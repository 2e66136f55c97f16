"""The correctness gate, run locally: every oracle-backed query in the
registry must match its DuckDB oracle (same check shape as the driver's
CORRECTNESS_r{N}.json: row-count + columns + order-insensitive values).

Runs at sf0.001 by default (fast); set TEST_SF_DIR/ORACLE_SF_DIR to
/root/testdata/sf0.01 for the driver-scale check.
"""

from __future__ import annotations

import pytest

import databricks_spark_sql_challenge1_spark.operators  # noqa: F401
from databricks_spark_sql_challenge1_spark.registry import ORACLES, QUERIES
from tests.conftest import SF_DIR, compare_with_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    ok, msg = compare_with_oracle(df, duck, ORACLES[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns  # schema materializes
    assert df.count() >= 0
