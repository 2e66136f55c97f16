"""End-to-end pipeline test (SURVEY.md §5.2.2): the full reference flow on
sf0.001 with row-count and export-layout assertions."""

from __future__ import annotations

import os

from databricks_spark_sql_challenge1_spark.pipeline import run_reference_pipeline
from tests.conftest import SF_DIR


def test_full_reference_pipeline(spark, tmp_path):
    res = run_reference_pipeline(spark, SF_DIR, str(tmp_path))

    # sanity stage produced single-row counts
    assert all(len(rows) == 1 for rows in res.sanity.values())
    n_orders = res.sanity["count_distinct_orders"][0][0]
    assert n_orders > 0

    # destructive clean kept a strict subset
    assert 0 < res.cleaned_rows < n_orders

    # analytics non-empty (launch_* can legitimately be empty: every fixture
    # part's first order predates the anchor month — faithful to semantics)
    for name, n in res.analytics.items():
        if not name.startswith("launch_"):
            assert n > 0, (name, res.analytics)

    # marts: 12 months; day mart ~3 calendar months
    assert res.marts["abandonment_by_month"] == 12
    assert res.marts["abandonment_by_day"] >= 60

    # export: header + 50 rows, pipe-delimited
    assert os.path.exists(res.export_path)
    with open(res.export_path) as fh:
        lines = fh.read().splitlines()
    assert len(lines) == 51
    assert lines[0].count("|") == lines[1].count("|") > 5
