"""The driver verifies only the first 50 entries of ``queries()`` — pin the
window contents (see registry.DRIVER_PRIORITY)."""

from __future__ import annotations

import databricks_spark_sql_challenge1_spark.operators  # noqa: F401
from databricks_spark_sql_challenge1_spark.registry import (
    DRIVER_PRIORITY,
    ORACLES,
    QUERIES,
    ordered_oracles,
    ordered_queries,
)

DRIVER_WINDOW = 50

# Round-5 must-verify: everything changed/new this round plus the 27 queries
# whose only driver evidence was round 1 (pre-PySpark-4.1 — the drift class
# that broke round 3; VERDICT.md r4 "What's missing" #1 / "Next round" #1).
MUST_VERIFY = {
    # changed or new this round
    "dedup_ngram_jaccard",
    "events_json_nested",
    "jsonl_roundtrip_checksum",
    "embedding_kmeans_refine",
    "similarity_ivfpq",
    "dedup_simhash_wide_pairs",
    "corpus_dedup_pipeline",
    "streaming_incremental_dedup",
    "dedup_semantic_sqrtk",
    "copurchase_triangles",
    "orders_incremental_merge",
    # round-1-stale evidence refresh
    "approx_price_percentiles",
    "approx_topk_products",
    "calendar_dim",
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_minhash_lsh",
    "embedding_centroids",
    "embedding_norm_stats",
    "launch_year_orders",
    "monthly_order_trend_lag",
    "pivot_status_by_priority",
    "price_percentiles",
    "rollup_order_values",
    "set_ops_customers",
    "similarity_ivf",
    "similarity_topk",
    "text_simhash",
    "widget_day_items",
    "widget_day_orders",
    "widget_day_peak",
    "widget_day_value_items",
    "widget_day_value_orders",
    "widget_month_items",
    "widget_month_orders",
    "widget_month_totals",
    "widget_month_value_items",
    "widget_month_value_orders",
}


def test_priority_names_are_registered_and_unique():
    assert len(DRIVER_PRIORITY) == len(set(DRIVER_PRIORITY))
    missing = [n for n in DRIVER_PRIORITY if n not in QUERIES]
    assert not missing, missing


def test_ordering_drops_nothing():
    assert set(ordered_queries()) == set(QUERIES)
    assert set(ordered_oracles()) == set(ORACLES)


def test_must_verify_set_inside_driver_window():
    window = list(ordered_queries())[:DRIVER_WINDOW]
    outside = MUST_VERIFY - set(window)
    assert not outside, f"need driver rows but ordered past {DRIVER_WINDOW}: {outside}"


def test_boundary_comment_matches_actual_window():
    """The '--- window boundary ---' comment in registry.py must sit after
    exactly the names that form the driver's first-50 window (caught an
    off-by-one in round 5)."""
    import re

    import databricks_spark_sql_challenge1_spark.registry as reg

    src = open(reg.__file__).read()
    before = re.findall(
        r'^\s+"([a-z0-9_]+)",', src.split("window boundary")[0], re.M
    )
    assert before == ordered_queries_names()[:DRIVER_WINDOW]


def ordered_queries_names():
    return list(ordered_queries())
