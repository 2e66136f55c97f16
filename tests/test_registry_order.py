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

# Round-4 must-verify: everything whose code path changed this round (the
# events.ts NTZ heal touches every events reader; tfidf posting-cap ranking
# re-keyed; multimodal _featurize vectorized) plus the 8 queries that had no
# CORRECTNESS row in ANY prior round (VERDICT.md r3 "What's wrong" #3).
MUST_VERIFY = {
    # events.ts heal — batch temporal
    "events_asof_join",
    "events_range_join",
    "events_funnel_conversion",
    # events.ts heal — streaming
    "streaming_tumbling_1h",
    "streaming_session_30m",
    "streaming_user_state",
    "streaming_dedup_events",
    "streaming_click_attribution",
    # events.ts heal — event-time windows re-witness
    "events_tumbling_1h",
    "events_sliding_1h_30m",
    "events_session_30m",
    "events_time_rollup",
    "events_hourly_anomaly",
    "events_retention_cohorts",
    "events_type_transitions",
    "events_json_extract",
    "events_json_schema",
    # changed this round
    "tfidf_doc_neighbors",
    "multimodal_frame_stats",
    "multimodal_features",
    "dedup_simhash_pairs",
    "dedup_cluster_components",
    # new in round 4
    "dedup_semantic_ivf",
    "embedding_kmeans_refine",
    "docs_contamination_bloom",
    "streaming_nation_activity",
    # never driver-verified before round 4
    "copurchase_lift",
    "corpus_mixture_weights",
    "cube_order_summary",
    "customer_value_deciles",
    "docs_perplexity_buckets",
    "docs_quality_tiers",
    "events_rolling_7d_value",
    "orders_unpivot_metrics",
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
