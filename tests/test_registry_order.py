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

# every query that had no CORRECTNESS row in round 1, plus everything whose
# code or oracle changed in round 2, must sit inside the driver window
MUST_VERIFY = {
    "nations_by_supplier",
    "nations_by_customer",
    "nations_by_expr_key",
    "corpus_filter_pipeline",
    "dedup_embedding_cosine",
    "events_asof_join",
    "events_range_join",
    "events_funnel_conversion",
    "events_tumbling_1h",
    "events_sliding_1h_30m",
    "events_session_30m",
    "events_time_rollup",
    "text_token_stats",
    "text_quality_stats",
    "lang_id_heuristic",
    "lang_stats",
    "text_tfidf_top_terms",
    "doc_fingerprint",
    "doc_rolling_fingerprint",
    "streaming_tumbling_1h",
    "streaming_session_30m",
    "streaming_user_state",
    "streaming_dedup_events",
    "streaming_click_attribution",
    # new in round 2
    "top_abandoned_products_salted",
    "docs_split_assign",
    "token_budget_pack",
    "dedup_embedding_lsh",
    "dedup_cluster_components",
    "dedup_incremental",
    "docs_chunk_windows",
    "docs_contamination",
    "similarity_pq",
    "corpus_vocabulary",
    "dedup_keep_best",
    "docs_lang_rebalance",
    "events_hourly_anomaly",
    "text_entropy",
    "customer_rfm_segments",
    "events_retention_cohorts",
    # refactored this round (shared band helper) — keep in window
    "dedup_simhash_pairs",
    # new late in round 2
    "docs_substring_dedup",
    "copurchase_pagerank",
    "copurchase_components",
    "tfidf_doc_neighbors",
    "docs_stratified_sample",
    "dedup_minhash_portable",
    "docs_repetition_stats",
    "events_type_transitions",
    "embedding_dim_stats",
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
