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

# Round-7 must-verify: everything new or whose code/oracle changed this
# round, the four similarity_* queries whose shared helper changed in r6
# without rotation (VERDICT r6 "What's wrong" #1), and the 30 queries whose
# latest driver evidence is round 4 (VERDICT r6 "Next round" #1).
MUST_VERIFY = {
    # new or changed this round
    "corpus_privacy_pipeline",
    "distinct_orders_kmv",
    "topk_products_cms",
    "multimodal_gif_roundtrip",
    "events_gapfill_interp",
    "streaming_gap_monitor",
    "dedup_simhash_adaptive",
    "embedding_random_projection",
    "events_gapfill_stats",
    "docs_pii_redact",
    "orders_dq_audit",
    "multimodal_png_roundtrip",
    "multimodal_wav_parse",
    "multimodal_bmp_parse",
    "multimodal_image_thumbnail",
    "embedding_quantize_int8",
    "jsonl_roundtrip_checksum",
    # _pq_scored helper refactored in r6 without rotation
    "similarity_pq",
    "similarity_ivfpq",
    "similarity_topk",
    "similarity_ivf",
    # round-4-stale evidence refresh
    "events_asof_join",
    "events_funnel_conversion",
    "events_hourly_anomaly",
    "events_json_extract",
    "events_json_schema",
    "events_range_join",
    "events_retention_cohorts",
    "events_rolling_7d_value",
    "events_session_30m",
    "events_sliding_1h_30m",
    "events_time_rollup",
    "events_tumbling_1h",
    "events_type_transitions",
    "streaming_click_attribution",
    "streaming_dedup_events",
    "streaming_session_30m",
    "streaming_tumbling_1h",
    "streaming_user_state",
    "dedup_cluster_components",
    "dedup_semantic_ivf",
    "dedup_simhash_pairs",
    "docs_contamination_bloom",
    "docs_perplexity_buckets",
    "docs_quality_tiers",
    "corpus_mixture_weights",
    "cube_order_summary",
    "customer_value_deciles",
    "multimodal_frame_stats",
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
