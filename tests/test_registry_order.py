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

# Round-6 must-verify: everything new or whose code/oracle changed this round
# plus the 17 queries whose latest driver evidence is round 3 — the final leg
# of the rotation discipline (VERDICT.md r5 "Next round" #3).
MUST_VERIFY = {
    # new or changed this round
    "dedup_embedding_lsh_adaptive",
    "embedding_quantize_int8",
    "corpus_temperature_mixture",
    "similarity_pq_rerank",
    "partkey_skew_histogram",
    "multimodal_audio_pcm_stats",
    "multimodal_image_thumbnail",
    "dedup_embedding_clusters",
    "dedup_embedding_lsh",
    "events_json_nested",
    "jsonl_roundtrip_checksum",
    "top_abandoned_pairs",
    "copurchase_components",
    "copurchase_pagerank",
    "copurchase_triangles",
    # round-3-stale evidence refresh
    "corpus_filter_pipeline",
    "corpus_vocabulary",
    "customer_rfm_segments",
    "doc_fingerprint",
    "doc_rolling_fingerprint",
    "docs_chunk_windows",
    "docs_contamination",
    "docs_lang_rebalance",
    "docs_repetition_stats",
    "docs_split_assign",
    "docs_stratified_sample",
    "lang_id_heuristic",
    "lang_stats",
    "text_entropy",
    "text_tfidf_top_terms",
    "token_budget_pack",
    "top_abandoned_products_salted",
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
