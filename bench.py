"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Comparable to BASELINE.md's per-query wall-clock table (reference run on
Databricks CE; see SURVEY.md §6 — comparison is per-operator relative cost).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from databricks_spark_sql_challenge1_spark.session import get_spark
    import databricks_spark_sql_challenge1_spark.operators  # noqa: F401
    from databricks_spark_sql_challenge1_spark.registry import QUERIES

    # Headline set: the full reference query surface + the LLM-pipeline
    # extension operators (SURVEY.md §2.12 numbering in comments).
    headline = [
        "count_distinct_orders",       # #1
        "orders_no_price",             # #2
        "valid_orders",                # #3
        "clean_orders",                # #4
        "top_abandoned_products",      # #5 (flagship)
        "top_abandoned_pairs",         # #6
        "abandonment_mom_increase",    # #7
        "abandonment_yoy_increase",    # #8
        "nations_by_customer",         # #9
        "nations_by_supplier",         # #10
        "nations_by_expr_key",         # #11
        "launch_month_orders",         # #12
        "launch_year_orders",          # #12b
        "abandonment_by_month",        # #13
        "abandonment_by_day",          # #13b
        "order_export_denorm",         # #14
        "calendar_dim",                # S6
        "events_json_extract",
        "events_tumbling_1h",
        "events_session_30m",
        "events_time_rollup",
        "events_asof_join",
        "events_range_join",
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_simhash_pairs",
        "dedup_embedding_cosine",
        "similarity_topk",
        "similarity_ivf",
        "embedding_centroids",
        "text_quality_stats",
        "lang_id_heuristic",
        "text_tfidf_top_terms",
        "corpus_filter_pipeline",
        "doc_rolling_fingerprint",
        "multimodal_features",
        "multimodal_frame_stats",
        "launch_cohort_analysis",
        "events_sliding_1h_30m",
        "events_funnel_conversion",
        "widget_month_orders",
    ]

    spark = get_spark("challenge1-bench")
    # JVM/codegen warmup outside the timed region (baseline timings also
    # exclude cluster startup — dbc:cmd32 is a separate setup row).
    spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).count()

    timings: dict[str, float] = {}
    for name in headline:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
