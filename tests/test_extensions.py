"""Accuracy pinning for the approximate (sketch-based) scale-path variants
against their exact counterparts."""

from __future__ import annotations

from databricks_spark_sql_challenge1_spark.operators.abandonment import (
    top_abandoned_products,
)
from databricks_spark_sql_challenge1_spark.operators.analytics_ext import (
    approx_price_percentiles,
    approx_topk_products,
    price_percentiles,
)
from tests.conftest import SF_DIR


def test_approx_topk_close_to_exact(spark):
    exact = {
        r["partkey"]: r["total_abandoned_orders"]
        for r in top_abandoned_products(spark, SF_DIR).collect()
    }
    approx = {
        r["partkey"]: r["approx_abandoned_orders"]
        for r in approx_topk_products(spark, SF_DIR).collect()
    }
    # top sets largely overlap and counts are within 10%
    overlap = set(exact) & set(approx)
    assert len(overlap) >= 0.8 * len(exact)
    for k in overlap:
        assert abs(approx[k] - exact[k]) <= max(2, 0.1 * exact[k])


def test_approx_percentiles_close_to_exact(spark):
    exact = {r["o_orderstatus"]: (r["p50"], r["p90"], r["p99"])
             for r in price_percentiles(spark, SF_DIR).collect()}
    approx = {r["o_orderstatus"]: (r["p50"], r["p90"], r["p99"])
              for r in approx_price_percentiles(spark, SF_DIR).collect()}
    assert exact.keys() == approx.keys()
    for k in exact:
        for e, a in zip(exact[k], approx[k]):
            assert abs(a - e) / e < 0.05


def test_cosine_chunked_matches_broadcast(spark):
    """The distributed chunk-pair GEMM path (no driver collect, no corpus
    broadcast) must produce exactly the broadcast path's pairs — forced here
    with several chunks so off-diagonal and diagonal groups both execute."""
    from databricks_spark_sql_challenge1_spark.catalog import load_table
    from databricks_spark_sql_challenge1_spark.operators.dedup import (
        _cosine_broadcast,
        _cosine_chunked,
    )

    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    want = {
        (r["vec_1"], r["vec_2"], r["cosine"])
        for r in _cosine_broadcast(spark, e).collect()
    }
    got = {
        (r["vec_1"], r["vec_2"], r["cosine"])
        for r in _cosine_chunked(e, 5).collect()
    }
    assert want and got == want


def test_embedding_lsh_subset_and_recall(spark):
    """LSH near-dup must be a subset of the exact all-pairs output (candidates
    are exact-cosine-verified) with usable recall at the fixture's similarity
    ceiling (deterministic: seeded planes, fixed data)."""
    from databricks_spark_sql_challenge1_spark.operators.dedup import (
        dedup_embedding_cosine,
        dedup_embedding_lsh,
    )

    lsh = {
        (r["vec_1"], r["vec_2"]) for r in dedup_embedding_lsh(spark, SF_DIR).collect()
    }
    exact = {
        (r["vec_1"], r["vec_2"])
        for r in dedup_embedding_cosine(spark, SF_DIR).collect()
    }
    assert lsh <= exact
    assert len(lsh & exact) / len(exact) >= 0.5
