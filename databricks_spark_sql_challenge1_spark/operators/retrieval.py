"""Lexical retrieval over ``documents`` — extension surface (SURVEY.md §7):
Okapi BM25 scoring, the classic sparse-retrieval baseline every RAG /
training-data curation stack keeps next to its embedding ANN index
(Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework").

Engine-parity policy: the per-term score is generated from ONE Python
template into both the Spark expression and the DuckDB oracle SQL, so the
floating-point evaluation order is textually identical on both sides; the
query-term partial scores are pivoted into fixed columns and added in a
fixed order (never SUM over rows, whose accumulation order differs per
engine/partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_spark_sql_challenge1_spark.catalog import load_table
from databricks_spark_sql_challenge1_spark.registry import query

# Fixed retrieval query — terms from the fixture vocabulary (FIXTURES.md:
# documents share a tiny vocabulary, so df spans low/mid/high and the
# score surface is non-degenerate).
BM25_QUERY_TERMS: tuple[str, ...] = ("hash", "merge", "window")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 20


def _bm25_term_score_sql(t: str) -> str:
    """One query-term's BM25 partial, as SQL shared verbatim by both
    engines: idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) with the
    Lucene-style always-positive idf ln(1 + (N - df + 0.5)/(df + 0.5))."""
    return (
        f"(ln(1.0 + (n_docs - df_{t} + 0.5) / (df_{t} + 0.5))"
        f" * (tf_{t} * {BM25_K1 + 1.0})"
        f" / (tf_{t} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl)))"
    )


_BM25_SCORE_SQL = " + ".join(_bm25_term_score_sql(t) for t in BM25_QUERY_TERMS)


def _bm25_oracle() -> str:
    tf_cols = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf_{t}"
        for t in BM25_QUERY_TERMS
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in BM25_QUERY_TERMS
    )
    return f"""
WITH d AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
    FROM documents
),
dd AS (
    SELECT doc_id, len(toks) AS dl, {tf_cols}
    FROM d
),
st AS (
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
           {df_cols}
    FROM dd
)
SELECT doc_id, ROUND({_BM25_SCORE_SQL}, 4) + 0 AS bm25
FROM dd, st
ORDER BY {_BM25_SCORE_SQL} DESC, doc_id ASC
LIMIT {BM25_TOP_K}
"""


@query("docs_bm25_topk", oracle=_bm25_oracle())
def docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k over the corpus for a fixed query-term set.

    Scale shape (the part that matters at 100 TB): two scan-resident
    passes and nothing else — a stats pass (N, Σdl, per-term df via one
    partial-aggregated ``agg`` whose 1-row result is broadcast back) and a
    scoring pass where dl and the |Q| term frequencies are filtered-
    ``size`` expressions inside the scan's codegen stage. No exploded
    token table, no
    term-level shuffle: the only exchange in the plan is the final
    TakeOrderedAndProject top-k merge (per-partition heaps, driver-side
    k-way merge of 32 rows). Contrast with the inverted-index layout
    (``text_tfidf_top_terms``) which pays a term-grain shuffle — right
    for ALL terms, wasteful for a fixed |Q|=3 probe. The scored relation
    never materializes: scoring is a scalar expression over (dl, tf_t)
    joined to the broadcast stats row.
    """
    docs = load_table(spark, sf_dir, "documents")
    dd = docs.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("toks")
    ).select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[
            F.expr(f"size(filter(toks, x -> x = '{t}'))").alias(f"tf_{t}")
            for t in BM25_QUERY_TERMS
        ],
    )
    st = dd.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in BM25_QUERY_TERMS
        ],
    )
    scored = dd.crossJoin(F.broadcast(st))
    raw = F.expr(_BM25_SCORE_SQL)
    return (
        scored.select(
            "doc_id", (F.round(raw, 4) + F.lit(0)).alias("bm25"), raw.alias("_raw")
        )
        .orderBy(F.col("_raw").desc(), F.col("doc_id").asc())
        .limit(BM25_TOP_K)
        .drop("_raw")
    )
