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
from pyspark.sql.window import Window

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


def _bm25_cte() -> str:
    """Shared oracle CTE chain ending in ``bm(doc_id, raw)`` — the DuckDB
    twin of ``_bm25_scored``."""
    tf_cols = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf_{t}"
        for t in BM25_QUERY_TERMS
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in BM25_QUERY_TERMS
    )
    return f"""d AS (
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
),
bm AS (
    SELECT doc_id, {_BM25_SCORE_SQL} AS raw
    FROM dd, st
)"""


def _bm25_oracle() -> str:
    # Top-k MEMBERSHIP is decided on the ROUNDED score (ADVICE r9): ln()
    # is not bit-identical between DuckDB's libm and the JVM, so a sub-ulp
    # near-tie at the k boundary on the raw double could select different
    # row sets per engine. Rounding first + doc_id tiebreak makes the
    # selected set ulp-drift-immune (the RRF lexical leg already does this).
    return f"""
WITH {_bm25_cte()}
SELECT doc_id, ROUND(raw, 4) + 0 AS bm25
FROM bm
ORDER BY bm25 DESC, doc_id ASC
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
    scored = _bm25_scored(spark, sf_dir)
    raw = F.col("_raw")
    return (
        scored.select(
            "doc_id", (F.round(raw, 4) + F.lit(0)).alias("bm25")
        )
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(BM25_TOP_K)
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared BM25 scoring frame: (doc_id, _raw score) for the fixed query
    terms — the lexical leg of both ``docs_bm25_topk`` and
    ``retrieval_hybrid_rrf``."""
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
    return dd.crossJoin(F.broadcast(st)).select(
        "doc_id", F.expr(_BM25_SCORE_SQL).alias("_raw")
    )


# --- hybrid retrieval: reciprocal-rank fusion -------------------------------
# The combiner every hybrid search stack runs (Cormack, Clarke & Büttcher
# 2009, "Reciprocal rank fusion outperforms Condorcet and individual rank
# learning methods"): fuse a lexical ranking and a dense ranking by
# rrf(d) = Σ_legs 1/(K + rank_leg(d)). Rank-based fusion needs no score
# calibration between legs — which is why it composes BM25 and cosine
# without normalizing either.
RRF_K = 60
RRF_LEG_N = 50  # candidates taken from each leg
RRF_TOP_K = 20
RRF_PROBE_VEC_ID = 0  # dense probe = this vector (aligned: vec_id == doc_id)


@query(
    "retrieval_hybrid_rrf",
    oracle=f"""
WITH {_bm25_cte()},
lex AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY ROUND(raw, 4) DESC, doc_id ASC) AS lr
    FROM bm
),
lexn AS (SELECT doc_id, lr FROM lex WHERE lr <= {RRF_LEG_N}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
qv AS (SELECT emb AS qemb FROM e WHERE vec_id = {RRF_PROBE_VEC_ID}),
den AS (
    SELECT vec_id,
           row_number() OVER (
               ORDER BY ROUND(list_cosine_similarity(qemb, emb), 6) DESC,
                        vec_id ASC) AS dr
    FROM e, qv
),
denn AS (SELECT vec_id, dr FROM den WHERE dr <= {RRF_LEG_N})
SELECT COALESCE(l.doc_id, d.vec_id) AS doc_id,
       CAST(l.lr AS BIGINT) AS lex_rank,
       CAST(d.dr AS BIGINT) AS dense_rank,
       ROUND(COALESCE(1.0 / ({RRF_K} + l.lr), 0.0)
             + COALESCE(1.0 / ({RRF_K} + d.dr), 0.0), 6) AS rrf_score
FROM lexn l FULL JOIN denn d ON d.vec_id = l.doc_id
ORDER BY COALESCE(1.0 / ({RRF_K} + l.lr), 0.0)
         + COALESCE(1.0 / ({RRF_K} + d.dr), 0.0) DESC,
         doc_id ASC
LIMIT {RRF_TOP_K}
""",
)
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical leg + brute-force cosine dense leg
    (probe = the vec_id-{RRF_PROBE_VEC_ID} embedding; the fixture aligns
    vec_id 1:1 with doc_id), top-{RRF_LEG_N} candidates per leg, fused by
    reciprocal-rank fusion with the standard K={RRF_K}. A document
    missing from one leg simply contributes nothing from it — exactly
    RRF's robustness property, and why no score normalization exists
    anywhere in this plan.

    Scale shape: each leg is the already-audited scan shape (BM25 =
    broadcast-stats scoring pass; dense = broadcast-probe zip_with
    products) truncated to a {RRF_LEG_N}-row TakeOrdered head, so the
    fusion itself — a full-outer join of two {RRF_LEG_N}-row frames and
    a rank-arithmetic projection — is driver-trivial at ANY corpus
    size: the legs' top-k machinery is what scales, the fusion never
    grows. Ranks are integers, so the fused score is bit-identical
    arithmetic on both engines — no FP drift surface beyond the legs'
    already-immunized rounding.
    """
    from databricks_spark_sql_challenge1_spark.functions.vectors import cosine
    from databricks_spark_sql_challenge1_spark.operators.similarity import _emb

    lex = (
        _bm25_scored(spark, sf_dir)
        .select(
            "doc_id",
            F.row_number()
            .over(
                Window.orderBy(
                    F.round("_raw", 4).desc(), F.col("doc_id").asc()
                )
            )
            .alias("lr"),
        )
        .where(F.col("lr") <= RRF_LEG_N)
    )
    e = _emb(spark, sf_dir)
    qv = e.where(F.col("vec_id") == RRF_PROBE_VEC_ID).select(
        F.col("emb").alias("qemb")
    )
    den = (
        e.join(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(cosine(F.col("qemb"), F.col("emb")), 6).alias("sim"),
        )
        .select(
            "vec_id",
            F.row_number()
            .over(Window.orderBy(F.col("sim").desc(), F.col("vec_id").asc()))
            .alias("dr"),
        )
        .where(F.col("dr") <= RRF_LEG_N)
    )
    fused = lex.join(den, lex["doc_id"] == den["vec_id"], "full_outer")
    rrf = F.coalesce(1.0 / (F.lit(RRF_K) + F.col("lr")), F.lit(0.0)) + F.coalesce(
        1.0 / (F.lit(RRF_K) + F.col("dr")), F.lit(0.0)
    )
    return (
        fused.select(
            F.coalesce(F.col("doc_id"), F.col("vec_id")).alias("doc_id"),
            F.col("lr").cast("bigint").alias("lex_rank"),
            F.col("dr").cast("bigint").alias("dense_rank"),
            F.round(rrf, 6).alias("rrf_score"),
            rrf.alias("_rrf_raw"),
        )
        .orderBy(F.col("_rrf_raw").desc(), F.col("doc_id").asc())
        .limit(RRF_TOP_K)
        .drop("_rrf_raw")
    )
