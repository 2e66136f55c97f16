"""Training-data assembly ops over ``documents`` — extension surface
(SURVEY.md §7): reproducible split assignment and token-budget packing, the
two steps between a filtered corpus (``corpus_filter_pipeline``) and a
training run.

Both are pure expression/window pipelines: no shuffle for the split (a map),
one shuffle for the packing (window over the stratification key) — shapes
that hold at 100 TB. Determinism matters more than randomness here: split
membership must be stable across reruns and engines, so bucketing hashes
md5(doc_id) rather than sampling (same policy as ``doc_fingerprint``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databricks_spark_sql_challenge1_spark.catalog import load_table
from databricks_spark_sql_challenge1_spark.registry import query

# split: md5 bucket 0-79 train / 80-89 val / 90-99 test
SPLIT_BUCKETS = 100
TRAIN_UPTO = 80
VAL_UPTO = 90

# packing: whitespace tokens per pack (tiny budget so fixture docs yield
# multi-pack groups; production would use the context length)
PACK_BUDGET = 2048


@query(
    "docs_split_assign",
    oracle=f"""
SELECT doc_id, lang,
       CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS UBIGINT)
            % {SPLIT_BUCKETS} AS BIGINT) AS bucket,
       CASE
         WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS UBIGINT)
              % {SPLIT_BUCKETS} < {TRAIN_UPTO} THEN 'train'
         WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS UBIGINT)
              % {SPLIT_BUCKETS} < {VAL_UPTO} THEN 'val'
         ELSE 'test'
       END AS split
FROM documents
ORDER BY doc_id ASC
""",
)
def docs_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: md5(doc_id) bucket ranges.

    Hash-bucket splitting (not ``sample()``) so membership is reproducible
    across reruns, engines, and data re-partitioning — the property training
    pipelines need for leakage audits. Pure projection: no shuffle, scales
    as a map over the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("bigint")
        % SPLIT_BUCKETS
    )
    return docs.select(
        "doc_id",
        "lang",
        bucket.alias("bucket"),
        F.when(bucket < TRAIN_UPTO, F.lit("train"))
        .when(bucket < VAL_UPTO, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    ).orderBy(F.col("doc_id").asc())


@query(
    "token_budget_pack",
    oracle=f"""
WITH t AS (
    SELECT doc_id, lang,
           len(string_split_regex(trim(text), '\\s+')) AS n_tokens
    FROM documents
),
c AS (
    SELECT doc_id, lang, n_tokens,
           SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum_tokens
    FROM t
)
SELECT doc_id, lang, n_tokens,
       CAST(CAST(cum_tokens - n_tokens AS BIGINT) // {PACK_BUDGET} AS BIGINT)
           AS pack_id,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM c
ORDER BY lang ASC, doc_id ASC
""",
)
def token_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed token-budget packs per
    language via a running-sum window (pack_id = tokens-before // budget).

    One shuffle on the stratification key; within-partition running sum is
    the classic offline-packing shape. At 100 TB ``lang`` is too coarse a
    partition key — production would sub-shard (lang, md5-bucket) and pack
    within shards; the window algebra is identical.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = docs.select("doc_id", "lang", n_tokens.alias("n_tokens"))
    cum = F.sum("n_tokens").over(w)
    return t.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / PACK_BUDGET)
        .cast("bigint")
        .alias("pack_id"),
        cum.cast("bigint").alias("cum_tokens"),
    ).orderBy(F.col("lang").asc(), F.col("doc_id").asc())
