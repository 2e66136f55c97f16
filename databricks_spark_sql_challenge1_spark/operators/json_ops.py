"""Semi-structured (JSON) extraction over ``events.props`` — extension
surface (SURVEY.md §7 Stage 3; no JSON exists in the reference, which has
only primitive columns, SURVEY.md §1.2).

Stays JVM-side: ``get_json_object`` / ``from_json`` are built-in Catalyst
expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from databricks_spark_sql_challenge1_spark.catalog import load_table
from databricks_spark_sql_challenge1_spark.registry import query


@query(
    "events_json_extract",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       ROUND(CAST(AVG(CAST(json_extract(props, '$.k') AS BIGINT)) AS DOUBLE), 4) AS avg_k
FROM events
GROUP BY event_type
ORDER BY event_type ASC
""",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract ``props.$.k`` (get_json_object) and aggregate per event type."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
        .orderBy(F.col("event_type").asc())
    )


@query(
    "events_json_schema",
    oracle="""
SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       COUNT(*) AS n_events
FROM events
GROUP BY 1
ORDER BY k_bucket ASC NULLS FIRST
""",
)
def events_json_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``from_json`` with an explicit schema (the scalable path: one parse,
    typed struct, prunable) then bucket-aggregate."""
    events = load_table(spark, sf_dir, "events")
    schema = StructType([StructField("k", LongType())])
    return (
        events.withColumn("j", F.from_json("props", schema))
        .select((F.col("j.k") % 10).alias("k_bucket"))
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.col("k_bucket").asc_nulls_first())
    )
