"""Streaming ingestion sink with idempotent (exactly-once-ish) writes —
the pattern a continuous training-data pipeline uses to land events:
``foreachBatch`` + dedup-on-key against the already-landed set, so batch
replays (crash/retry) never double-ingest.

At scale the landed-key lookup is a Delta MERGE / an anti-join against the
sink's key index; the parquet variant here anti-joins the sink directly,
which is the same dataflow.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from databricks_spark_sql_challenge1_spark.streaming.events_stream import (
    _events_stream,
)


def ingest_events_idempotent(
    spark: SparkSession, sf_dir: str, sink_dir: str, checkpoint_dir: str
) -> int:
    """Drain the events stream into ``sink_dir`` exactly once per event_id,
    surviving batch replay. Returns the number of rows landed.
    """

    def land(batch: DataFrame, batch_id: int) -> None:
        out = batch
        if os.path.isdir(sink_dir) and any(
            f.endswith(".parquet") for f in os.listdir(sink_dir)
        ):
            landed = batch.sparkSession.read.parquet(sink_dir).select("event_id")
            out = batch.join(landed, "event_id", "left_anti")
        out.write.mode("append").parquet(sink_dir)

    q = (
        _events_stream(spark, sf_dir)
        .writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(sink_dir).count()
