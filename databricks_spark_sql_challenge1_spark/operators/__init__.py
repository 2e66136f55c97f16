"""Operator modules. Importing this package registers every query into
``databricks_spark_sql_challenge1_spark.registry``."""

from databricks_spark_sql_challenge1_spark.operators import (  # noqa: F401
    abandonment,
    analytics_ext,
    clustering,
    dashboards,
    dedup,
    export_denorm,
    json_ops,
    launch,
    layout,
    marts,
    multimodal,
    retrieval,
    similarity,
    states,
    temporal,
    textstats,
    traindata,
    windows,
)
from databricks_spark_sql_challenge1_spark.streaming import (  # noqa: F401
    events_stream,
    ingest_sink,
    parity,
)
