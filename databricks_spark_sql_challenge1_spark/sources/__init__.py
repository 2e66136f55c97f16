from databricks_spark_sql_challenge1_spark.sources import (  # noqa: F401
    bucketing,
    export,
    ingest,
    overwrite,
)
