from databricks_spark_sql_challenge1_spark.sources import export, ingest, overwrite  # noqa: F401
